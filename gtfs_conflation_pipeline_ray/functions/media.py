"""Audio / video codecs for multimodal binary columns — stdlib-only
(struct + zlib + numpy), since this container ships no media libraries
(no ffmpeg/libsndfile/PyAV).

Audio
-----
- ``wav``  — real RIFF/WAVE, 16-bit PCM mono (the public format, encoded and
  decoded for real; a foreign PCM16-mono WAV decodes here too).
- ``qaud`` — **STUB** for compressed audio (opus/mp3 need a real codec
  library): deterministic lossy stand-in — 12-bit mid-bin quantization +
  zlib, magic ``QAUD``. Honest about lossiness; SNR >= 40 dB whenever the
  signal's RMS exceeds ~2% of full scale (see ``encode_qaud``). Swap for a
  libsndfile/opus binding in production; all call sites go through
  :func:`encode_audio` / :func:`decode_audio` so the swap is one function.
- any other fmt — ``NotImplementedError`` (clearly-marked stub boundary).

Video
-----
Real containers (mp4/webm) need ffmpeg, so the engine defines ``qvid``: a
seekable deterministic container with a frame INDEX table so a frame-sampling
stage decodes ONLY the sampled frames (the property that matters at scale —
real decoders seek keyframes the same way):

    magic 'QVID' | u16 w | u16 h | u32 n_frames | u8 fps
    | n_frames x u32 compressed-frame sizes          (the seek index)
    | n_frames x zlib(RGB24 frame bytes)

All frame arrays are ``numpy uint8 (h, w, 3)`` RGB.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# WAV (real format: RIFF/WAVE PCM16 mono)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sr: int) -> bytes:
    """16-bit PCM mono WAV. ``samples`` is int16 1-D."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)  # PCM, mono, 16-bit
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Returns (samples int16 1-D, sample_rate). PCM16 mono only."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, sr, data = 12, None, None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        if tag == b"fmt ":
            audio_fmt, channels, sr, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", buf, pos + 8
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV variant (fmt={audio_fmt} ch={channels} bits={bits})"
                )
        elif tag == b"data":
            data = buf[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # RIFF chunks are 2-byte aligned
    if sr is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return np.frombuffer(data, dtype="<i2"), int(sr)


# ---------------------------------------------------------------------------
# "QAUD" compressed-audio stand-in (deterministic lossy STUB — see docstring)
# ---------------------------------------------------------------------------

_QAUD_MAGIC = b"QAUD"


def encode_qaud(samples: np.ndarray, sr: int) -> bytes:
    """12-bit mid-bin quantization + zlib: reconstruction error ≤ 8 LSB, so
    SNR ≥ 40 dB holds for any signal whose RMS exceeds ~2% of full scale
    (below that no fixed-step quantizer keeps 40 dB — a real opus/mp3 codec
    is adaptive; this stub documents its guarantee domain instead)."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    q = (s.astype(np.int32) >> 4).astype(np.int16)  # 12-bit quantization
    body = zlib.compress(q.tobytes(), 6)
    return _QAUD_MAGIC + struct.pack("<II", sr, len(s)) + body


def decode_qaud(buf: bytes) -> tuple[np.ndarray, int]:
    if buf[:4] != _QAUD_MAGIC:
        raise ValueError("not a QAUD (stub compressed audio) payload")
    sr, n = struct.unpack_from("<II", buf, 4)
    q = np.frombuffer(zlib.decompress(buf[12:]), dtype=np.int16)[:n]
    # dequantize to bin centers
    return ((q.astype(np.int32) << 4) | 0x8).astype(np.int16), int(sr)


AUDIO_LOSSLESS = {"wav"}
_A_ENCODERS = {"wav": encode_wav, "qaud": encode_qaud}
_A_DECODERS = {"wav": decode_wav, "qaud": decode_qaud}


def encode_audio(samples: np.ndarray, sr: int, fmt: str) -> bytes:
    if fmt not in _A_ENCODERS:
        raise NotImplementedError(
            f"audio fmt {fmt!r}: real compressed codecs need an external "
            "library (opus/libmp3lame) absent from this container"
        )
    return _A_ENCODERS[fmt](samples, sr)


def decode_audio(buf: bytes, fmt: str) -> tuple[np.ndarray, int]:
    if fmt not in _A_DECODERS:
        raise NotImplementedError(
            f"audio fmt {fmt!r}: real compressed codecs need an external "
            "library (opus/libmp3lame) absent from this container"
        )
    return _A_DECODERS[fmt](buf)


def snr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Signal-to-noise ratio of reconstruction b vs original a (dB)."""
    sig = np.sum(a.astype(np.float64) ** 2)
    err = np.sum((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if err == 0:
        return float("inf")
    return 10.0 * np.log10(sig / err) if sig > 0 else float("-inf")


# ---------------------------------------------------------------------------
# QVID video container (seekable; deterministic — see docstring)
# ---------------------------------------------------------------------------

_QVID_MAGIC = b"QVID"
_QVID_HDR = struct.Struct("<HHIB")


def encode_video(frames: np.ndarray, fps: int = 24) -> bytes:
    """``frames`` is uint8 (n, h, w, 3)."""
    n, h, w, _ = frames.shape
    blobs = [zlib.compress(np.ascontiguousarray(f).tobytes(), 6) for f in frames]
    index = np.array([len(b) for b in blobs], dtype="<u4").tobytes()
    return (
        _QVID_MAGIC
        + _QVID_HDR.pack(w, h, n, fps)
        + index
        + b"".join(blobs)
    )


def video_info(buf: bytes) -> tuple[int, int, int, int]:
    """Header-only read: (w, h, n_frames, fps) — no frame decode."""
    if buf[:4] != _QVID_MAGIC:
        raise ValueError("not a QVID payload")
    w, h, n, fps = _QVID_HDR.unpack_from(buf, 4)
    return int(w), int(h), int(n), int(fps)


def _frame_offsets(buf: bytes, n: int) -> tuple[np.ndarray, int]:
    base = 4 + _QVID_HDR.size
    sizes = np.frombuffer(buf, dtype="<u4", count=n, offset=base)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    return offs, base + 4 * n


def decode_frame(buf: bytes, k: int) -> np.ndarray:
    """Decode ONLY frame ``k`` via the seek index (O(1) locate + one
    inflate) — the scale-relevant access pattern for frame sampling."""
    w, h, n, _fps = video_info(buf)
    if not 0 <= k < n:
        raise IndexError(f"frame {k} out of range [0,{n})")
    offs, data0 = _frame_offsets(buf, n)
    raw = zlib.decompress(buf[data0 + offs[k] : data0 + offs[k + 1]])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def decode_video(buf: bytes) -> np.ndarray:
    w, h, n, _fps = video_info(buf)
    offs, data0 = _frame_offsets(buf, n)
    out = np.empty((n, h, w, 3), dtype=np.uint8)
    for k in range(n):
        raw = zlib.decompress(buf[data0 + offs[k] : data0 + offs[k + 1]])
        out[k] = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    return out


# ---------------------------------------------------------------------------
# average hash (aHash) — public perceptual-hash algorithm, integer-exact
# ---------------------------------------------------------------------------


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash: 8x8 block-mean grid, bit = cell mean > global
    mean, row-major MSB-first. The predicate is evaluated in exact integer
    cross-multiplication (cell_sum * total_pix > total_sum * cell_pix), so
    the hash is bit-reproducible across platforms."""
    h, w, _ = img.shape
    gray = img.astype(np.int64).sum(axis=2)  # 3x luminance-less gray (exact)
    rb = (np.arange(9, dtype=np.int64) * h) // 8
    cb = (np.arange(9, dtype=np.int64) * w) // 8
    # exact block sums via 2-D prefix sums
    ps = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(gray, axis=0), axis=1, out=ps[1:, 1:])
    cell = (
        ps[rb[1:], :][:, cb[1:]]
        - ps[rb[:-1], :][:, cb[1:]]
        - ps[rb[1:], :][:, cb[:-1]]
        + ps[rb[:-1], :][:, cb[:-1]]
    )
    npix = (rb[1:] - rb[:-1])[:, None] * (cb[1:] - cb[:-1])[None, :]
    total_sum, total_pix = int(ps[h, w]), h * w
    bits = (cell * total_pix) > (total_sum * npix)
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    return int(np.sum(weights[bits.reshape(64)], dtype=np.uint64).view(np.int64))
