"""Image codecs for the engine's native input table
``(image_id, bytes, w, h, fmt, caption, phash)`` — stdlib-only (struct + zlib
+ numpy), since this container ships no image libraries (no PIL/OpenCV).

- ``bmp``  — real 24-bit uncompressed BMP (BGR, bottom-up, 4-byte row pad).
- ``png``  — real PNG, 8-bit RGB, filter type 0, zlib; decoder handles filter
  types 0-4 so foreign PNGs also decode.
- ``jfif`` — REAL baseline JPEG (ITU-T T.81): huffman + fixed-point IDCT
  decoder and Annex-K encoder in :mod:`.jpeg`, no libjpeg needed. This is
  the production path for real image corpora.
- ``jpeg`` — dual-dispatch: real JFIF streams (FFD8 magic) decode through
  the T.81 decoder; the legacy deterministic ``QJPG`` stand-in (6-bit
  uniform quantization + zlib) is kept ONLY because its dequantization is
  closed-form replayable inside the DuckDB oracles of the image registry
  queries — a property a full DCT codec cannot offer for arbitrary images
  (the ``image_jfif_*`` queries get exact oracles via DC-only constructions
  instead). ``encode_jpeg`` still emits QJPG for those fixtures; real
  encoding is ``encode_jfif``.

All functions take/return ``numpy uint8 (h, w, 3)`` RGB arrays.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# BMP (lossless)
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    row_pad = (-(w * 3)) % 4
    stride = w * 3 + row_pad
    data_size = stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    bgr = img[::-1, :, ::-1]  # bottom-up, BGR
    if row_pad:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    return header + body


def decode_bmp(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h, _planes, bpp = struct.unpack_from("<IiiHH", buf, 14)
    if bpp != 24:
        raise ValueError(f"unsupported BMP bpp={bpp}")
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(buf, dtype=np.uint8, count=stride * abs(h), offset=data_off)
    rows = arr.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ---------------------------------------------------------------------------
# PNG (lossless)
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = img.reshape(h, w * 3)  # filter type 0 per row
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(buf: bytes) -> np.ndarray:
    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, w = 8, b"", None
    while pos < len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    bpp = 3
    out = np.zeros((h, w * 3), dtype=np.uint8)
    for y in range(h):
        f, line = raw[y, 0], raw[y, 1:].copy()
        prev = out[y - 1] if y else np.zeros(w * 3, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 2:  # Up
            out[y] = line + prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left state: per-pixel
            cur = np.zeros(w * 3 + bpp, dtype=np.uint8)
            pv = np.concatenate([np.zeros(bpp, np.uint8), prev])
            for x in range(w * 3):
                left, up, ul = cur[x], pv[x + bpp], pv[x]
                if f == 1:
                    v = line[x] + left
                elif f == 3:
                    v = line[x] + np.uint8((int(left) + int(up)) // 2)
                else:
                    v = line[x] + _paeth(
                        np.array(left), np.array(up), np.array(ul)
                    )
                cur[x + bpp] = v
            out[y] = cur[bpp:]
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# "JPEG" stand-in (deterministic lossy stub — see module docstring)
# ---------------------------------------------------------------------------

_QJPG_MAGIC = b"QJPG"
_QBITS = 6  # 6-bit quantization -> max err 2/255 per channel, PSNR ~ 46 dB


def encode_jpeg(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    q = (img >> (8 - _QBITS)).astype(np.uint8)
    body = zlib.compress(q.tobytes(), 6)
    return _QJPG_MAGIC + struct.pack("<IIB", w, h, _QBITS) + body


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Lossy-format decode: REAL baseline JFIF (sniffed on the FFD8 SOI
    magic, full ITU-T T.81 huffman+IDCT path in :mod:`.jpeg`) or the legacy
    QJPG stand-in. Every fmt='jpeg'/'jfif' row goes through here, so real
    JPEG corpora decode without call-site changes."""
    if buf[:2] == b"\xff\xd8":
        return decode_jfif(buf)
    if buf[:4] != _QJPG_MAGIC:
        raise ValueError("neither a JFIF stream nor a QJPG payload")
    w, h, qbits = struct.unpack_from("<IIB", buf, 4)
    q = np.frombuffer(zlib.decompress(buf[13:]), dtype=np.uint8).reshape(h, w, 3)
    # dequantize to bin centers
    shift = 8 - qbits
    return ((q.astype(np.uint16) << shift) | (q >> (qbits - shift))).astype(np.uint8)


# ---------------------------------------------------------------------------
# real baseline JFIF (ITU-T T.81) — see functions/jpeg.py
# ---------------------------------------------------------------------------

def encode_jfif(img: np.ndarray, quality: int = 90,
                subsampling: str = "444", restart_interval: int = 0) -> bytes:
    from . import jpeg as _jpeg

    return _jpeg.encode(img, quality=quality, subsampling=subsampling,
                        restart_interval=restart_interval)


def decode_jfif(buf: bytes) -> np.ndarray:
    from . import jpeg as _jpeg

    out = _jpeg.decode(buf)
    if out.ndim == 2:  # grayscale stream -> 3-channel for the image contract
        out = np.repeat(out[:, :, None], 3, axis=2)
    return out


# ---------------------------------------------------------------------------
# dispatch + metrics
# ---------------------------------------------------------------------------

_ENCODERS = {"bmp": encode_bmp, "png": encode_png, "jpeg": encode_jpeg,
             "jfif": encode_jfif}
_DECODERS = {"bmp": decode_bmp, "png": decode_png, "jpeg": decode_jpeg,
             "jfif": decode_jfif}
LOSSLESS = {"bmp", "png"}


def encode(img: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](img)


def decode(buf: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](buf)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
