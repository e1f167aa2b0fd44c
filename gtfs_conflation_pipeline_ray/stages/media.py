"""Multimodal (audio / video) actor-pool stages over opaque binary columns.

The task shape mirrors the image pipeline (``pipelines/image_conflation.py``):
binary payloads are decoded INSIDE a stage and reduced to small typed rows —
bytes never ride a shuffle. Decode itself goes through
``functions/media`` (real WAV + seekable QVID container; compressed formats
are clearly-marked stubs — swap one function for ffmpeg/libsndfile in
production).

Reference parity: these extend the engine beyond SURVEY §2 into the
training-data-pipeline operator set (multimodal decode / feature-extract /
resample / frame-sample) the 100 TB deployment needs; the Ray-side plumbing
(schemas, actor signatures, batch sizes, shard-local byte handling) is real
and tested even where a codec is a stand-in.

Integer-exact feature math: every emitted feature (sum of squares, peak,
zero-crossings, per-channel frame sums, aHash bits) is exact int64
arithmetic, so the stages carry closed-form DuckDB oracles
(``pipelines/queries.py``: ``audio_decode_features``, ``video_frame_means``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import media
from .util import pool_size


# ---------------------------------------------------------------------------
# audio: decode + feature extraction
# ---------------------------------------------------------------------------

class AudioFeaturizer:
    """Actor-pool batch fn: decode each audio payload, emit integer-exact
    features. Per-actor ``__init__`` holds the decode dispatch (the slot a
    real deployment fills with a loaded codec/model); per-row decode is
    unavoidable Python (variable-length blobs), feature math is vectorized
    numpy over each sample array."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "audio_id",
                 fmt_col: str = "fmt"):
        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = media.decode_audio  # codec handle: loaded once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        out = {k: np.zeros(n, dtype=np.int64)
               for k in ("sr", "n_samples", "peak", "sum_sq", "n_zero_cross")}
        ok = np.ones(n, dtype=bool)
        errs = []
        for i in range(n):
            try:
                s, sr = self.decode(blobs[i], fmts[i])
                s64 = s.astype(np.int64)
                out["sr"][i] = sr
                out["n_samples"][i] = len(s)
                out["peak"][i] = np.max(np.abs(s64)) if len(s) else 0
                out["sum_sq"][i] = np.sum(s64 * s64)
                out["n_zero_cross"][i] = (
                    np.count_nonzero(s64[1:] * s64[:-1] < 0) if len(s) > 1 else 0
                )
                errs.append("")
            except Exception as e:  # poison-row quarantine, not job abort
                ok[i] = False
                errs.append(f"{type(e).__name__}: {e}")
        return pa.table(
            {
                # id column passes through with its ORIGINAL type (string ids
                # are as valid as ints — same contract as phash_neardup_pairs)
                "audio_id": batch[self.id_col],
                "sr": out["sr"],
                "n_samples": out["n_samples"],
                "peak": out["peak"],
                "sum_sq": out["sum_sq"],
                "n_zero_cross": out["n_zero_cross"],
                "ok": ok,
                "err": pa.array(errs, type=pa.string()),
            }
        )


def audio_features(ds, bytes_col: str = "bytes", id_col: str = "audio_id",
                   fmt_col: str = "fmt", concurrency: int | None = None,
                   batch_size: int = 256):
    """Decode + featurize an audio table. Actor pool (stateful decode handle);
    small batches — a batch of payloads must fit a worker heap."""
    return ds.map_batches(
        AudioFeaturizer,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


class AudioResampler:
    """Actor-pool batch fn: decode → linear-interpolation resample to
    ``target_sr`` → re-encode WAV. (No grid memoization: the grid is a single
    O(n_out) arange — the same cost as the interp itself — and caching it
    per distinct (n, sr) would grow without bound over variable-length
    clips.)"""

    def __init__(self, target_sr: int, bytes_col: str = "bytes",
                 fmt_col: str = "fmt"):
        self.target_sr = target_sr
        self.bytes_col, self.fmt_col = bytes_col, fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        out_bytes, out_n = [], np.zeros(batch.num_rows, dtype=np.int64)
        for i, (buf, fmt) in enumerate(zip(blobs, fmts)):
            s, sr = media.decode_audio(buf, fmt)
            if sr == self.target_sr:
                res = s
            else:
                n_out = max(1, (len(s) * self.target_sr) // sr)
                g = (np.arange(n_out, dtype=np.float64) * sr) / self.target_sr
                res = np.interp(g, np.arange(len(s), dtype=np.float64),
                                s.astype(np.float64))
                res = np.clip(np.rint(res), -32768, 32767).astype(np.int16)
            out_bytes.append(media.encode_wav(res, self.target_sr))
            out_n[i] = len(res)
        cols = {name: batch[name] for name in batch.column_names
                if name not in (self.bytes_col, self.fmt_col)}
        cols[self.bytes_col] = pa.array(out_bytes, type=pa.binary())
        cols[self.fmt_col] = pa.array(["wav"] * batch.num_rows, type=pa.string())
        cols["n_samples_out"] = out_n
        return pa.table(cols)


def resample_audio_shards(files: list[str], target_sr: int, out_dir: str,
                          concurrency: int | None = None):
    """Bytes-in / bytes-out resample over (file, row_group) shard descriptors —
    the payloads never transit the object store (same structure as
    ``image_conflation.validate_images``): each task reads its row group
    locally, resamples, and writes its own output file under ``out_dir``.
    Returns a Dataset of (path, rows) receipts."""
    import os

    import pyarrow.parquet as _pq
    import ray

    units = []
    for f in sorted(files):
        n_rg = _pq.ParquetFile(f).metadata.num_row_groups
        units.extend({"path": f, "rg": g} for g in range(n_rg))
    os.makedirs(out_dir, exist_ok=True)

    def _resample_shard(batch: pa.Table) -> pa.Table:
        rs = AudioResampler(target_sr)
        outs = []
        for path, rg in zip(batch["path"].to_pylist(), batch["rg"].to_pylist()):
            tab = _pq.ParquetFile(path).read_row_group(rg)
            res = rs(tab)
            stem = os.path.splitext(os.path.basename(path))[0]
            out_path = f"{out_dir}/{stem}-rg{rg}.parquet"
            _pq.write_table(res, out_path)
            outs.append((out_path, res.num_rows))
        return pa.table({"path": [o[0] for o in outs],
                         "rows": np.array([o[1] for o in outs], dtype=np.int64)})

    return ray.data.from_items(units).map_batches(
        _resample_shard, batch_format="pyarrow", batch_size=1
    )


# ---------------------------------------------------------------------------
# video: frame sampling + per-frame features
# ---------------------------------------------------------------------------

class FrameSampler:
    """Actor-pool batch fn: per video, read the container HEADER, pick every
    ``every_n``-th frame, and decode ONLY those frames via the container's
    seek index (``media.decode_frame``) — never the whole video. Emits one
    row per sampled frame with exact int64 per-channel sums + aHash."""

    def __init__(self, every_n: int, bytes_col: str = "bytes",
                 id_col: str = "video_id", with_ahash: bool = True):
        if every_n < 1:
            raise ValueError("every_n must be >= 1")
        self.every_n = every_n
        self.bytes_col, self.id_col = bytes_col, id_col
        self.with_ahash = with_ahash

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        row_out, idx_out, sums, hashes, whs = [], [], [], [], []
        for row, buf in enumerate(blobs):
            w, h, n, _fps = media.video_info(buf)
            for k in range(0, n, self.every_n):
                frame = media.decode_frame(buf, k)
                f64 = frame.astype(np.int64)
                row_out.append(row)
                idx_out.append(k)
                sums.append(f64.sum(axis=(0, 1)))
                hashes.append(media.ahash64(frame) if self.with_ahash else 0)
                whs.append((w, h))
        # id column gathered from the input with its ORIGINAL type (string
        # ids are as valid as ints); empty batches keep that schema too
        ids = batch[self.id_col].take(pa.array(row_out, type=pa.int64()))
        s = (np.asarray(sums, dtype=np.int64) if sums
             else np.zeros((0, 3), dtype=np.int64))
        wh = (np.asarray(whs, dtype=np.int64) if whs
              else np.zeros((0, 2), dtype=np.int64))
        return pa.table(
            {
                "video_id": ids,
                "frame_idx": np.asarray(idx_out, dtype=np.int64),
                "w": wh[:, 0],
                "h": wh[:, 1],
                "sum_r": s[:, 0],
                "sum_g": s[:, 1],
                "sum_b": s[:, 2],
                "ahash": np.asarray(hashes, dtype=np.int64),
            }
        )


def sample_frames(ds, every_n: int = 3, bytes_col: str = "bytes",
                  id_col: str = "video_id", with_ahash: bool = True,
                  concurrency: int | None = None, batch_size: int = 64):
    """Frame-sampling stage: header read + seek-index decode of sampled
    frames only. Small batches (each row may carry a multi-MB payload)."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_n": every_n, "bytes_col": bytes_col,
                               "id_col": id_col, "with_ahash": with_ahash},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def video_keyframe_neardup(ds, every_n: int = 3, max_hamming: int = 3,
                           bytes_col: str = "bytes", id_col: str = "video_id"):
    """Cross-modal reuse: sampled-frame aHash keys feed the SAME banded
    Hamming near-dup machinery the image corpus uses
    (``dedup.phash_neardup_pairs``) — near-duplicate keyframes across a video
    corpus without any frame ever entering a shuffle. Key = composite
    (video_id << 20 | frame_idx) int64 key per frame (requires integer
    video ids; string-id corpora can pass a composite string key straight to
    ``dedup.phash_neardup_pairs`` instead)."""
    from . import dedup

    frames = sample_frames(ds, every_n, bytes_col, id_col)

    def _key(batch: pa.Table) -> pa.Table:
        vid = batch["video_id"].to_numpy(zero_copy_only=False)
        idx = batch["frame_idx"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "frame_key": vid * np.int64(1 << 20) + idx,
                "phash": batch["ahash"],
            }
        )

    keyed = frames.map_batches(_key, batch_format="pyarrow")
    return dedup.phash_neardup_pairs(keyed, phash_col="phash",
                                     id_col="frame_key",
                                     max_hamming=max_hamming)


# ---------------------------------------------------------------------------
# image: decode + feature extraction + resize (completing the multimodal
# verb set for the image payload: decode / feature-extract / resize)
# ---------------------------------------------------------------------------

class ImageFeaturizer:
    """Actor-pool batch fn: decode each image payload (real BMP/PNG codecs,
    deterministic QJPG stub — ``functions/codecs``), emit exact int64
    per-channel pixel sums + dims + aHash. Same poison-row quarantine
    contract as the audio featurizer."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt", with_ahash: bool = True):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.with_ahash = with_ahash
        self.decode = codecs.decode  # codec handle held per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        out = {k: np.zeros(n, dtype=np.int64)
               for k in ("w", "h", "sum_r", "sum_g", "sum_b", "ahash")}
        ok = np.ones(n, dtype=bool)
        errs = []
        for i in range(n):
            try:
                img = self.decode(blobs[i], fmts[i])
                f64 = img.astype(np.int64)
                out["h"][i], out["w"][i] = img.shape[0], img.shape[1]
                s = f64.sum(axis=(0, 1))
                out["sum_r"][i], out["sum_g"][i], out["sum_b"][i] = s
                if self.with_ahash:
                    out["ahash"][i] = media.ahash64(img)
                errs.append("")
            except Exception as e:  # poison-row quarantine
                ok[i] = False
                errs.append(f"{type(e).__name__}: {e}")
        return pa.table({"image_id": batch[self.id_col], **out,
                         "ok": ok, "err": pa.array(errs, type=pa.string())})


def image_features(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                   fmt_col: str = "fmt", with_ahash: bool = True,
                   concurrency: int | None = None, batch_size: int = 256):
    return ds.map_batches(
        ImageFeaturizer,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col, "with_ahash": with_ahash},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def _area_resize(img: np.ndarray, ow: int, oh: int) -> np.ndarray:
    """Exact integer area-average resize via 2-D prefix sums: output pixel =
    rounded mean of its source box (the same integer prefix-sum machinery as
    ``media.ahash64``) — deterministic across platforms."""
    h, w, _ = img.shape
    rb = (np.arange(oh + 1, dtype=np.int64) * h) // oh
    cb = (np.arange(ow + 1, dtype=np.int64) * w) // ow
    out = np.empty((oh, ow, 3), dtype=np.uint8)
    for c in range(3):
        ps = np.zeros((h + 1, w + 1), dtype=np.int64)
        np.cumsum(np.cumsum(img[:, :, c].astype(np.int64), axis=0), axis=1,
                  out=ps[1:, 1:])
        cell = (ps[rb[1:], :][:, cb[1:]] - ps[rb[:-1], :][:, cb[1:]]
                - ps[rb[1:], :][:, cb[:-1]] + ps[rb[:-1], :][:, cb[:-1]])
        npix = (rb[1:] - rb[:-1])[:, None] * (cb[1:] - cb[:-1])[None, :]
        out[:, :, c] = ((cell + npix // 2) // npix).astype(np.uint8)
    return out


def resize_images_shards(files: list[str], out_w: int, out_h: int,
                         out_dir: str, fmt: str = "png"):
    """Bytes-in/bytes-out image resize over (file, row_group) shards — the
    image sibling of ``resample_audio_shards``; payloads never transit the
    object store."""
    import os

    import pyarrow.parquet as _pq
    import ray

    from ..functions import codecs

    units = []
    for f in sorted(files):
        n_rg = _pq.ParquetFile(f).metadata.num_row_groups
        units.extend({"path": f, "rg": g} for g in range(n_rg))
    os.makedirs(out_dir, exist_ok=True)

    def _resize_shard(batch: pa.Table) -> pa.Table:
        outs = []
        for path, rg in zip(batch["path"].to_pylist(), batch["rg"].to_pylist()):
            tab = _pq.ParquetFile(path).read_row_group(rg)
            blobs, fmts = tab["bytes"].to_pylist(), tab["fmt"].to_pylist()
            new_bytes = []
            for buf, f in zip(blobs, fmts):
                img = codecs.decode(buf, f)
                new_bytes.append(codecs.encode(_area_resize(img, out_w, out_h), fmt))
            cols = {name: tab[name] for name in tab.column_names
                    if name not in ("bytes", "fmt", "w", "h")}
            cols["bytes"] = pa.array(new_bytes, type=pa.binary())
            cols["fmt"] = pa.array([fmt] * tab.num_rows, type=pa.string())
            cols["w"] = np.full(tab.num_rows, out_w, dtype=np.int32)
            cols["h"] = np.full(tab.num_rows, out_h, dtype=np.int32)
            stem = os.path.splitext(os.path.basename(path))[0]
            out_path = f"{out_dir}/{stem}-rg{rg}.parquet"
            _pq.write_table(pa.table(cols), out_path)
            outs.append((out_path, tab.num_rows))
        return pa.table({"path": [o[0] for o in outs],
                         "rows": np.array([o[1] for o in outs], dtype=np.int64)})

    return ray.data.from_items(units).map_batches(
        _resize_shard, batch_format="pyarrow", batch_size=1)


class ImageEdgeEnergy:
    """Actor-pool batch fn: decode each image and emit exact integer EDGE
    ENERGY — the sum of absolute neighbor differences, horizontally and
    vertically, per channel (the L1 gradient magnitude every
    blur/sharpness quality filter reduces to). All int64; the decode
    handle is held per actor like :class:`ImageFeaturizer`."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        out = {k: np.zeros(n, dtype=np.int64)
               for k in ("eh_r", "ev_g", "edge_total")}
        for i in range(n):
            img = self.decode(blobs[i], fmts[i]).astype(np.int64)
            dh = np.abs(np.diff(img, axis=1)).sum(axis=(0, 1))  # per channel
            dv = np.abs(np.diff(img, axis=0)).sum(axis=(0, 1))
            out["eh_r"][i] = dh[0]
            out["ev_g"][i] = dv[1]
            out["edge_total"][i] = int(dh.sum() + dv.sum())
        return pa.table({"image_id": batch[self.id_col], **out})


def image_edge_energy(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                      fmt_col: str = "fmt", concurrency: int | None = None,
                      batch_size: int = 256):
    return ds.map_batches(
        ImageEdgeEnergy,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


class ImageBlockStats:
    """Actor-pool batch fn: decode each image and emit PER-BLOCK integer
    mean colors over a fixed ``bw x bh`` tiling — the exact-arithmetic area
    downsample (thumbnail / patch-embedding input) primitive, emitted as
    ROWS so downstream stages can join / aggregate per patch rather than
    per image. Block mean = floor(block channel sum / (bw*bh)); images are
    expected to be exact multiples of the block dims (the resize shards in
    :func:`resize_images_shards` normalize arbitrary sizes first — this
    stage is the post-normalization patch featurizer). All int64; decode
    handle held per actor like :class:`ImageFeaturizer`."""

    def __init__(self, bw: int = 4, bh: int = 6, bytes_col: str = "bytes",
                 id_col: str = "image_id", fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bw, self.bh = bw, bh
        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        bw, bh = self.bw, self.bh
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        o_id, o_bx, o_by = [], [], []
        o_m = {c: [] for c in ("mean_r", "mean_g", "mean_b")}
        for i in range(len(ids)):
            img = self.decode(blobs[i], fmts[i]).astype(np.int64)
            h, w, _ = img.shape
            nbx, nby = w // bw, h // bh
            # exact block sums via one reshape — no prefix sums needed when
            # the tiling divides the image
            bs = img[: nby * bh, : nbx * bw].reshape(
                nby, bh, nbx, bw, 3).sum(axis=(1, 3))  # (nby, nbx, 3)
            means = bs // (bw * bh)
            byy, bxx = np.mgrid[0:nby, 0:nbx]
            o_id.append(np.full(nby * nbx, ids[i], dtype=np.int64))
            o_bx.append(bxx.ravel().astype(np.int64))
            o_by.append(byy.ravel().astype(np.int64))
            for c, name in enumerate(("mean_r", "mean_g", "mean_b")):
                o_m[name].append(means[:, :, c].ravel())
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.array([], dtype=np.int64))
        return pa.table({"image_id": cat(o_id), "bx": cat(o_bx),
                         "by": cat(o_by),
                         **{k: cat(v) for k, v in o_m.items()}})


def image_block_stats(ds, bw: int = 4, bh: int = 6, bytes_col: str = "bytes",
                      id_col: str = "image_id", fmt_col: str = "fmt",
                      concurrency: int | None = None, batch_size: int = 256):
    return ds.map_batches(
        ImageBlockStats,
        fn_constructor_kwargs={"bw": bw, "bh": bh, "bytes_col": bytes_col,
                               "id_col": id_col, "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


class ImageHistogram:
    """Actor-pool batch fn: per-channel 8-bin intensity histograms
    (bin = v >> 5) through the genuine decode path, emitted as
    (image_id, channel, bin, n) ROWS with zero-count bins omitted — the
    exposure/contrast quality-filter primitive of an image training-data
    pipeline. Decode handle per actor as in :class:`ImageFeaturizer`."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        o_id, o_ch, o_bin, o_n = [], [], [], []
        for i in range(len(ids)):
            img = self.decode(blobs[i], fmts[i])
            for c in range(3):
                cnt = np.bincount(img[:, :, c].ravel() >> 5, minlength=8)
                nz = np.flatnonzero(cnt)
                o_id.append(np.full(len(nz), ids[i], dtype=np.int64))
                o_ch.append(np.full(len(nz), c, dtype=np.int64))
                o_bin.append(nz.astype(np.int64))
                o_n.append(cnt[nz].astype(np.int64))
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.array([], dtype=np.int64))
        return pa.table({"image_id": cat(o_id), "channel": cat(o_ch),
                         "bin": cat(o_bin), "n": cat(o_n)})


def image_histogram(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                    fmt_col: str = "fmt", concurrency: int | None = None,
                    batch_size: int = 256):
    return ds.map_batches(
        ImageHistogram,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


class AudioVAD:
    """Actor-pool batch fn: decode each clip and emit energy-gated ACTIVITY
    SEGMENTS — the voice-activity-detection primitive that trims silence
    before an audio corpus is transcribed or embedded. Frames of ``frame``
    samples (tail partial frame dropped); frame energy = exact int64 L1 sum
    of |sample|; a frame is active iff energy > ``thr``; maximal runs of
    consecutive active frames are merged and emitted as
    (audio_id, start_frame, end_frame, n_frames, max_energy) rows."""

    def __init__(self, frame: int = 80, thr: int = 120000,
                 bytes_col: str = "bytes", id_col: str = "audio_id",
                 fmt_col: str = "fmt"):
        self.frame, self.thr = frame, thr
        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        o_id, o_s, o_e, o_n, o_m = [], [], [], [], []
        for i in range(len(ids)):
            s, _sr = media.decode_audio(blobs[i], fmts[i])
            nf = len(s) // self.frame
            if nf == 0:
                continue
            e = np.abs(s[: nf * self.frame].astype(np.int64)).reshape(
                nf, self.frame).sum(axis=1)
            act = np.flatnonzero(e > self.thr)
            if len(act) == 0:
                continue
            new = np.ones(len(act), dtype=bool)
            new[1:] = act[1:] != act[:-1] + 1
            isl = np.cumsum(new) - 1
            n_isl = isl[-1] + 1
            starts = act[new]
            ends = np.zeros(n_isl, dtype=np.int64)
            np.maximum.at(ends, isl, act)
            mx = np.zeros(n_isl, dtype=np.int64)
            np.maximum.at(mx, isl, e[act])
            o_id.append(np.full(n_isl, ids[i], dtype=np.int64))
            o_s.append(starts.astype(np.int64))
            o_e.append(ends)
            o_n.append((ends - starts + 1).astype(np.int64))
            o_m.append(mx)
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.array([], dtype=np.int64))
        return pa.table({"audio_id": cat(o_id), "start_frame": cat(o_s),
                         "end_frame": cat(o_e), "n_frames": cat(o_n),
                         "max_energy": cat(o_m)})


def audio_vad_segments(ds, frame: int = 80, thr: int = 120000,
                       bytes_col: str = "bytes", id_col: str = "audio_id",
                       fmt_col: str = "fmt", concurrency: int | None = None,
                       batch_size: int = 256):
    return ds.map_batches(
        AudioVAD,
        fn_constructor_kwargs={"frame": frame, "thr": thr,
                               "bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def shot_segments(frames, thr_px: int, key_col: str = "video_id",
                  idx_col: str = "frame_idx", est_rows: int | None = None):
    """SHOT-BOUNDARY segmentation over a per-frame channel-sum table (the
    output of :func:`sample_frames` with ``every_n=1``): a boundary falls
    before frame f iff the L1 difference of its channel sums vs frame f-1
    exceeds ``thr_px`` per pixel (the w*h columns carried by the sampler
    normalize the threshold — larger frames need proportionally larger
    absolute change). Shots = runs between boundaries, emitted as
    (video_id, shot_id, start_frame, end_frame, n_frames).

    Scale shape: the heavy decode already happened in the sampler's actor
    pool; this stage shuffles only 7-int rows, one video-bucketed exchange,
    then an O(n) vectorized diff scan per bucket."""
    from .relational import bucketed_groups

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, idx_col], kind="mergesort")
        key = df[key_col].to_numpy()
        idx = df[idx_col].to_numpy().astype(np.int64)
        sums = df[["sum_r", "sum_g", "sum_b"]].to_numpy().astype(np.int64)
        px = (df["w"].to_numpy().astype(np.int64)
              * df["h"].to_numpy().astype(np.int64))
        n = len(df)
        nb = np.zeros(n, dtype=np.int64)
        if n > 1:
            same = key[1:] == key[:-1]
            d = np.abs(np.diff(sums, axis=0)).sum(axis=1)
            nb[1:][same & (d > thr_px * px[1:])] = 1
        cum = np.cumsum(nb)
        first = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        base = np.repeat(cum[first] - nb[first], np.diff(np.r_[first, n]))
        shot = cum - base
        out = pd.DataFrame({key_col: key, "shot_id": shot, "f": idx})
        agg = out.groupby([key_col, "shot_id"], sort=True)["f"].agg(
            start_frame="min", end_frame="max", n_frames="size")
        return agg.astype(np.int64).reset_index()

    return bucketed_groups(frames, [key_col], _scan, est_rows=est_rows)


class ImageRoundtripChecker:
    """Per-row INVARIANT check of the engine's image contract (BASELINE.json:
    "decoded-pixel allclose, PSNR>=40dB for lossy formats, caption equality"):
    each row carries the stored payload (``bytes``/``fmt``) plus a LOSSLESS
    reference encoding of the original pixels (``ref_bytes``, PNG); the
    checker decodes BOTH, measures the exact integer pixel error (SSE, max
    abs diff), and evaluates the 40 dB bar as a pure-integer predicate:

        PSNR >= 40  <=>  sse * 10_000 <= 255^2 * n_subpixels

    (PSNR = 10*log10(255^2 / (sse/n)); no floats anywhere, so engine and
    oracle agree bit-exactly). Caption equality rides along: ``cap_ok``
    re-derives the expected caption from the id and compares — proving the
    string column survived the binary-heavy stage unmutated.

    Scale shape: an actor-pool decode stage like :class:`ImageFeaturizer`;
    bytes enter once per row and leave as 5 small ints, so nothing binary
    transits the downstream exchange. Poison rows quarantine (ok=false)
    instead of aborting the job."""

    def __init__(self, bytes_col: str = "bytes", ref_col: str = "ref_bytes",
                 id_col: str = "image_id", fmt_col: str = "fmt",
                 cap_col: str | None = None, cap_prefix: str = "cap-"):
        from ..functions import codecs

        self.bytes_col, self.ref_col = bytes_col, ref_col
        self.id_col, self.fmt_col = id_col, fmt_col
        self.cap_col, self.cap_prefix = cap_col, cap_prefix
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        refs = batch[self.ref_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        caps = batch[self.cap_col].to_pylist() if self.cap_col else None
        sse = np.zeros(n, dtype=np.int64)
        max_err = np.zeros(n, dtype=np.int64)
        nsub = np.zeros(n, dtype=np.int64)
        ok = np.ones(n, dtype=bool)
        cap_ok = np.ones(n, dtype=bool)
        for i in range(n):
            try:
                got = self.decode(blobs[i], fmts[i]).astype(np.int64)
                want = self.decode(refs[i], "png").astype(np.int64)
                if got.shape != want.shape:
                    raise ValueError(f"dims {got.shape} != {want.shape}")
                d = got - want
                sse[i] = int((d * d).sum())
                max_err[i] = int(np.abs(d).max()) if d.size else 0
                nsub[i] = d.size
            except Exception:
                ok[i] = False
            if caps is not None:
                cap_ok[i] = caps[i] == f"{self.cap_prefix}{ids[i]}"
        ok &= sse * 10_000 <= 65_025 * nsub
        cols = {
            self.id_col: ids,
            "sse": sse,
            "max_err": max_err,
            "ok_40db": ok,
        }
        if caps is not None:
            cols["cap_ok"] = cap_ok
        return pa.table(cols)


def image_roundtrip_check(ds, bytes_col: str = "bytes",
                          ref_col: str = "ref_bytes",
                          id_col: str = "image_id", fmt_col: str = "fmt",
                          cap_col: str | None = None,
                          concurrency: int | None = None,
                          batch_size: int = 256):
    return ds.map_batches(
        ImageRoundtripChecker,
        fn_constructor_kwargs={"bytes_col": bytes_col, "ref_col": ref_col,
                               "id_col": id_col, "fmt_col": fmt_col,
                               "cap_col": cap_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


class ImageFilterFlags:
    """LAION-style multimodal QUALITY FILTER: decode each payload and emit
    the standard pre-training keep/drop flags — minimum pixel area, aspect
    ratio bound (max side <= ``aspect_num/aspect_den`` x min side), and a
    caption-length floor — plus the conjunction ``keep``. Dims come from the
    DECODED pixels (a corrupt payload fails every flag), not trusted
    metadata. Actor-pool decode like :class:`ImageFeaturizer`; output is a
    flags row per image, so bytes never leave the stage."""

    def __init__(self, min_area: int = 300, aspect_num: int = 2,
                 aspect_den: int = 1, min_cap_len: int = 8,
                 bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt", cap_col: str = "caption"):
        from ..functions import codecs

        self.min_area, self.min_cap_len = min_area, min_cap_len
        self.aspect_num, self.aspect_den = aspect_num, aspect_den
        self.bytes_col, self.id_col = bytes_col, id_col
        self.fmt_col, self.cap_col = fmt_col, cap_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        caps = batch[self.cap_col].to_pylist()
        w = np.zeros(n, dtype=np.int64)
        h = np.zeros(n, dtype=np.int64)
        ok = np.ones(n, dtype=bool)
        for i in range(n):
            try:
                img = self.decode(blobs[i], fmts[i])
                h[i], w[i] = img.shape[0], img.shape[1]
            except Exception:
                ok[i] = False
        area_ok = ok & (w * h >= self.min_area)
        mx, mn = np.maximum(w, h), np.minimum(w, h)
        aspect_ok = ok & (mx * self.aspect_den <= mn * self.aspect_num)
        cap_len = np.fromiter((len(c or "") for c in caps), dtype=np.int64,
                              count=n)
        cap_ok = cap_len >= self.min_cap_len
        return pa.table({
            self.id_col: batch[self.id_col],
            "fmt": batch[self.fmt_col],
            "area_ok": area_ok,
            "aspect_ok": aspect_ok,
            "cap_ok": cap_ok,
            "keep": area_ok & aspect_ok & cap_ok,
        })


def image_filter_flags(ds, concurrency: int | None = None,
                       batch_size: int = 256, **kwargs):
    return ds.map_batches(
        ImageFilterFlags,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def label_components(mask: np.ndarray) -> tuple[int, int]:
    """4-connected component labeling of a boolean mask — run-based
    two-pass with union-find (the classic blob-labeling algorithm, cost
    O(runs α) not O(pixels²)): each row decomposes into maximal True
    runs, runs in adjacent rows union when their column intervals share
    a column. Returns (n_components, largest_component_area)."""
    h, w = mask.shape
    parent: list[int] = []
    size: list[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if size[ra] < size[rb]:
                ra, rb = rb, ra
            parent[rb] = ra
            size[ra] += size[rb]

    prev_runs: list[tuple[int, int, int]] = []  # (c0, c1, run_id), half-open
    for r in range(h):
        row = mask[r]
        d = np.diff(np.r_[0, row.view(np.int8), 0])
        starts = np.flatnonzero(d == 1)
        stops = np.flatnonzero(d == -1)
        cur_runs: list[tuple[int, int, int]] = []
        for c0, c1 in zip(starts, stops):
            rid = len(parent)
            parent.append(rid)
            size.append(int(c1 - c0))
            cur_runs.append((int(c0), int(c1), rid))
        # two-pointer merge against the previous row's runs
        j = 0
        for c0, c1, rid in cur_runs:
            while j < len(prev_runs) and prev_runs[j][1] <= c0:
                j += 1
            jj = j
            while jj < len(prev_runs) and prev_runs[jj][0] < c1:
                union(rid, prev_runs[jj][2])
                jj += 1
            if jj > j:
                jj -= 1  # the last overlapping prev run may also touch the next cur run
            j = jj
        prev_runs = cur_runs
    roots = {find(i) for i in range(len(parent))}
    if not roots:
        return 0, 0
    return len(roots), max(size[r] for r in roots)


def morph_counts(mask: np.ndarray) -> tuple[int, int, int]:
    """3×3 binary EROSION and DILATION pixel counts of a boolean mask —
    the morphological open/close primitives of every mask-cleanup pass.
    Out-of-bounds neighbors are UNSET (border pixels never survive
    erosion; dilation does not wrap). General shifted-window kernel —
    no structure of the mask is assumed. Returns (n_mask, n_eroded,
    n_dilated)."""
    h, w = mask.shape
    p = np.zeros((h + 2, w + 2), dtype=bool)
    p[1:-1, 1:-1] = mask
    er = np.ones((h, w), dtype=bool)
    di = np.zeros((h, w), dtype=bool)
    for di_ in range(3):
        for dj in range(3):
            win = p[di_:di_ + h, dj:dj + w]
            er &= win
            di |= win
    return int(mask.sum()), int(er.sum()), int(di.sum())


class ImageMorphology:
    """Actor-pool batch fn: 3×3 binary erosion/dilation counts through the
    genuine decode path — the mask-hygiene pass (speckle removal / hole
    closing) of a segmentation pipeline. Threshold = R-channel parity
    (the gradient fixture yields full-height stripe masks, so the oracle
    can replay per-column; the kernel itself is the general
    :func:`morph_counts`, pytest-fuzzed on random 2D masks). Emits
    (image_id, n_mask, n_eroded, n_dilated)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        m_out = np.empty(len(ids), np.int64)
        e_out = np.empty(len(ids), np.int64)
        d_out = np.empty(len(ids), np.int64)
        for i in range(len(ids)):
            img = self.decode(blobs[i], fmts[i])
            m, e, d = morph_counts(img[:, :, 0] % 2 == 1)
            m_out[i], e_out[i], d_out[i] = m, e, d
        return pa.table({"image_id": ids, "n_mask": m_out,
                         "n_eroded": e_out, "n_dilated": d_out})


def image_morphology(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                     fmt_col: str = "fmt", concurrency: int | None = None,
                     batch_size: int = 256):
    return ds.map_batches(
        ImageMorphology,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def otsu_threshold(channel: np.ndarray) -> tuple[int, int, int]:
    """OTSU'S METHOD in exact integer arithmetic: the threshold t maximizing
    the between-class variance of the (<=t | >t) split of an 8-bit channel,
    scored as the floor-quantized fraction

        score(t) = (sumB*nF - sumF*nB)^2 // (nB * nF)

    (the cross-multiplied form of nB*nF*(muB-muF)^2 — identical argmax, no
    floats). Ties break to the SMALLEST t; images with a single gray level
    have no valid split and return (-1, 0, 0). Magnitude bound: exact in
    int64 for images up to ~2.4e8 pixels (sumB*nF < 2^63 needs
    255*n*n < 9.2e18). Returns (t, score, n_background)."""
    hist = np.bincount(channel.reshape(-1), minlength=256).astype(np.int64)
    n = int(hist.sum())
    vals = np.arange(256, dtype=np.int64)
    cn = np.cumsum(hist)          # nB for t = 0..255
    cs = np.cumsum(hist * vals)   # sumB
    nb, sb = cn[:-1], cs[:-1]     # t = 0..254 (t = 255 leaves no foreground)
    nf = n - nb
    valid = (nb > 0) & (nf > 0)
    if not valid.any():
        return -1, 0, 0
    num = sb * nf - (cs[-1] - sb) * nb
    score = np.where(valid, num * num // np.where(valid, nb * nf, 1), -1)
    t = int(np.argmax(score))     # argmax returns the FIRST max -> smallest t
    return t, int(score[t]), int(nb[t])


class ImageOtsu:
    """Actor-pool batch fn: per-image OTSU THRESHOLD of the decoded R channel
    — the automatic binarization step ahead of every mask pipeline
    (components / morphology / contours). Goes through the genuine decode
    path (jpeg dequantization included); the kernel is the general
    histogram form (:func:`otsu_threshold`, pytest vs brute-force fraction
    comparison) — the oracle exploits only the fixture's column-constant R
    structure to replay the histogram. Emits (image_id, otsu_t, score_q,
    n_bg)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        t_out = np.empty(len(ids), np.int64)
        s_out = np.empty(len(ids), np.int64)
        b_out = np.empty(len(ids), np.int64)
        for i in range(len(ids)):
            img = self.decode(blobs[i], fmts[i])
            t_out[i], s_out[i], b_out[i] = otsu_threshold(img[:, :, 0])
        return pa.table({"image_id": ids, "otsu_t": t_out,
                         "score_q": s_out, "n_bg": b_out})


def image_otsu(ds, bytes_col: str = "bytes", id_col: str = "image_id",
               fmt_col: str = "fmt", concurrency: int | None = None,
               batch_size: int = 256):
    return ds.map_batches(
        ImageOtsu,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def integral_rect_sums(channel: np.ndarray,
                       rects: list[tuple[int, int, int, int]]) -> list[int]:
    """SUMMED-AREA TABLE (integral image) rect-sum queries — the O(1)-per-
    query primitive behind Haar features, box filters and tile statistics.
    Builds the (h+1, w+1) int64 SAT once, answers each half-open rect
    (r0, r1, c0, c1) as ``S[r1,c1] - S[r0,c1] - S[r1,c0] + S[r0,c0]``."""
    sat = np.zeros((channel.shape[0] + 1, channel.shape[1] + 1), np.int64)
    np.cumsum(np.cumsum(channel.astype(np.int64), axis=0), axis=1,
              out=sat[1:, 1:])
    return [int(sat[r1, c1] - sat[r0, c1] - sat[r1, c0] + sat[r0, c0])
            for r0, r1, c0, c1 in rects]


class ImageIntegralRects:
    """Actor-pool batch fn: fixed-rect channel sums via a SUMMED-AREA TABLE
    through the genuine decode path — the Haar-feature / box-statistic
    primitive. Two probes per image: R over the top-left quadrant
    [0,h/2)×[0,w/2) and G over the centered half-size rect
    [h/4,h/4+h/2)×[w/4,w/4+w/2) — one row-constant and one column-constant
    channel of the gradient fixture, so the oracle replays each axis
    separately while the kernel (:func:`integral_rect_sums`) stays the
    general SAT. Emits (image_id, r_quad_sum, g_center_sum)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        rq = np.empty(len(ids), np.int64)
        gc = np.empty(len(ids), np.int64)
        for i in range(len(ids)):
            img = self.decode(blobs[i], fmts[i])
            h, w = img.shape[:2]
            rq[i] = integral_rect_sums(img[:, :, 0],
                                       [(0, h // 2, 0, w // 2)])[0]
            gc[i] = integral_rect_sums(
                img[:, :, 1],
                [(h // 4, h // 4 + h // 2, w // 4, w // 4 + w // 2)])[0]
        return pa.table({"image_id": ids, "r_quad_sum": rq,
                         "g_center_sum": gc})


def image_integral_rects(ds, bytes_col: str = "bytes",
                         id_col: str = "image_id", fmt_col: str = "fmt",
                         concurrency: int | None = None,
                         batch_size: int = 256):
    return ds.map_batches(
        ImageIntegralRects,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def autocorr_pitch(s: np.ndarray, lo: int, hi: int) -> tuple[int, int]:
    """PITCH-PERIOD detection by exact integer autocorrelation: the lag
    L in [lo, hi] maximizing ``sum(s[t]*s[t+L])`` (ties to the SMALLEST
    lag — the fundamental, not a harmonic multiple). Returns
    (best_lag, corr_at_best); (-1, 0) when the clip is shorter than lo+1
    samples. int64-exact for PCM16 up to ~2^31 samples."""
    n = len(s)
    s64 = s.astype(np.int64)
    best_lag, best = -1, None
    for lag in range(lo, min(hi, n - 1) + 1):
        c = int(np.dot(s64[: n - lag], s64[lag:]))
        if best is None or c > best:
            best_lag, best = lag, c
    return (best_lag, best) if best is not None else (-1, 0)


class AudioPitch:
    """Actor-pool batch fn: per-clip integer autocorrelation pitch period
    through the genuine WAV decode path — the fundamental-frequency pass of
    an audio-curation pipeline. The kernel (:func:`autocorr_pitch`) is the
    general argmax; the square-wave fixture makes the oracle closed-form
    (a period-P square wave autocorrelates perfectly at lag P with value
    (n-P)·amp², and strictly worse everywhere else in range, so the argmax
    is exactly the synthesis period). Emits (audio_id, pitch_lag,
    corr_peak)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "audio_id",
                 fmt_col: str = "fmt", lo: int = 2, hi: int = 64):
        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.lo, self.hi = lo, hi
        self.decode = media.decode_audio

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        lag_out = np.empty(batch.num_rows, np.int64)
        c_out = np.empty(batch.num_rows, np.int64)
        for i in range(batch.num_rows):
            s, _sr = self.decode(blobs[i], fmts[i])
            lag_out[i], c_out[i] = autocorr_pitch(s, self.lo, self.hi)
        return pa.table({"audio_id": ids, "pitch_lag": lag_out,
                         "corr_peak": c_out})


def audio_pitch(ds, bytes_col: str = "bytes", id_col: str = "audio_id",
                fmt_col: str = "fmt", lo: int = 2, hi: int = 64,
                concurrency: int | None = None, batch_size: int = 256):
    return ds.map_batches(
        AudioPitch,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col, "lo": lo, "hi": hi},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def equalize_checksum(channel: np.ndarray) -> tuple[int, int]:
    """HISTOGRAM EQUALIZATION of an 8-bit channel in exact integer
    arithmetic — the contrast-normalization pass of image preprocessing:

        new(v) = (cdf(v) - cdf_min) * 255 // (n - cdf_min)

    with cdf_min = count of the minimum present value (the standard
    discrete form, floor-quantized identically on both sides). Returns
    (eq_sum, eq_distinct): the checksum sum of all equalized pixels and
    the number of distinct equalized levels (monotone remaps can merge
    levels). A constant image has no spread and returns (0, 1)."""
    hist = np.bincount(channel.reshape(-1), minlength=256).astype(np.int64)
    n = int(hist.sum())
    cdf = np.cumsum(hist)
    present = hist > 0
    cmin = int(cdf[np.argmax(present)])  # count of the min present value
    if n == cmin:
        return 0, 1
    lut = (cdf - cmin) * 255 // (n - cmin)
    eq_sum = int((lut * hist).sum())
    eq_distinct = int(len(np.unique(lut[present])))
    return eq_sum, eq_distinct


class ImageEqualize:
    """Actor-pool batch fn: per-image HISTOGRAM-EQUALIZATION checksum of the
    decoded R channel through the genuine decode path. The kernel
    (:func:`equalize_checksum`) is the general 256-bin discrete form
    (pytest vs a per-pixel brute force); the oracle replays the
    column-constant R values — the shared factor h cancels exactly inside
    the floor division, so the per-column replay is bit-exact. Emits
    (image_id, eq_sum, eq_distinct)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        s_out = np.empty(len(ids), np.int64)
        d_out = np.empty(len(ids), np.int64)
        for i in range(len(ids)):
            img = self.decode(blobs[i], fmts[i])
            s_out[i], d_out[i] = equalize_checksum(img[:, :, 0])
        return pa.table({"image_id": ids, "eq_sum": s_out,
                         "eq_distinct": d_out})


def image_equalize(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                   fmt_col: str = "fmt", concurrency: int | None = None,
                   batch_size: int = 256):
    return ds.map_batches(
        ImageEqualize,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


class ImageCaptionCheck:
    """Actor-pool batch fn: CROSS-MODAL pair validation over the engine's
    native (image, caption) input shape — decode the image payload for its
    TRUE dimensions, parse the caption's claimed ``WxH`` with a regex
    compiled once per actor, and flag mismatched pairs (the data-quality
    gate a web-scraped image+caption corpus runs before training; ≙ the
    caption-equality half of BASELINE.json's per-row invariant, made an
    operator). Emits (image_id, w_true, h_true, w_caption, h_caption,
    consistent); pairs whose caption carries no parsable claim get
    (-1, -1, 0)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt", caption_col: str = "caption"):
        import re

        from ..functions import codecs

        self.bytes_col, self.id_col = bytes_col, id_col
        self.fmt_col, self.caption_col = fmt_col, caption_col
        self.pat = re.compile(r"(\d+)x(\d+)")  # compiled once per actor
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch[self.id_col]
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        caps = batch[self.caption_col].to_pylist()
        wt = np.empty(n, np.int64)
        ht = np.empty(n, np.int64)
        wc = np.full(n, -1, np.int64)
        hc = np.full(n, -1, np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            ht[i], wt[i] = img.shape[:2]
            m = self.pat.search(caps[i] or "")
            if m:
                wc[i], hc[i] = int(m.group(1)), int(m.group(2))
        cons = ((wt == wc) & (ht == hc)).astype(np.int64)
        return pa.table({"image_id": ids, "w_true": wt, "h_true": ht,
                         "w_caption": wc, "h_caption": hc,
                         "consistent": cons})


def image_caption_check(ds, bytes_col: str = "bytes",
                        id_col: str = "image_id", fmt_col: str = "fmt",
                        caption_col: str = "caption",
                        concurrency: int | None = None,
                        batch_size: int = 256):
    return ds.map_batches(
        ImageCaptionCheck,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col, "caption_col": caption_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def block_motion(prev: np.ndarray, cur: np.ndarray,
                 radius: int = 4) -> tuple[int, int, int, int]:
    """BLOCK-MATCHING MOTION ESTIMATION between two frames of one channel:
    the (dy, dx) in [-radius, radius]² minimizing the sum of absolute
    differences over the cropped overlap ``|cur[r, j] - prev[r-dy, j-dx]|``
    — the motion-vector primitive of every video codec / stabilization /
    optical-flow-lite pass. Scan order (dy, dx) ascending with strict-<
    improvement, so ties resolve to the lexicographically smallest shift.
    Returns (dy_best, dx_best, sad_best, sad00) with sad00 the no-motion
    cost. Frames must overhang the radius (h, w > 2·radius)."""
    h, w = prev.shape
    p = prev.astype(np.int64)
    c = cur.astype(np.int64)
    best = (0, 0, None)
    sad00 = int(np.abs(c - p).sum())
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            cr = c[max(dy, 0):h + min(dy, 0), max(dx, 0):w + min(dx, 0)]
            pr = p[max(-dy, 0):h + min(-dy, 0), max(-dx, 0):w + min(-dx, 0)]
            sad = int(np.abs(cr - pr).sum())
            if best[2] is None or sad < best[2]:
                best = (dy, dx, sad)
    return best[0], best[1], best[2], sad00


class VideoMotion:
    """Actor-pool batch fn: motion vector between the first two frames of
    each clip through the genuine QVID seek-decode path (header + exactly
    two frame decodes per clip — never the whole container). The fixture
    translates a monotone horizontal ramp by +2 px/frame over a strictly
    increasing vertical ramp, so (0, +2) is the UNIQUE zero-SAD shift in
    range (any dy≠0 offsets every row by a nonzero constant; any dx≠2
    leaves a non-constant column difference) — the oracle is that closed
    form plus the exactly replayed no-motion cost. The kernel
    (:func:`block_motion`) is the general SAD scan, pytest vs brute force.
    Emits (video_id, dy_best, dx_best, sad_best, sad00)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "video_id",
                 radius: int = 4):
        self.bytes_col, self.id_col, self.radius = bytes_col, id_col, radius
        self.decode_frame = media.decode_frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        blobs = batch[self.bytes_col].to_pylist()
        n = batch.num_rows
        dy = np.empty(n, np.int64)
        dx = np.empty(n, np.int64)
        sb = np.empty(n, np.int64)
        s0 = np.empty(n, np.int64)
        for i in range(n):
            f0 = self.decode_frame(blobs[i], 0)
            f1 = self.decode_frame(blobs[i], 1)
            dy[i], dx[i], sb[i], s0[i] = block_motion(
                f0[:, :, 0], f1[:, :, 0], self.radius)
        return pa.table({"video_id": ids, "dy_best": dy, "dx_best": dx,
                         "sad_best": sb, "sad00": s0})


def video_motion(ds, bytes_col: str = "bytes", id_col: str = "video_id",
                 radius: int = 4, concurrency: int | None = None,
                 batch_size: int = 256):
    return ds.map_batches(
        VideoMotion,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "radius": radius},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def hadamard_matrix(n: int) -> np.ndarray:
    """Natural-order WALSH-HADAMARD matrix H[u, r] = (-1)^popcount(u & r)
    (n a power of two) — the ±1 integer orthogonal transform, so every
    coefficient is an exact int64 signed pixel sum (the float-free stand-in
    for the DCT in energy-compaction features)."""
    u = np.arange(n, dtype=np.int64)[:, None]
    r = np.arange(n, dtype=np.int64)[None, :]
    pc = np.zeros((n, n), dtype=np.int64)
    x = u & r
    while x.any():
        pc += x & 1
        x >>= 1
    return np.where(pc % 2 == 1, np.int64(-1), np.int64(1))


def wht_energy(block: np.ndarray, low_pc: int = 1) -> tuple[int, int]:
    """2D Walsh-Hadamard transform of a square power-of-two block; returns
    (low_energy, high_energy): the sum of squared coefficients whose
    sequency class popcount(u) + popcount(v) is <= ``low_pc`` vs the rest —
    the energy-compaction split every transform-domain quality / blur /
    complexity heuristic reads. Exact int64 (|coef| <= n²·255)."""
    n = block.shape[0]
    h = hadamard_matrix(n)
    coef = h @ block.astype(np.int64) @ h
    pc = np.array([bin(i).count("1") for i in range(n)], dtype=np.int64)
    cls = pc[:, None] + pc[None, :]
    e = coef * coef
    low = int(e[cls <= low_pc].sum())
    return low, int(e.sum()) - low


class ImageWhtEnergy:
    """Actor-pool batch fn: WALSH-HADAMARD energy split of the top-left 8×8
    crop through the genuine decode path — the transform-domain
    complexity/blur feature (DCT's exact integer sibling). Probes BOTH
    gradient axes of the fixture: R (column-driven) and G (row-driven), so
    the oracle collapses each to a 1D transform — only the u=0 (resp. v=0)
    line survives because Hadamard rows other than the first sum to zero —
    while the kernel (:func:`wht_energy`) stays the general 2D transform
    (pytest vs brute-force double matmul + Parseval pin). Emits
    (image_id, r_low, r_high, g_low, g_high)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        rl = np.empty(len(ids), np.int64)
        rh = np.empty(len(ids), np.int64)
        gl = np.empty(len(ids), np.int64)
        gh = np.empty(len(ids), np.int64)
        for i in range(len(ids)):
            img = self.decode(blobs[i], fmts[i])
            rl[i], rh[i] = wht_energy(img[:8, :8, 0])
            gl[i], gh[i] = wht_energy(img[:8, :8, 1])
        return pa.table({"image_id": ids, "r_low": rl, "r_high": rh,
                         "g_low": gl, "g_high": gh})


def image_wht_energy(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                     fmt_col: str = "fmt", concurrency: int | None = None,
                     batch_size: int = 256):
    return ds.map_batches(
        ImageWhtEnergy,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def laplacian_sq_sum(channel: np.ndarray) -> int:
    """Sum of squared 4-neighbor LAPLACIAN responses over interior pixels —
    the variance-of-Laplacian blur/noise metric (high = sharp/noisy, low =
    smooth/blurred) in exact int64, summed instead of divided so no float
    enters. lap(r,j) = 4·v − up − down − left − right; border excluded."""
    v = channel.astype(np.int64)
    if v.shape[0] < 3 or v.shape[1] < 3:
        return 0
    lap = (4 * v[1:-1, 1:-1] - v[:-2, 1:-1] - v[2:, 1:-1]
           - v[1:-1, :-2] - v[1:-1, 2:])
    return int((lap * lap).sum())


class ImageLaplacian:
    """Actor-pool batch fn: per-image Laplacian-energy blur/noise metric
    through the genuine decode path (``laplacian_sq_sum`` on R and G). On
    the gradient fixture the R channel is column-driven (vertical second
    difference vanishes) and G row-driven, so each oracle side collapses
    to a 1D second-difference replay scaled by the interior extent; the
    kernel is the general 2D stencil (pytest vs brute force). Emits
    (image_id, r_lap, g_lap)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        r_out = np.empty(len(ids), np.int64)
        g_out = np.empty(len(ids), np.int64)
        for i in range(len(ids)):
            img = self.decode(blobs[i], fmts[i])
            r_out[i] = laplacian_sq_sum(img[:, :, 0])
            g_out[i] = laplacian_sq_sum(img[:, :, 1])
        return pa.table({"image_id": ids, "r_lap": r_out, "g_lap": g_out})


def image_laplacian(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                    fmt_col: str = "fmt", concurrency: int | None = None,
                    batch_size: int = 256):
    return ds.map_batches(
        ImageLaplacian,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def palette_stats(img: np.ndarray) -> tuple[int, int, int]:
    """PALETTE PROFILE of a decoded RGB image: number of distinct colors,
    the modal color (packed r<<16 | g<<8 | b, ties to the smallest packed
    value) and its pixel count — the palette-complexity screen
    (screenshots/diagrams vs photographs) of image curation."""
    flat = (img[:, :, 0].astype(np.int64) << 16 \
            | img[:, :, 1].astype(np.int64) << 8 \
            | img[:, :, 2].astype(np.int64)).reshape(-1)
    vals, counts = np.unique(flat, return_counts=True)
    best = np.lexsort((vals, -counts))[0]
    return int(len(vals)), int(vals[best]), int(counts[best])


class ImagePalette:
    """Actor-pool batch fn: per-image palette profile through the genuine
    decode path (:func:`palette_stats`). On the gradient fixture R varies
    only by column and G only by row (B constant), so every (R, G) combo
    occurs and the oracle factorizes: n_colors = |distinct R|·|distinct G|
    and the modal color's count is the product of the modal column and
    row multiplicities; the kernel is the general pixel-multiset profile.
    Emits (image_id, n_colors, top_color, top_count)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        nc = np.empty(len(ids), np.int64)
        tc = np.empty(len(ids), np.int64)
        tn = np.empty(len(ids), np.int64)
        for i in range(len(ids)):
            img = self.decode(blobs[i], fmts[i])
            nc[i], tc[i], tn[i] = palette_stats(img)
        return pa.table({"image_id": ids, "n_colors": nc,
                         "top_color": tc, "top_count": tn})


def image_palette(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                  fmt_col: str = "fmt", concurrency: int | None = None,
                  batch_size: int = 256):
    return ds.map_batches(
        ImagePalette,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


class ImageComponents:
    """Actor-pool batch fn: BLOB LABELING through the genuine decode path —
    threshold the decoded R channel with the parity predicate (R odd; the
    gradient fixture then yields several full-height stripes per image,
    exercising multi-component masks) and label 4-connected components.
    Emits (image_id, n_components, largest_area). The labeling kernel
    (:func:`label_components`) is the general run-merge union-find — the
    fixture's stripe structure is NOT assumed."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n_out = np.empty(len(ids), np.int64)
        a_out = np.empty(len(ids), np.int64)
        for i in range(len(ids)):
            img = self.decode(blobs[i], fmts[i])
            n, a = label_components(img[:, :, 0] % 2 == 1)
            n_out[i], a_out[i] = n, a
        return pa.table({"image_id": ids, "n_components": n_out,
                         "largest_area": a_out})


def image_components(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                     fmt_col: str = "fmt", concurrency: int | None = None,
                     batch_size: int = 256):
    return ds.map_batches(
        ImageComponents,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def content_bbox(img: np.ndarray) -> tuple[int, int, int, int]:
    """CONTENT BOUNDING BOX of a decoded RGB image: the tightest (x0, y0,
    x1, y1) (inclusive) covering every pixel that differs from the
    background, where background = the top-left corner pixel — the autocrop
    / border-trim primitive of image curation (scanned pages, letterboxed
    frames, screenshots with window chrome). Returns (-1, -1, -1, -1) for a
    fully-background image."""
    bg = img[0, 0, :]
    mask = (img != bg[None, None, :]).any(axis=2)
    rows = mask.any(axis=1)
    cols = mask.any(axis=0)
    if not rows.any():
        return -1, -1, -1, -1
    ys = np.flatnonzero(rows)
    xs = np.flatnonzero(cols)
    return int(xs[0]), int(ys[0]), int(xs[-1]), int(ys[-1])


class ImageAutocrop:
    """Actor-pool batch fn: per-image content bbox through the genuine
    decode path (:func:`content_bbox`). Emits (image_id, x0, y0, x1, y1,
    content_area). The kernel is the general any-channel-differs scan —
    fixtures that plant a constant border make the oracle the synthesis
    closed form, but nothing about the border is assumed here."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        x0 = np.empty(n, np.int64)
        y0 = np.empty(n, np.int64)
        x1 = np.empty(n, np.int64)
        y1 = np.empty(n, np.int64)
        area = np.empty(n, np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            a, b, c, d = content_bbox(img)
            x0[i], y0[i], x1[i], y1[i] = a, b, c, d
            area[i] = (c - a + 1) * (d - b + 1) if a >= 0 else 0
        return pa.table({"image_id": ids, "x0": x0, "y0": y0,
                         "x1": x1, "y1": y1, "content_area": area})


def image_autocrop(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                   fmt_col: str = "fmt", concurrency: int | None = None,
                   batch_size: int = 256):
    return ds.map_batches(
        ImageAutocrop,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def box_downscale2(img: np.ndarray) -> np.ndarray:
    """Exact 2× BOX DOWNSAMPLE: each output pixel is the floor-mean of its
    2×2 source block per channel (odd trailing row/column dropped) — the
    thumbnail / pyramid-level constructor in pure int arithmetic, so the
    result is bit-identical across hosts (no float resampler variance)."""
    h, w, c = img.shape
    v = img[: h - h % 2, : w - w % 2, :].astype(np.int64)
    return (v.reshape(h // 2, 2, w // 2, 2, c).sum(axis=(1, 3)) // 4)


class ImageDownscaleStats:
    """Actor-pool batch fn: exact 2× box downsample through the genuine
    decode path (:func:`box_downscale2`), reduced to integer checkpoints —
    the ORACLE-BACKED upgrade of the resize op (``image_resize`` is
    pytest-only because re-encoded bytes aren't SQL-mirrorable; the
    downsampled PIXELS are). Emits (image_id, dw, dh, r_sum, r_wsum,
    g_sum, g_wsum) where *_wsum weights pixel (r', j') by
    (j'+1)·(r'+1) — separable, so a column×row factorized fixture keeps
    the DuckDB mirror 1-D while the kernel stays the general 2-D block
    mean."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        out = {k: np.empty(n, np.int64)
               for k in ("dw", "dh", "r_sum", "r_wsum", "g_sum", "g_wsum")}
        for i in range(n):
            d = box_downscale2(self.decode(blobs[i], fmts[i]))
            dh, dw = d.shape[0], d.shape[1]
            wj = np.arange(1, dw + 1, dtype=np.int64)
            wr = np.arange(1, dh + 1, dtype=np.int64)
            out["dw"][i], out["dh"][i] = dw, dh
            out["r_sum"][i] = int(d[:, :, 0].sum())
            out["r_wsum"][i] = int((d[:, :, 0] * wj[None, :] * wr[:, None]).sum())
            out["g_sum"][i] = int(d[:, :, 1].sum())
            out["g_wsum"][i] = int((d[:, :, 1] * wj[None, :] * wr[:, None]).sum())
        return pa.table({"image_id": ids, **{k: out[k] for k in
                         ("dw", "dh", "r_sum", "r_wsum", "g_sum", "g_wsum")}})


def image_downscale_stats(ds, bytes_col: str = "bytes",
                          id_col: str = "image_id", fmt_col: str = "fmt",
                          concurrency: int | None = None,
                          batch_size: int = 256):
    return ds.map_batches(
        ImageDownscaleStats,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def rle_runs(channel: np.ndarray, axis: int) -> int:
    """Total RUN-LENGTH-ENCODING token count of a channel along ``axis``
    (0 = down each column, 1 = along each row): one token per maximal
    constant run per scanline — the compressibility / synthetic-vs-photo
    screen (diagrams RLE tiny, photographs don't)."""
    v = channel.astype(np.int64)
    if axis == 1:
        changes = int((v[:, 1:] != v[:, :-1]).sum())
        return changes + v.shape[0]
    changes = int((v[1:, :] != v[:-1, :]).sum())
    return changes + v.shape[1]


class ImageRleProfile:
    """Actor-pool batch fn: per-image RLE compressibility profile through
    the genuine decode path (:func:`rle_runs`): horizontal token count of
    R, vertical token count of G, horizontal token count of B. On the
    gradient fixture R varies only by column (every row identical → the
    oracle is h × a 1-D LAG replay) and G only by row; the kernel is the
    general 2-D change count. Emits (image_id, r_runs_h, g_runs_v,
    b_runs_h)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        r_out = np.empty(n, np.int64)
        g_out = np.empty(n, np.int64)
        b_out = np.empty(n, np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            r_out[i] = rle_runs(img[:, :, 0], axis=1)
            g_out[i] = rle_runs(img[:, :, 1], axis=0)
            b_out[i] = rle_runs(img[:, :, 2], axis=1)
        return pa.table({"image_id": ids, "r_runs_h": r_out,
                         "g_runs_v": g_out, "b_runs_h": b_out})


def image_rle_profile(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                      fmt_col: str = "fmt", concurrency: int | None = None,
                      batch_size: int = 256):
    return ds.map_batches(
        ImageRleProfile,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def grad_octant_hist(luma: np.ndarray) -> tuple[np.ndarray, int]:
    """8-bin GRADIENT-ORIENTATION histogram of a 2-D luma plane (HOG-lite,
    integer-exact): central-difference dx/dy on interior pixels, octant by
    the classic sign/|dx|-vs-|dy| comparison tree (no atan2, no floats) —
    the texture/edge-direction signature used to screen synthetic vs
    photographic content and as the block descriptor of pedestrian-era
    HOG. Returns (counts[8], flat_count); flat = dx == dy == 0.

    Octants (0 = east, counter-clockwise): ties go to the LOWER octant
    (|dy| <= |dx| stays in the axis-hugging bin)."""
    v = luma.astype(np.int64)
    dx = v[1:-1, 2:] - v[1:-1, :-2]
    dy = v[2:, 1:-1] - v[:-2, 1:-1]
    dx, dy = dx.ravel(), dy.ravel()
    flat = (dx == 0) & (dy == 0)
    ax, ay = np.abs(dx), np.abs(dy)
    # comparison tree: quadrant from signs, halve by |dy| <= |dx|
    oct_ = np.where(
        dy >= 0,
        np.where(dx >= 0, np.where(ay <= ax, 0, 1),
                 np.where(ay > ax, 2, 3)),
        np.where(dx < 0, np.where(ay <= ax, 4, 5),
                 np.where(ay > ax, 6, 7)),
    )
    counts = np.bincount(oct_[~flat], minlength=8).astype(np.int64)
    return counts, int(flat.sum())


class ImageGradOrientation:
    """Actor-pool batch fn: per-image gradient-orientation octant histogram
    of the luma sum R+G+B through the genuine decode path
    (:func:`grad_octant_hist`). On the factorized gradient fixture dx
    depends only on the column and dy only on the row, so the oracle is a
    1-D × 1-D cross join; the kernel is the general 2-D comparison tree.
    Emits (image_id, flat_n, oct0..oct7)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        octs = np.empty((n, 8), np.int64)
        flat = np.empty(n, np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i]).astype(np.int64)
            luma = img[:, :, 0] + img[:, :, 1] + img[:, :, 2]
            octs[i], flat[i] = grad_octant_hist(luma)
        cols = {"image_id": ids, "flat_n": flat}
        for k in range(8):
            cols[f"oct{k}"] = octs[:, k].copy()
        return pa.table(cols)


def image_grad_orientation(ds, bytes_col: str = "bytes",
                           id_col: str = "image_id", fmt_col: str = "fmt",
                           concurrency: int | None = None,
                           batch_size: int = 256):
    return ds.map_batches(
        ImageGradOrientation,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


# Standard 4x4 Bayer index matrix (values 0..15).
BAYER4 = np.array([[0, 8, 2, 10],
                   [12, 4, 14, 6],
                   [3, 11, 1, 9],
                   [15, 7, 13, 5]], dtype=np.int64)


def bayer_black_count(channel: np.ndarray) -> int:
    """ORDERED-DITHER black-pixel count of one channel under the classic
    4x4 Bayer matrix: a pixel dithers to black iff its 16-level
    quantization v // 16 is <= the tiled threshold B(y % 4, x % 4) —
    integer-exact, embarrassingly parallel (the reason ordered dithering,
    unlike Floyd-Steinberg error diffusion, distributes)."""
    v = channel.astype(np.int64) >> 4
    h, w = v.shape
    thr = BAYER4[np.arange(h)[:, None] % 4, np.arange(w)[None, :] % 4]
    return int((v <= thr).sum())


class ImageBayerDither:
    """Actor-pool batch fn: per-image, per-channel black-pixel counts of
    the 4x4 Bayer ordered dither through the genuine decode path
    (:func:`bayer_black_count`) — the 1-bit-display / thumbnail-ink
    estimate. On the factorized fixture each channel varies along one axis
    only, so the oracle collapses the tiled threshold to residue-class
    counts; the kernel is the general 2-D compare. Emits
    (image_id, black_r, black_g, black_b)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        out = np.empty((n, 3), np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            for c in range(3):
                out[i, c] = bayer_black_count(img[:, :, c])
        return pa.table({"image_id": ids, "black_r": out[:, 0].copy(),
                         "black_g": out[:, 1].copy(),
                         "black_b": out[:, 2].copy()})


def image_bayer_dither(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                       fmt_col: str = "fmt", concurrency: int | None = None,
                       batch_size: int = 256):
    return ds.map_batches(
        ImageBayerDither,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def seam_carve_cost(luma: np.ndarray) -> tuple[int, int, int]:
    """Vertical SEAM-CARVING minimum-energy path (Avidan & Shamir) over the
    interior energy grid e(i, j) = |dx| + |dy| (central differences on the
    luma): M[i][j] = e[i][j] + min(M[i-1][j-1..j+1]), 8-connected seam.
    Integer-exact throughout. Returns (min seam cost, its end column in
    interior coordinates — smallest on ties, total interior energy)."""
    v = luma.astype(np.int64)
    a = np.abs(v[1:-1, 2:] - v[1:-1, :-2])  # |dx| per interior pixel
    b = np.abs(v[2:, 1:-1] - v[:-2, 1:-1])  # |dy|
    e = a + b
    hi, wi = e.shape
    big = np.int64(1) << 56
    m = e[0].copy()
    for i in range(1, hi):
        p = np.concatenate([[big], m, [big]])
        m = e[i] + np.minimum(np.minimum(p[:-2], p[1:-1]), p[2:])
    end = int(np.argmin(m))  # first min = smallest column
    return int(m[end]), end, int(e.sum())


class ImageSeamEnergy:
    """Actor-pool batch fn: per-image vertical seam-carving DP through the
    genuine decode path (:func:`seam_carve_cost`) — the content-aware
    resize primitive; the min-seam cost doubles as a 'how removable is a
    column' synthetic-vs-photo signal. On the factorized fixture the
    energy grid is a(j) + b(i), so the oracle can carry the DP row as a
    LIST through a recursive CTE; the kernel is the general 2-D DP.
    Emits (image_id, seam_cost, seam_end, e_total)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        cost = np.empty(n, np.int64)
        end = np.empty(n, np.int64)
        tot = np.empty(n, np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i]).astype(np.int64)
            luma = img[:, :, 0] + img[:, :, 1] + img[:, :, 2]
            cost[i], end[i], tot[i] = seam_carve_cost(luma)
        return pa.table({"image_id": ids, "seam_cost": cost,
                         "seam_end": end, "e_total": tot})


def image_seam_energy(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                      fmt_col: str = "fmt", concurrency: int | None = None,
                      batch_size: int = 256):
    return ds.map_batches(
        ImageSeamEnergy,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def bilinear_up2(channel: np.ndarray) -> np.ndarray:
    """Exact 2x BILINEAR UPSAMPLE (corner-aligned) of one channel in floor
    integer arithmetic: output is (2h-1, 2w-1); even/even = source pixel,
    edge midpoints = floor mean of 2, centers = floor mean of 4. The
    integer twin of the box downsample (:func:`box_downscale2`'s sibling)
    — together they are the resize pyramid's two directions."""
    v = channel.astype(np.int64)
    h, w = v.shape
    out = np.empty((2 * h - 1, 2 * w - 1), np.int64)
    out[::2, ::2] = v
    out[::2, 1::2] = (v[:, :-1] + v[:, 1:]) // 2
    out[1::2, ::2] = (v[:-1, :] + v[1:, :]) // 2
    out[1::2, 1::2] = (v[:-1, :-1] + v[:-1, 1:]
                       + v[1:, :-1] + v[1:, 1:]) // 4
    return out


class ImageUpscaleStats:
    """Actor-pool batch fn: per-image integer checkpoints of the exact 2x
    bilinear upsample through the genuine decode path
    (:func:`bilinear_up2`): per-channel sums plus a row-weighted G sum
    (sensitive to vertical placement, so a transposed or flipped upsample
    cannot pass). On the factorized fixture each channel varies along one
    axis, so every output row (R) / column (G) is identical and the
    oracle collapses to 1-D grids. Emits
    (image_id, up_h, up_w, sum_r, sum_g, sum_b, wsum_g)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        uh = np.empty(n, np.int64)
        uw = np.empty(n, np.int64)
        sums = np.empty((n, 3), np.int64)
        wg = np.empty(n, np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            ups = [bilinear_up2(img[:, :, c]) for c in range(3)]
            uh[i], uw[i] = ups[0].shape
            for c in range(3):
                sums[i, c] = ups[c].sum()
            rows = np.arange(ups[1].shape[0], dtype=np.int64) + 1
            wg[i] = int((ups[1].sum(axis=1) * rows).sum())
        return pa.table({"image_id": ids, "up_h": uh, "up_w": uw,
                         "sum_r": sums[:, 0].copy(),
                         "sum_g": sums[:, 1].copy(),
                         "sum_b": sums[:, 2].copy(), "wsum_g": wg})


def image_upscale_stats(ds, bytes_col: str = "bytes",
                        id_col: str = "image_id", fmt_col: str = "fmt",
                        concurrency: int | None = None,
                        batch_size: int = 256):
    return ds.map_batches(
        ImageUpscaleStats,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def median3x3(channel: np.ndarray) -> np.ndarray:
    """Exact 3x3 MEDIAN FILTER of one channel's interior: output is
    (h-2, w-2); each cell is the 5th order statistic of its 9-neighbor
    window (odd count, so always an exact element — no interpolation).
    The order-statistic denoiser next to the linear box blur
    (``grid_box_blur``): medians kill salt-and-pepper impulses that any
    linear kernel only smears."""
    v = channel.astype(np.int64)
    h, w = v.shape
    if h < 3 or w < 3:
        return np.zeros((0, 0), np.int64)
    stack = np.stack([v[dy:h - 2 + dy, dx:w - 2 + dx]
                      for dy in range(3) for dx in range(3)])
    stack.partition(4, axis=0)
    return stack[4]


class ImageMedianFilter:
    """Actor-pool batch fn: per-image integer checkpoints of the 3x3
    median filter through the genuine decode path (:func:`median3x3`):
    per-channel sums of the filtered interior. On the factorized fixture
    each channel varies along one axis, so the 9-window multiset is
    {prev x3, cur x3, next x3} and the 5th order statistic collapses to a
    1-D median-of-3 — the oracle mirrors that; the kernel is the general
    2-D order-statistic filter. Emits
    (image_id, int_h, int_w, med_r, med_g, med_b)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        ih = np.empty(n, np.int64)
        iw = np.empty(n, np.int64)
        sums = np.empty((n, 3), np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            for c in range(3):
                med = median3x3(img[:, :, c])
                sums[i, c] = med.sum()
            ih[i], iw[i] = med.shape
        return pa.table({"image_id": ids, "int_h": ih, "int_w": iw,
                         "med_r": sums[:, 0].copy(),
                         "med_g": sums[:, 1].copy(),
                         "med_b": sums[:, 2].copy()})


def image_median_filter(ds, bytes_col: str = "bytes",
                        id_col: str = "image_id", fmt_col: str = "fmt",
                        concurrency: int | None = None,
                        batch_size: int = 256):
    return ds.map_batches(
        ImageMedianFilter,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def glcm_stats(channel: np.ndarray, dx: int, dy: int,
               levels: int = 8, shift: int = 5) -> tuple[int, int, int]:
    """GLCM (gray-level co-occurrence matrix) checkpoints of one channel
    at offset (dx, dy): quantize to ``levels`` by ``>> shift``, count
    co-occurring (qa, qb) pairs, and reduce to the Haralick integer
    trio — contrast Σ c·(qa−qb)², energy Σ c², occupied-cell count. The
    texture screen of image curation (flat synthetics occupy a diagonal
    sliver; noisy photographs spread mass off-diagonal)."""
    v = channel.astype(np.int64) >> shift
    h, w = v.shape
    a = v[0:h - dy, 0:w - dx]
    b = v[dy:h, dx:w]
    cnt = np.bincount((a * levels + b).ravel(),
                      minlength=levels * levels).astype(np.int64)
    qa = np.arange(levels * levels, dtype=np.int64) // levels
    qb = np.arange(levels * levels, dtype=np.int64) % levels
    contrast = int((cnt * (qa - qb) ** 2).sum())
    energy = int((cnt * cnt).sum())
    ncells = int((cnt > 0).sum())
    return contrast, energy, ncells


class ImageGlcmTexture:
    """Actor-pool batch fn: per-image GLCM texture checkpoints through the
    genuine decode path (:func:`glcm_stats`): R at horizontal offset (1,0)
    and G at vertical offset (0,1). On the factorized fixture R varies by
    column and G by row, so each co-occurrence pair repeats exactly h (w)
    times and the oracle collapses to 1-D LEAD pairs; the kernel is the
    general 2-D co-occurrence count. Emits
    (image_id, con_r, ene_r, cel_r, con_g, ene_g, cel_g)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        out = np.empty((n, 6), np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            out[i, 0:3] = glcm_stats(img[:, :, 0], 1, 0)
            out[i, 3:6] = glcm_stats(img[:, :, 1], 0, 1)
        return pa.table({"image_id": ids,
                         "con_r": out[:, 0].copy(), "ene_r": out[:, 1].copy(),
                         "cel_r": out[:, 2].copy(), "con_g": out[:, 3].copy(),
                         "ene_g": out[:, 4].copy(), "cel_g": out[:, 5].copy()})


def image_glcm_texture(ds, bytes_col: str = "bytes",
                       id_col: str = "image_id", fmt_col: str = "fmt",
                       concurrency: int | None = None,
                       batch_size: int = 256):
    return ds.map_batches(
        ImageGlcmTexture,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


# 8 Hough angles θ = kπ/8 over [0, π) as fixed-point (cos, sin)·1024 —
# the integer approximation IS the definition (same device as the
# rational rotation grid in shape_rotfrechet), so engine and oracle are
# exact by construction. sin ≥ 0 throughout, so ρ = j·c + i·s ≥ −946·j.
HOUGH_ANGLES = np.array([
    (1024, 0), (946, 392), (724, 724), (392, 946),
    (0, 1024), (-392, 946), (-724, 724), (-946, 392)], np.int64)
HOUGH_RHO_OFFSET = 65536
HOUGH_RHO_Q = 2048


def hough_peak(luma: np.ndarray, thresh: int = 5):
    """HOUGH LINE TRANSFORM peak of one luma grid: interior pixels with
    central-difference gradient |dx| + |dy| ≥ thresh vote, for each of
    the 8 fixed-point angles, into the quantized-ρ accumulator
    ρq = (j·c + i·s + 65536) // 2048 (offset keeps ρ positive so floor
    and trunc division agree). Returns (n_edge, best_votes, best_k,
    best_rho) with ties by smallest (k, ρq); (0, 0, -1, -1) when no
    pixel clears the threshold — the line-structure detector of the
    image suite (documents/diagrams spike one bucket, photos spread)."""
    v = luma.astype(np.int64)
    h, w = v.shape
    if h < 3 or w < 3:
        return 0, 0, -1, -1
    dx = v[1:h - 1, 2:] - v[1:h - 1, :w - 2]
    dy = v[2:, 1:w - 1] - v[:h - 2, 1:w - 1]
    mask = np.abs(dx) + np.abs(dy) >= thresh
    iy, ix = np.nonzero(mask)
    if len(iy) == 0:
        return 0, 0, -1, -1
    i = (iy + 1).astype(np.int64)
    j = (ix + 1).astype(np.int64)
    ncode = (HOUGH_RHO_OFFSET * 2) // HOUGH_RHO_Q + 2
    codes = []
    for k in range(len(HOUGH_ANGLES)):
        c, s = HOUGH_ANGLES[k]
        rho = (j * c + i * s + HOUGH_RHO_OFFSET) // HOUGH_RHO_Q
        codes.append(k * ncode + rho)
    cnt = np.bincount(np.concatenate(codes),
                      minlength=len(HOUGH_ANGLES) * ncode)
    best_code = int(np.argmax(cnt))  # first max = smallest (k, ρq) tie rule
    return (int(len(iy)), int(cnt[best_code]),
            best_code // ncode, best_code % ncode)


class ImageHoughLines:
    """Actor-pool batch fn: Hough line-transform peak per image through
    the genuine decode path (:func:`hough_peak` on the R+G+B luma sum).
    On the factorized fixture the luma is f(j) + g(r) + const, so the
    edge set is a product of 1-D gradient grids and the oracle is a
    cross join × the 8-angle table; the kernel is the general 2-D
    transform. Emits (image_id, n_edge, best_votes, best_k, best_rho)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt", thresh: int = 5):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.thresh = thresh
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        out = np.empty((n, 4), np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            luma = img.astype(np.int64).sum(axis=2)
            out[i] = hough_peak(luma, self.thresh)
        return pa.table({"image_id": ids,
                         "n_edge": out[:, 0].copy(),
                         "best_votes": out[:, 1].copy(),
                         "best_k": out[:, 2].copy(),
                         "best_rho": out[:, 3].copy()})


def image_hough_lines(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                      fmt_col: str = "fmt", thresh: int = 5,
                      concurrency: int | None = None,
                      batch_size: int = 256):
    return ds.map_batches(
        ImageHoughLines,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col, "thresh": thresh},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def affine_nn_sample(img: np.ndarray, c: int, s: int, tx: int, ty: int,
                     oh: int = 16, ow: int = 16) -> np.ndarray:
    """NEAREST-NEIGHBOR AFFINE WARP of an image onto an (oh, ow) output
    grid: source coords are the fixed-point rotation
    sx = ⌊(j·c − i·s)/1024⌋ + tx, sy = ⌊(j·s + i·c)/1024⌋ + ty (offset
    positive before the divide so floor and trunc agree), border-clamped
    into the source — the resampling core of every rotate / rectify /
    augmentation stage, integer-exact by construction (the rational-
    matrix device of `shape_rotfrechet`)."""
    h, w = img.shape[:2]
    i, j = np.mgrid[0:oh, 0:ow].astype(np.int64)
    sx = (j * c - i * s + 16777216) // 1024 - 16384 + tx
    sy = (j * s + i * c + 16777216) // 1024 - 16384 + ty
    sx = np.clip(sx, 0, w - 1)
    sy = np.clip(sy, 0, h - 1)
    return img[sy, sx]


class ImageAffineSample:
    """Actor-pool batch fn: integer checkpoints of a per-image nearest-
    neighbor affine warp through the genuine decode path
    (:func:`affine_nn_sample`): rotation (c,s) from the 8-angle fixed-
    point table keyed by image_id % 8, translation (id%5−2, id%3−1),
    16×16 output; emits per-channel sums plus a raster-position-weighted
    R sum (so a transposed or shifted warp cannot pass). The oracle
    enumerates the 256-cell output grid per image and evaluates the
    fixture's closed-form pixel values at the warped source coords.
    Emits (image_id, sum_r, sum_g, sum_b, wsum_r)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        out = np.empty((n, 4), np.int64)
        i_idx, j_idx = np.mgrid[0:16, 0:16].astype(np.int64)
        wgt = 16 * i_idx + j_idx + 1
        for i in range(n):
            img = self.decode(blobs[i], fmts[i]).astype(np.int64)
            c, s = HOUGH_ANGLES[int(ids[i]) % 8]
            tx = int(ids[i]) % 5 - 2
            ty = int(ids[i]) % 3 - 1
            warp = affine_nn_sample(img, int(c), int(s), tx, ty)
            out[i, 0] = warp[:, :, 0].sum()
            out[i, 1] = warp[:, :, 1].sum()
            out[i, 2] = warp[:, :, 2].sum()
            out[i, 3] = (warp[:, :, 0] * wgt).sum()
        return pa.table({"image_id": ids,
                         "sum_r": out[:, 0].copy(),
                         "sum_g": out[:, 1].copy(),
                         "sum_b": out[:, 2].copy(),
                         "wsum_r": out[:, 3].copy()})


def image_affine_sample(ds, bytes_col: str = "bytes",
                        id_col: str = "image_id", fmt_col: str = "fmt",
                        concurrency: int | None = None,
                        batch_size: int = 256):
    return ds.map_batches(
        ImageAffineSample,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def fast_corners(luma: np.ndarray, t: int = 8) -> tuple[int, int]:
    """FAST-lite CORNER DETECTION on one luma grid: an interior pixel is
    a corner iff ≥ 6 of its 8 ring neighbors are brighter than center+t,
    OR ≥ 6 are darker than center−t — the segment-test heuristic of the
    FAST detector collapsed to the radius-1 ring (integer-exact, no
    NMS). Returns (n_corners, Σ(31·j + 17·i) over corner pixels) — the
    interest-point counterpart of the Hough line peak (corners feed
    matching/stitching; lines feed rectification)."""
    v = luma.astype(np.int64)
    h, w = v.shape
    if h < 3 or w < 3:
        return 0, 0
    c = v[1:h - 1, 1:w - 1]
    bright = np.zeros(c.shape, np.int64)
    dark = np.zeros(c.shape, np.int64)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            nb = v[1 + di:h - 1 + di, 1 + dj:w - 1 + dj]
            bright += nb > c + t
            dark += nb < c - t
    corner = (bright >= 6) | (dark >= 6)
    iy, ix = np.nonzero(corner)
    return int(corner.sum()), int((31 * (ix + 1) + 17 * (iy + 1)).sum())


class ImageFastCorners:
    """Actor-pool batch fn: FAST-lite corner checkpoints per image through
    the genuine decode path (:func:`fast_corners` on the R+G+B luma sum).
    On the factorized fixture every ring-neighbor delta is a column-delta
    + row-delta, so the oracle is a 1-D×1-D cross join with eight CASE
    terms; the kernel is the general 2-D ring test. Emits
    (image_id, n_corners, corner_sum)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt", t: int = 8):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.t = t
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        out = np.empty((n, 2), np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            luma = img.astype(np.int64).sum(axis=2)
            out[i] = fast_corners(luma, self.t)
        return pa.table({"image_id": ids,
                         "n_corners": out[:, 0].copy(),
                         "corner_sum": out[:, 1].copy()})


def image_fast_corners(ds, bytes_col: str = "bytes",
                       id_col: str = "image_id", fmt_col: str = "fmt",
                       t: int = 8, concurrency: int | None = None,
                       batch_size: int = 256):
    return ds.map_batches(
        ImageFastCorners,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col, "t": t},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def feather_blend_mirror(img: np.ndarray) -> np.ndarray:
    """PANORAMA FEATHER BLEND of an image with its horizontal mirror:
    out(i,j) = ⌊(a(j)·v(i,j) + (1024−a(j))·v(i,w−1−j)) / 1024⌋ with the
    linear ramp a(j) = ⌊j·1024/(w−1)⌋ — the seam-feathering kernel every
    stitcher runs where two projected frames overlap, in floor-integer
    fixed point (all operands non-negative, so floor ≡ trunc)."""
    v = img.astype(np.int64)
    h, w = v.shape[:2]
    a = (np.arange(w, dtype=np.int64) * 1024) // (w - 1)
    shape = (1, w) + (1,) * (v.ndim - 2)
    a = a.reshape(shape)
    return (a * v + (1024 - a) * v[:, ::-1]) // 1024


class ImageFeatherBlend:
    """Actor-pool batch fn: per-image checkpoints of the mirror feather
    blend through the genuine decode path (:func:`feather_blend_mirror`):
    per-channel sums of the blended output plus a column-weighted R sum
    (the ramp is horizontal, so only a column weight can pin its
    direction). On the factorized fixture R blends f(j) against
    f(w−1−j) — a 1-D grid self-join — while G and B are invariant under
    the mirror and pass through exactly. Emits
    (image_id, sum_r, sum_g, sum_b, wsum_r)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        out = np.empty((n, 4), np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            bl = feather_blend_mirror(img)
            w = bl.shape[1]
            jw = np.arange(w, dtype=np.int64) + 1
            out[i, 0] = bl[:, :, 0].sum()
            out[i, 1] = bl[:, :, 1].sum()
            out[i, 2] = bl[:, :, 2].sum()
            out[i, 3] = (bl[:, :, 0].sum(axis=0) * jw).sum()
        return pa.table({"image_id": ids,
                         "sum_r": out[:, 0].copy(),
                         "sum_g": out[:, 1].copy(),
                         "sum_b": out[:, 2].copy(),
                         "wsum_r": out[:, 3].copy()})


def image_feather_blend(ds, bytes_col: str = "bytes",
                        id_col: str = "image_id", fmt_col: str = "fmt",
                        concurrency: int | None = None,
                        batch_size: int = 256):
    return ds.map_batches(
        ImageFeatherBlend,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def radial_profile(luma: np.ndarray) -> np.ndarray:
    """CHEBYSHEV RADIAL PROFILE of one luma grid: pixels bucket by ring
    dc = max(|i−ci|, |j−cj|) around the center ((h−1)//2, (w−1)//2);
    returns an (n_rings, 2) int64 array of (n_px, luma_sum) per ring —
    the vignetting / lens-falloff screen of image curation (a clean
    photo's profile decays smoothly; a vignetted or bordered one steps)."""
    v = luma.astype(np.int64)
    h, w = v.shape
    ci, cj = (h - 1) // 2, (w - 1) // 2
    i, j = np.mgrid[0:h, 0:w]
    dc = np.maximum(np.abs(i - ci), np.abs(j - cj)).ravel()
    n_rings = int(dc.max()) + 1
    n_px = np.bincount(dc, minlength=n_rings)
    s = np.bincount(dc, weights=v.ravel().astype(np.float64),
                    minlength=n_rings).astype(np.int64)
    return np.stack([n_px.astype(np.int64), s], axis=1)


class ImageRadialProfile:
    """Actor-pool batch fn: per-(image, ring) rows of the Chebyshev
    radial profile through the genuine decode path
    (:func:`radial_profile` on the R+G+B luma sum). The oracle buckets
    the 1-D×1-D fixture grids by GREATEST(|i−ci|, |j−cj|). Emits
    (image_id, ring, n_px, luma_sum)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        out_id, out_ring, out_n, out_s = [], [], [], []
        for i in range(len(ids)):
            img = self.decode(blobs[i], fmts[i])
            luma = img.astype(np.int64).sum(axis=2)
            prof = radial_profile(luma)
            rings = len(prof)
            out_id.append(np.full(rings, ids[i], np.int64))
            out_ring.append(np.arange(rings, dtype=np.int64))
            out_n.append(prof[:, 0])
            out_s.append(prof[:, 1])
        return pa.table({"image_id": np.concatenate(out_id),
                         "ring": np.concatenate(out_ring),
                         "n_px": np.concatenate(out_n),
                         "luma_sum": np.concatenate(out_s)})


def image_radial_profile(ds, bytes_col: str = "bytes",
                         id_col: str = "image_id", fmt_col: str = "fmt",
                         concurrency: int | None = None,
                         batch_size: int = 256):
    return ds.map_batches(
        ImageRadialProfile,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def kuwahara5(channel: np.ndarray) -> np.ndarray:
    """EDGE-PRESERVING KUWAHARA FILTER (5×5 window, four overlapping 3×3
    quadrants) of one channel's interior in exact integers: per pixel,
    pick the quadrant with the smallest division-free variance metric
    9·Σx² − (Σx)² (ties in NW, NE, SW, SE order) and output its floor
    mean Σx // 9 — smoothing that never averages across an edge, the
    stylization/denoise classic the box blur cannot imitate. Vectorized
    with two integral images; output is (h−4, w−4)."""
    v = channel.astype(np.int64)
    h, w = v.shape
    if h < 5 or w < 5:
        return np.zeros((0, 0), np.int64)
    i1 = np.zeros((h + 1, w + 1), np.int64)
    i1[1:, 1:] = v.cumsum(0).cumsum(1)
    i2 = np.zeros((h + 1, w + 1), np.int64)
    i2[1:, 1:] = (v * v).cumsum(0).cumsum(1)

    def box(ii):
        return ii[3:, 3:] - ii[:-3, 3:] - ii[3:, :-3] + ii[:-3, :-3]

    b1 = box(i1)  # 3x3 sums by top-left corner, shape (h-2, w-2)
    b2 = box(i2)
    s_q = np.stack([b1[0:h - 4, 0:w - 4], b1[0:h - 4, 2:w - 2],
                    b1[2:h - 2, 0:w - 4], b1[2:h - 2, 2:w - 2]])
    m_q = np.stack([b2[0:h - 4, 0:w - 4], b2[0:h - 4, 2:w - 2],
                    b2[2:h - 2, 0:w - 4], b2[2:h - 2, 2:w - 2]])
    metric = 9 * m_q - s_q * s_q
    choice = metric.argmin(axis=0)  # first min = NW,NE,SW,SE tie order
    chosen = np.take_along_axis(s_q, choice[None], axis=0)[0]
    return chosen // 9


class ImageKuwahara:
    """Actor-pool batch fn: per-image sums of the Kuwahara-filtered
    interior through the genuine decode path (:func:`kuwahara5`). On the
    factorized fixture the quadrant variances collapse per axis (left/
    right column windows for R, top/bottom row windows for G; B is flat
    so the NW tie wins everywhere), so the oracle is 1-D window sums +
    the same argmin tie rule. Emits
    (image_id, int_h, int_w, kw_r, kw_g, kw_b)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        ih = np.empty(n, np.int64)
        iw = np.empty(n, np.int64)
        sums = np.empty((n, 3), np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            for c in range(3):
                kw = kuwahara5(img[:, :, c])
                sums[i, c] = kw.sum()
            ih[i], iw[i] = kw.shape
        return pa.table({"image_id": ids, "int_h": ih, "int_w": iw,
                         "kw_r": sums[:, 0].copy(),
                         "kw_g": sums[:, 1].copy(),
                         "kw_b": sums[:, 2].copy()})


def image_kuwahara(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                   fmt_col: str = "fmt", concurrency: int | None = None,
                   batch_size: int = 256):
    return ds.map_batches(
        ImageKuwahara,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def zhang_suen_step(mask: np.ndarray, step: int = 1) -> np.ndarray:
    """One ZHANG–SUEN THINNING sub-iteration on a boolean mask: flag for
    deletion every foreground pixel with 2 ≤ B(p) ≤ 6 ring neighbors,
    exactly one 0→1 ring transition A(p) = 1, and the step's two
    directional products zero (step 1: P2·P4·P6 = P4·P6·P8 = 0; step 2:
    P2·P4·P8 = P2·P6·P8 = 0) — the skeletonization building block that
    erodes strokes to 1-px centerlines while preserving connectivity
    (out-of-bounds neighbors are background). Returns the deletion
    mask."""
    h, w = mask.shape
    pad = np.zeros((h + 2, w + 2), bool)
    pad[1:-1, 1:-1] = mask
    p2 = pad[0:-2, 1:-1]
    p3 = pad[0:-2, 2:]
    p4 = pad[1:-1, 2:]
    p5 = pad[2:, 2:]
    p6 = pad[2:, 1:-1]
    p7 = pad[2:, 0:-2]
    p8 = pad[1:-1, 0:-2]
    p9 = pad[0:-2, 0:-2]
    ring = [p2, p3, p4, p5, p6, p7, p8, p9]
    b = sum(r.astype(np.int64) for r in ring)
    a = sum((~ring[k] & ring[(k + 1) % 8]).astype(np.int64)
            for k in range(8))
    if step == 1:
        c1 = ~(p2 & p4 & p6)
        c2 = ~(p4 & p6 & p8)
    else:
        c1 = ~(p2 & p4 & p8)
        c2 = ~(p2 & p6 & p8)
    return mask & (b >= 2) & (b <= 6) & (a == 1) & c1 & c2


class ImageThinningStep:
    """Actor-pool batch fn: one Zhang–Suen sub-iteration (step 1) on the
    R-parity stripe mask through the genuine decode path
    (:func:`zhang_suen_step`): emits the mask size, the deleted count
    and a Σ(31j+17i) position checksum. On the full-height stripe
    fixture the interior rows are identical and the top/bottom rows
    have their own ring patterns, so the oracle collapses to per-column
    (l, m, r) CASE logic × closed-form row weights; the kernel is the
    general 2-D rule (pytest-fuzzed vs brute force). Emits
    (image_id, n_mask, n_del, del_chk)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        out = np.empty((n, 3), np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            mask = (img[:, :, 0].astype(np.int64) % 2) == 1
            d = zhang_suen_step(mask, step=1)
            iy, ix = np.nonzero(d)
            out[i] = (int(mask.sum()), int(d.sum()),
                      int((31 * ix + 17 * iy).sum()))
        return pa.table({"image_id": ids,
                         "n_mask": out[:, 0].copy(),
                         "n_del": out[:, 1].copy(),
                         "del_chk": out[:, 2].copy()})


def image_thinning_step(ds, bytes_col: str = "bytes",
                        id_col: str = "image_id", fmt_col: str = "fmt",
                        concurrency: int | None = None,
                        batch_size: int = 256):
    return ds.map_batches(
        ImageThinningStep,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def nms_edges(luma: np.ndarray, thresh: int = 8) -> tuple[int, int]:
    """CANNY NON-MAXIMUM SUPPRESSION (4-direction) on one luma grid:
    central-difference gradient, magnitude m = |dx| + |dy|; a pixel
    survives iff m ≥ thresh and m strictly exceeds both neighbors ALONG
    the dominant gradient axis (horizontal when |dx| ≥ |dy|, else
    vertical) — the thinning step that turns smeared gradient ridges
    into 1-px edge chains (the Canny stage between `image_grad_
    orientation` and hysteresis). Returns (n_edges, Σ(31j+17i))."""
    v = luma.astype(np.int64)
    h, w = v.shape
    if h < 5 or w < 5:
        return 0, 0
    dx = v[:, 2:] - v[:, :-2]          # at cols 1..w-2
    dy = v[2:, :] - v[:-2, :]          # at rows 1..h-2
    m = np.abs(dx[1:-1, :]) + np.abs(dy[:, 1:-1])  # rows/cols 1..-2
    # valid NMS region needs m at all four neighbors: rows/cols 2..-3
    c = m[1:-1, 1:-1]
    horiz = np.abs(dx[2:-2, 1:-1]) >= np.abs(dy[1:-1, 2:-2])
    keeph = (c > m[1:-1, :-2]) & (c > m[1:-1, 2:])
    keepv = (c > m[:-2, 1:-1]) & (c > m[2:, 1:-1])
    keep = (c >= thresh) & np.where(horiz, keeph, keepv)
    iy, ix = np.nonzero(keep)
    return int(keep.sum()), int((31 * (ix + 2) + 17 * (iy + 2)).sum())


class ImageNmsEdges:
    """Actor-pool batch fn: Canny NMS edge checkpoints per image through
    the genuine decode path (:func:`nms_edges` on the R+G+B luma sum).
    On the factorized fixture m = A(j) + B(i) with A = |df|, B = |dg|,
    so along-axis comparisons cancel the other axis and the oracle is a
    1-D×1-D cross join of local-max flags. Emits
    (image_id, n_edges, edge_chk)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt", thresh: int = 8):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.thresh = thresh
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        out = np.empty((n, 2), np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            luma = img.astype(np.int64).sum(axis=2)
            out[i] = nms_edges(luma, self.thresh)
        return pa.table({"image_id": ids,
                         "n_edges": out[:, 0].copy(),
                         "edge_chk": out[:, 1].copy()})


def image_nms_edges(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                    fmt_col: str = "fmt", thresh: int = 8,
                    concurrency: int | None = None, batch_size: int = 256):
    return ds.map_batches(
        ImageNmsEdges,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col, "thresh": thresh},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


class ImageColorfulness:
    """Actor-pool batch fn: Hasler–Süsstrunk COLORFULNESS moment pieces
    per image through the genuine decode path: opponent axes rg = R − G
    and yb2 = R + G − 2B (×2-scaled yellow-blue so everything stays
    integer); emits (image_id, n_px, rg_sum, rg_sq, yb_sum, yb_sq) — the
    metric C = sqrt(σ_rg²+σ_yb²) + 0.3·sqrt(μ_rg²+μ_yb²) is the
    caller's fold over the exact pieces."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        out = np.empty((n, 5), np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i]).astype(np.int64)
            rg = img[:, :, 0] - img[:, :, 1]
            yb = img[:, :, 0] + img[:, :, 1] - 2 * img[:, :, 2]
            out[i] = (rg.size, rg.sum(), (rg * rg).sum(),
                      yb.sum(), (yb * yb).sum())
        return pa.table({"image_id": ids,
                         "n_px": out[:, 0].copy(),
                         "rg_sum": out[:, 1].copy(),
                         "rg_sq": out[:, 2].copy(),
                         "yb_sum": out[:, 3].copy(),
                         "yb_sq": out[:, 4].copy()})


def image_colorfulness(ds, bytes_col: str = "bytes",
                       id_col: str = "image_id", fmt_col: str = "fmt",
                       concurrency: int | None = None,
                       batch_size: int = 256):
    return ds.map_batches(
        ImageColorfulness,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


# 4 separable 8×8 integer templates — the deterministic bank for
# template matching: t_k(i,j) = ((j+1)·α_k) % 64 + ((i+1)·β_k) % 64.
TM_ALPHA = (5, 11, 17, 23)
TM_BETA = (3, 7, 13, 19)


def template_match(luma: np.ndarray) -> tuple[int, int, int, int]:
    """SSD TEMPLATE MATCHING of one luma grid against the 4-template
    bank: the minimum sum of squared differences over every 8×8 window
    position × template, ties by (k, y, x) — the classic
    registration/detection primitive (the integer-exact core of
    normalized cross-correlation matching). Returns
    (best_k, best_y, best_x, best_ssd); (-1, -1, -1, -1) when the image
    is smaller than the window."""
    v = luma.astype(np.int64)
    h, w = v.shape
    if h < 8 or w < 8:
        return -1, -1, -1, -1
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(v, (8, 8)).astype(np.int64)
    jj = np.arange(1, 9, dtype=np.int64)
    best = None
    for k in range(4):
        t = (jj * TM_ALPHA[k]) % 64 + ((jj * TM_BETA[k]) % 64)[:, None]
        ssd = ((win - t) ** 2).sum(axis=(2, 3))
        y, x = np.unravel_index(np.argmin(ssd), ssd.shape)
        cand = (int(ssd[y, x]), k, int(y), int(x))
        if best is None or cand < best:
            best = cand
    return best[1], best[2], best[3], best[0]


class ImageTemplateMatch:
    """Actor-pool batch fn: best template-bank SSD match per image
    through the genuine decode path (:func:`template_match` on the luma
    sum). On the factorized fixture both image and templates are
    separable, so SSD(y,x,k) = 8ΣA² + 8ΣB² + 2ΣAΣB with A/B 1-D window
    residuals — the oracle enumerates the small (x,k)×(y,k) grids.
    Emits (image_id, best_k, best_y, best_x, best_ssd)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        out = np.empty((n, 4), np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            luma = img.astype(np.int64).sum(axis=2)
            out[i] = template_match(luma)
        return pa.table({"image_id": ids,
                         "best_k": out[:, 0].copy(),
                         "best_y": out[:, 1].copy(),
                         "best_x": out[:, 2].copy(),
                         "best_ssd": out[:, 3].copy()})


def image_template_match(ds, bytes_col: str = "bytes",
                         id_col: str = "image_id", fmt_col: str = "fmt",
                         concurrency: int | None = None,
                         batch_size: int = 256):
    return ds.map_batches(
        ImageTemplateMatch,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def rlsa_horizontal(mask: np.ndarray, gap: int = 4) -> np.ndarray:
    """RUN-LENGTH SMEARING (RLSA, horizontal pass) on a boolean mask:
    background runs of length ≤ gap BETWEEN two foreground pixels on the
    same row are filled — the document-layout-analysis classic that
    merges characters into words/lines before segmentation. Edge gaps
    (no foreground on one side) never fill."""
    h, w = mask.shape
    out = mask.copy()
    for y in range(h):
        row = mask[y]
        idx = np.flatnonzero(row)
        if len(idx) < 2:
            continue
        gaps = idx[1:] - idx[:-1] - 1
        for k in np.flatnonzero((gaps > 0) & (gaps <= gap)):
            out[y, idx[k] + 1:idx[k + 1]] = True
    return out


class ImageRlsaSmear:
    """Actor-pool batch fn: horizontal RLSA checkpoints on the R-parity
    stripe mask through the genuine decode path
    (:func:`rlsa_horizontal`): mask size, post-smear size, and the
    Σ(31j+17i) checksum of the FILLED pixels. On the full-height stripe
    fixture every row is identical, so the oracle collapses to a 1-D
    prev-one/next-one gap test × h. Emits
    (image_id, n_mask, n_after, fill_chk)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        out = np.empty((n, 3), np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            mask = (img[:, :, 0].astype(np.int64) % 2) == 1
            sm = rlsa_horizontal(mask)
            filled = sm & ~mask
            iy, ix = np.nonzero(filled)
            out[i] = (int(mask.sum()), int(sm.sum()),
                      int((31 * ix + 17 * iy).sum()))
        return pa.table({"image_id": ids,
                         "n_mask": out[:, 0].copy(),
                         "n_after": out[:, 1].copy(),
                         "fill_chk": out[:, 2].copy()})


def image_rlsa_smear(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                     fmt_col: str = "fmt", concurrency: int | None = None,
                     batch_size: int = 256):
    return ds.map_batches(
        ImageRlsaSmear,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )


def skew_profile_energy(mask: np.ndarray, shears=(-2, -1, 0, 1, 2)
                        ) -> tuple[int, int]:
    """PROJECTION-PROFILE SKEW DETECTION on a boolean mask — the
    document-deskew classic: columns live on an ×8 subpixel grid and
    row i shifts by i·s subpixels under candidate shear s (exact — no
    rounding; the +8h offset keeps buckets non-negative); the score is
    Σ_column count² of the sheared column profile — text lines aligned
    with the axis give a PEAKY profile (large Σc²), skewed ones smear
    it. Returns (best_s, best_energy), ties → smaller s."""
    h, w = mask.shape
    iy, ix = np.nonzero(mask)
    best = None
    for s in shears:
        cols = ix * 8 + iy * s + 8 * h  # x8 scale keeps shears integer
        cnt = np.bincount(cols)
        energy = int((cnt.astype(np.int64) ** 2).sum())
        cand = (-energy, s)
        if best is None or cand < best:
            best = cand
    return best[1], -best[0]


class ImageSkewDetect:
    """Actor-pool batch fn: skew detection on the R-parity stripe mask
    through the genuine decode path (:func:`skew_profile_energy`). On
    the full-height stripe fixture the sheared profile is an (i, j)
    cross join with the shifted-column GROUP BY; vertical stripes are
    axis-aligned, so s = 0 maximizes the energy — the oracle still
    replays ALL candidate shears and takes the argmax. Emits
    (image_id, best_s, energy)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 fmt_col: str = "fmt"):
        from ..functions import codecs

        self.bytes_col, self.id_col, self.fmt_col = bytes_col, id_col, fmt_col
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(ids)
        out = np.empty((n, 2), np.int64)
        for i in range(n):
            img = self.decode(blobs[i], fmts[i])
            mask = (img[:, :, 0].astype(np.int64) % 2) == 1
            out[i] = skew_profile_energy(mask)
        return pa.table({"image_id": ids,
                         "best_s": out[:, 0].copy(),
                         "energy": out[:, 1].copy()})


def image_skew_detect(ds, bytes_col: str = "bytes", id_col: str = "image_id",
                      fmt_col: str = "fmt", concurrency: int | None = None,
                      batch_size: int = 256):
    return ds.map_batches(
        ImageSkewDetect,
        fn_constructor_kwargs={"bytes_col": bytes_col, "id_col": id_col,
                               "fmt_col": fmt_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
    )
