"""AudioVAD and shot_segments vs brute-force references through the real
WAV / QVID encode-decode round trip."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gtfs_conflation_pipeline_ray.functions import media as M


def _brute_vad(s, frame, thr):
    """Reference: explicit frame loop + run merge."""
    nf = len(s) // frame
    act = [int(np.abs(s[f * frame:(f + 1) * frame].astype(np.int64)).sum())
           for f in range(nf)]
    segs, f = [], 0
    while f < nf:
        if act[f] > thr:
            g = f
            while g + 1 < nf and act[g + 1] > thr:
                g += 1
            segs.append((f, g, g - f + 1, max(act[f:g + 1])))
            f = g + 1
        else:
            f += 1
    return segs


def test_audio_vad_vs_brute(ray_session):
    import ray
    from gtfs_conflation_pipeline_ray.stages import media as ms

    rng = np.random.default_rng(13)
    blobs, samples = [], []
    for i in range(6):
        n = int(rng.integers(300, 3000))
        # random loud/quiet alternation with random region lengths — no
        # frame alignment, so partial-frame energies are genuinely mixed
        s = np.zeros(n, dtype=np.int16)
        pos = 0
        while pos < n:
            ln = int(rng.integers(50, 400))
            amp = int(rng.choice([30, 2500]))
            sign = np.where(np.arange(pos, min(pos + ln, n)) % 5 < 3, 1, -1)
            s[pos:pos + ln] = (sign * amp).astype(np.int16)
            pos += ln
        blobs.append(M.encode_wav(s, 8000))
        samples.append(s)
    ds = ray.data.from_arrow(pa.table({
        "audio_id": pa.array(range(6), type=pa.int64()),
        "bytes": pa.array(blobs, type=pa.binary()),
        "fmt": pa.array(["wav"] * 6, type=pa.string()),
    }))
    got = ms.audio_vad_segments(ds, frame=64, thr=64 * 800,
                                batch_size=2).to_pandas()
    for i, s in enumerate(samples):
        sub = got[got.audio_id == i].sort_values("start_frame")
        got_t = list(map(tuple, sub[["start_frame", "end_frame", "n_frames",
                                     "max_energy"]].astype(int).to_numpy()))
        assert got_t == _brute_vad(s, 64, 64 * 800), f"clip {i}"


def test_shot_segments_vs_brute(ray_session):
    import ray
    from gtfs_conflation_pipeline_ray.stages import media as ms

    rng = np.random.default_rng(17)
    blobs, all_frames = [], []
    for i in range(5):
        nf, w, h = int(rng.integers(3, 20)), 12, 8
        frames = np.empty((nf, h, w, 3), dtype=np.uint8)
        col = rng.integers(40, 200, size=3)
        for f in range(nf):
            if f > 0 and rng.random() < 0.3:  # random hard cut
                col = rng.integers(40, 200, size=3)
            else:  # gentle drift
                col = np.clip(col + rng.integers(-3, 4, size=3), 0, 255)
            frames[f] = col[None, None, :]
        blobs.append(M.encode_video(frames, fps=24))
        all_frames.append(frames)
    ds = ray.data.from_arrow(pa.table({
        "video_id": pa.array(range(5), type=pa.int64()),
        "bytes": pa.array(blobs, type=pa.binary()),
    }))
    frames_ds = ms.sample_frames(ds, every_n=1, with_ahash=False,
                                 batch_size=2)
    got = ms.shot_segments(frames_ds, thr_px=30).to_pandas()

    for i, frames in enumerate(all_frames):
        nf, h, w, _ = frames.shape
        sums = frames.astype(np.int64).sum(axis=(1, 2))
        # brute: boundary before f iff L1 sum diff > thr*w*h; shots = runs
        exp, shot_start = [], 0
        for f in range(1, nf):
            if np.abs(sums[f] - sums[f - 1]).sum() > 30 * w * h:
                exp.append((shot_start, f - 1, f - shot_start))
                shot_start = f
        exp.append((shot_start, nf - 1, nf - shot_start))
        sub = got[got.video_id == i].sort_values("shot_id")
        assert list(sub.shot_id) == list(range(len(exp))), f"video {i}"
        got_t = list(map(tuple, sub[["start_frame", "end_frame",
                                     "n_frames"]].astype(int).to_numpy()))
        assert got_t == exp, f"video {i}"
