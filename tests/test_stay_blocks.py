"""ImageBlockStats vs a per-pixel reference loop, and stay_point_islands
vs a brute-force window scan — both on randomized inputs with fixed seeds."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_block_means(img: np.ndarray, bw: int, bh: int):
    """Per-block channel means via explicit per-pixel loops (no reshape)."""
    h, w, _ = img.shape
    rows = []
    for by in range(h // bh):
        for bx in range(w // bw):
            s = np.zeros(3, dtype=np.int64)
            for r in range(by * bh, (by + 1) * bh):
                for c in range(bx * bw, (bx + 1) * bw):
                    s += img[r, c, :].astype(np.int64)
            rows.append((bx, by, *(s // (bw * bh))))
    return rows


def test_image_block_stats_vs_brute(ray_session):
    import ray
    from gtfs_conflation_pipeline_ray.functions import codecs
    from gtfs_conflation_pipeline_ray.stages import media

    rng = np.random.default_rng(7)
    bw, bh = 4, 6
    imgs, blobs, fmts, ids = [], [], [], []
    for i, fmt in enumerate(["bmp", "png", "jpeg", "bmp", "png"]):
        w = bw * int(rng.integers(2, 6))
        h = bh * int(rng.integers(2, 5))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        # reference means are computed on the DECODED pixels, so the lossy
        # jpeg path is exercised honestly
        dec = codecs.decode(codecs.encode(img, fmt), fmt)
        imgs.append(dec)
        blobs.append(codecs.encode(img, fmt))
        fmts.append(fmt)
        ids.append(i)

    ds = ray.data.from_arrow(pa.table({
        "image_id": pa.array(ids, type=pa.int64()),
        "bytes": pa.array(blobs, type=pa.binary()),
        "fmt": pa.array(fmts, type=pa.string()),
    }))
    out = media.image_block_stats(ds, bw=bw, bh=bh, batch_size=2).to_pandas()
    out = out.sort_values(["image_id", "by", "bx"]).reset_index(drop=True)

    exp_rows = []
    for i, img in enumerate(imgs):
        for bx, by, mr, mg, mb in _brute_block_means(img, bw, bh):
            exp_rows.append((i, bx, by, mr, mg, mb))
    exp = pd.DataFrame(exp_rows, columns=["image_id", "bx", "by",
                                          "mean_r", "mean_g", "mean_b"])
    exp = exp.sort_values(["image_id", "by", "bx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out.astype(np.int64), exp.astype(np.int64))


def _brute_stay_islands(df: pd.DataFrame, k: int, r: int):
    """Reference: per trajectory, anchor i is a core iff points i+1..i+k
    all exist and each is within Chebyshev r of the anchor; islands are
    maximal consecutive-core runs."""
    out = []
    for key, g in df.groupby("traj"):
        g = g.sort_values("seq").reset_index(drop=True)
        n = len(g)
        core = []
        for i in range(n):
            ok = i + k < n
            for j in range(i + 1, min(i + k + 1, n)):
                if (abs(int(g.x[j]) - int(g.x[i])) > r
                        or abs(int(g.y[j]) - int(g.y[i])) > r):
                    ok = False
            core.append(ok)
        i = 0
        while i < n:
            if core[i]:
                j = i
                while j + 1 < n and core[j + 1]:
                    j += 1
                out.append((key, int(g.seq[i]), int(g.seq[j]), j - i + 1))
                i = j + 1
            else:
                i += 1
    return sorted(out)


def test_stay_point_islands_vs_brute(ray_session):
    import ray
    from gtfs_conflation_pipeline_ray.stages import spatial

    rng = np.random.default_rng(11)
    rows = []
    for traj in range(6):
        n = int(rng.integers(15, 40))
        x = y = 0
        for seq in range(n):
            # mixture of dwell steps (small) and travel jumps (large)
            if rng.random() < 0.25:
                x += int(rng.integers(50, 200))
                y += int(rng.integers(50, 200))
            else:
                x += int(rng.integers(-5, 6))
                y += int(rng.integers(-5, 6))
            rows.append((traj, seq, x, y))
    df = pd.DataFrame(rows, columns=["traj", "seq", "x", "y"])

    ds = ray.data.from_pandas(df)
    got = spatial.stay_point_islands(
        ds, "traj", "seq", "x", "y", k=3, r=12).to_pandas()
    got_t = sorted((int(a), int(b), int(c), int(d)) for a, b, c, d in
                   zip(got.traj, got.start_seq, got.end_seq, got.n_core))
    assert got_t == _brute_stay_islands(df, k=3, r=12)


def test_stay_point_islands_no_cores(ray_session):
    import ray
    from gtfs_conflation_pipeline_ray.stages import spatial

    # every step jumps farther than r: zero islands, schema intact
    df = pd.DataFrame({"traj": [0] * 10, "seq": range(10),
                       "x": np.arange(10) * 100, "y": np.zeros(10, int)})
    got = spatial.stay_point_islands(
        ray.data.from_pandas(df), "traj", "seq", "x", "y", k=2, r=5)
    # Dataset schema survives the empty result (to_pandas on a fully-empty
    # dataset drops columns — a Ray conversion quirk, not an engine one)
    assert got.schema().names == ["traj", "start_seq", "end_seq", "n_core"]
    assert got.count() == 0


def test_grid_moran_vs_brute(ray_session):
    import ray
    from gtfs_conflation_pipeline_ray.stages import spatial

    rng = np.random.default_rng(23)
    n = 4000
    x = rng.integers(0, 1 << 14, size=n)
    y = rng.integers(0, 1 << 14, size=n)
    ds = ray.data.from_arrow(pa.table({"px": x.astype(np.int64),
                                       "py": y.astype(np.int64)}))
    got = spatial.grid_moran(ds, "px", "py", cell=1024, band_div=4)
    got = got.to_pandas().set_index("band").sort_index()

    # brute force: dense grid + explicit 8-neighborhood double loop
    cells = {}
    for xi, yi in zip(x // 1024, y // 1024):
        cells[(int(xi), int(yi))] = cells.get((int(xi), int(yi)), 0) + 1
    import collections
    agg = collections.defaultdict(lambda: [0, 0, 0, 0, 0])
    for (cx, cy), v in cells.items():
        a = agg[cx // 4]
        a[0] += 1
        a[1] += v
        a[2] += v * v
        for dx, dy in ((1, 0), (1, 1), (0, 1), (-1, 1)):
            w = cells.get((cx + dx, cy + dy))
            if w is not None:
                a[3] += 1
                a[4] += v * w
    for band, (nc, sv, sv2, npair, scross) in agg.items():
        r = got.loc[band]
        assert (r.n_cells, r.sum_v, r.sum_v2, r.n_pairs, r.sum_cross) == (
            nc, sv, sv2, npair, scross), band
    assert set(got.index) == set(agg.keys())
