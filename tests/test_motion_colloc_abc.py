"""Kernel pins for block-matching motion, PMI collocations' integer form,
and the two-phase ABC classifier."""

import numpy as np
import pandas as pd
import pyarrow as pa

from gtfs_conflation_pipeline_ray.stages.media import block_motion


def motion_brute(prev, cur, r):
    h, w = prev.shape
    best = None
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            sad = 0
            cnt = 0
            for i in range(h):
                for j in range(w):
                    ii, jj = i - dy, j - dx
                    if 0 <= ii < h and 0 <= jj < w:
                        sad += abs(int(cur[i, j]) - int(prev[ii, jj]))
                        cnt += 1
            if best is None or sad < best[2]:
                best = (dy, dx, sad)
    sad00 = int(np.abs(cur.astype(int) - prev.astype(int)).sum())
    return best[0], best[1], best[2], sad00


def test_motion_matches_bruteforce_random():
    rng = np.random.default_rng(17)
    for _ in range(6):
        h, w = int(rng.integers(7, 12)), int(rng.integers(7, 12))
        prev = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        cur = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        assert block_motion(prev, cur, 3) == motion_brute(prev, cur, 3)


def test_motion_recovers_planted_shift():
    rng = np.random.default_rng(5)
    prev = rng.integers(0, 256, size=(20, 30)).astype(np.uint8)
    cur = np.roll(prev, (1, -3), axis=(0, 1))
    dy, dx, sad, _ = block_motion(prev[4:-4, 4:-4], cur[4:-4, 4:-4], 4)
    assert (dy, dx) == (1, -3)
    # planted shift matches exactly on the cropped interior
    assert sad == 0


def test_motion_identical_frames():
    f = np.arange(48, dtype=np.uint8).reshape(6, 8)
    dy, dx, sad, sad00 = block_motion(f, f, 2)
    assert (dy, dx, sad, sad00) == (0, 0, 0, 0)


def test_collocation_pmi_integer_form(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.textops import collocation_pmi

    docs = ["a b a b a b", "a b c d", "c d c d c d c d", "a b"] * 3
    ds = ray.data.from_arrow(pa.table({"text": docs}))
    out = collocation_pmi(ds, min_count=2).to_pandas()
    # brute-force the definition
    toks = [d.split() for d in docs]
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for ws in toks:
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n = sum(uni.values())
    m = sum(big.values())
    want = {
        (a, b): (c, c * n * n * 100 // (uni[a] * uni[b] * m))
        for (a, b), c in big.items() if c >= 2
    }
    got = {(r.w1, r.w2): (int(r.c_xy), int(r.pmi_q))
           for r in out.itertuples()}
    assert got == want


def test_abc_classes_matches_window(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.relational import abc_classes

    rng = np.random.default_rng(2)
    n = 300
    keys = np.arange(n, dtype=np.int64)
    vals = rng.integers(1, 10_000_000, size=n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals}))
    out = abc_classes(ds, "k", "v", band_width=1 << 18).to_pandas()
    df = pd.DataFrame({"k": keys, "v": vals}).sort_values(
        ["v", "k"], ascending=[False, True])
    cum = df["v"].cumsum().to_numpy()
    tot = int(vals.sum())
    want = np.where(cum * 10 <= tot * 7, "A",
                    np.where(cum * 10 <= tot * 9, "B", "C"))
    merged = out.set_index("k").loc[df["k"].to_numpy()]
    assert merged["abc_class"].tolist() == want.tolist()
    assert (merged["v"].to_numpy() == df["v"].to_numpy()).all()
