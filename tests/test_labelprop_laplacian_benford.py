"""Kernel pins for label propagation, the Laplacian blur metric, and the
Benford first-digit extraction."""

import numpy as np
import pyarrow as pa

from gtfs_conflation_pipeline_ray.stages.media import laplacian_sq_sum


def lap_brute(ch):
    h, w = ch.shape
    s = 0
    for r in range(1, h - 1):
        for j in range(1, w - 1):
            lap = (4 * int(ch[r, j]) - int(ch[r - 1, j]) - int(ch[r + 1, j])
                   - int(ch[r, j - 1]) - int(ch[r, j + 1]))
            s += lap * lap
    return s


def test_laplacian_matches_bruteforce_random():
    rng = np.random.default_rng(41)
    for _ in range(8):
        h, w = rng.integers(3, 9, size=2)
        ch = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        assert laplacian_sq_sum(ch) == lap_brute(ch)


def test_laplacian_flat_and_tiny():
    assert laplacian_sq_sum(np.full((5, 5), 100, dtype=np.uint8)) == 0
    assert laplacian_sq_sum(np.zeros((2, 9), dtype=np.uint8)) == 0  # no interior


def test_laplacian_single_spike():
    ch = np.zeros((3, 3), dtype=np.uint8)
    ch[1, 1] = 10
    assert laplacian_sq_sum(ch) == 1600  # lap = 40 at the center


def _lp_brute(edges, seeds, rounds):
    labels = dict(seeds)
    for _ in range(rounds):
        votes: dict[int, dict[int, int]] = {}
        for s, t in edges:
            if s in labels:
                votes.setdefault(t, {}).setdefault(labels[s], 0)
                votes[t][labels[s]] += 1
        new = dict(seeds)
        for v, cnt in votes.items():
            if v in seeds:
                continue
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        labels = new
    return labels


def test_label_propagation_matches_bruteforce(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.graphrank import (
        label_propagation_rounds,
    )

    rng = np.random.default_rng(6)
    n, m = 25, 70
    s = rng.integers(0, n, size=m).astype(np.int64)
    t = rng.integers(0, n, size=m).astype(np.int64)
    seeds = {0: 3, 5: 1, 11: 1, 17: 4}
    edges = ray.data.from_arrow(pa.table({"src": s, "dst": t}))
    seed_ds = ray.data.from_arrow(pa.table({
        "node": np.array(list(seeds), dtype=np.int64),
        "label": np.array(list(seeds.values()), dtype=np.int64)}))
    out = label_propagation_rounds(edges, seed_ds, rounds=2).to_pandas()
    got = dict(zip(out["node"].astype(int), out["label"].astype(int)))
    want = _lp_brute(list(zip(s.tolist(), t.tolist())), seeds, 2)
    assert got == want


def test_benford_digit_extraction():
    v = np.array([1, 9, 10, 19, 99, 100, 1234567, 900000001], dtype=np.int64)
    d = v.copy()
    while (d >= 10).any():
        big = d >= 10
        d[big] //= 10
    assert d.tolist() == [1, 9, 1, 1, 9, 1, 1, 9]
