"""Kernel pins for the round-4 session-6 operators: DTW curve similarity,
L1 chamfer distance transform, LIX readability."""

import numpy as np
import pytest

from gtfs_conflation_pipeline_ray.stages.segments import dtw_sq_int, stride_pick


def dtw_brute(a: np.ndarray, b: np.ndarray) -> int:
    """Reference DTW by memoized recursion over all warp paths."""
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2)
    n, m = d.shape
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def rec(i, j):
        if i == 0 and j == 0:
            return int(d[0, 0])
        best = min(
            (rec(i - 1, j) if i else 1 << 60),
            (rec(i, j - 1) if j else 1 << 60),
            (rec(i - 1, j - 1) if i and j else 1 << 60),
        )
        return int(d[i, j]) + best

    return rec(n - 1, m - 1)


def test_dtw_matches_bruteforce_random():
    rng = np.random.default_rng(7)
    for _ in range(25):
        n, m = rng.integers(2, 9, size=2)
        a = rng.integers(0, 65536, size=(n, 2)).astype(np.int64)
        b = rng.integers(0, 65536, size=(m, 2)).astype(np.int64)
        assert dtw_sq_int(a, b) == dtw_brute(a, b)


def test_dtw_identical_curves_zero():
    a = np.array([[0, 0], [10, 10], [20, 5]], dtype=np.int64)
    assert dtw_sq_int(a, a) == 0


def test_dtw_accumulates_where_frechet_maxes():
    # two curves offset by a constant 3 in y: every aligned step costs 9,
    # so DTW = 9 * path_len while Fréchet would be 9.
    a = np.stack([np.arange(5, dtype=np.int64), np.zeros(5, np.int64)], axis=1)
    b = a + np.array([0, 3], dtype=np.int64)
    assert dtw_sq_int(a, b) == 9 * 5


def test_dtw_time_shift_cheap():
    # DTW absorbs a time shift: b repeats a vertex; cost stays 0.
    a = np.array([[0, 0], [5, 0], [10, 0]], dtype=np.int64)
    b = np.array([[0, 0], [0, 0], [5, 0], [10, 0]], dtype=np.int64)
    assert dtw_sq_int(a, b) == 0


def _chamfer_field(v: np.ndarray) -> np.ndarray:
    """Run the same two-scan chamfer the stage uses, standalone."""
    g = v.shape[0]
    thr = (int(v.max()) + 1) // 2
    src = v >= thr
    inf = np.int64(1) << 40
    d = np.where(src, np.int64(0), inf)
    idx = np.arange(g, dtype=np.int64)
    for i in range(g):
        if i:
            np.minimum(d[i], d[i - 1] + 1, out=d[i])
        d[i] = np.minimum.accumulate(d[i] - idx) + idx
    for i in range(g - 1, -1, -1):
        if i < g - 1:
            np.minimum(d[i], d[i + 1] + 1, out=d[i])
        d[i] = (np.minimum.accumulate((d[i] + idx)[::-1])[::-1]) - idx
    return d


def test_chamfer_matches_bruteforce_random():
    rng = np.random.default_rng(11)
    for _ in range(20):
        g = int(rng.integers(3, 17))
        v = rng.integers(0, 8, size=(g, g)).astype(np.int64)
        d = _chamfer_field(v)
        thr = (int(v.max()) + 1) // 2
        sx, sy = np.nonzero(v >= thr)
        assert len(sx) >= 1
        bx, by = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
        brute = (np.abs(bx[:, :, None] - sx[None, None, :])
                 + np.abs(by[:, :, None] - sy[None, None, :])).min(axis=2)
        np.testing.assert_array_equal(d, brute)


def test_chamfer_single_source_corner():
    v = np.zeros((5, 5), dtype=np.int64)
    v[0, 0] = 3
    d = _chamfer_field(v)
    bx, by = np.meshgrid(np.arange(5), np.arange(5), indexing="ij")
    np.testing.assert_array_equal(d, bx + by)


def test_readability_kernel(ray_session):
    import pyarrow as pa
    import ray

    from gtfs_conflation_pipeline_ray.stages.textops import readability

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["Short words only. Yes!", "gigantic vocabulary flourishes", ""],
    }))
    out = readability(docs).to_pandas().set_index("doc_id")
    # doc 1: 4 words, 2 sentences, 0 long -> 4*1000//2 = 2000
    assert out.loc[1, "n_words"] == 4
    assert out.loc[1, "n_sentences"] == 2
    assert out.loc[1, "lix_q"] == 2000
    # doc 2: 3 words all >=7 chars, 0 sentences -> 3000 + 100000
    assert out.loc[2, "n_long"] == 3
    assert out.loc[2, "lix_q"] == 3 * 1000 // 1 + 3 * 100000 // 3
    # empty doc: all zeros
    assert out.loc[3, "lix_q"] == 0


def test_stride_pick_duplicates_kept():
    xy = np.array([[0, 0], [1, 1]], dtype=np.int64)
    p = stride_pick(xy, 24)
    assert len(p) == 24 and (p[0] == [0, 0]).all() and (p[-1] == [1, 1]).all()
