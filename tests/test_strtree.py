"""STRtree backend: parity vs GridIndex and vs brute force.

The two index backends must be interchangeable — same probe surface, same
results — so every probe is checked three ways: STRtree vs brute force,
STRtree vs GridIndex, and on adversarial shapes (skewed extents, duplicate
centers, short last node) that exercise the packing edge cases.
"""

import numpy as np
import pytest

from gtfs_conflation_pipeline_ray.state.grid_index import GridIndex
from gtfs_conflation_pipeline_ray.state.strtree import STRtree, _str_order


def _random_rects(rng, n, world=65536, max_half=900, skew=False):
    cx = rng.integers(0, world, n)
    cy = rng.integers(0, world, n)
    if skew:  # heavy-tailed extents: a few continent-sized rects
        half = (rng.pareto(1.5, n) * 40).astype(np.int64) + 1
        half = np.minimum(half, world // 3)
    else:
        half = rng.integers(1, max_half, n)
    x0 = np.maximum(cx - half, 0)
    x1 = np.minimum(cx + half, world - 1)
    y0 = np.maximum(cy - half, 0)
    y1 = np.minimum(cy + half, world - 1)
    tid = rng.permutation(n).astype(np.int64)  # ids independent of position
    return tid, x0, y0, x1, y1


def _pairs_set(a, b):
    return set(zip(a.tolist(), b.tolist()))


@pytest.mark.parametrize("n,cap,skew", [(0, 16, False), (1, 16, False),
                                        (15, 16, False), (16, 4, False),
                                        (1000, 16, False), (1000, 7, True),
                                        (4097, 16, True)])
def test_query_points_matches_brute(n, cap, skew):
    rng = np.random.default_rng(42 + n + cap)
    tid, x0, y0, x1, y1 = _random_rects(rng, n, skew=skew)
    tree = STRtree(tid, x0, y0, x1, y1, node_cap=cap)
    px = rng.integers(0, 65536, 500)
    py = rng.integers(0, 65536, 500)
    qi, ti = tree.query_points(px, py)
    # brute force (inclusive bounds)
    m = (px[:, None] >= x0) & (px[:, None] <= x1) & (py[:, None] >= y0) & (py[:, None] <= y1)
    bq, bt = np.nonzero(m)
    assert _pairs_set(qi, tid[ti]) == _pairs_set(bq, tid[bt])


@pytest.mark.parametrize("n,cap,skew", [(500, 16, False), (500, 16, True),
                                        (2000, 5, True)])
def test_query_rects_matches_brute_and_grid(n, cap, skew):
    rng = np.random.default_rng(7 + n)
    tid, x0, y0, x1, y1 = _random_rects(rng, n, skew=skew)
    tree = STRtree(tid, x0, y0, x1, y1, node_cap=cap)
    grid = GridIndex(tid, x0, y0, x1, y1)
    qtid, qx0, qy0, qx1, qy1 = _random_rects(rng, 300, skew=skew)
    tq, tt = tree.query_rects(qx0, qy0, qx1, qy1)
    gq, gt = grid.query_rects(qx0, qy0, qx1, qy1)
    m = (qx0[:, None] < x1) & (qx1[:, None] > x0) & (qy0[:, None] < y1) & (qy1[:, None] > y0)
    bq, bt = np.nonzero(m)
    want = _pairs_set(bq, tid[bt])
    assert _pairs_set(tq, tid[tt]) == want
    assert _pairs_set(gq, tid[gt]) == want


@pytest.mark.parametrize("n,k,skew", [(50, 1, False), (50, 5, False),
                                      (1000, 3, False), (1000, 8, True),
                                      (5000, 4, True), (37, 50, False)])
def test_knn_matches_grid_and_brute(n, k, skew):
    rng = np.random.default_rng(99 + n + k)
    tid, x0, y0, x1, y1 = _random_rects(rng, n, skew=skew)
    tree = STRtree(tid, x0, y0, x1, y1, node_cap=11)
    grid = GridIndex(tid, x0, y0, x1, y1)
    qx = rng.integers(0, 65536, 200)
    qy = rng.integers(0, 65536, 200)
    tq, tt, td = tree.knn_centroids(qx, qy, k)
    gq, gt, gd = grid.knn_centroids(qx, qy, k)
    # identical ordered result: (query, rank) -> (tile_id, d2)
    assert np.array_equal(tq, gq)
    assert np.array_equal(tid[tt], tid[gt])
    assert np.array_equal(td, gd)
    # brute-force spot check of the first query
    kk = min(k, n)
    cx, cy = (x0 + x1) // 2, (y0 + y1) // 2
    d2 = (int(qx[0]) - cx) ** 2 + (int(qy[0]) - cy) ** 2
    order = np.lexsort((tid, d2))[:kk]
    assert np.array_equal(td[:kk], d2[order])
    assert np.array_equal(tid[tt[:kk]], tid[order])


def test_knn_duplicate_centroids_tie_break():
    # many rects sharing one centroid: ties must break by tile_id ascending
    n = 40
    tid = np.arange(n, dtype=np.int64)[::-1].copy()
    x0 = np.full(n, 100, dtype=np.int64)
    y0 = np.full(n, 100, dtype=np.int64)
    x1 = np.full(n, 200, dtype=np.int64)
    y1 = np.full(n, 200, dtype=np.int64)
    tree = STRtree(tid, x0, y0, x1, y1, node_cap=8)
    qi, ti, d2 = tree.knn_centroids(np.array([150]), np.array([150]), 5)
    assert np.array_equal(tid[ti], np.array([0, 1, 2, 3, 4]))
    assert np.array_equal(d2, np.zeros(5, dtype=np.int64))


def test_str_order_groups_are_tight():
    # STR packing should beat random grouping on total leaf MBR area
    rng = np.random.default_rng(3)
    cx = rng.integers(0, 65536, 3000)
    cy = rng.integers(0, 65536, 3000)
    cap = 16

    def leaf_area(perm):
        starts = np.arange(0, len(perm), cap)
        w = np.maximum.reduceat(cx[perm], starts) - np.minimum.reduceat(cx[perm], starts)
        h = np.maximum.reduceat(cy[perm], starts) - np.minimum.reduceat(cy[perm], starts)
        return float((w.astype(np.float64) * h).sum())

    a_str = leaf_area(_str_order(cx, cy, cap))
    a_rand = leaf_area(rng.permutation(len(cx)))
    assert a_str < a_rand / 5  # packed leaves are far tighter than random


def test_tree_depth_and_pointers_consistent():
    rng = np.random.default_rng(11)
    tid, x0, y0, x1, y1 = _random_rects(rng, 2500, skew=True)
    tree = STRtree(tid, x0, y0, x1, y1, node_cap=9)
    # every level's child ranges tile the level below exactly once
    below_len = len(tree.x0)
    for lvl in range(len(tree.levels)):
        _, _, _, _, cs, cc = tree.levels[lvl]
        seen = np.zeros(below_len, dtype=np.int64)
        for s, c in zip(cs.tolist(), cc.tolist()):
            seen[s : s + c] += 1
        assert (seen == 1).all()
        below_len = len(cs)
    assert below_len <= tree.cap  # root run fits one dense scan
