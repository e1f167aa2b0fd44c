"""Exact cospatiality, similarity comparator, and metadata path merge —
brute-force oracles for the new geometry kernels."""

import numpy as np

from gtfs_conflation_pipeline_ray.functions import geom


def _brute_cospatial(a, b, r, n=20001):
    """Dense-sampling reference: fraction/intervals of A within r of B."""
    total = geom.polyline_length(a)
    samples = geom.resample(a, n)
    d, _ = geom.project_points(samples, b)
    inside = d <= r
    alongs = np.linspace(0.0, total, n)
    # total inside length (trapezoid on the 0/1 indicator is fine at this res)
    return float(inside[:-1].sum() * (alongs[1] - alongs[0]))


def test_cospatial_exact_simple_overlap():
    a = np.array([[0.0, 0.0], [10.0, 0.0]])
    b = np.array([[3.0, 0.5], [7.0, 0.5]])
    iv = geom.cospatial_intervals_exact(a, b, buffer_dist=1.0)
    assert len(iv) == 1
    lo, hi = iv[0]
    # within 1.0 of b's endpoints: x in [3 - sqrt(1-.25), 7 + sqrt(1-.25)]
    ex = np.sqrt(1.0 - 0.25)
    assert abs(lo - (3.0 - ex)) < 1e-9
    assert abs(hi - (7.0 + ex)) < 1e-9


def test_cospatial_exact_disjoint_islands():
    a = np.array([[0.0, 0.0], [20.0, 0.0]])
    b = np.array([[2.0, 0.0], [4.0, 0.0], [4.0, 50.0], [14.0, 50.0],
                  [14.0, 0.0], [16.0, 0.0]])
    iv = geom.cospatial_intervals_exact(a, b, buffer_dist=1.0)
    assert len(iv) == 2
    assert abs(iv[0][0] - 1.0) < 1e-9 and abs(iv[0][1] - 5.0) < 1e-9
    assert abs(iv[1][0] - 13.0) < 1e-9 and abs(iv[1][1] - 17.0) < 1e-9


def test_cospatial_exact_matches_dense_sampling():
    rng = np.random.default_rng(5)
    for _ in range(10):
        a = np.cumsum(rng.normal(0, 3, (12, 2)), axis=0)
        b = np.cumsum(rng.normal(0, 3, (9, 2)), axis=0)
        exact = sum(hi - lo for lo, hi in
                    geom.cospatial_intervals_exact(a, b, buffer_dist=2.5))
        brute = _brute_cospatial(a, b, 2.5)
        assert abs(exact - brute) < geom.polyline_length(a) / 1000.0


def test_cospatial_min_len_cleanup():
    a = np.array([[0.0, 0.0], [100.0, 0.0]])
    b = np.array([[50.0, 1.0], [50.0, 2.0]])  # tiny touch window around x=50
    all_iv = geom.cospatial_intervals_exact(a, b, buffer_dist=1.05)
    assert len(all_iv) == 1 and (all_iv[0][1] - all_iv[0][0]) < 1.0
    assert geom.cospatial_intervals_exact(a, b, 1.05, min_len=2.0) == []


def test_hausdorff_int_matches_float_kernel_and_brute():
    """The integer-exact halves kernel (stages/segments.shape_hausdorff_halves
    math) must agree with a per-point brute force AND with the float
    geom.hausdorff_distance (squared) on integer inputs."""
    rng = np.random.default_rng(7)
    for _ in range(25):
        na, nb = rng.integers(1, 30, 2)
        a = rng.integers(0, 65536, (int(na), 2)).astype(np.int64)
        b = rng.integers(0, 65536, (int(nb), 2)).astype(np.int64)
        d2 = ((a[:, None, 0] - b[None, :, 0]) ** 2
              + (a[:, None, 1] - b[None, :, 1]) ** 2)
        h_ab, h_ba = int(d2.min(axis=1).max()), int(d2.min(axis=0).max())
        brute_ab = max(min((int(px) - int(qx)) ** 2 + (int(py) - int(qy)) ** 2
                           for qx, qy in b) for px, py in a)
        brute_ba = max(min((int(px) - int(qx)) ** 2 + (int(py) - int(qy)) ** 2
                           for qx, qy in a) for px, py in b)
        assert (h_ab, h_ba) == (brute_ab, brute_ba)
        h = geom.hausdorff_distance(a.astype(np.float64), b.astype(np.float64))
        assert abs(h * h - max(h_ab, h_ba)) <= 1e-6 * max(1.0, h * h)


def test_line_similarity_identical_and_divergent():
    a = np.array([[0.0, 0.0], [10.0, 0.0], [20.0, 0.0]])
    assert geom.line_similarity(a, a.copy(), buffer_dist=0.5) == 0.0
    # same shape, shifted start: zero diff after translation but penalized > 0
    b = a + np.array([3.0, 4.0])
    assert geom.line_similarity(a, b, buffer_dist=0.5) == 0.0  # diff_len 0 -> 0
    # orthogonal line: full length diff
    c = np.array([[0.0, 0.0], [0.0, 10.0], [0.0, 20.0]])
    s = geom.line_similarity(a, c, buffer_dist=0.5)
    assert 18.0 < s < 20.1


def test_merge_paths_by_ids():
    # suffix/prefix splice
    assert geom.merge_paths_by_ids([[1, 2, 3], [3, 4, 5]]) == [[1, 2, 3, 4, 5]]
    # longest overlap preferred
    assert geom.merge_paths_by_ids([[1, 2, 3], [2, 3, 4]]) == [[1, 2, 3, 4]]
    # subset removal (D5)
    assert geom.merge_paths_by_ids([[1, 2, 3, 4], [2, 3]]) == [[1, 2, 3, 4]]
    # duplicate keeps one
    assert geom.merge_paths_by_ids([[7, 8], [7, 8]]) == [[7, 8]]
    # disjoint stays apart
    out = geom.merge_paths_by_ids([[1, 2], [5, 6]])
    assert sorted(map(tuple, out)) == [(1, 2), (5, 6)]
    # chain of three splices to one
    assert geom.merge_paths_by_ids([[1, 2], [2, 3], [3, 4]]) == [[1, 2, 3, 4]]


def test_union_paths_fixpoint():
    a = np.array([[0.0, 0.0], [1.0, 0.0]])
    b = np.array([[1.0, 0.0], [2.0, 0.0]])
    c = np.array([[5.0, 5.0], [6.0, 5.0]])
    # metadata splice: suffix/prefix id overlap joins a+b; c stays apart
    ps, ids = geom.union_paths_fixpoint([a, b, c], [[1, 2], [2, 3], [9]], tol=0.1)
    assert sorted(map(tuple, ids)) == [(1, 2, 3), (9,)]
    joined = ps[[tuple(i) for i in ids].index((1, 2, 3))]
    assert np.allclose(joined, [[0, 0], [1, 0], [2, 0]])
    # geospatial merge joins disjoint-id paths whose ends touch within tol
    d = np.array([[2.0, 0.0], [3.0, 0.0]])
    ps2, ids2 = geom.union_paths_fixpoint([a, d], [[1], [7]], tol=1.5)
    assert len(ps2) == 1 and ids2 == [[1, 7]]
    # subset path absorbed (D5)
    ps3, ids3 = geom.union_paths_fixpoint([a, b], [[1, 2, 3], [2]], tol=0.0)
    assert ids3 == [[1, 2, 3]]
    # alternation reaches fixpoint: metadata join enables a geospatial join
    e = np.array([[0.0, 0.0], [1.0, 0.0]])
    f = np.array([[1.0, 0.0], [2.0, 0.0]])
    g2 = np.array([[2.5, 0.0], [3.0, 0.0]])
    ps4, ids4 = geom.union_paths_fixpoint([e, f, g2], [[1, 2], [2, 3], [8]], tol=0.6)
    assert len(ps4) == 1


def test_union_paths_by_ids_geo():
    # id-centric variant (the path_linestrings oracle mirror): geometry is
    # the centroid chain of the id list, merges are pure-integer decisions
    centro = {1: (0, 0), 2: (1, 0), 3: (2, 0), 7: (3, 0), 9: (50, 50),
              8: (4, 0)}
    # metadata splice joins [1,2]+[2,3]; [9] stays apart
    out = geom.union_paths_by_ids_geo([[1, 2], [2, 3], [9]], centro, tol2=0)
    assert sorted(map(tuple, out)) == [(1, 2, 3), (9,)]
    # geospatial concat: end of [1,2,3] at (2,0) within tol of [7] at (3,0)
    out2 = geom.union_paths_by_ids_geo([[1, 2], [2, 3], [7]], centro, tol2=1)
    assert out2 == [[1, 2, 3, 7]]
    # subset absorbed before any geo action
    out3 = geom.union_paths_by_ids_geo([[1, 2, 3], [2]], centro, tol2=0)
    assert out3 == [[1, 2, 3]]
    # geo concat enables a follow-up metadata splice: [1,2]+geo[3] -> then
    # [3,8] splices onto the tail
    out4 = geom.union_paths_by_ids_geo([[1, 2], [3], [3, 8]], centro, tol2=1)
    assert out4 == [[1, 2, 3, 8]]
    # first-lex (i, j) scan order: both (0->1) and (0->2) are in range;
    # j = 1 wins, then the remainder concatenates
    out5 = geom.union_paths_by_ids_geo([[1], [2], [3]], centro, tol2=1)
    assert out5 == [[1, 2, 3]]
    # engine/emission parity fixture used by the SQL oracle comment: the
    # encoded-BIGINT predicate equals this integer predicate by construction
    assert geom.union_paths_by_ids_geo([[9], [1]], centro, tol2=1) == [[9], [1]]


def test_coords_to_vertex_ids():
    a = np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 4.0]])
    b = np.array([[3.0, 4.0], [1.0, 2.0], [9.0, 9.0]])
    ia, ib = geom.coords_to_vertex_ids(a, b)
    # first-appearance dense ids
    assert ia.tolist() == [0, 1, 2]
    # shared vertices get the SAME id across lines
    assert ib[0] == ia[2] and ib[1] == ia[1]
    assert ib[2] == 3  # new vertex -> next id
    # self-sharing within one line
    c = np.array([[5.0, 5.0], [6.0, 6.0], [5.0, 5.0]])
    (ic,) = geom.coords_to_vertex_ids(c)
    assert ic[0] == ic[2] and ic[0] != ic[1]


def test_points_within_polyline_exact_vs_float():
    rng = np.random.default_rng(11)
    for _ in range(20):
        pts = rng.integers(-500, 500, (40, 2)).astype(np.int64)
        poly = np.cumsum(rng.integers(-80, 80, (7, 2)), axis=0).astype(np.int64)
        buf = 60
        got = geom.points_within_polyline_exact(pts, poly, buf * buf)
        d, _ = geom.project_points(pts.astype(np.float64), poly.astype(np.float64))
        want = d <= buf + 1e-9
        # exclude knife-edge ties where float roundoff is ambiguous
        clear = np.abs(d - buf) > 1e-6
        assert (got[clear] == want[clear]).all()


def test_line_similarity_exact_basics():
    a = np.array([[0, 0], [1000, 0], [2000, 0]], dtype=np.int64)
    # identical -> 0
    assert geom.line_similarity_exact(a, a.copy(), buffer_dist=50) == 0.0
    # same shape translated: cospatial after translation, penalty x0 diff = 0
    b = a + np.array([300, 400])
    assert geom.line_similarity_exact(a, b, buffer_dist=50) == 0.0
    # orthogonal: nothing cospatial -> full cents length, no start penalty
    c = np.array([[0, 0], [0, 1000], [0, 2000]], dtype=np.int64)
    s = geom.line_similarity_exact(a, c, buffer_dist=50)
    assert s == 200000.0  # 2000 units = 200000 cents, start dist 0 -> x1
    # degenerate input
    assert geom.line_similarity_exact(a[:1], c, 50) == float("inf")


def test_shape_merge_roundtrip_stage(ray_session):
    """Integer-exact slice->merge roundtrip: 1 part for ordinary shapes,
    3 parts when the middle chunk is jittered apart (uid%5==0), real
    merge_chains doing the joining, lengths = sum of quantized seg lengths."""
    import pandas as pd
    import pyarrow as pa

    from gtfs_conflation_pipeline_ray.stages import segments as sg

    ray = ray_session
    rows = []
    rng = np.random.default_rng(7)
    for uid in range(1, 12):  # uid 5 and 10 jittered
        n = int(rng.integers(4, 30))
        for k in range(n):
            rows.append({"user_id": uid, "ts": k, "event_id": uid * 1000 + k,
                         "ex": int(rng.integers(0, 60000)),
                         "ey": int(rng.integers(0, 60000))})
    # degenerate shapes: single point (0 parts) and 3 points (1 part, no cut)
    rows.append({"user_id": 50, "ts": 0, "event_id": 1, "ex": 5, "ey": 5})
    for k in range(3):
        rows.append({"user_id": 51, "ts": k, "event_id": 2 + k,
                     "ex": 10 * k, "ey": 0})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    got = sg.shape_merge_roundtrip(ds).to_pandas().set_index("user_id")
    for uid in range(1, 12):
        expect_parts = 3 if uid % 5 == 0 else 1
        assert got.loc[uid, "merged_parts"] == expect_parts, uid
        pts = pd.DataFrame([r for r in rows if r["user_id"] == uid])
        xyi = pts.sort_values(["ts", "event_id"])[["ex", "ey"]].to_numpy(np.int64)
        assert got.loc[uid, "merged_len_q2"] == sg.seg_len_c(xyi).sum()
    assert got.loc[50, "merged_parts"] == 0 and got.loc[50, "merged_len_q2"] == 0
    assert got.loc[51, "merged_parts"] == 1


def test_shape_merge_roundtrip_coincidence_sentinel(ray_session):
    """A cut-vertex coincidence (a.end == c.start) must yield the -1 sentinel
    on the engine side (the SQL mirror computes the same predicate)."""
    import pandas as pd

    from gtfs_conflation_pipeline_ray.stages import segments as sg

    ray = ray_session
    # 6 points; cuts at k1=2, k2=4 (0-based); make v2 == v4 exactly
    xs = [0, 10, 20, 30, 20, 50]
    ys = [0, 0, 7, 0, 7, 0]
    rows = [{"user_id": 1, "ts": k, "event_id": k, "ex": xs[k], "ey": ys[k]}
            for k in range(6)]
    got = sg.shape_merge_roundtrip(
        ray.data.from_pandas(pd.DataFrame(rows))).to_pandas()
    assert got["merged_parts"].iloc[0] == -1
    assert got["merged_len_q2"].iloc[0] == -1
