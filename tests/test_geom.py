"""Geometry kernel tests vs independent brute-force oracles."""

import numpy as np

from gtfs_conflation_pipeline_ray.functions import geom


def _rand_line(rng, n):
    return np.cumsum(rng.normal(0, 10, size=(n, 2)), axis=0)


def test_length_and_cum():
    line = np.array([[0.0, 0.0], [3.0, 4.0], [3.0, 10.0]])
    assert geom.polyline_length(line) == 11.0
    assert geom.cum_lengths(line).tolist() == [0.0, 5.0, 11.0]


def test_project_points_matches_bruteforce():
    rng = np.random.default_rng(5)
    line = _rand_line(rng, 20)
    pts = rng.normal(0, 30, size=(50, 2))
    d, along = geom.project_points(pts, line)
    # brute force: sample densely along the line
    dense = geom.resample(line, 20000)
    cl_d = geom.cum_lengths(dense)
    for i in range(50):
        dd = np.hypot(*(dense - pts[i]).T)
        j = np.argmin(dd)
        assert abs(d[i] - dd[j]) < 0.05
        assert abs(along[i] - cl_d[j]) < geom.polyline_length(line) / 1000 + 0.1


def test_monotonic_fit_no_backtracking():
    rng = np.random.default_rng(6)
    line = _rand_line(rng, 30)
    # points along the line in order, with noise
    t = np.sort(rng.uniform(0, 1, 10))
    cl = geom.cum_lengths(line)
    pts = np.vstack([geom.line_slice_along(line, v * cl[-1], v * cl[-1])[0] for v in t])
    pts += rng.normal(0, 1, pts.shape)
    dev, along = geom.fit_points_monotonic(pts, line)
    assert (np.diff(along) >= -1e-9).all()  # monotone
    free_dev, _ = geom.project_points(pts, line)
    assert (dev + 1e-9 >= free_dev).all()  # constrained >= unconstrained


def test_monotonic_fit_handles_backtracking_candidates():
    # U-shaped line: naive nearest-point snapping would backtrack
    line = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    pts = np.array([[1, -1], [9, 1], [9, 9], [1, 11]], dtype=float)
    dev, along = geom.fit_points_monotonic(pts, line)
    assert (np.diff(along) >= 0).all()


def test_line_slice_along():
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    sl = geom.line_slice_along(line, 2.0, 7.0)
    assert np.allclose(sl[0], [2, 0]) and np.allclose(sl[-1], [7, 0])
    assert abs(geom.polyline_length(sl) - 5.0) < 1e-9
    # slices tile the line
    total = sum(
        geom.polyline_length(geom.line_slice_along(line, 10 * i / 3, 10 * (i + 1) / 3))
        for i in range(3)
    )
    assert abs(total - 10.0) < 1e-9


def test_rdp_keeps_endpoints_and_tolerance():
    rng = np.random.default_rng(8)
    line = _rand_line(rng, 100)
    simp = geom.rdp_simplify(line, 5.0)
    assert (simp[0] == line[0]).all() and (simp[-1] == line[-1]).all()
    assert len(simp) <= len(line)
    # every original vertex is within tol-ish of the simplified line
    d, _ = geom.project_points(line, simp)
    assert d.max() <= 5.0 + 1e-6


def test_frechet_known_values():
    a = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    b = a + [0.0, 3.0]
    assert abs(geom.frechet_distance(a, b) - 3.0) < 1e-12
    assert geom.frechet_distance(a, a) == 0.0
    # frechet >= hausdorff always
    rng = np.random.default_rng(9)
    x, y = _rand_line(rng, 15), _rand_line(rng, 12)
    assert geom.frechet_distance(x, y) >= geom.hausdorff_distance(x, y) - 1e-9


def test_resample_preserves_endpoints():
    rng = np.random.default_rng(10)
    line = _rand_line(rng, 17)
    r = geom.resample(line, 64)
    assert len(r) == 64
    assert np.allclose(r[0], line[0]) and np.allclose(r[-1], line[-1])
    assert abs(geom.polyline_length(r) - geom.polyline_length(line)) < geom.polyline_length(line) * 0.05


def test_bearing_splits():
    line = np.array([[0, 0], [10, 0], [20, 0], [20, 10], [20, 20]], dtype=float)
    parts = geom.bearing_splits(line, 67.5)  # 90-degree turn at (20,0)
    assert len(parts) == 2
    assert (parts[0][-1] == parts[1][0]).all()
    straight = np.array([[0, 0], [5, 0], [10, 0]], dtype=float)
    assert len(geom.bearing_splits(straight, 67.5)) == 1


def test_cospatial_intervals():
    a = np.array([[0, 0], [100, 0]], dtype=float)
    b = np.array([[30, 1], [60, 1]], dtype=float)  # near A between x=30..60
    iv = geom.cospatial_intervals(a, b, buffer_dist=2.0, step=1.0)
    assert len(iv) == 1
    s, e = iv[0]
    assert abs(s - 30) <= 2 and abs(e - 60) <= 2
    # disjoint line -> no intervals
    far = np.array([[0, 100], [100, 100]], dtype=float)
    assert geom.cospatial_intervals(a, far, 2.0, 1.0) == []


def test_merge_chains_roundtrip():
    line = np.array([[0, 0], [10, 0], [20, 0], [30, 0]], dtype=float)
    slices = [geom.line_slice_along(line, 10 * i, 10 * (i + 1)) for i in range(3)]
    merged = geom.merge_chains(slices, tol=1e-9)
    assert len(merged) == 1
    assert abs(geom.polyline_length(merged[0]) - 30.0) < 1e-9
    # disconnected pieces stay separate
    apart = [np.array([[0, 0], [1, 0]], dtype=float), np.array([[50, 50], [51, 50]], dtype=float)]
    assert len(geom.merge_chains(apart, tol=0.5)) == 2


def test_rotfrechet_sweep_recovers_rotation():
    """A second half that is (approximately) the first half rotated by ~9°
    must score far better under the rotation sweep than at angle 0, and the
    sweep must pick the counter-rotating grid angle."""
    import numpy as np

    from gtfs_conflation_pipeline_ray.stages.segments import (
        ROT_CS, frechet_sq_int, stride_pick)

    rng = np.random.default_rng(5)
    # a wiggly integer curve, far from the origin
    t = np.arange(40)
    ax = 5000 + t * 97 + rng.integers(-20, 20, size=40)
    ay = 7000 + (t * t) % 900 + rng.integers(-20, 20, size=40)
    a = np.stack([ax, ay], axis=1).astype(np.int64)
    # rotate by the grid's +2 matrix (9°) around a's first vertex
    _, c, s = next(r for r in ROT_CS if r[0] == 2)
    rel = a - a[0]
    b = np.stack([rel[:, 0] * c - rel[:, 1] * s,
                  rel[:, 0] * s + rel[:, 1] * c], axis=1) // 1024 + a[0]

    def score(k):
        kk, c2, s2 = next(r for r in ROT_CS if r[0] == k)
        aa = (stride_pick(a, 32) - a[0]) * np.int64(1024)
        b0 = stride_pick(b, 32) - b[0]
        rb = np.stack([b0[:, 0] * c2 - b0[:, 1] * s2,
                       b0[:, 0] * s2 + b0[:, 1] * c2], axis=1)
        return int(frechet_sq_int(aa, rb))

    scores = {k: score(k) for k, _, _ in ROT_CS}
    best = min(scores, key=lambda k: (scores[k], k))
    assert best == -2  # counter-rotation undoes the applied +2 rotation
    assert scores[-2] * 4 < scores[0]  # sweep win is decisive, not noise


def test_convex_hull_int_properties():
    import numpy as np

    from gtfs_conflation_pipeline_ray.functions.geom import (
        convex_hull_int, shoelace_area2)

    rng = np.random.default_rng(17)
    for _ in range(50):
        n = int(rng.integers(1, 40))
        pts = rng.integers(0, 200, size=(n, 2)).astype(np.int64)
        hull = convex_hull_int(pts)
        pset = {tuple(p) for p in pts}
        assert all(tuple(h) in pset for h in hull)  # vertices ⊆ input
        if len(hull) >= 3:
            # strict convexity + CCW: every consecutive triple turns left
            m = len(hull)
            for i in range(m):
                a, b, c = hull[i], hull[(i + 1) % m], hull[(i + 2) % m]
                cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
                assert cross > 0
            # every input point is inside or on the hull (left of every edge)
            for p in pts:
                for i in range(m):
                    a, b = hull[i], hull[(i + 1) % m]
                    assert (b[0] - a[0]) * (p[1] - a[1]) \
                        - (b[1] - a[1]) * (p[0] - a[0]) >= 0
            assert shoelace_area2(hull) > 0
        else:
            # degenerate: all points collinear (or identical)
            if len(pts) >= 3:
                a = pts[0]
                d = None
                for p in pts[1:]:
                    v = p - a
                    if v.any():
                        if d is None:
                            d = v
                        else:
                            assert d[0] * v[1] - d[1] * v[0] == 0
