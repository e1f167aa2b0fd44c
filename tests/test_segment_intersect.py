"""segment_intersect_counts: the bbox+orientation-sign predicate vs an
independent CLRS-style checker (directional tests + on-segment tests — a
different decomposition of the same geometry) over random segment sets, plus
pinned edge cases (touching endpoints, collinear overlap/disjoint, degenerate
zero-length probes)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from gtfs_conflation_pipeline_ray.stages.spatial import segment_intersect_counts


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _on_segment(p, q, r):
    """r collinear with pq: is r within pq's bbox?"""
    return (min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
            and min(p[1], q[1]) <= r[1] <= max(p[1], q[1]))


def _intersects_clrs(p1, p2, p3, p4):
    d1 = _cross(p3, p4, p1)
    d2 = _cross(p3, p4, p2)
    d3 = _cross(p1, p2, p3)
    d4 = _cross(p1, p2, p4)
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
            (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)):
        return True
    if d1 == 0 and _on_segment(p3, p4, p1):
        return True
    if d2 == 0 and _on_segment(p3, p4, p2):
        return True
    if d3 == 0 and _on_segment(p1, p2, p3):
        return True
    if d4 == 0 and _on_segment(p1, p2, p4):
        return True
    return False


def _run(segs, probes):
    seg_tab = pa.table({
        "tile_id": np.arange(len(segs), dtype=np.int64),
        "ax": np.array([s[0][0] for s in segs], np.int64),
        "ay": np.array([s[0][1] for s in segs], np.int64),
        "bx": np.array([s[1][0] for s in segs], np.int64),
        "by": np.array([s[1][1] for s in segs], np.int64),
    })
    pr = ray.data.from_pandas(pd.DataFrame({
        "px": np.array([p[0][0] for p in probes], np.int64),
        "py": np.array([p[0][1] for p in probes], np.int64),
        "qx": np.array([p[1][0] for p in probes], np.int64),
        "qy": np.array([p[1][1] for p in probes], np.int64),
    }))
    out = segment_intersect_counts(pr, ray.put(seg_tab)).to_pandas()
    return dict(zip(out.tile_id, out.n_cross))


def test_random_vs_clrs_bruteforce():
    rng = np.random.default_rng(11)
    # clustered coordinates so intersections actually happen
    segs = [((int(x), int(y)), (int(x + dx), int(y + dy)))
            for x, y, dx, dy in zip(rng.integers(0, 600, 120),
                                    rng.integers(0, 600, 120),
                                    rng.integers(-300, 301, 120),
                                    rng.integers(-300, 301, 120))]
    probes = [((int(x), int(y)), (int(x + dx), int(y + dy)))
              for x, y, dx, dy in zip(rng.integers(0, 600, 80),
                                      rng.integers(0, 600, 80),
                                      rng.integers(-200, 201, 80),
                                      rng.integers(-200, 201, 80))]
    got = _run(segs, probes)
    exp = {}
    for i, (a, b) in enumerate(segs):
        n = sum(_intersects_clrs(a, b, c, d) for c, d in probes)
        if n:
            exp[i] = n
    assert got == exp


def test_edge_cases_pinned():
    segs = [((0, 0), (10, 0))]
    probes = [
        ((10, 0), (20, 5)),    # touching at segment endpoint -> intersects
        ((5, 0), (5, 0)),      # degenerate point ON the segment -> intersects
        ((3, 0), (7, 0)),      # collinear overlap -> intersects
        ((11, 0), (20, 0)),    # collinear disjoint -> no
        ((5, 1), (5, 9)),      # crosses the LINE beyond the segment? no: above it
        ((5, -1), (5, 1)),     # proper crossing -> intersects
    ]
    got = _run(segs, probes)
    assert got == {0: 4}
