"""Hilbert-curve key kernel + segment×rect span join: brute-force parity.

The Hilbert transform is checked against an independent scalar reference
implementation, its own inverse (bijection), and the defining locality
property (every consecutive pair of curve positions is one unit grid step —
the property Morton does NOT have). The rect-span join is checked against a
dense point-sampling oracle on small worlds, including touching, collinear,
degenerate-point and containment cases.
"""

import numpy as np
import pyarrow as pa
import pytest

from gtfs_conflation_pipeline_ray.functions.cells import hilbert_d, hilbert_xy


def _hilbert_scalar(x: int, y: int, order: int = 16) -> int:
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_scalar_reference():
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 65536, 500)
    ys = rng.integers(0, 65536, 500)
    d = hilbert_d(xs, ys)
    for i in range(len(xs)):
        assert d[i] == _hilbert_scalar(int(xs[i]), int(ys[i]))


def test_hilbert_bijection_and_unit_steps():
    order = 5
    n = 1 << order
    ds = np.arange(n * n, dtype=np.int64)
    x, y = hilbert_xy(ds, order=order)
    # bijection: round-trips, and covers every cell exactly once
    assert hilbert_d(x, y, order=order).tolist() == ds.tolist()
    assert len(set(zip(x.tolist(), y.tolist()))) == n * n
    # locality: consecutive curve positions are unit grid steps
    steps = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (steps == 1).all()


def _seg_rect_hit_brute(ax, ay, bx, by, x0, y0, x1, y1) -> bool:
    """Dense-parameter sampling oracle: any sampled point of the segment
    inside the closed rect (with endpoints checked exactly)."""
    for t in np.linspace(0.0, 1.0, 4001):
        px = ax + t * (bx - ax)
        py = ay + t * (by - ay)
        if x0 - 1e-9 <= px <= x1 + 1e-9 and y0 - 1e-9 <= py <= y1 + 1e-9:
            return True
    return False


def test_segment_rect_spans_brute_force(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.spatial import segment_rect_spans

    rng = np.random.default_rng(11)
    n_r = 40
    x0 = rng.integers(0, 900, n_r)
    y0 = rng.integers(0, 900, n_r)
    rects = pa.table({
        "tile_id": np.arange(n_r, dtype=np.int64),
        "x0": x0, "y0": y0,
        "x1": x0 + rng.integers(1, 120, n_r),
        "y1": y0 + rng.integers(1, 120, n_r),
    })
    n_s = 120
    ax = rng.integers(0, 1000, n_s)
    ay = rng.integers(0, 1000, n_s)
    segs = {
        "seg_id": np.arange(n_s, dtype=np.int64),
        "ax": ax, "ay": ay,
        "bx": ax + rng.integers(-150, 151, n_s),
        "by": ay + rng.integers(-150, 151, n_s),
    }
    # force edge cases: a degenerate point segment inside rect 0, one touching
    # rect 0's corner, and one collinear with rect 0's top edge
    rx0, ry0 = int(rects["x0"][0].as_py()), int(rects["y0"][0].as_py())
    rx1, ry1 = int(rects["x1"][0].as_py()), int(rects["y1"][0].as_py())
    segs["ax"][0] = segs["bx"][0] = (rx0 + rx1) // 2
    segs["ay"][0] = segs["by"][0] = (ry0 + ry1) // 2
    segs["ax"][1], segs["ay"][1] = rx1, ry1
    segs["bx"][1], segs["by"][1] = rx1 + 50, ry1 + 50
    segs["ax"][2], segs["ay"][2] = rx0 - 30, ry1
    segs["bx"][2], segs["by"][2] = rx1 + 30, ry1

    ds = ray.data.from_arrow(pa.table({k: np.asarray(v, np.int64)
                                       for k, v in segs.items()}))
    out = segment_rect_spans(ds, ray.put(rects), carry_cols=["seg_id"]).to_pandas()
    got = dict(zip(out["seg_id"], out["n_tiles"]))

    X0 = rects["x0"].to_numpy()
    Y0 = rects["y0"].to_numpy()
    X1 = rects["x1"].to_numpy()
    Y1 = rects["y1"].to_numpy()
    for i in range(n_s):
        expect = sum(
            _seg_rect_hit_brute(segs["ax"][i], segs["ay"][i],
                                segs["bx"][i], segs["by"][i],
                                X0[j], Y0[j], X1[j], Y1[j])
            for j in range(n_r))
        assert got.get(int(segs["seg_id"][i]), 0) == expect, f"seg {i}"
    # the planted edge cases actually hit rect 0
    assert got.get(0, 0) >= 1 and got.get(1, 0) >= 1 and got.get(2, 0) >= 1


def test_hilbert_beats_morton_locality():
    """More grid-adjacent point pairs are IMMEDIATE curve neighbors
    (|Δkey| == 1) under Hilbert than under Morton — the defensible locality
    claim (Hilbert's mean |Δkey| is NOT smaller: it trades rare huge jumps
    for a much fatter |Δ|==1 mass, which is what block-pruning cares
    about). Measured on a full 32×32 grid: ~52% vs ~26%."""
    from gtfs_conflation_pipeline_ray.functions.cells import morton_encode

    order = 5
    n = 1 << order
    gx, gy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    x = gx.ravel().astype(np.int64)
    y = gy.ravel().astype(np.int64)
    h = hilbert_d(x, y, order=order)
    m = morton_encode(x, y).astype(np.int64)
    right = x + 1 < n
    down = y + 1 < n
    hj = np.concatenate([
        np.abs(h[right] - hilbert_d(x[right] + 1, y[right], order=order)),
        np.abs(h[down] - hilbert_d(x[down], y[down] + 1, order=order))])
    mj = np.concatenate([
        np.abs(m[right] - morton_encode(x[right] + 1, y[right]).astype(np.int64)),
        np.abs(m[down] - morton_encode(x[down], y[down] + 1).astype(np.int64))])
    assert (hj == 1).mean() > (mj == 1).mean()
    assert np.median(hj) <= np.median(mj)
