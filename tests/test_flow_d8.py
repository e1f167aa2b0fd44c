"""D8 flow direction + fixed-round flow accumulation."""

import numpy as np
import pandas as pd
import pyarrow as pa

D8 = [(0, 1, 0, 99), (1, 1, 1, 70), (2, 0, 1, 99), (3, -1, 1, 70),
      (4, -1, 0, 99), (5, -1, -1, 70), (6, 0, -1, 99), (7, 1, -1, 70)]


def _brute(cells: dict, rounds: int):
    """cells: {(cx,cy): v}. Returns {(cx,cy): (dir, acc)}."""
    dirs = {}
    for (cx, cy), v in cells.items():
        best_key, best_code = -1, -1
        for code, dx, dy, num in D8:
            nv = cells.get((cx + dx, cy + dy), 0)
            drop = v - nv
            if drop > 0:
                key = drop * num
                if key > best_key or (key == best_key and code < best_code):
                    if key > best_key:
                        best_key, best_code = key, code
        dirs[(cx, cy)] = best_code
    acc = {c: 1 for c in cells}
    for _ in range(rounds):
        nxt = {c: 1 for c in cells}
        for (cx, cy), d in dirs.items():
            if d >= 0:
                _, dx, dy, _n = D8[d]
                t = (cx + dx, cy + dy)
                if t in cells:
                    nxt[t] += acc[(cx, cy)]
        acc = nxt
    return {c: (dirs[c], acc[c]) for c in cells}


def _run_engine(cells: dict, rounds: int):
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    # one point per count, cell size 4 so px = cx*4 (+ jitter inside cell)
    xs, ys = [], []
    for (cx, cy), v in cells.items():
        for k in range(v):
            xs.append(cx * 4 + k % 4)
            ys.append(cy * 4 + (k // 4) % 4)
    ds = ray.data.from_arrow(pa.table({
        "px": np.array(xs, np.int64), "py": np.array(ys, np.int64)}))
    t = spatial.grid_flow_d8(ds, "px", "py", cell=4, rounds=rounds)
    return t.to_pandas().set_index(["cx", "cy"])


def test_flow_d8_vs_brute(ray_session):
    rng = np.random.default_rng(17)
    cells = {}
    for _ in range(60):
        c = (int(rng.integers(0, 8)), int(rng.integers(0, 8)))
        cells[c] = int(rng.integers(1, 13))
    got = _run_engine(cells, rounds=4)
    want = _brute(cells, rounds=4)
    assert len(got) == len(want)
    for c, (d, a) in want.items():
        assert (got.loc[c, "dir"], got.loc[c, "acc"]) == (d, a), c
        assert got.loc[c, "v"] == cells[c]


def test_flow_d8_trench_chain(ray_session):
    """A walled trench: interior trench cells have all 8 neighbors
    occupied, so flow follows the in-trench gradient southward and the
    trench mouth accumulates the whole chain. (Cells on the raster hull
    always drain off-raster instead — absent neighbors are elevation 0,
    the steepest drop there by construction — which the wall cells
    demonstrate.)"""
    cells = {}
    for y in range(5):
        cells[(0, y)] = 1000  # west wall
        cells[(2, y)] = 1000  # east wall
        cells[(1, y)] = 10 + y  # trench floor, higher northward
    got = _run_engine(cells, rounds=4)
    # interior trench cells flow south (code 6) down the floor gradient
    for y in (1, 2, 3):
        assert got.loc[(1, y), "dir"] == 6
    # trench mouth: south neighbor absent -> drains off-raster (some
    # absent-neighbor direction), but still collects the chain above it
    assert got.loc[(1, 0), "acc"] == 4  # itself + (1,1),(1,2),(1,3)
    # (1,4) is on the hull: N absent gives drop 14*99, the in-trench step
    # south only 1*99 -> drains north off-raster, contributes nothing
    assert got.loc[(1, 4), "dir"] == 2
    assert got.loc[(1, 4), "acc"] == 1
    # wall cells drain outward off-raster and accumulate nothing
    assert got.loc[(0, 2), "dir"] == 4  # west, absent
    assert got.loc[(2, 2), "dir"] == 0  # east, absent
    assert got.loc[(0, 2), "acc"] == 1


def test_flow_d8_diagonal_vs_cardinal_rational():
    """The 99/70 rational weighting prefers a cardinal drop of 5 over a
    diagonal drop of 7 (5*99=495 > 7*70=490) — exactly the sqrt(2)
    distance penalty."""
    from gtfs_conflation_pipeline_ray.stages.spatial import D8 as eng_d8

    assert eng_d8 == D8
    assert 5 * 99 > 7 * 70 and 5 * 99 < 8 * 70


def test_flow_basins_vs_brute(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    rng = np.random.default_rng(23)
    cells = {}
    for _ in range(70):
        c = (int(rng.integers(0, 8)), int(rng.integers(0, 8)))
        cells[c] = int(rng.integers(1, 13))
    # brute: follow D8 direction to terminal
    dirs = {c: _brute(cells, 0)[c][0] for c in cells}

    def term(c):
        seen = set()
        while True:
            assert c not in seen  # acyclicity of strict descent
            seen.add(c)
            d = dirs[c]
            if d < 0:
                return c
            _, dx, dy, _n = D8[d]
            t = (c[0] + dx, c[1] + dy)
            if t not in cells:
                return c
            c = t

    xs, ys = [], []
    for (cx, cy), v in cells.items():
        for k in range(v):
            xs.append(cx * 4 + k % 4)
            ys.append(cy * 4 + (k // 4) % 4)
    ds = ray.data.from_arrow(pa.table({
        "px": np.array(xs, np.int64), "py": np.array(ys, np.int64)}))
    got = (spatial.grid_flow_basins(ds, "px", "py", cell=4, doublings=7)
           .to_pandas().set_index(["cx", "cy"]))
    assert len(got) == len(cells)
    for c in cells:
        assert (got.loc[c, "bx"], got.loc[c, "by"]) == term(c), c


def test_flow_basins_long_chain(ray_session):
    """A strictly monotone 20-cell trench chain collapses to one terminal
    (needs ceil(log2(20)) = 5 doublings; run with exactly 5 to pin the
    2^k chain-length bound)."""
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    cells = {}
    n = 20
    for i in range(n):
        cells[(0, i)] = 1000
        cells[(2, i)] = 1000
        cells[(1, i)] = 10 + i
    xs, ys = [], []
    for (cx, cy), v in cells.items():
        for k in range(v):
            xs.append(cx * 4 + k % 4)
            ys.append(cy * 4 + (k // 4) % 4)
    ds = ray.data.from_arrow(pa.table({
        "px": np.array(xs, np.int64), "py": np.array(ys, np.int64)}))
    got = (spatial.grid_flow_basins(ds, "px", "py", cell=4, doublings=5)
           .to_pandas().set_index(["cx", "cy"]))
    # every interior trench cell drains to the mouth (1, 0)
    for i in range(0, n - 1):
        assert (got.loc[(1, i), "bx"], got.loc[(1, i), "by"]) == (1, 0)
