"""Wave-12 kernels: flow vector field, OD matrix, basket-pair machinery."""

import collections

import numpy as np
import pyarrow as pa


def _traj_fixture(rng, n_traj=6, max_len=20):
    rows = []
    for traj in range(n_traj):
        n = int(rng.integers(1, max_len))
        x = np.cumsum(rng.integers(-300, 300, size=n)) + 5000
        y = np.cumsum(rng.integers(-300, 300, size=n)) + 5000
        rows += [(traj, s, int(a), int(b)) for s, (a, b) in
                 enumerate(zip(x, y))]
    return rows


def test_flow_vectors_vs_brute(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    rng = np.random.default_rng(51)
    rows = _traj_fixture(rng)
    ds = ray.data.from_arrow(pa.table({
        "traj": np.array([r[0] for r in rows], np.int64),
        "seq": np.array([r[1] for r in rows], np.int64),
        "x": np.array([r[2] for r in rows], np.int64),
        "y": np.array([r[3] for r in rows], np.int64)}))
    got = spatial.flow_vectors(ds, "traj", "seq", "x", "y", cell=1024)
    got = {(r.cx, r.cy): (r.n_steps, r.sum_dx, r.sum_dy)
           for r in got.to_pandas().itertuples()}

    want = collections.defaultdict(lambda: [0, 0, 0])
    by_t = collections.defaultdict(list)
    for t, s, x, y in rows:
        by_t[t].append((s, x, y))
    for obs in by_t.values():
        obs.sort()
        for (s0, x0, y0), (_s1, x1, y1) in zip(obs, obs[1:]):
            cell = (x0 // 1024, y0 // 1024)
            want[cell][0] += 1
            want[cell][1] += x1 - x0
            want[cell][2] += y1 - y0
    assert got == {k: tuple(v) for k, v in want.items()}


def test_od_matrix_vs_brute(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    rng = np.random.default_rng(53)
    rows = _traj_fixture(rng, n_traj=9)
    ds = ray.data.from_arrow(pa.table({
        "traj": np.array([r[0] for r in rows], np.int64),
        "seq": np.array([r[1] for r in rows], np.int64),
        "x": np.array([r[2] for r in rows], np.int64),
        "y": np.array([r[3] for r in rows], np.int64)}))
    got = spatial.od_matrix(ds, "traj", "seq", "x", "y", cell=2048)
    got = {(r.o_cx, r.o_cy, r.d_cx, r.d_cy): r.n_trips
           for r in got.to_pandas().itertuples()}

    want = collections.Counter()
    by_t = collections.defaultdict(list)
    for t, s, x, y in rows:
        by_t[t].append((s, x, y))
    for obs in by_t.values():
        obs.sort()
        _s, ox, oy = obs[0]
        _s, dx, dy = obs[-1]
        want[(ox // 2048, oy // 2048, dx // 2048, dy // 2048)] += 1
    assert got == dict(want)
    assert sum(got.values()) == 9  # one trip per trajectory
