"""grid_dbscan vs a brute-force O(n²) DBSCAN under the Chebyshev metric,
for BOTH label-attachment plans (broadcast and join). The deterministic
variant pins: core = |N_eps| >= min_pts counting self; cluster id =
component-min core id over the core-core graph; border = min core-neighbor
cluster; noise = -1."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_dbscan(x, y, pid, eps, min_pts):
    n = len(x)
    adj = (np.abs(x[:, None] - x[None, :]) <= eps) & (
        np.abs(y[:, None] - y[None, :]) <= eps)
    # neighbor count INCLUDING self (diagonal is True)
    core = adj.sum(axis=1) >= min_pts
    # core-core components, labeled by min pid
    lbl = np.where(core, pid, np.int64(-1)).astype(np.int64)
    changed = True
    while changed:
        changed = False
        for i in range(n):
            if not core[i]:
                continue
            nb = np.flatnonzero(adj[i] & core)
            m = lbl[nb].min()
            if m < lbl[i]:
                lbl[i] = m
                changed = True
            if (lbl[nb] > lbl[i]).any():
                lbl[nb] = np.minimum(lbl[nb], lbl[i])
                changed = True
    role = np.full(n, "noise", dtype=object)
    out = np.full(n, -1, dtype=np.int64)
    role[core] = "core"
    out[core] = lbl[core]
    for i in range(n):
        if core[i]:
            continue
        nb = np.flatnonzero(adj[i] & core)
        nb = nb[nb != i]
        if len(nb):
            role[i] = "border"
            out[i] = lbl[nb].min()
    return role, out


def _mkpoints(rng, n, world):
    # three planted dense blobs + uniform background; some duplicates
    cx = rng.integers(1000, world - 1000, 3)
    cy = rng.integers(1000, world - 1000, 3)
    xs, ys = [], []
    for k in range(3):
        m = n // 5
        xs.append(np.clip(cx[k] + rng.integers(-40, 41, m), 0, world - 1))
        ys.append(np.clip(cy[k] + rng.integers(-40, 41, m), 0, world - 1))
    m = n - 3 * (n // 5)
    xs.append(rng.integers(0, world, m))
    ys.append(rng.integers(0, world, m))
    # planted cross (5 mutual neighbors -> all core) + one tendril point at
    # Chebyshev 30 from exactly ONE core: guaranteed border
    bx, by = 50000, 50000
    xs.append(np.array([bx, bx + 10, bx - 10, bx, bx, bx + 40]))
    ys.append(np.array([by, by, by, by + 10, by - 10, by]))
    x = np.concatenate(xs).astype(np.int64)
    y = np.concatenate(ys).astype(np.int64)
    x[1], y[1] = x[0], y[0]  # exact duplicate coordinates, distinct ids
    return x, y


@pytest.mark.parametrize("plan", ["broadcast", "join"])
def test_grid_dbscan_bruteforce(ray_session, plan):
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    rng = np.random.default_rng(4041)
    world = 65536
    x, y = _mkpoints(rng, 400, world)
    pid = np.arange(len(x), dtype=np.int64) + 7  # non-zero-based ids
    ds = ray.data.from_arrow(pa.table({"point_id": pid, "px": x, "py": y}))
    got = spatial.grid_dbscan(ds, eps=32, min_pts=4, world=world,
                              supercell=4096, est_rows=len(x),
                              plan=plan).to_pandas()
    got = got.sort_values("point_id").reset_index(drop=True)

    role, cl = _brute_dbscan(x, y, pid, eps=32, min_pts=4)
    exp = pd.DataFrame({"point_id": pid, "role": role,
                        "cluster_id": cl}).sort_values(
        "point_id").reset_index(drop=True)
    assert got["role"].tolist() == exp["role"].tolist()
    assert got["cluster_id"].tolist() == exp["cluster_id"].tolist()
    # the planted blobs must actually cluster (non-degenerate fixture)
    assert (exp["role"] == "core").sum() > 50
    assert (exp["role"] == "border").sum() > 0
    assert (exp["role"] == "noise").sum() > 0


def test_grid_dbscan_supercell_boundary(ray_session):
    """Points straddling a supercell boundary must still pair up exactly
    once (halo-copy correctness): a tight blob centered ON the boundary."""
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    rng = np.random.default_rng(77)
    S = 4096
    n = 60
    x = np.clip(2 * S + rng.integers(-30, 31, n), 0, 65535).astype(np.int64)
    y = np.clip(3 * S + rng.integers(-30, 31, n), 0, 65535).astype(np.int64)
    pid = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"point_id": pid, "px": x, "py": y}))
    got = spatial.grid_dbscan(ds, eps=32, min_pts=4, world=65536,
                              supercell=S, est_rows=n).to_pandas()
    got = got.sort_values("point_id").reset_index(drop=True)
    role, cl = _brute_dbscan(x, y, pid, eps=32, min_pts=4)
    assert got["role"].tolist() == list(role)
    assert got["cluster_id"].tolist() == list(cl)


def test_grid_dbscan_all_noise(ray_session):
    """No cores anywhere -> every point noise, cluster_id -1."""
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    x = np.array([0, 10000, 20000, 30000], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "point_id": np.arange(4, dtype=np.int64), "px": x, "py": x}))
    got = spatial.grid_dbscan(ds, eps=32, min_pts=4,
                              est_rows=4).to_pandas()
    assert (got["role"] == "noise").all()
    assert (got["cluster_id"] == -1).all()
