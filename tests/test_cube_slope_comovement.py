"""Brute-force mirrors for the CUBE grouping sets, the raster
slope/aspect gradient, and convoy (co-movement) detection."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_revenue_cube_internal_consistency(ray_session):
    from gtfs_conflation_pipeline_ray.pipelines.queries import q_revenue_cube

    got = q_revenue_cube(SF).to_pandas()
    grand = got[(got.l_returnflag == "ALL") & (got.l_linestatus == "ALL")
                & (got.ship_year == -1)]
    assert len(grand) == 1
    # every grouping set must re-sum to the grand total
    for mask in range(8):
        keep_flag = bool(mask & 1)
        keep_stat = bool(mask & 2)
        keep_year = bool(mask & 4)
        sel = got[((got.l_returnflag != "ALL") == keep_flag)
                  & ((got.l_linestatus != "ALL") == keep_stat)
                  & ((got.ship_year != -1) == keep_year)]
        assert sel["revenue_c"].sum() == grand["revenue_c"].iloc[0], mask
        assert sel["n_rows"].sum() == grand["n_rows"].iloc[0], mask
    # finest level matches a direct pandas groupby
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    li["rev_c"] = np.floor(li.l_extendedprice * (1.0 - li.l_discount) * 100
                           + 0.5).astype(np.int64)
    li["yr"] = li.l_shipdate.dt.year.astype(np.int64)
    fin = li.groupby(["l_returnflag", "l_linestatus", "yr"])["rev_c"].sum()
    sel = got[(got.l_returnflag != "ALL") & (got.l_linestatus != "ALL")
              & (got.ship_year != -1)]
    for r in sel.itertuples():
        assert fin.loc[(r.l_returnflag, r.l_linestatus, r.ship_year)] == r.revenue_c


def test_grid_slope_aspect_vs_dense_numpy(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    rng = np.random.default_rng(31)
    n = 5000
    px = rng.integers(0, 8192, n).astype(np.int64)
    py = rng.integers(0, 8192, n).astype(np.int64)
    pts = ray.data.from_arrow(pa.table({"px": px, "py": py}))
    got = spatial.grid_slope_aspect(pts, "px", "py", cell=512).to_pandas()

    W = 16
    dense = np.zeros((W + 2, W + 2), dtype=np.int64)  # pad border with 0
    for x, y in zip(px // 512, py // 512):
        dense[x + 1, y + 1] += 1
    assert len(got) == (dense > 0).sum()
    for r in got.itertuples():
        x, y = r.cx + 1, r.cy + 1
        dx = dense[x + 1, y] - dense[x - 1, y]
        dy = dense[x, y + 1] - dense[x, y - 1]
        assert (r.v, r.dx, r.dy) == (dense[x, y], dx, dy)
        assert r.slope2 == dx * dx + dy * dy
        assert r.aspect_class == 3 * (np.sign(dx) + 1) + np.sign(dy) + 1


def test_comovement_exact_convoy_classes(ray_session):
    """On the shared trajectory fixture the convoys are exactly the
    same-(traj%5) classes: 5 classes x C(10,2) pairs = 225, full
    containment both ways (identical slot sets)."""
    from gtfs_conflation_pipeline_ray.pipelines.queries import q_traj_comovement

    got = q_traj_comovement(SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(got) == 225
    assert ((got.traj_a % 5) == (got.traj_b % 5)).all()
    # full containment: shared slots equals the min (here: both) slot counts
    assert (got.n_shared == got.min_slots).all()
