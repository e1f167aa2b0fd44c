"""Discrete Voronoi assignment, FK-integrity audit, trimmed mean."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_grid_nearest_sites_vs_brute(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    rng = np.random.default_rng(5)
    n = 2000
    x = rng.integers(0, 1 << 14, size=n).astype(np.int64)
    y = rng.integers(0, 1 << 14, size=n).astype(np.int64)
    sites = pa.table({
        "site_id": np.array([7, 3, 11, 5], dtype=np.int64),
        "sx": np.array([1000, 9000, 9000, 1000], dtype=np.int64),
        "sy": np.array([1000, 1000, 9000, 9000], dtype=np.int64),
    })
    ds = ray.data.from_arrow(pa.table({"px": x, "py": y}))
    got = spatial.grid_nearest_sites(ds, ray.put(sites), "px", "py",
                                     cell=1024).to_pandas()
    got = got.set_index("site_id").sort_index()

    # brute force over occupied cells
    cells = {}
    for xi, yi in zip(x // 1024, y // 1024):
        cells[(int(xi), int(yi))] = cells.get((int(xi), int(yi)), 0) + 1
    agg = {}
    sid = sites["site_id"].to_numpy()
    sx = sites["sx"].to_numpy()
    sy = sites["sy"].to_numpy()
    for (cx, cy), v in cells.items():
        ccx, ccy = cx * 1024 + 512, cy * 1024 + 512
        d2 = (ccx - sx) ** 2 + (ccy - sy) ** 2
        best = min(zip(d2, sid))[1]
        nc, m = agg.get(best, (0, 0))
        agg[best] = (nc + 1, m + v)
    assert len(got) == len(agg)
    for s, (nc, m) in agg.items():
        assert (got.loc[s].n_cells, got.loc[s].mass) == (nc, m)


def test_fk_audit_planted_orphans(ray_session, tmp_path):
    """Planted orphan keys must surface exactly; the sf parquet itself
    is covered by the oracle gate, so here we synthesize a tiny sf dir."""
    import pyarrow.parquet as pq

    from gtfs_conflation_pipeline_ray.pipelines import queries

    # child lineitem: orderkeys 1..10, keys 9,10 have no parent (3 rows)
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 10],
                               type=pa.int64()),
        "l_partkey": pa.array([1] * 12, type=pa.int64()),
        "l_suppkey": pa.array([1] * 12, type=pa.int64()),
    })
    orders = pa.table({
        "o_orderkey": pa.array(list(range(1, 9)), type=pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2, 3, 3, 4, 99], type=pa.int64()),
    })
    cust = pa.table({"c_custkey": pa.array([1, 2, 3, 4], type=pa.int64())})
    part = pa.table({"p_partkey": pa.array([1], type=pa.int64())})
    supp = pa.table({"s_suppkey": pa.array([1], type=pa.int64())})
    for name, t in [("lineitem", li), ("orders", orders),
                    ("customer", cust), ("part", part), ("supplier", supp)]:
        pq.write_table(t, tmp_path / f"{name}.parquet")

    out = queries.q_fk_integrity_audit(str(tmp_path)).to_pandas()
    out = out.set_index("relation")
    lo = out.loc["lineitem->orders"]
    assert (lo.child_rows, lo.distinct_keys, lo.orphan_keys,
            lo.orphan_rows) == (12, 10, 2, 3)
    oc = out.loc["orders->customer"]
    assert (oc.child_rows, oc.distinct_keys, oc.orphan_keys,
            oc.orphan_rows) == (8, 5, 1, 1)
    assert out.loc["lineitem->part"].orphan_keys == 0
    assert out.loc["lineitem->supplier"].orphan_rows == 0


def test_trimmed_sum_tie_independence():
    """The kept multiset is invariant to how ties are ordered: dropping
    k smallest / k largest BY VALUE gives the same sum either way."""
    rng = np.random.default_rng(13)
    v = rng.integers(0, 5, size=137).astype(np.int64)  # heavy ties
    n, k = len(v), len(v) // 10
    s1 = np.sort(v)[k:n - k].sum()
    # an adversarial alternative order among equal values
    order = np.lexsort((rng.permutation(n), v))
    s2 = v[order][k:n - k].sum()
    assert s1 == s2
