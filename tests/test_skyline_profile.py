"""Distributed skyline: local-skyline-merge correctness vs O(n²) dominance
brute force, including duplicate (price, date) points which must ALL survive
(no strict dominance between equals)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _brute_skyline(p, d):
    n = len(p)
    keep = np.ones(n, bool)
    for i in range(n):
        dom = (p >= p[i]) & (d <= d[i]) & ((p > p[i]) | (d < d[i]))
        if dom.any():
            keep[i] = False
    return keep


def test_orders_skyline_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from gtfs_conflation_pipeline_ray.pipelines.queries import q_orders_skyline

    rng = np.random.default_rng(47)
    n = 3000
    price = np.round(rng.uniform(10, 500, n), 2)
    # coarse date grid -> ties and duplicate (price, date) pairs exist
    date = rng.integers(0, 20, n).astype("datetime64[D]").astype("datetime64[us]")
    # plant an exact duplicate pair at an extreme corner: both must survive
    price[0] = price[1] = 99999.99
    date[0] = date[1] = np.datetime64("1970-01-25", "us")
    tab = pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_totalprice": pa.array(price),
        "o_orderdate": pa.array(date),
        "o_custkey": pa.array(np.zeros(n, np.int64)),
        "o_orderstatus": pa.array(["O"] * n),
        "o_orderpriority": pa.array(["1-URGENT"] * n),
    })
    sf = str(tmp_path)
    pq.write_table(tab, f"{sf}/orders.parquet")

    out = q_orders_skyline(sf).to_pandas()
    pc = np.floor(price * 100 + 0.5).astype(np.int64)
    du = date.astype(np.int64)
    keep = _brute_skyline(pc, du)
    want = sorted(np.flatnonzero(keep).tolist())
    assert out["o_orderkey"].tolist() == want
    assert {0, 1}.issubset(set(want))  # both planted duplicates survive
