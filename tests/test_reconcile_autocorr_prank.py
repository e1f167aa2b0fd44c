"""Semantics tests for the full-outer reconcile, lag-1 autocorrelation
moments, and percent-rank queries (brute-force mirrors at sf0.001; the
DuckDB value parity is covered by the gate)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _df(res) -> pd.DataFrame:
    out = res.to_pandas() if hasattr(res, "to_pandas") else res
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    return out


def test_inventory_reconcile_vs_pandas_outer(ray_session):
    from gtfs_conflation_pipeline_ray.pipelines.queries import q_inventory_reconcile

    got = _df(q_inventory_reconcile(SF)).sort_values("p_partkey").reset_index(drop=True)

    part = pq.read_table(f"{SF}/part.parquet").to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    left = part[part.p_size >= 25][["p_partkey", "p_retailprice"]].copy()
    left["retail_c"] = np.floor(left.p_retailprice * 100 + 0.5).astype(np.int64)
    r = li[li.l_quantity >= 45.0].copy()
    r["qty_c"] = np.floor(r.l_quantity * 100 + 0.5).astype(np.int64)
    right = r.groupby("l_partkey").agg(
        obs_qty_c=("qty_c", "sum"), n_lines=("qty_c", "size")).reset_index()
    m = left[["p_partkey", "retail_c"]].merge(
        right.rename(columns={"l_partkey": "p_partkey"}),
        on="p_partkey", how="outer", indicator=True)
    m["status"] = m["_merge"].astype(str)
    m["retail_c"] = m["retail_c"].fillna(-1).astype(np.int64)
    m["obs_qty_c"] = m["obs_qty_c"].fillna(0).astype(np.int64)
    m["n_lines"] = m["n_lines"].fillna(0).astype(np.int64)
    want = m[["p_partkey", "status", "retail_c", "obs_qty_c", "n_lines"]]
    want = want.sort_values("p_partkey").reset_index(drop=True)
    want["p_partkey"] = want["p_partkey"].astype(np.int64)

    pd.testing.assert_frame_equal(got, want, check_like=True)
    # all three outer-join statuses are exercised by the fixture
    assert set(got["status"]) == {"both", "left_only", "right_only"}


def test_events_autocorr_vs_brute(ray_session):
    from gtfs_conflation_pipeline_ray.pipelines.queries import q_events_autocorr

    got = _df(q_events_autocorr(SF)).set_index("user_id")

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["us"] = ev["ts"].astype("int64")
    ev["v_c"] = np.floor(ev["value"] * 100 + 0.5).astype(np.int64)
    want = {}
    for uid, g in ev.groupby("user_id"):
        v = g.sort_values(["us", "event_id"])["v_c"].to_numpy(np.int64)
        if len(v) < 2:
            continue
        x, y = v[:-1], v[1:]
        want[uid] = (len(x), x.sum(), y.sum(), (x * y).sum(),
                     (x * x).sum(), (y * y).sum())
    assert set(got.index) == set(want)
    for uid, row in got.iterrows():
        assert (row.n_pairs, row.sx, row.sy, row.sxy, row.sxx, row.syy) == want[uid]


def test_percent_rank_tie_semantics(ray_session):
    from gtfs_conflation_pipeline_ray.pipelines.queries import q_customer_percent_rank

    got = _df(q_customer_percent_rank(SF))
    for seg, g in got.groupby("seg"):
        n = len(g)
        # min rank is 1, max pr_bp <= 10000, ties share the same (min) rank
        assert g["rnk"].min() == 1
        assert g["pr_bp"].between(0, 10000).all()
        by_val = g.groupby("bal_c")["rnk"].nunique()
        assert (by_val == 1).all()
        # RANK semantics: rank of value v = 1 + #rows strictly below v
        vals = g["bal_c"].to_numpy()
        for v, rk in zip(g["bal_c"].head(20), g["rnk"].head(20)):
            assert rk == 1 + int((vals < v).sum())
        # exact basis-point formula
        want_bp = ((g["rnk"] - 1) * 10000) // max(n - 1, 1)
        assert (g["pr_bp"] == (want_bp if n > 1 else 0)).all()
