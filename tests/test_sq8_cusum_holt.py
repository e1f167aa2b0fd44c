"""Brute-force mirrors for SQ8 ANN search, CUSUM change-point scan, and the
integer Holt linear-trend replay."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_sq8_topk_vs_bruteforce(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages import ann

    rng = np.random.default_rng(21)
    n, d = 400, 16
    x = rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64) * 3 + 1
    vec = pa.table({"vec_id": ids,
                    "embedding": pa.array(list(x.astype(np.float32)))})
    q = pa.table({"query_id": ids[:5],
                  "embedding": pa.array(list(x[:5].astype(np.float32)))})

    m = ann.quantize_fixed(np.stack([np.asarray(v, np.float64) for v in
                                     vec["embedding"].to_pylist()]))
    mn = m.min(axis=0)
    span = np.maximum(m.max(axis=0) - mn, 1)

    got = ann.sq8_topk(ray.data.from_arrow(vec), ray.put(q), mn, span, k=4)
    got = got.to_pandas().sort_values(["query_id", "d2_rank"]).reset_index(drop=True)

    code = ((m - mn[None, :]) * 255) // span[None, :]
    dqv = mn[None, :] + (code * span[None, :]) // 255
    rows = []
    for qi in range(5):
        qm = m[qi]
        d2 = ((qm[None, :] - dqv) ** 2).sum(axis=1)
        order = sorted((int(d2[j]), int(ids[j])) for j in range(n) if ids[j] != ids[qi])
        for r, (dd, vid) in enumerate(order[:4], start=1):
            rows.append((int(ids[qi]), vid, dd, r))
    want = pd.DataFrame(rows, columns=["query_id", "vec_id", "d2", "d2_rank"])
    pd.testing.assert_frame_equal(
        got[["query_id", "vec_id", "d2", "d2_rank"]].astype(np.int64),
        want.astype(np.int64))


def test_events_cusum_vs_brute(ray_session):
    from gtfs_conflation_pipeline_ray.pipelines.queries import q_events_cusum

    got = q_events_cusum(SF).to_pandas().set_index("user_id")

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["us"] = ev["ts"].astype("int64")
    ev["v_c"] = np.floor(ev["value"] * 100 + 0.5).astype(np.int64)
    for uid, g in ev.groupby("user_id"):
        v = g.sort_values(["us", "event_id"])["v_c"].to_numpy(np.int64)
        mean = v.sum() // len(v)
        best_a, best_i = -1, -1
        cs = 0
        for i, x in enumerate(v, start=1):
            cs += x
            a = abs(cs - i * mean)
            if a > best_a:
                best_a, best_i = a, i
        row = got.loc[uid]
        assert (row.n_events, row.max_abs_cusum, row.argmax_idx) == \
            (len(v), best_a, best_i)


def test_holt_vs_scalar_replay(ray_session):
    from gtfs_conflation_pipeline_ray.pipelines.queries import q_part_demand_holt

    got = q_part_demand_holt(SF).to_pandas().set_index("l_partkey")

    MO = 2_592_000_000_000
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    li["us"] = li["l_shipdate"].astype("int64")
    li["qty_c"] = np.floor(li["l_quantity"] * 100 + 0.5).astype(np.int64)
    t0, t1 = li["us"].min() // MO, li["us"].max() // MO
    T = int(t1 - t0 + 1)
    li["mo"] = li["us"] // MO - t0
    for pk, g in li.groupby("l_partkey"):
        v = np.zeros(T, dtype=np.int64)
        for mo, q in g.groupby("mo")["qty_c"].sum().items():
            v[int(mo)] = q
        l, b = int(v[0]), 0
        for t in range(1, T):
            l2 = (int(v[t]) + 3 * (l + b)) // 4
            b = (l2 - l + 3 * b) // 4
            l = l2
        row = got.loc[pk]
        assert (row.level_c, row.trend_c, row.forecast_c) == (l, b, l + b)
    assert len(got) == li["l_partkey"].nunique()
    # trend must go negative somewhere (floor-division sign semantics hit)
    assert (got["trend_c"] < 0).any()
