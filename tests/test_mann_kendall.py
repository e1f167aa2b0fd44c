"""Mann-Kendall trend statistic pieces."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _mk_brute(q):
    n = len(q)
    s = sum(np.sign(q[j] - q[i]) for i in range(n) for j in range(i + 1, n))
    _, t = np.unique(q, return_counts=True)
    var18 = n * (n - 1) * (2 * n + 5) - (t * (t - 1) * (2 * t + 5)).sum()
    return int(s), int(var18)


def test_mann_kendall_query_vs_brute(ray_session, tmp_path):
    from gtfs_conflation_pipeline_ray.pipelines import queries

    rng = np.random.default_rng(4)
    rows = []
    for supp in (1, 2, 3):
        for mo in range(1, 13):
            # supp 2: exactly two rows of qty 10 every month -> the monthly
            # sums are ALL tied; others vary
            reps = 2 if supp == 2 else int(rng.integers(1, 4))
            for _ in range(reps):
                day = int(rng.integers(1, 28))
                rows.append((supp, np.datetime64(f"1995-{mo:02d}-{day:02d}"),
                             float(10 if supp == 2 else rng.integers(1, 50))))
    df = pd.DataFrame(rows, columns=["l_suppkey", "l_shipdate", "l_quantity"])
    d = tmp_path / "sf"
    d.mkdir()
    li = pa.table({
        "l_suppkey": pa.array(df.l_suppkey.to_numpy(np.int64)),
        "l_shipdate": pa.Array.from_pandas(
            pd.to_datetime(df.l_shipdate)).cast(pa.timestamp("us")),
        "l_quantity": pa.array(df.l_quantity.to_numpy(np.float64)),
    })
    pq.write_table(li, d / "lineitem.parquet")
    pq.write_table(pa.table({"s_suppkey": pa.array([1, 2, 3], pa.int64())}),
                   d / "supplier.parquet")

    got = (queries.q_supplier_mann_kendall(str(d)).to_pandas()
           .set_index("l_suppkey").sort_index())
    monthly = (df.assign(mo=pd.to_datetime(df.l_shipdate).dt.month,
                         q=df.l_quantity.astype(np.int64))
               .groupby(["l_suppkey", "mo"])["q"].sum().reset_index())
    for supp in (1, 2, 3):
        series = monthly[monthly.l_suppkey == supp].sort_values("mo")["q"]
        s, var18 = _mk_brute(series.to_numpy(np.int64))
        assert got.loc[supp, "n_months"] == len(series)
        assert got.loc[supp, "s_stat"] == s
        assert got.loc[supp, "var18"] == var18
    # supp 2 is all-ties: S = 0 and the tie correction wipes the variance
    assert got.loc[2, "s_stat"] == 0
    assert got.loc[2, "var18"] == 0
