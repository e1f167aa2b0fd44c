"""Hot-key skew: every grouped operator must stay correct — and the
combiner-equipped ones must shrink the shuffle — when half the input shares
ONE key (the north rule's "skew-aware salting of hot cells": partial/combine
per batch IS the salt, see stages/relational.py module docstring)."""

import numpy as np
import pandas as pd
import ray


def _hot_df(n: int = 120_000, n_keys: int = 100, hot: int = 7) -> pd.DataFrame:
    i = np.arange(n, dtype=np.int64)
    k = np.where(i % 2 == 0, hot, i % n_keys)  # 50% of rows on key `hot`
    return pd.DataFrame({"k": k.astype(np.int64),
                         "v": (i % 1000).astype(np.int64)})


def test_hot_key_grouped_sum(ray_session):
    from gtfs_conflation_pipeline_ray.stages import relational

    df = _hot_df()
    ds = ray.data.from_pandas(df).repartition(16)
    out = relational.partial_groupby_sum(ds, ["k"], ["v"], count_as="n") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = df.assign(n=np.int64(1)).groupby("k", as_index=False).agg(
        {"v": "sum", "n": "sum"}).sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["k", "v", "n"]], exp)


def test_hot_key_group_topk(ray_session):
    from gtfs_conflation_pipeline_ray.stages import relational

    df = _hot_df(40_000)
    df["uniq"] = np.arange(len(df), dtype=np.int64)  # unique tie-breaker
    ds = ray.data.from_pandas(df).repartition(16)
    out = relational.group_topk(ds, ["k"], [("v", False), ("uniq", True)], k=3) \
        .to_pandas().sort_values(["k", "v", "uniq"],
                                 ascending=[True, False, True]).reset_index(drop=True)
    exp = (df.sort_values(["v", "uniq"], ascending=[False, True], kind="mergesort")
           .groupby("k", sort=False).head(3)
           .sort_values(["k", "v", "uniq"], ascending=[True, False, True])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["k", "v", "uniq"]], exp[["k", "v", "uniq"]])


def test_hot_key_distinct_concat_combiner(ray_session):
    """distinct=True concat: the per-batch dedup combiner must not change the
    result vs a brute-force distinct-sorted join, under heavy duplication of
    the hot key's values."""
    from gtfs_conflation_pipeline_ray.stages import relational

    df = _hot_df(60_000)
    df["v"] = df["v"] % 17  # few distinct values -> combiner shrinks a lot
    ds = ray.data.from_pandas(df).repartition(16)
    out = relational.group_concat(ds, ["k"], "v", "vals", distinct=True) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = (df.groupby("k")["v"]
           .agg(lambda s: ",".join(str(x) for x in np.unique(s.to_numpy())))
           .rename("vals").reset_index().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["k", "vals"]], exp)
