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


def test_distinctive_terms_vs_bruteforce(ray_session):
    """tf-df top-k vs a single-frame pandas computation of the same ranking,
    including a hot token shared by every doc (max df) and exact ties."""
    import pandas as pd

    from gtfs_conflation_pipeline_ray.stages.textops import distinctive_terms

    ray = ray_session
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for d in range(40):
        words = ["common"] * 3 + list(rng.choice(vocab, size=rng.integers(5, 40)))
        docs.append({"doc_id": d, "text": " ".join(words)})
    df = pd.DataFrame(docs)
    got = distinctive_terms(ray.data.from_pandas(df), k=4).to_pandas()
    got = got.sort_values(["doc_id", "rk"]).reset_index(drop=True)

    toks = df.assign(token=df["text"].str.lower().str.findall(r"\w+")).explode("token")
    tf = toks.groupby(["doc_id", "token"], as_index=False).agg(tf=("token", "size"))
    dfreq = tf.groupby("token", as_index=False).agg(df=("doc_id", "size"))
    m = tf.merge(dfreq, on="token")
    m = m.sort_values(["doc_id", "tf", "df", "token"],
                      ascending=[True, False, True, True], kind="mergesort")
    m["rk"] = m.groupby("doc_id").cumcount() + 1
    expect = m[m["rk"] <= 4].reset_index(drop=True)
    assert len(got) == len(expect)
    for c in ["doc_id", "token", "tf", "df", "rk"]:
        assert (got[c].to_numpy() == expect[c].to_numpy()).all(), c
