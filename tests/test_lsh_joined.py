"""lsh_verified_pairs_joined (the corpus-scale LSH plan: ids-only band
shuffle + packed-signature co-group joins) must return EXACTLY the rows of
the ride-along plan — same pairs, same jaccard_est."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from gtfs_conflation_pipeline_ray.stages import dedup


def _docs(n: int = 400, seed_mod: int = 13) -> pa.Table:
    vocab = np.array([f"w{k}" for k in range(500)], dtype=object)
    texts, ids = [], []
    for i in range(n):
        ln = 30 + i % 20
        j = np.arange(ln)
        w = vocab[(i * 37 + j * 13 + j * j * 7) % 500]
        if i % seed_mod == 0 and i > 0:  # planted near-dup of doc i-1
            lp = 30 + (i - 1) % 20
            jp = np.arange(lp)
            w = vocab[((i - 1) * 37 + jp * 13 + jp * jp * 7) % 500].copy()
            w[-1] = "zzz"
        texts.append(" ".join(w))
        ids.append(i)
    return pa.table({"doc_id": np.array(ids, np.int64),
                     "text": pa.array(texts)})


def _canon(df):
    return (df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
            [["doc_a", "doc_b", "jaccard_est"]])


def test_joined_plan_matches_ride_along():
    tab = _docs()
    ride = dedup.lsh_verified_pairs(
        dedup.minhash_signatures(rd.from_arrow(tab))).to_pandas()
    joined = dedup.lsh_verified_pairs_joined(
        dedup.minhash_signatures(rd.from_arrow(tab))).to_pandas()
    assert len(ride) > 0  # planted near-dups must surface
    assert _canon(ride).equals(_canon(joined))


def test_joined_plan_respects_threshold_and_cap():
    tab = _docs(n=200, seed_mod=7)
    for thr in (0.3, 0.8):
        ride = dedup.lsh_verified_pairs(
            dedup.minhash_signatures(rd.from_arrow(tab)),
            jaccard_threshold=thr, band_member_cap=8).to_pandas()
        joined = dedup.lsh_verified_pairs_joined(
            dedup.minhash_signatures(rd.from_arrow(tab)),
            jaccard_threshold=thr, band_member_cap=8).to_pandas()
        assert _canon(ride).equals(_canon(joined))


def test_joined_plan_empty_input():
    tab = pa.table({"doc_id": np.array([], np.int64),
                    "text": pa.array([], type=pa.string())})
    out = dedup.lsh_verified_pairs_joined(
        dedup.minhash_signatures(rd.from_arrow(tab))).to_pandas()
    assert len(out) == 0
