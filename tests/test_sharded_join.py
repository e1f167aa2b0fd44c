"""Two-sided distributed vector join (ann.sharded_cosine_join): parity with
the broadcast IVF path, invariance to skew sub-sharding, and exhaustive-mode
equality with brute-force cosine top-k."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from gtfs_conflation_pipeline_ray.stages import ann


def _corpus(n: int = 300, d: int = 12, seed: int = 5) -> pa.Table:
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
    })


def _canon(df):
    return (df.sort_values(["query_id", "sim_rank"])
            .reset_index(drop=True)[["query_id", "vec_id", "sim_rank"]])


def test_matches_broadcast_ivf_path():
    tab = _corpus()
    qtab = pa.table({"query_id": tab["vec_id"].slice(0, 8),
                     "embedding": tab["embedding"].slice(0, 8)})
    broadcast = ann.ivf_topk(rd.from_arrow(tab), ray.put(qtab), k=5,
                             n_centroids=16, nprobe=4).to_pandas()
    sharded = ann.sharded_cosine_join(
        rd.from_arrow(tab.slice(0, 8)), rd.from_arrow(tab), k=5,
        n_centroids=16, nprobe=4).to_pandas()
    assert _canon(broadcast).equals(_canon(sharded))


@pytest.mark.parametrize("shards", [2, 3])
def test_invariant_to_list_shards(shards):
    tab = _corpus(seed=9)
    base = ann.sharded_cosine_join(
        rd.from_arrow(tab.slice(0, 6)), rd.from_arrow(tab), k=4,
        n_centroids=8, nprobe=3, list_shards=1).to_pandas()
    salted = ann.sharded_cosine_join(
        rd.from_arrow(tab.slice(0, 6)), rd.from_arrow(tab), k=4,
        n_centroids=8, nprobe=3, list_shards=shards).to_pandas()
    assert _canon(base).equals(_canon(salted))


def test_exhaustive_probe_equals_bruteforce():
    tab = _corpus(n=150, seed=1)
    out = ann.sharded_cosine_join(
        rd.from_arrow(tab.slice(0, 5)), rd.from_arrow(tab), k=5,
        n_centroids=8, nprobe=8, list_shards=2).to_pandas()
    x = np.stack(tab["embedding"].to_pylist()).astype(np.float64)
    qn = np.linalg.norm(x[:5], axis=1)
    cn = np.maximum(np.linalg.norm(x, axis=1), 1e-300)
    sims = (x[:5] @ x.T) / (qn[:, None] * cn[None, :])
    for qi in range(5):
        sims[qi, qi] = -np.inf
        want = np.lexsort((np.arange(len(x)), -sims[qi]))[:5]
        got = (out[out.query_id == qi].sort_values("sim_rank")["vec_id"]
               .to_numpy())
        assert (got == want).all()


def test_disjoint_query_side():
    """Queries that are NOT corpus members (true two-table join)."""
    tab = _corpus(n=200, seed=3)
    rng = np.random.default_rng(11)
    q = rng.normal(size=(4, 12)).astype(np.float32)
    qtab = pa.table({
        "vec_id": np.arange(1000, 1004, dtype=np.int64),
        "embedding": pa.array(list(q), type=pa.list_(pa.float32())),
    })
    out = ann.sharded_cosine_join(
        rd.from_arrow(qtab), rd.from_arrow(tab), k=3,
        n_centroids=4, nprobe=4).to_pandas()
    assert set(out["query_id"]) == {1000, 1001, 1002, 1003}
    assert (out.groupby("query_id").size() == 3).all()
    x = np.stack(tab["embedding"].to_pylist()).astype(np.float64)
    qd = q.astype(np.float64)
    sims = (qd @ x.T) / (np.linalg.norm(qd, axis=1)[:, None]
                         * np.maximum(np.linalg.norm(x, axis=1), 1e-300))
    for i, qid in enumerate(range(1000, 1004)):
        want = np.lexsort((np.arange(len(x)), -sims[i]))[:3]
        got = (out[out.query_id == qid].sort_values("sim_rank")["vec_id"]
               .to_numpy())
        assert (got == want).all()


def test_adc_join_matches_ivfpq_broadcast_path():
    """sharded_adc_join (codes-not-vectors exchange) must equal ivfpq_topk
    (broadcast query side) bit-for-bit given the same codebooks."""
    tab = _corpus(n=300, d=16, seed=21)
    rng = np.random.default_rng(5)
    cents = ann.quantize_fixed(rng.normal(size=(16, 16)))
    cref = ray.put(cents)
    qtab = pa.table({"vec_id": tab["vec_id"].slice(0, 6),
                     "embedding": tab["embedding"].slice(0, 6)})
    ref = ann.ivfpq_topk(rd.from_arrow(tab), cref, ray.put(qtab), k=5,
                         n_centroids=8, nprobe=3).to_pandas()
    got = ann.sharded_adc_join(rd.from_arrow(tab.slice(0, 6)),
                               rd.from_arrow(tab), cref, k=5,
                               n_centroids=8, nprobe=3,
                               list_shards=2).to_pandas()

    def c(df):
        return (df.sort_values(["query_id", "adc_rank"])
                .reset_index(drop=True)[["query_id", "vec_id",
                                         "adc_rank", "adc"]])

    assert len(ref) > 0
    assert c(ref).equals(c(got))
