"""dedup_clusters (connected components over near-dup pairs): exactness vs a
Python union-find on random sparse graphs, multi-round convergence on a long
chain (pointer doubling must beat plain neighbor-min's diameter bound), and
the keep/cluster_size contract — BOTH plans (the single-task small-graph
kernel and the iterative join/shuffle path, forced via smallgraph_edges=0)."""

import numpy as np
import pandas as pd
import pytest
import ray

from gtfs_conflation_pipeline_ray.stages.dedup import dedup_clusters


def _union_find(n_nodes, pairs):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    root_min = {}
    for v in range(n_nodes):
        r = find(v)
        root_min[r] = min(root_min.get(r, v), v)
    return {v: root_min[find(v)] for v in range(n_nodes)}


def _run(doc_ids, pairs, **kw):
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.asarray(doc_ids, dtype=np.int64)}))
    pr = ray.data.from_pandas(pd.DataFrame({
        "doc_a": np.asarray([a for a, _ in pairs], dtype=np.int64),
        "doc_b": np.asarray([b for _, b in pairs], dtype=np.int64),
    }))
    out = dedup_clusters(docs, pr, **kw).to_pandas().sort_values("doc_id")
    return out.reset_index(drop=True)


PLANS = [{}, {"smallgraph_edges": 0}]  # fast path / forced iterative path
PLAN_IDS = ["smallgraph", "iterative"]


@pytest.mark.parametrize("plan", PLANS, ids=PLAN_IDS)
def test_random_graph_matches_union_find(plan):
    rng = np.random.default_rng(7)
    n = 400
    pairs = [tuple(sorted(p)) for p in
             rng.integers(0, n, size=(150, 2)).tolist() if p[0] != p[1]]
    out = _run(range(n), pairs, **plan)
    exp = _union_find(n, pairs)
    assert len(out) == n
    got = dict(zip(out.doc_id, out.cluster_id))
    assert got == exp
    sizes = pd.Series(list(exp.values())).value_counts()
    for _, r in out.iterrows():
        assert r.cluster_size == sizes[r.cluster_id]
        assert bool(r.keep) == (r.doc_id == r.cluster_id)


@pytest.mark.parametrize("plan", PLANS, ids=PLAN_IDS)
def test_long_chain_converges_in_log_rounds(plan):
    # a 200-node path graph has diameter 199: plain neighbor-min needs ~199
    # rounds; pointer doubling must land the fixpoint within max_rounds=16
    n = 200
    pairs = [(i, i + 1) for i in range(n - 1)]
    out = _run(range(n), pairs, max_rounds=16, **plan)
    assert (out.cluster_id == 0).all()
    assert (out.cluster_size == n).all()
    assert out.keep.sum() == 1


def test_singletons_and_empty_pairs():
    out = _run([5, 9, 11], [])
    assert list(out.cluster_id) == [5, 9, 11]
    assert list(out.cluster_size) == [1, 1, 1]
    assert out.keep.all()
