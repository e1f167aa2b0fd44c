"""Integer PageRank vs a scalar Python recompute: exact fixed-point parity
on random multigraphs (parallel edges weight the walk), dangling nodes
(share 0, rank still receives), and no-in-edge nodes (base rank only)."""

import numpy as np
import pandas as pd
import ray

from gtfs_conflation_pipeline_ray.stages.graphrank import SCALE, pagerank


def _brute(edges, n_iters=3):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = {v: SCALE for v in nodes}
    base = 15 * SCALE // 100
    for _ in range(n_iters):
        share = {v: (r[v] // deg[v] if deg.get(v) else 0) for v in nodes}
        insum = {v: 0 for v in nodes}
        for u, v in edges:
            insum[v] += share[u]
        r = {v: base + 17 * insum[v] // 20 for v in nodes}
    return r


def _run(edges, n_iters=3):
    ds = ray.data.from_pandas(pd.DataFrame({
        "src": np.array([u for u, _ in edges], np.int64),
        "dst": np.array([v for _, v in edges], np.int64),
    }))
    out = pagerank(ds, n_iters=n_iters).to_pandas()
    return dict(zip(out.node, out.rank_q))


def test_pagerank_random_multigraph():
    rng = np.random.default_rng(13)
    edges = [(int(u), int(v)) for u, v in rng.integers(0, 50, (300, 2))
             if u != v]
    edges += edges[:40]  # parallel edges must weight the walk identically
    assert _run(edges) == _brute(edges)


def test_pagerank_dangling_and_source_nodes():
    # 3 -> 1 -> 2, node 2 dangling (no out-edges), node 3 no in-edges
    edges = [(3, 1), (1, 2)]
    got = _run(edges, n_iters=2)
    exp = _brute(edges, n_iters=2)
    assert got == exp
    base = 15 * SCALE // 100
    assert got[3] == base  # nothing points at 3 after iteration 1
