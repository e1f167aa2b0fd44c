"""bfs_hops and kcore_peel vs brute-force references on random graphs."""

import numpy as np
import pyarrow as pa
import pytest


def _rand_graph(rng, n_nodes, n_edges):
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    m = a != b
    a, b = a[m], b[m]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def _brute_bfs(adj, seeds, max_hops):
    hops = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in hops:
                    nxt.add(v)
        for v in nxt:
            hops[v] = h
        frontier = nxt
        if not frontier:
            break
    return hops


def test_bfs_hops_bruteforce(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.graphrank import bfs_hops

    rng = np.random.default_rng(4242)
    a, b = _rand_graph(rng, 300, 500)
    adj = {}
    for u, v in zip(a, b):
        adj.setdefault(int(u), set()).add(int(v))
        adj.setdefault(int(v), set()).add(int(u))
    seeds = [n for n in range(0, 300, 37) if n in adj]
    exp = _brute_bfs(adj, seeds, 4)

    edges = ray.data.from_arrow(pa.table({
        "src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}))
    seeds_ds = ray.data.from_arrow(pa.table(
        {"node": np.array(seeds, dtype=np.int64)}))
    got = bfs_hops(edges, seeds_ds, max_hops=4).to_pandas()
    got_map = dict(zip(got["node"], got["hops"]))
    assert got_map == exp
    # non-degenerate: some nodes at every hop depth 0..3
    assert {0, 1, 2, 3} <= set(exp.values())


def test_bfs_hops_disconnected_seed(ray_session):
    """A seed with no edges stays hop 0; unreachable nodes never appear."""
    import ray

    from gtfs_conflation_pipeline_ray.stages.graphrank import bfs_hops

    edges = ray.data.from_arrow(pa.table({
        "src": np.array([1, 2], dtype=np.int64),
        "dst": np.array([2, 1], dtype=np.int64)}))
    seeds = ray.data.from_arrow(pa.table(
        {"node": np.array([99], dtype=np.int64)}))
    got = bfs_hops(edges, seeds, max_hops=3).to_pandas()
    assert got["node"].tolist() == [99]
    assert got["hops"].tolist() == [0]


def _brute_kcore(a, b, k, rounds):
    edges = set(zip(a.tolist(), b.tolist()))
    for _ in range(rounds):
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return deg


@pytest.mark.parametrize("k,rounds", [(3, 4), (4, 6)])
def test_kcore_peel_bruteforce(ray_session, k, rounds):
    import ray

    from gtfs_conflation_pipeline_ray.stages.graphrank import kcore_peel

    rng = np.random.default_rng(555)
    # dense blob (survives) + sparse periphery (peels away)
    a1, b1 = _rand_graph(rng, 30, 200)       # dense core candidates
    a2, b2 = _rand_graph(rng, 300, 250)      # sparse
    a = np.concatenate([a1, a2 + 1000])
    b = np.concatenate([b1, b2 + 1000])
    exp = _brute_kcore(a, b, k, rounds)

    edges = ray.data.from_arrow(pa.table({"supp_a": a, "supp_b": b}))
    got = kcore_peel(edges, k=k, rounds=rounds).to_pandas()
    got_map = dict(zip(got["node"], got["deg"]))
    assert got_map == exp
    assert len(exp) > 0            # something survives
    assert len(exp) < len(set(a.tolist() + b.tolist()))  # something peeled


def test_kcore_peel_everything_dies(ray_session):
    """k above the max degree peels the whole graph -> empty result."""
    import ray

    from gtfs_conflation_pipeline_ray.stages.graphrank import kcore_peel

    edges = ray.data.from_arrow(pa.table({
        "supp_a": np.array([1, 2, 3], dtype=np.int64),
        "supp_b": np.array([2, 3, 4], dtype=np.int64)}))
    got = kcore_peel(edges, k=10, rounds=3).to_pandas()
    assert len(got) == 0


def test_pagerank_broadcast_plan_matches_join_plan():
    """Size-gated broadcast-iteration plan must equal the distributed
    join plan bit-for-bit (same integer update rule)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gtfs_conflation_pipeline_ray.stages import graphrank

    rng = np.random.default_rng(7)
    e = pa.table({"src": rng.integers(0, 150, 2000).astype(np.int64),
                  "dst": rng.integers(0, 150, 2000).astype(np.int64)})
    fast = (graphrank.pagerank(rd.from_arrow(e)).to_pandas()
            .sort_values("node").reset_index(drop=True))
    join = (graphrank.pagerank(rd.from_arrow(e), broadcast_nodes_cap=0)
            .to_pandas().sort_values("node").reset_index(drop=True))
    assert fast.equals(join)
