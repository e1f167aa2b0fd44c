"""Borůvka MSF: kernel vs Kruskal, distributed path parity."""

import numpy as np
import pyarrow as pa


def _kruskal(u, v, w):
    """Union-find Kruskal under the (w, u, v) total order."""
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    order = np.lexsort((v, u, w))
    out = []
    for i in order:
        ru, rv = find(int(u[i])), find(int(v[i]))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            out.append((int(u[i]), int(v[i]), int(w[i])))
    return sorted(out)


def _rand_graph(rng, n_nodes, n_edges):
    a = rng.integers(0, n_nodes, size=n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, size=n_edges).astype(np.int64)
    m = a != b
    a, b = a[m], b[m]
    u, v = np.minimum(a, b), np.maximum(a, b)
    w = rng.integers(0, 50, size=len(u)).astype(np.int64)  # heavy ties
    # distinct (u, v): keep first
    _, keep = np.unique(u * 100000 + v, return_index=True)
    return u[keep], v[keep], w[keep]


def test_boruvka_kernel_vs_kruskal():
    from gtfs_conflation_pipeline_ray.stages.graphrank import _boruvka_kernel

    rng = np.random.default_rng(17)
    for trial in range(20):
        u, v, w = _rand_graph(rng, 60, 150)
        sel, rnd = _boruvka_kernel(u, v, w)
        got = sorted(zip(u[sel].tolist(), v[sel].tolist(), w[sel].tolist()))
        assert got == _kruskal(u, v, w), f"trial {trial}"


def test_boruvka_kernel_chain_and_empty():
    from gtfs_conflation_pipeline_ray.stages.graphrank import _boruvka_kernel

    # path graph: MST = all edges
    n = 200
    u = np.arange(n - 1, dtype=np.int64)
    v = u + 1
    w = np.ones(n - 1, dtype=np.int64)
    sel, rnd = _boruvka_kernel(u, v, w)
    assert len(sel) == n - 1
    # log-round bound: a 200-node path contracts in <= ceil(log2 200) = 8
    assert rnd.max() <= 8


def test_boruvka_distributed_parity(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.graphrank import (
        _boruvka_kernel, boruvka_msf)

    rng = np.random.default_rng(23)
    u, v, w = _rand_graph(rng, 120, 400)
    ds = ray.data.from_arrow(pa.table({"u": u, "v": v, "w": w}))
    # force the distributed plan
    got = boruvka_msf(ds, smallgraph_edges=0).to_pandas()
    got_t = sorted(zip(got["u"], got["v"], got["w"], got["r"]))
    sel, rnd = _boruvka_kernel(u, v, w)
    want = sorted(zip(u[sel].tolist(), v[sel].tolist(), w[sel].tolist(),
                      rnd.tolist()))
    assert got_t == want
