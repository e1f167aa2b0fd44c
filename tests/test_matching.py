"""Locally-dominant greedy maximal matching."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _sequential_greedy(u, v, w):
    """Classic sequential greedy: scan edges in (w, u, v) order, take an
    edge iff both endpoints are free."""
    order = np.lexsort((v, u, w))
    used = set()
    out = []
    for i in order:
        a, b = int(u[i]), int(v[i])
        if a not in used and b not in used:
            used.add(a)
            used.add(b)
            out.append((a, b, int(w[i])))
    return set(out)


def _rand_edges(rng, n_nodes, n_edges):
    u = rng.integers(0, n_nodes, size=n_edges).astype(np.int64)
    v = rng.integers(0, n_nodes, size=n_edges).astype(np.int64)
    m = u != v
    u, v = u[m], v[m]
    uu, vv = np.minimum(u, v), np.maximum(u, v)
    w = rng.integers(1, 1000, size=len(uu)).astype(np.int64)
    df = pd.DataFrame({"u": uu, "v": vv, "w": w}).drop_duplicates(["u", "v"])
    return df


def test_matching_equals_sequential_greedy(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.graphrank import greedy_matching

    rng = np.random.default_rng(6)
    for trial in range(8):
        df = _rand_edges(rng, n_nodes=40, n_edges=150)
        ds = ray.data.from_pandas(df)
        got = greedy_matching(ds, max_rounds=60).to_pandas()
        want = _sequential_greedy(df["u"].to_numpy(), df["v"].to_numpy(),
                                  df["w"].to_numpy())
        got_set = set(map(tuple, got[["u", "v", "w"]].to_numpy()))
        assert got_set == want, trial
        # validity: no vertex matched twice
        verts = np.concatenate([got["u"].to_numpy(), got["v"].to_numpy()])
        assert len(verts) == len(set(verts.tolist()))
        # maximality: every edge touches a matched vertex
        vs = set(verts.tolist())
        for a, b in df[["u", "v"]].to_numpy():
            assert a in vs or b in vs


def test_matching_distributed_plan_parity(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.graphrank import greedy_matching

    rng = np.random.default_rng(19)
    df = _rand_edges(rng, n_nodes=60, n_edges=250)
    ds = ray.data.from_pandas(df).repartition(4)
    small = greedy_matching(ds, max_rounds=40).to_pandas()
    dist = greedy_matching(ds, max_rounds=40,
                           smallgraph_edges=0).to_pandas()
    key = ["u", "v", "w", "r"]
    a = small.sort_values(key).reset_index(drop=True)
    b = dist.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key], b[key])


def test_matching_chain_rounds(ray_session):
    """Path graph with increasing weights matches greedily left-to-right,
    one edge every other position, and needs several ROUNDS (the lightest
    remaining edge only becomes locally dominant after its blocker
    matches)."""
    import ray

    from gtfs_conflation_pipeline_ray.stages.graphrank import greedy_matching

    n = 9  # path 0-1-2-...-8, w = 1..8
    df = pd.DataFrame({
        "u": np.arange(n - 1, dtype=np.int64),
        "v": np.arange(1, n, dtype=np.int64),
        "w": np.arange(1, n, dtype=np.int64)})
    got = (greedy_matching(ray.data.from_pandas(df), max_rounds=10)
           .to_pandas().sort_values("u").reset_index(drop=True))
    assert list(map(tuple, got[["u", "v"]].to_numpy())) == [
        (0, 1), (2, 3), (4, 5), (6, 7)]
    assert got["r"].tolist() == [0, 1, 2, 3]
