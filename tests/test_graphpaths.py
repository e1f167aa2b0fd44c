"""Tests for the graph-native Dijkstra path construction
(``stages/graphpaths.py``) — brute-force shortest-path parity, determinism,
and the documented semantic difference vs the Viterbi chain DP."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from gtfs_conflation_pipeline_ray.stages.graphpaths import _group_paths


def _brute_shortest(edges, src, sink):
    """Min total weight over ALL simple directed paths src→sink (None if
    unreachable). edges = list of (u, v, w) after dedup."""
    adj = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
    best = [None]

    def walk(v, cost, seen):
        if best[0] is not None and cost >= best[0]:
            return
        if v == sink:
            best[0] = cost if best[0] is None else min(best[0], cost)
            return
        for nv, w in adj.get(v, []):
            if nv not in seen:
                walk(nv, cost + w, seen | {nv})

    walk(src, 0, {src})
    return best[0]


def _dedup(raw):
    """Mirror the stage's non-multigraph collapse: drop self-loops, keep the
    lightest (w, eid) parallel edge."""
    kept = {}
    for u, v, w, eid in raw:
        if u == v:
            continue
        if (u, v) not in kept or (w, eid) < kept[(u, v)]:
            kept[(u, v)] = (w, eid)
    return [(u, v, w) for (u, v), (w, _) in kept.items()]


def test_group_paths_vs_bruteforce():
    rng = np.random.default_rng(31)
    for _ in range(60):
        n_e = int(rng.integers(1, 10))
        raw = [(int(rng.integers(0, 8)), int(rng.integers(0, 8)),
                int(rng.integers(1, 50)), i) for i in range(n_e)]
        rows = _group_paths(
            0,
            np.array([r[0] for r in raw], dtype=np.int64),
            np.array([r[1] for r in raw], dtype=np.int64),
            np.array([r[2] for r in raw], dtype=np.int64),
            np.array([r[3] for r in raw], dtype=np.int64),
            8,
        )
        edges = _dedup(raw)
        touched = {u for u, v, w in edges} | {v for u, v, w in edges}
        has_in = {v for _, v, _ in edges}
        has_out = {u for u, _, _ in edges}
        sources = sorted(touched - has_in)
        sinks = sorted(touched - has_out)
        # group step rows into paths
        paths = {}
        for s, t, d, si, node in rows:
            paths.setdefault((s, t), (d, []))[1].append((si, node))
        # 1) pair set == all (source, sink) with finite brute-force distance
        want_pairs = {(s, t): _brute_shortest(edges, s, t)
                      for s in sources for t in sinks
                      if s != t and _brute_shortest(edges, s, t) is not None}
        assert set(paths) == set(want_pairs)
        ew = {(u, v): w for u, v, w in edges}
        for (s, t), (d, steps) in paths.items():
            # 2) distance equals the brute-force optimum
            assert d == want_pairs[(s, t)]
            # 3) the emitted step chain is a REAL path achieving that distance
            steps.sort()
            nodes = [node for _, node in steps]
            assert nodes[0] == s and nodes[-1] == t
            assert [si for si, _ in steps] == list(range(1, len(nodes) + 1))
            assert sum(ew[(a, b)] for a, b in zip(nodes, nodes[1:])) == d


def test_group_paths_min_pred_tiebreak():
    """Two equal-cost shortest paths: the backtrack must take the smallest
    achieving predecessor at every step (the SQL mirror's MIN(u))."""
    # 0→2 (w 5), 1→2 (w 5) can't tie into one sink pair; build a diamond:
    # 0→1 (3), 0→2 (3), 1→3 (3), 2→3 (3): two cost-6 paths 0-1-3 / 0-2-3.
    raw = [(0, 1, 3, 0), (0, 2, 3, 1), (1, 3, 3, 2), (2, 3, 3, 3)]
    rows = _group_paths(
        0,
        np.array([r[0] for r in raw], dtype=np.int64),
        np.array([r[1] for r in raw], dtype=np.int64),
        np.array([r[2] for r in raw], dtype=np.int64),
        np.array([r[3] for r in raw], dtype=np.int64),
        4,
    )
    nodes = [node for _, _, _, si, node in sorted(rows, key=lambda r: r[3])]
    assert nodes == [0, 1, 3]  # pred(3) = min(1, 2) = 1


def test_dijkstra_differs_from_viterbi_chain():
    """The documented semantic gap: the Viterbi chain DP picks exactly ONE
    candidate per step (locally scored, continuity-penalized) while the
    graph construction follows EDGE weights end-to-end — on a diamond where
    the per-step emission favors one branch but the edge weights favor the
    other, the two select different interior nodes."""
    from gtfs_conflation_pipeline_ray.stages.choose import _viterbi

    # steps: [0], [1 or 2], [3]; emissions favor 1 at the middle step
    cand_t = [np.array([0]), np.array([1, 2]), np.array([3])]
    cand_c = [np.array([0.0]), np.array([1.0, 9.0]), np.array([0.0])]
    chain = _viterbi(cand_t, cand_c, switch_penalty=0.0)
    assert chain.tolist() == [0, 1, 3]  # viterbi: cheapest emission

    # same topology as an edge graph, but edge weights favor the 0→2→3 arm
    raw = [(0, 1, 9, 0), (1, 3, 9, 1), (0, 2, 1, 2), (2, 3, 1, 3)]
    rows = _group_paths(
        0,
        np.array([r[0] for r in raw], dtype=np.int64),
        np.array([r[1] for r in raw], dtype=np.int64),
        np.array([r[2] for r in raw], dtype=np.int64),
        np.array([r[3] for r in raw], dtype=np.int64),
        4,
    )
    nodes = [node for _, _, _, si, node in sorted(rows, key=lambda r: r[3])]
    assert nodes == [0, 2, 3]  # dijkstra: cheapest edges


def test_dijkstra_paths_stage(ray_session):
    """End-to-end through bucketed_groups: two groups, one with an
    unreachable sink component."""
    from gtfs_conflation_pipeline_ray.stages.graphpaths import dijkstra_paths

    df = pd.DataFrame({
        "group_key": [1, 1, 1, 2, 2],
        "src": [0, 1, 4, 0, 2],
        "dst": [1, 2, 5, 1, 3],
        "w": [2, 3, 7, 1, 1],
        "eid": [0, 1, 2, 3, 4],
    })
    ds = ray.data.from_pandas(df)
    out = dijkstra_paths(ds, "group_key", "src", "dst", "w", "eid",
                         n_slots=8).to_pandas()
    g1 = out[out["group_key"] == 1].sort_values(["src_node", "dst_node", "si"])
    # group 1 has two components: 0→1→2 (dist 5) and 4→5 (dist 7)
    assert [(r.src_node, r.dst_node, r.dist_w, r.si, r.node)
            for r in g1.itertuples()] == [
        (0, 2, 5, 1, 0), (0, 2, 5, 2, 1), (0, 2, 5, 3, 2),
        (4, 5, 7, 1, 4), (4, 5, 7, 2, 5)]
    g2 = out[out["group_key"] == 2]
    # group 2: sources 0 and 2; sinks 1 and 3; only same-arm pairs reachable
    assert set(zip(g2["src_node"], g2["dst_node"])) == {(0, 1), (2, 3)}
