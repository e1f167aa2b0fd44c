"""Graph-native path construction: per-group connected subgraph → every
source→sink shortest path — the engine's direct analog of the reference's
subgraph components + Dijkstra traversal
(``/root/reference/src/services/Conflation/chooseShstMatchesForShape/computeSubGraphComponentsTraversals/createPathLineStrings.js:12-78``
and ``buildShstMatchSubGraphsPerGtfsShapeSegment.js:46-113``), offered
NEXT TO the Viterbi chain DP (``stages/choose.py``) as the fidelity option.

Semantics preserved from the reference:
  - nodes are match endpoints (shared-vertex ids), edges are matches with
    weight = len × rmsd (here an integer weight column);
  - the graph is directed, non-multigraph (parallel (src,dst) edges
    collapse to ONE — the reference keeps the last-inserted match, we keep
    the lightest (w, edge_id), a documented substitution with identical
    non-multigraph semantics), self-loops dropped (a degenerate match);
  - sources = in-degree-0 nodes, sinks = out-degree-0 nodes;
  - for every source, Dijkstra; every sink with finite distance yields one
    predecessor-backtracked path.

The reference's undirected-components pass (``graphAlgs.components`` +
source/sink ∩ component) only PRUNES pairs that the finite-distance check
excludes anyway — ``componentSources`` falls back to the identical
intersection when empty (sources === subGraphSources in the reference), so
"all (source, sink) pairs with finite directed distance" is exactly the
reference's path set and both engine and oracle skip the explicit component
construction.

Determinism (what makes the recursive-CTE oracle bit-exact): distances are
the unique shortest-path metric; the PATH tie-break is pinned by the
post-fixpoint predecessor rule ``pred(v) = min{ u : dist(u) + w(u,v) ==
dist(v) }`` — smallest achieving predecessor node id — which both numpy and
SQL compute identically in int64.

Partitioning assumption: one segment subgraph = one group (bucketed by the
group key); node ids live in a small per-group id space (the reference's
per-segment endpoint table), so the per-group DP is O(V·E) on tiny V.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .relational import bucketed_groups

BIG = np.int64(2**62)


def _group_paths(gk, src_a, dst_a, w_a, eid_a, n_slots: int):
    """All source→sink shortest paths of ONE subgraph. Returns row tuples
    (src_node, dst_node, dist_w, si, node)."""
    # non-multigraph collapse: lightest (w, eid) per (src, dst); self-loops out
    keep = src_a != dst_a
    src_a, dst_a, w_a, eid_a = src_a[keep], dst_a[keep], w_a[keep], eid_a[keep]
    if len(src_a) == 0:
        return []
    order = np.lexsort((eid_a, w_a, dst_a, src_a))
    src_a, dst_a, w_a = src_a[order], dst_a[order], w_a[order]
    first = np.r_[True, (src_a[1:] != src_a[:-1]) | (dst_a[1:] != dst_a[:-1])]
    es, ed, ew = src_a[first], dst_a[first], w_a[first]

    has_in = np.zeros(n_slots, dtype=bool)
    has_out = np.zeros(n_slots, dtype=bool)
    has_in[ed] = True
    has_out[es] = True
    touched = np.zeros(n_slots, dtype=bool)
    touched[es] = True
    touched[ed] = True
    sources = np.flatnonzero(touched & ~has_in)
    sinks = np.flatnonzero(touched & ~has_out)
    rows = []
    for s in sources:
        dist = np.full(n_slots, BIG, dtype=np.int64)
        dist[s] = 0
        for _ in range(n_slots):  # Bellman-Ford to fixpoint (V rounds suffice)
            nd = dist[es] + ew
            nd[dist[es] >= BIG] = BIG
            before = dist.copy()
            np.minimum.at(dist, ed, nd)
            if np.array_equal(before, dist):
                break
        # post-fixpoint predecessor: min u achieving dist(u)+w == dist(v)
        pred = np.full(n_slots, -1, dtype=np.int64)
        achieve = (dist[es] < BIG) & (dist[es] + ew == dist[ed])
        if achieve.any():
            for u, v in zip(es[achieve][::-1], ed[achieve][::-1]):
                # reversed iteration + overwrite == min u per v, because
                # (es, ed) are lexsorted ascending
                pred[v] = u
        for t in sinks:
            if dist[t] >= BIG or t == s:
                continue
            path = [int(t)]
            v = int(t)
            while v != s:
                v = int(pred[v])
                path.append(v)
            path.reverse()
            for i, node in enumerate(path):
                rows.append((int(s), int(t), int(dist[t]), i + 1, node))
    return rows


def dijkstra_paths(edges_ds, group_col: str, src_col: str, dst_col: str,
                   w_col: str, eid_col: str, n_slots: int = 12,
                   est_rows: int | None = None):
    """Per-group all-source→sink shortest paths over an edge Dataset.
    Returns one row per path STEP:
    (group_col, src_node, dst_node, dist_w, si, node) — si is the 1-based
    position from the source."""

    def _paths(g: pd.DataFrame) -> pd.DataFrame:
        out = {k: [] for k in (group_col, "src_node", "dst_node",
                               "dist_w", "si", "node")}
        for gk, grp in g.groupby(group_col, sort=False):
            rows = _group_paths(
                gk,
                grp[src_col].to_numpy().astype(np.int64),
                grp[dst_col].to_numpy().astype(np.int64),
                grp[w_col].to_numpy().astype(np.int64),
                grp[eid_col].to_numpy().astype(np.int64),
                n_slots,
            )
            for s, t, d, si, node in rows:
                out[group_col].append(gk)
                out["src_node"].append(s)
                out["dst_node"].append(t)
                out["dist_w"].append(d)
                out["si"].append(si)
                out["node"].append(node)
        return pd.DataFrame({k: np.array(v, dtype=np.int64)
                             for k, v in out.items()})

    return bucketed_groups(edges_ds, [group_col], _paths, est_rows=est_rows)
