"""Integer PageRank — fixed-iteration link analysis as a Ray Data pipeline.

The graph-native sibling of ``dedup.dedup_clusters`` (connected components):
where CC answers "which nodes belong together", PageRank answers "which
nodes matter" — the standard centrality pass a 100 TB link/citation/dedup
graph pipeline runs after edge extraction.

Exactness: all arithmetic is int64 with FLOOR division, so the DuckDB
mirror reproduces every bit. Damping 0.85 is the rational 17/20:

    r_{k+1}(v) = (15 · SCALE) // 100  +  17 · Σ_{u→v} (r_k(u) // deg(u)) // 20

with r_0(v) = SCALE = 10^6. Floor-divided shares discard remainder mass by
DESIGN (both sides identically) — this is fixed-point PageRank, not a float
approximation of it.

Scale shape: each iteration is one hash join (ranks ⋈ edges on src — the
only per-iteration shuffle of rank rows) plus a combiner-first grouped sum
by dst; per-iteration state is the NODE set, never the edge payloads, and
the iteration count is fixed (unrolled in the oracle), so the plan depth is
static. ≙ the reference's iterative fix-point passes (union-to-fixpoint,
`unionPathLineStrings.js`) generalized to value propagation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 1_000_000


def pagerank(edges, n_iters: int = 3, src_col: str = "src",
             dst_col: str = "dst", n_parts: int = 8,
             broadcast_nodes_cap: int = 5_000_000):
    """``edges``: directed (src, dst) int64 Dataset (parallel edges allowed —
    they weight the walk, matching the SQL mirror which keeps duplicates).
    Returns (node, rank_q) for every node that appears as a src or dst;
    rank_q is the int64 fixed-point rank after ``n_iters`` iterations.

    Size-based plan selection (repo convention): when the node space fits
    the driver (``<= broadcast_nodes_cap`` rows of 4 int64 vectors), each
    iteration broadcasts the share vector and runs ONE bucketed combine
    over the distributed edge set — no per-iteration hash joins (which
    cost ~1s fixed each at small scale and dominated this operator's
    wall). Beyond the cap, the original join plan runs: ranks stay a
    Dataset and every step is a distributed join + combine. Both plans
    are bit-identical (same integer update rule)."""
    from .relational import bucketed_groups, partial_groupby_sum

    def _ident(t: pa.Table) -> pa.Table:
        return t

    def _one(t: pa.Table) -> pa.Table:
        return pa.table({"src": t[src_col], "dst": t[dst_col],
                         "w": np.ones(t.num_rows, dtype=np.int64)})

    # compress parallel edges to weighted distinct pairs up front: every
    # iteration then joins the DISTINCT pair set and multiplies shares by w
    # (integer multiply == repeated add, bit-identical to the duplicate-edge
    # oracle) — at sf0.1 this shrinks the per-round join ~4x
    edges = partial_groupby_sum(
        edges.map_batches(_one, batch_format="pyarrow", batch_size=65536),
        ["src", "dst"], ["w"], n_buckets=n_parts,
    ).map_batches(_ident, batch_format="pyarrow",
                  batch_size=65536).materialize()
    src_col, dst_col = "src", "dst"

    # out-degree per src (parallel edges count), and the node universe
    deg = partial_groupby_sum(
        edges.map_batches(
            lambda t: pa.table({"node": t["src"], "deg": t["w"]}),
            batch_format="pyarrow", batch_size=65536),
        ["node"], ["deg"], n_buckets=n_parts,
    ).map_batches(_ident, batch_format="pyarrow", batch_size=65536)

    def _nodes(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": np.unique(np.concatenate([s, d]))})

    def _dedup_nodes(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    nodes = bucketed_groups(
        edges.map_batches(_nodes, batch_format="pyarrow", batch_size=65536),
        ["node"], _dedup_nodes, n_buckets=n_parts,
    ).map_batches(_ident, batch_format="pyarrow", batch_size=65536)

    # ranks carry their share (rank // deg) so the per-iteration join output
    # is immediately consumable; dangling nodes (no out-edges) keep share 0
    ranks = nodes.join(deg, "left_outer", n_parts,
                       on=("node",), right_on=("node",))

    def _init(t: pa.Table) -> pa.Table:
        n = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        dg = t["deg"].to_numpy(zero_copy_only=False)
        dg = np.where(pd.isna(dg), 0, dg).astype(np.int64)
        r = np.full(len(n), SCALE, dtype=np.int64)
        return pa.table({"node": n, "deg": dg, "rank_q": r,
                         "share": np.where(dg > 0, r // np.maximum(dg, 1), 0)})

    ranks = ranks.map_batches(_init, batch_format="pyarrow",
                              batch_size=65536).materialize()
    base = 15 * SCALE // 100

    if ranks.count() <= broadcast_nodes_cap:
        import ray

        rdf = ranks.to_pandas()
        order = np.argsort(rdf["node"].to_numpy(), kind="stable")
        nodes_v = rdf["node"].to_numpy().astype(np.int64)[order]
        deg_v = rdf["deg"].to_numpy().astype(np.int64)[order]
        rank_v = rdf["rank_q"].to_numpy().astype(np.int64)[order]
        share_v = rdf["share"].to_numpy().astype(np.int64)[order]
        for _ in range(n_iters):
            share_ref = ray.put(share_v)
            nodes_ref = ray.put(nodes_v)

            def _contrib(t: pa.Table, share_ref=share_ref,
                         nodes_ref=nodes_ref) -> pa.Table:
                sv = ray.get(share_ref)
                nv = ray.get(nodes_ref)
                s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
                w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
                return pa.table({
                    "node": t[dst_col],
                    "in_share": w * sv[np.searchsorted(nv, s)],
                })

            insum = partial_groupby_sum(
                edges.map_batches(_contrib, batch_format="pyarrow",
                                  batch_size=65536),
                ["node"], ["in_share"], n_buckets=n_parts,
            ).map_batches(_ident, batch_format="pyarrow",
                          batch_size=65536).to_pandas()
            s_in = np.zeros(len(nodes_v), dtype=np.int64)
            ii = np.searchsorted(nodes_v,
                                 insum["node"].to_numpy().astype(np.int64))
            s_in[ii] = insum["in_share"].to_numpy().astype(np.int64)
            rank_v = base + 17 * s_in // 20
            share_v = np.where(deg_v > 0,
                               rank_v // np.maximum(deg_v, 1), 0)
        import ray.data as _rd

        return _rd.from_arrow(pa.table({"node": nodes_v, "rank_q": rank_v}))

    def _upd(t: pa.Table) -> pa.Table:
        n = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        dg = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["in_share"].to_numpy(zero_copy_only=False)
        s = np.where(pd.isna(s), 0, s).astype(np.int64)
        r = base + 17 * s // 20
        return pa.table({"node": n, "deg": dg, "rank_q": r,
                         "share": np.where(dg > 0, r // np.maximum(dg, 1), 0)})

    for _ in range(n_iters):
        contrib = edges.join(ranks, "inner", n_parts,
                             on=(src_col,), right_on=("node",))
        contrib = contrib.map_batches(
            lambda t: pa.table({
                "node": t[dst_col],
                "in_share": t["w"].to_numpy(zero_copy_only=False)
                * t["share"].to_numpy(zero_copy_only=False)}),
            batch_format="pyarrow", batch_size=65536)
        insum = partial_groupby_sum(contrib, ["node"], ["in_share"],
                                    n_buckets=n_parts).map_batches(
            _ident, batch_format="pyarrow", batch_size=65536)
        # left join keeps nodes with no in-edges at in_share = 0
        ranks = ranks.select_columns(["node", "deg"]).join(
            insum, "left_outer", n_parts, on=("node",), right_on=("node",))
        ranks = ranks.map_batches(_upd, batch_format="pyarrow",
                                  batch_size=65536).materialize()

    return ranks.map_batches(
        lambda t: pa.table({"node": t["node"], "rank_q": t["rank_q"]}),
        batch_format="pyarrow", batch_size=65536)


def triangle_counts(edges, a_col: str = "supp_a", b_col: str = "supp_b"):
    """Per-node triangle counts over an undirected edge set (rows carry each
    unordered edge once as a < b) — the classic degree-ordered-orientation
    triangle enumeration: for every edge (a, b), triangles are the common
    neighbors c > b of a and b, so each triangle a < b < c is found exactly
    once, at its lowest edge. Per-edge work = one sorted-adjacency
    intersection; the hot loop is over edges in a batch with numpy
    ``intersect1d`` per edge.

    The edge table is BOUNDED (it is itself the thresholded output of a
    grouped aggregation), so it materializes once and broadcasts as a CSR
    adjacency (``ray.put``); the edge stream then probes it batch-parallel —
    the same broadcast-small-side shape as the spatial joins. Returns
    (node, n_triangles) for nodes in ≥1 triangle."""
    import ray

    from .util import cached_state
    from .relational import partial_groupby_sum

    epd = edges.to_pandas()  # bounded: the thresholded pair table
    full = pa.table({a_col: epd[a_col].to_numpy().astype(np.int64),
                     b_col: epd[b_col].to_numpy().astype(np.int64)})
    eref = ray.put(full)
    edges = ray.data.from_arrow(full)

    def _build_csr(t: pa.Table):
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        nodes, starts = np.unique(src, return_index=True)
        return nodes, np.append(starts, len(src)), dst

    def _tri(batch: pa.Table) -> pa.Table:
        nodes, indptr, dst = cached_state(eref, _build_csr, token="tri_csr")
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ai = np.searchsorted(nodes, a)
        bi = np.searchsorted(nodes, b)
        out_n, out_c = [], []
        for i in range(len(a)):
            na = dst[indptr[ai[i]]:indptr[ai[i] + 1]]
            nb = dst[indptr[bi[i]]:indptr[bi[i] + 1]]
            common = np.intersect1d(na, nb, assume_unique=True)
            common = common[common > b[i]]
            k = len(common)
            if k == 0:
                continue
            out_n.extend((a[i], b[i]))
            out_c.extend((k, k))
            out_n.extend(common.tolist())
            out_c.extend([1] * k)
        return pa.table({"supp": np.asarray(out_n, np.int64),
                         "n_triangles": np.asarray(out_c, np.int64)})

    partials = edges.map_batches(_tri, batch_format="pyarrow",
                                 batch_size=8192)
    return partial_groupby_sum(partials, ["supp"], ["n_triangles"])


def bfs_hops(edges, seeds, max_hops: int = 4, src_col: str = "src",
             dst_col: str = "dst", node_col: str = "node", n_parts: int = 8):
    """Multi-source BFS: minimum hop count from any seed, bounded by
    ``max_hops`` — the reachability/radius pass of a graph pipeline (≙ the
    reference's component walk in ``createPathLineStrings.js:12-45``
    generalized to hop distance, and the expansion step of a kNN-graph
    diffusion).

    Scale shape: each round is ONE hash join (frontier ⋈ edges on src) +
    a grouped-min dedup, so per-round shuffle volume is the frontier's edge
    neighborhood, never the graph; the visited set rides along as a sorted
    broadcast array for the anti-join (Ray 2.49's native left_anti is
    broken — see bench gotchas) — bounded by the REACHED subgraph, the same
    assumption the CC engine's label frontier makes. Round count is fixed
    (``max_hops``), so the plan depth is static and the oracle unrolls as a
    bounded recursive CTE.

    Returns (node, hops) for every node within ``max_hops`` of a seed.
    """
    import ray

    from .relational import partial_groupby_sum
    from .util import cached_state

    def _ident(t: pa.Table) -> pa.Table:
        return t

    def _seed(t: pa.Table) -> pa.Table:
        n = t[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": n,
                         "hops": np.zeros(len(n), dtype=np.int64)})

    visited = seeds.map_batches(_seed, batch_format="pyarrow",
                                batch_size=65536).materialize()
    frontier = visited
    out = [visited]

    for h in range(1, max_hops + 1):
        # neighbors of the frontier: one hash join on src
        np_h = max(1, min(n_parts, frontier.count() // 50_000 + 1))
        nxt = edges.join(
            frontier.map_batches(
                lambda t: pa.table({"fnode": t["node"]}),
                batch_format="pyarrow", batch_size=65536).materialize(),
            "inner", np_h, on=(src_col,), right_on=("fnode",))
        # dedup candidate nodes before the anti-join (combiner-first)
        cand = partial_groupby_sum(
            nxt.map_batches(
                lambda t: pa.table({"node": t[dst_col]}),
                batch_format="pyarrow", batch_size=65536),
            ["node"], [], count_as="_c", n_buckets=np_h)
        # anti-join against visited via a sorted broadcast array (bounded by
        # the reached set; a huge-graph deployment swaps in the hash-join
        # plan exactly like dedup_clusters' size-based selection)
        varr = np.sort(np.concatenate(
            [b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
             for b in visited.iter_batches(batch_format="pyarrow",
                                           batch_size=65536)]
            or [np.array([], dtype=np.int64)]))
        vref = ray.put(varr)

        def _new(t: pa.Table, _h=h, _vref=vref) -> pa.Table:
            arr = cached_state(_vref, lambda a: a, token=f"_bfs_visited_{_h}")
            n = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(arr):
                ix = np.minimum(np.searchsorted(arr, n), len(arr) - 1)
                keep = arr[ix] != n
            else:
                keep = np.ones(len(n), dtype=bool)
            n = n[keep]
            return pa.table({"node": n,
                             "hops": np.full(len(n), _h, dtype=np.int64)})

        frontier = cand.map_batches(_new, batch_format="pyarrow",
                                    batch_size=65536).materialize()
        if frontier.count() == 0:
            break
        out.append(frontier)
        visited = visited.union(frontier).materialize()

    res = out[0]
    for d in out[1:]:
        res = res.union(d)
    return res.map_batches(_ident, batch_format="pyarrow", batch_size=65536)


def kcore_peel(edges, k: int, rounds: int, a_col: str = "supp_a",
               b_col: str = "supp_b", n_parts: int = 8):
    """k-core peeling, fixed ``rounds`` iterations (unrolled in the oracle,
    the ``pagerank`` convention): round r drops every node whose degree in
    the surviving subgraph is < k; after the last round the survivors are
    emitted with their degree in the FINAL induced subgraph. The density
    backbone extraction of a co-occurrence / dedup graph (which suppliers
    sit in a dense substitution core; which documents form a dense near-dup
    mesh).

    ``edges``: undirected (a, b) with a < b, assumed distinct pairs.
    Scale shape: per round one combiner-first degree sum + one map-side
    edge filter against the SURVIVOR set (sorted broadcast array — bounded
    by the node alphabet, which for supplier/part graphs is the bounded
    dimension side; swap in hash-join filtering for open node domains).
    Returns (node, deg) for survivors after ``rounds`` peels.
    """
    import ray

    from .relational import partial_groupby_sum
    from .util import cached_state

    def _ident(t: pa.Table) -> pa.Table:
        return t

    def _both(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"s": np.concatenate([a, b]),
                         "t": np.concatenate([b, a])})

    ed = edges.map_batches(_both, batch_format="pyarrow",
                           batch_size=65536).materialize()

    def _deg(e):
        return partial_groupby_sum(
            e.map_batches(lambda t: pa.table({"node": t["s"]}),
                          batch_format="pyarrow", batch_size=65536),
            ["node"], [], count_as="deg", n_buckets=n_parts,
        ).map_batches(_ident, batch_format="pyarrow", batch_size=65536)

    for r in range(rounds):
        deg = _deg(ed)
        surv = deg.filter(expr=f"deg >= {k}")
        sarr = np.sort(np.concatenate(
            [b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
             for b in surv.iter_batches(batch_format="pyarrow",
                                        batch_size=65536)]
            or [np.array([], dtype=np.int64)]))
        if len(sarr) == 0:
            return ray.data.from_arrow(pa.table(
                {"node": np.array([], dtype=np.int64),
                 "deg": np.array([], dtype=np.int64)}))
        sref = ray.put(sarr)

        def _filt(t: pa.Table, _r=r, _sref=sref) -> pa.Table:
            arr = cached_state(_sref, lambda a: a, token=f"_kcore_surv_{_r}")
            s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["t"].to_numpy(zero_copy_only=False).astype(np.int64)
            ixs = np.minimum(np.searchsorted(arr, s), len(arr) - 1)
            ixd = np.minimum(np.searchsorted(arr, d), len(arr) - 1)
            m = (arr[ixs] == s) & (arr[ixd] == d)
            return pa.table({"s": s[m], "t": d[m]})

        ed = ed.map_batches(_filt, batch_format="pyarrow",
                            batch_size=65536).materialize()

    return _deg(ed)


def sssp_rounds(edges, seeds, rounds: int = 3, src_col: str = "src",
                dst_col: str = "dst", w_col: str = "w",
                node_col: str = "node", n_parts: int = 8):
    """Multi-source WEIGHTED shortest path (the isochrone / cost-field
    pass: travel cost from the nearest depot, reach within a budget),
    fixed-round Bellman-Ford so the oracle unrolls as MATERIALIZED rounds:

        dist_{r+1} = grouped-min( dist_r  ∪  { (v, dist_r(u) + w) : (u,v,w) } )

    The weighted sibling of :func:`bfs_hops` — BFS counts hops, this
    accumulates edge weights; after ``rounds`` relaxations the result is
    exact for every node whose shortest path uses ≤ ``rounds`` edges.

    Scale shape: per round ONE hash join (dist ⋈ edges on src — shuffle
    volume is the reached set's out-neighborhood) + a combiner-first
    grouped min; state is the reached node set, never edges. Returns
    (node, cost) for every node reached within ``rounds`` edges.
    """
    from .relational import bucketed_groups

    def _seed(t: pa.Table) -> pa.Table:
        n = t[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": n, "cost": np.zeros(len(n), np.int64)})

    def _grouped_min(ds):
        def _pre(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("node", as_index=False, sort=False,
                              observed=True).agg(cost=("cost", "min"))

        return bucketed_groups(ds, ["node"], _pre, pre_fn=_pre,
                               n_buckets=n_parts)

    dist = seeds.map_batches(_seed, batch_format="pyarrow",
                             batch_size=65536).materialize()

    for r in range(rounds):
        np_h = max(1, min(n_parts, dist.count() // 50_000 + 1))
        relaxed = edges.join(
            dist.map_batches(
                lambda t: pa.table({"fnode": t["node"], "fcost": t["cost"]}),
                batch_format="pyarrow", batch_size=65536).materialize(),
            "inner", np_h, on=(src_col,), right_on=("fnode",))

        def _relax(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t[dst_col],
                "cost": (t["fcost"].to_numpy(zero_copy_only=False).astype(np.int64)
                         + t[w_col].to_numpy(zero_copy_only=False).astype(np.int64)),
            })

        cand = relaxed.map_batches(_relax, batch_format="pyarrow",
                                   batch_size=65536)
        # re-normalize to Arrow blocks: bucketed_groups emits pandas blocks
        # and a mixed-block union breaks Ray's batcher on the next round
        dist = _grouped_min(dist.union(cand)).map_batches(
            lambda t: t.select(["node", "cost"]),
            batch_format="pyarrow", batch_size=65536).materialize()

    return dist


def pointer_double_chain(state0, rounds: int = 6, n_parts: int = 8):
    """Ancestor-chain rollup by POINTER DOUBLING (a.k.a. pointer jumping) —
    the O(log depth) distributed form of "walk every node's parent chain to
    the root": per round ONE self-join doubles the walked prefix, so depth
    2^rounds resolves in ``rounds`` shuffles where naive per-level walking
    needs ``depth`` (the PRAM list-ranking classic; the hierarchy/BOM
    rollup every org-chart / category-tree / thread-tree pipeline runs).

    Input columns (node, parent, val) with parent < 0 marking the root
    (a NEGATIVE sentinel, so 0 stays a legal node id). State invariant
    after k rounds, per node: ``ptr`` = the 2^k-th ancestor
    (-1 once the chain is exhausted), ``acc`` = sum of val over the walked
    prefix [node .. ptr), ``dep`` = edges inside that prefix. One doubling
    step joins every unfinished row with the SAME round's state of its ptr:

        acc' = acc + acc[ptr];  dep' = dep + dep[ptr] + 1;  ptr' = ptr[ptr]

    Finished rows (ptr < 0) stay in the table — they are exactly the
    suffix-sums their descendants still need. Exact for every chain of
    depth <= 2^rounds; the sf fixtures (parent = key // 2) are depth
    <= log2(max key). Returns (node, depth, chain_sum)."""

    def _init(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        par = t["parent"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = t["val"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": node, "ptr": par, "acc": val,
                         "dep": np.zeros(len(node), np.int64)})

    state = state0.map_batches(_init, batch_format="pyarrow",
                               batch_size=65536).materialize()

    def _split(want_done: bool):
        def _f(t: pa.Table) -> pa.Table:
            ptr = t["ptr"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ptr < 0 if want_done else ptr >= 0))

        return _f

    for _ in range(rounds):
        active = state.map_batches(_split(False), batch_format="pyarrow",
                                   batch_size=65536)
        if active.count() == 0:
            break
        done = state.map_batches(_split(True), batch_format="pyarrow",
                                 batch_size=65536)
        right = state.map_batches(
            lambda t: pa.table({"rnode": t["node"], "rptr": t["ptr"],
                                "racc": t["acc"], "rdep": t["dep"]}),
            batch_format="pyarrow", batch_size=65536).materialize()
        joined = active.join(right, "inner", n_parts,
                             on=("ptr",), right_on=("rnode",))

        def _step(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t["node"],
                "ptr": t["rptr"],
                "acc": (t["acc"].to_numpy(zero_copy_only=False).astype(np.int64)
                        + t["racc"].to_numpy(zero_copy_only=False).astype(np.int64)),
                "dep": (t["dep"].to_numpy(zero_copy_only=False).astype(np.int64)
                        + t["rdep"].to_numpy(zero_copy_only=False).astype(np.int64)
                        + 1),
            })

        state = done.union(
            joined.map_batches(_step, batch_format="pyarrow",
                               batch_size=65536)).materialize()

    return state.map_batches(
        lambda t: pa.table({"node": t["node"], "depth": t["dep"],
                            "chain_sum": t["acc"]}),
        batch_format="pyarrow", batch_size=65536)


def label_propagation_rounds(edges, seeds, rounds: int = 2,
                             src_col: str = "src", dst_col: str = "dst",
                             n_parts: int = 8):
    """Semi-supervised LABEL PROPAGATION, fixed rounds so the oracle
    unrolls: each round every node adopts the MODAL label of its labeled
    in-neighbors (ties to the smallest label); SEED labels are clamped
    (never overwritten) — the graph-ML label-spreading pass next to
    PageRank (value propagation) and CC (min propagation). Per round ONE
    hash join (labels ⋈ edges on src) + a combiner-first (dst, label)
    count + a bucketed per-dst mode; the seed set is BROADCAST-bounded
    (documented assumption) for the clamp. Unreached nodes stay absent.
    Returns (node, label)."""
    import ray

    from .relational import bucketed_groups, partial_groupby_sum
    from .util import cached_state

    seed_pd = seeds.to_pandas()  # bounded seed set (contract above)
    seed_ref = ray.put(dict(zip(seed_pd["node"].astype(int),
                                seed_pd["label"].astype(int))))

    labels = seeds.map_batches(
        lambda t: pa.table({"node": t["node"], "label": t["label"]}),
        batch_format="pyarrow", batch_size=65536).materialize()

    for _ in range(rounds):
        right = labels.map_batches(
            lambda t: pa.table({"fnode": t["node"], "flab": t["label"]}),
            batch_format="pyarrow", batch_size=65536).materialize()
        votes = edges.join(right, "inner", n_parts,
                           on=(src_col,), right_on=("fnode",))
        pairs = votes.map_batches(
            lambda t: pa.table({"node": t[dst_col], "label": t["flab"]}),
            batch_format="pyarrow", batch_size=65536)
        counts = partial_groupby_sum(pairs, ["node", "label"], [],
                                     count_as="c", n_buckets=n_parts)

        def _mode(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["c", "label"], ascending=[False, True],
                              kind="mergesort")
            g = g.drop_duplicates("node")
            sd = cached_state(seed_ref, lambda m: m, token="labelprop_seeds")
            mask = ~g["node"].isin(sd.keys())
            return g.loc[mask, ["node", "label"]]

        spread = bucketed_groups(counts, ["node"], _mode, n_buckets=n_parts)
        # clamp: next round's labels = seeds (verbatim) ∪ non-seed modes
        labels = seeds.map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["label"]}),
            batch_format="pyarrow", batch_size=65536).union(
            spread.map_batches(
                lambda df: pa.Table.from_pandas(
                    df.astype({"node": np.int64, "label": np.int64}),
                    preserve_index=False),
                batch_format="pandas", batch_size=65536)).materialize()

    return labels


def _boruvka_kernel(u, v, w, max_rounds: int = 16):
    """Vectorized single-worker Borůvka over int64 arrays (u < v per edge,
    (u, v) distinct). Tie-break total order (w, u, v) makes the MSF unique,
    so the distributed path and any correct MST algorithm agree bit-exactly.
    Returns (sel_idx, sel_round) — indices into the input edge arrays."""
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[:len(u)], inv[len(u):]
    comp = np.arange(len(nodes), dtype=np.int64)
    sel_idx, sel_round = [], []
    for r in range(max_rounds):
        cu, cv = comp[ui], comp[vi]
        cross = cu != cv
        if not cross.any():
            break
        idx = np.nonzero(cross)[0]
        # both orientations: every component sees its incident cross edges
        cc = np.concatenate([cu[idx], cv[idx]])
        ei = np.concatenate([idx, idx])
        order = np.lexsort((v[ei], u[ei], w[ei], cc))
        cc_s, ei_s = cc[order], ei[order]
        first = np.ones(len(cc_s), dtype=bool)
        first[1:] = cc_s[1:] != cc_s[:-1]
        chosen = np.unique(ei_s[first])
        sel_idx.append(chosen)
        sel_round.append(np.full(len(chosen), r, dtype=np.int64))
        # contract: hash-min + pointer-doubling CC over the selected
        # component arcs (same loop as dedup_clusters' _cc_kernel)
        ca, cb = comp[ui[chosen]], comp[vi[chosen]]
        cn, cinv = np.unique(np.concatenate([ca, cb]), return_inverse=True)
        si = np.concatenate([cinv[:len(ca)], cinv[len(ca):]])
        di = np.concatenate([cinv[len(ca):], cinv[:len(ca)]])
        lbl = np.arange(len(cn), dtype=np.int64)
        # contraction must reach the FIXPOINT (the oracle's recursive CTE
        # is exact transitive closure) — its round budget is independent
        # of the Borůvka round budget
        for _ in range(64):
            prev = lbl.copy()
            nxt = lbl.copy()
            np.minimum.at(nxt, di, lbl[si])
            lbl = np.minimum(nxt[nxt], nxt)
            if (lbl == prev).all():
                break
        else:
            raise RuntimeError("boruvka contraction: no CC fixpoint")
        uc = np.unique(comp)
        remap = uc.copy()
        remap[np.searchsorted(uc, cn)] = cn[lbl]  # cn ⊆ uc
        comp = remap[np.searchsorted(uc, comp)]
    if sel_idx:
        return np.concatenate(sel_idx), np.concatenate(sel_round)
    return (np.array([], dtype=np.int64), np.array([], dtype=np.int64))


def boruvka_msf(edges, max_rounds: int = 10, n_parts: int = 8,
                smallgraph_edges: int = 2_000_000):
    """Minimum spanning FOREST by Borůvka — the parallel-MST classic (each
    component grabs its lightest incident edge, components contract,
    repeat; O(log n) rounds): the clustering / network-design primitive
    (single-linkage dendrograms, road-network skeletons) next to CC
    (``dedup_clusters``) and SSSP (``sssp_rounds``).

    ``edges``: Dataset (u, v, w) int64 with u < v, (u, v) distinct. The
    tie-break total order (w, u, v) makes the MSF UNIQUE, so any correct
    MST algorithm reproduces it — the oracle replays the rounds with
    per-round recursive-CTE contraction, pytest cross-checks Kruskal.

    Scale shape (mirrors ``dedup_clusters``' size-based plan selection):
    an edge set that fits one task collapses to one vectorized kernel;
    larger graphs take the round loop where edges NEVER leave their
    shards — per round each shard emits per-component partial argmins
    (combiner), one component-bucketed shuffle finalizes the argmin, and
    the contraction runs on the SELECTED edge set (component-count-sized,
    halving per round). Per-round driver state is the component map, never
    the edge set. Returns (u, v, w, r) — MSF edges + selection round."""
    import ray

    from .relational import bucketed_groups

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        import pyarrow as _pa
        return ray.data.from_arrow(_pa.table({
            "u": _pa.array([], type=_pa.int64()),
            "v": _pa.array([], type=_pa.int64()),
            "w": _pa.array([], type=_pa.int64()),
            "r": _pa.array([], type=_pa.int64())}))

    if n_edges <= smallgraph_edges:
        def _msf(batch: pa.Table) -> pa.Table:
            u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            # global (u, v) dedup — per-shard dedup upstream can't see
            # cross-shard duplicates, and the kernel requires distinct pairs
            order = np.lexsort((w, v, u))
            u, v, w = u[order], v[order], w[order]
            first = np.ones(len(u), dtype=bool)
            first[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
            u, v, w = u[first], v[first], w[first]
            sel, rnd = _boruvka_kernel(u, v, w, max_rounds=max_rounds)
            return pa.table({"u": u[sel], "v": v[sel], "w": w[sel],
                             "r": rnd})

        return edges.repartition(1).map_batches(
            _msf, batch_format="pyarrow", batch_size=None)

    # distributed rounds: labels live driver-side only as the CONTRACTED
    # component map (halving per round); edges stay sharded throughout
    from .util import cached_state

    out_parts = []
    label_map: dict[int, int] = {}  # node -> comp (identity when absent)
    for r in range(max_rounds):
        lref = ray.put(label_map)

        def _partial_min(df: pd.DataFrame, _lref=lref, _r=r) -> pd.DataFrame:
            lm = cached_state(_lref, lambda m: m, token=f"boruvka.lab{_r}")
            uu = df["u"].to_numpy(np.int64)
            vv = df["v"].to_numpy(np.int64)
            ww = df["w"].to_numpy(np.int64)
            cu = np.array([lm.get(int(x), int(x)) for x in uu])
            cv = np.array([lm.get(int(x), int(x)) for x in vv])
            m = cu != cv
            if not m.any():
                return pd.DataFrame({"c": [], "w": [], "u": [], "v": []}
                                    ).astype(np.int64)
            d = pd.DataFrame({
                "c": np.concatenate([cu[m], cv[m]]),
                "w": np.concatenate([ww[m], ww[m]]),
                "u": np.concatenate([uu[m], uu[m]]),
                "v": np.concatenate([vv[m], vv[m]])})
            d = d.sort_values(["c", "w", "u", "v"], kind="mergesort")
            return d.drop_duplicates("c", keep="first")

        def _final_min(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["c", "w", "u", "v"], kind="mergesort")
            return g.drop_duplicates("c", keep="first")

        staged = edges.map_batches(_partial_min, batch_format="pandas",
                                   batch_size=65536)
        sel = bucketed_groups(staged, ["c"], _final_min,
                              n_buckets=n_parts)
        sel_df = sel.to_pandas()  # component-count-sized, halves per round
        sel_df = sel_df.drop_duplicates(["u", "v"])
        if len(sel_df) == 0:
            break
        out_parts.append(sel_df.assign(r=np.int64(r))[["u", "v", "w", "r"]])
        # contract on the selected component arcs
        cu = np.array([label_map.get(int(x), int(x))
                       for x in sel_df["u"].to_numpy(np.int64)])
        cv = np.array([label_map.get(int(x), int(x))
                       for x in sel_df["v"].to_numpy(np.int64)])
        cn, cinv = np.unique(np.concatenate([cu, cv]), return_inverse=True)
        si = np.concatenate([cinv[:len(cu)], cinv[len(cu):]])
        di = np.concatenate([cinv[len(cu):], cinv[:len(cu)]])
        lbl = np.arange(len(cn), dtype=np.int64)
        for _ in range(32):
            prev = lbl.copy()
            nxt = lbl.copy()
            np.minimum.at(nxt, di, lbl[si])
            lbl = np.minimum(nxt[nxt], nxt)
            if (lbl == prev).all():
                break
        root = dict(zip(cn.tolist(), cn[lbl].tolist()))
        # compose: every node whose comp got contracted follows it
        for nd in list(label_map):
            label_map[nd] = root.get(label_map[nd], label_map[nd])
        for c, rt in root.items():
            label_map.setdefault(c, rt)
    import pandas as _pd
    allsel = (_pd.concat(out_parts, ignore_index=True) if out_parts
              else _pd.DataFrame({"u": [], "v": [], "w": [], "r": []}
                                 ).astype(np.int64))
    return ray.data.from_pandas(allsel)


def _matching_kernel(u: np.ndarray, v: np.ndarray, w: np.ndarray,
                     max_rounds: int) -> tuple[np.ndarray, np.ndarray]:
    """One-worker vectorized locally-dominant matching rounds. Returns
    (selected edge indices, their rounds)."""
    n = len(u)
    alive = np.ones(n, bool)
    matched: set[int] = set()
    sel_idx: list[int] = []
    sel_r: list[int] = []
    for r in range(max_rounds):
        live = np.flatnonzero(alive)
        if len(live) == 0:
            break
        lu, lv, lw = u[live], v[live], w[live]
        x = np.concatenate([lu, lv])
        ew = np.concatenate([lw, lw])
        eu = np.concatenate([lu, lu])
        ev = np.concatenate([lv, lv])
        ei = np.concatenate([live, live])
        order = np.lexsort((ev, eu, ew, x))
        xs = x[order]
        first = np.r_[True, xs[1:] != xs[:-1]]
        min_edge = ei[order][first]  # one per live vertex
        # an edge dominant at both endpoints appears twice
        me_sorted = np.sort(min_edge)
        dup = me_sorted[1:] == me_sorted[:-1]
        chosen = me_sorted[1:][dup]
        if len(chosen) == 0:
            break
        sel_idx.extend(chosen.tolist())
        sel_r.extend([r] * len(chosen))
        for e in chosen:
            matched.add(int(u[e]))
            matched.add(int(v[e]))
        if matched:
            ma = np.fromiter(matched, np.int64)
            alive &= ~(np.isin(u, ma) | np.isin(v, ma))
    return (np.asarray(sel_idx, np.int64), np.asarray(sel_r, np.int64))


def greedy_matching(edges, max_rounds: int = 12, n_parts: int = 8,
                    smallgraph_edges: int = 2_000_000):
    """MAXIMAL MATCHING by locally-dominant edges (Preis / Manne-Bisseling;
    the parallel analog of sequential greedy matching — with the strict
    (w, u, v) total order the two produce the SAME matching, which pytest
    exploits): per round an edge is selected iff it is the minimum-key
    live edge at BOTH endpoints; matched vertices retire their edges.
    The one-to-one assignment primitive of conflation itself — 'pair each
    GTFS segment with at most one OSM segment, lightest conflict wins'.

    ``edges``: Dataset (u, v, w) int64, u < v, duplicates collapse to the
    same key. Emits (u, v, w, r) — matched edges + selection round.

    Scale shape mirrors :func:`boruvka_msf`: small edge sets collapse to
    one vectorized task; larger graphs run distributed rounds where edges
    never leave their shards — per round each shard emits per-VERTEX
    partial argmins (combiner), one vertex-bucketed shuffle finalizes, a
    second edge-key-bucketed pass counts dominance (= 2 means selected),
    and only the matching-sized selected set reaches the driver (the
    matched-vertex set broadcasts back, growing by 2 x selected per
    round)."""
    import ray

    from .relational import bucketed_groups
    from .util import cached_state

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(pa.table({
            "u": pa.array([], type=pa.int64()),
            "v": pa.array([], type=pa.int64()),
            "w": pa.array([], type=pa.int64()),
            "r": pa.array([], type=pa.int64())}))

    if n_edges <= smallgraph_edges:
        def _match(batch: pa.Table) -> pa.Table:
            u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.lexsort((w, v, u))
            u, v, w = u[order], v[order], w[order]
            first = np.ones(len(u), dtype=bool)
            first[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
            u, v, w = u[first], v[first], w[first]
            sel, rnd = _matching_kernel(u, v, w, max_rounds=max_rounds)
            return pa.table({"u": u[sel], "v": v[sel], "w": w[sel],
                             "r": rnd})

        return edges.repartition(1).map_batches(
            _match, batch_format="pyarrow", batch_size=None)

    out_parts = []
    matched = np.empty(0, np.int64)
    for r in range(max_rounds):
        mref = ray.put(np.sort(matched))

        def _partial_min(df: pd.DataFrame, _mref=mref, _r=r) -> pd.DataFrame:
            ma = cached_state(_mref, lambda m: m, token=f"match.m{_r}")
            uu = df["u"].to_numpy(np.int64)
            vv = df["v"].to_numpy(np.int64)
            ww = df["w"].to_numpy(np.int64)
            live = ~(np.isin(uu, ma) | np.isin(vv, ma))
            uu, vv, ww = uu[live], vv[live], ww[live]
            if len(uu) == 0:
                return pd.DataFrame({"x": [], "w": [], "u": [], "v": []}
                                    ).astype(np.int64)
            d = pd.DataFrame({
                "x": np.concatenate([uu, vv]),
                "w": np.concatenate([ww, ww]),
                "u": np.concatenate([uu, uu]),
                "v": np.concatenate([vv, vv])})
            d = d.sort_values(["x", "w", "u", "v"], kind="mergesort")
            return d.drop_duplicates("x", keep="first")

        def _final_min(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["x", "w", "u", "v"], kind="mergesort")
            return g.drop_duplicates("x", keep="first")

        staged = edges.map_batches(_partial_min, batch_format="pandas",
                                   batch_size=65536)
        vmin = bucketed_groups(staged, ["x"], _final_min, n_buckets=n_parts)

        def _dominant(g: pd.DataFrame) -> pd.DataFrame:
            c = g.groupby(["w", "u", "v"], as_index=False, sort=False
                          ).agg(k=("x", "size"))
            return c[c["k"] == 2][["u", "v", "w"]]

        sel = bucketed_groups(vmin, ["w", "u", "v"], _dominant,
                              n_buckets=n_parts)
        sel_df = sel.to_pandas()  # matching-sized
        if len(sel_df) == 0:
            break
        out_parts.append(sel_df.assign(r=np.int64(r))[["u", "v", "w", "r"]])
        matched = np.concatenate([
            matched, sel_df["u"].to_numpy(np.int64),
            sel_df["v"].to_numpy(np.int64)])
    allsel = (pd.concat(out_parts, ignore_index=True) if out_parts
              else pd.DataFrame({"u": [], "v": [], "w": [], "r": []}
                                ).astype(np.int64))
    return ray.data.from_pandas(allsel)
