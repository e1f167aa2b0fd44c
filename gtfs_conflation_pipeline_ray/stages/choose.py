"""Chunked sequential path selection — the engine's re-expression of the
reference's `chooseShstMatchesForShape` core (SURVEY.md §3.2 Step B):

The reference builds a subgraph per shape segment (nodes = match endpoints,
edges = candidate matches weighted by len x RMSD), walks Dijkstra paths,
then anneals thresholds and enumerates up to O(2^n) path combinations to pick
the chain of matches that best covers the shape
(``/root/reference/src/services/Conflation/chooseShstMatchesForShape/``:
``buildShstMatchSubGraphsPerGtfsShapeSegment.js:17-113``,
``createPathLineStrings.js:12-78``, ``findNonAxiomaticPaths.js:12-320``).

Here the same argmax-coverage-with-continuity semantics are a per-shape
VITERBI dynamic program: for each segment of the shape, the candidate set is
its containing tiles; the chosen chain minimizes

    sum(segment->tile squared centroid distance)
  + switch_penalty * (#tile changes between consecutive matched segments)

which preserves the reference's objective shape (prefer locally-best matches,
penalize fragmented chains) while replacing the exponential combination
search with an exact O(n * c^2) DP — bounded, deterministic, and safe for
skewed shapes (candidate sets capped at MAX_CANDIDATES by (dist2, tile_id);
SURVEY §7.6-2).

Partitioning assumption: one shape = one group (bucketed by shape key); the
DP never crosses a shape boundary. Ties resolve to the first (lowest-index)
candidate, which is deterministic because candidates are pre-sorted by
(dist2, tile_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .relational import bucketed_groups
from .util import cached_state

MAX_CANDIDATES = 16  # per-segment cap (deterministic: best by (dist2, tile_id))


def _viterbi(cand_t: list[np.ndarray], cand_c: list[np.ndarray],
             switch_penalty: float) -> np.ndarray:
    """Exact min-cost chain through per-step candidate sets. Returns the
    chosen candidate VALUE per step (len == len(cand_t))."""
    costs: list[np.ndarray] = []
    backs: list[np.ndarray] = []
    prev_cost: np.ndarray | None = None
    prev_t: np.ndarray | None = None
    for t, c in zip(cand_t, cand_c):
        if prev_cost is None:
            cost = c.astype(np.float64).copy()
            back = np.full(len(t), -1, dtype=np.int64)
        else:
            trans = prev_cost[:, None] + np.where(
                prev_t[:, None] == t[None, :], 0.0, switch_penalty
            )
            back = np.argmin(trans, axis=0)
            cost = trans[back, np.arange(len(t))] + c
        costs.append(cost)
        backs.append(back)
        prev_cost, prev_t = cost, t
    out = np.empty(len(cand_t), dtype=np.int64)
    j = int(np.argmin(prev_cost))
    for k in range(len(cand_t) - 1, -1, -1):
        out[k] = cand_t[k][j]
        j = int(backs[k][j])
    return out


def viterbi_choose(segments_ds, tiles_ref, shape_col: str, seq_col: str,
                   x_col: str, y_col: str, switch_penalty: float = 1e7):
    """Per shape: choose one tile per segment from its candidate containment
    set, minimizing total squared centroid distance + switch penalty per tile
    change. Segments with no candidates are skipped by the chain (emitted
    with tile_id = -1). Returns (shape_col, seq_col, tile_id, n_candidates).
    """

    def _choose(g: pd.DataFrame) -> pd.DataFrame:
        from .spatial import _TileState

        st: _TileState = cached_state(tiles_ref, _TileState)
        ix = st.index
        d = g.sort_values([shape_col, seq_col], kind="mergesort")
        px = d[x_col].to_numpy().astype(np.int64)
        py = d[y_col].to_numpy().astype(np.int64)
        sid = d[shape_col].to_numpy()
        seq = d[seq_col].to_numpy().astype(np.int64)
        n = len(d)

        pi, ti = ix.query_points(px, py)
        d2 = ((px[pi] - st.cx[ti]) ** 2 + (py[pi] - st.cy[ti]) ** 2).astype(np.float64)
        tids = ix.tile_id[ti]
        order = np.lexsort((tids, d2, pi))
        pi, tids, d2 = pi[order], tids[order], d2[order]

        empty_t, empty_c = np.empty(0, np.int64), np.empty(0, np.float64)
        cand_t: list[np.ndarray] = [empty_t] * n
        cand_c: list[np.ndarray] = [empty_c] * n
        if len(pi):
            starts = np.flatnonzero(np.r_[True, pi[1:] != pi[:-1]])
            ends = np.append(starts[1:], len(pi))
            for s, e in zip(starts, ends):
                e = min(e, s + MAX_CANDIDATES)
                cand_t[pi[s]] = tids[s:e]
                cand_c[pi[s]] = d2[s:e]

        out_tile = np.full(n, -1, dtype=np.int64)
        sh_starts = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]]) if n else []
        sh_ends = np.append(sh_starts[1:], n) if n else []
        for ss, se in zip(sh_starts, sh_ends):
            idxs = [i for i in range(ss, se) if len(cand_t[i])]
            if not idxs:
                continue
            chosen = _viterbi([cand_t[i] for i in idxs], [cand_c[i] for i in idxs],
                              switch_penalty)
            out_tile[idxs] = chosen
        return pd.DataFrame(
            {
                shape_col: sid,
                seq_col: seq,
                "tile_id": out_tile,
                "n_candidates": np.array([len(c) for c in cand_t], dtype=np.int64),
            }
        )

    return bucketed_groups(segments_ds, [shape_col], _choose)


def _viterbi_topk(cand_t: list[np.ndarray], cand_c: list[np.ndarray],
                  switch_penalty: int, k: int):
    """K-best chains through per-step candidate sets — the engine's analog of
    the reference's all-source→sink path ENUMERATION
    (``createPathLineStrings.js:47-78``), bounded to the top k instead of
    exponential. Returns a list of (total_cost, [chosen tile per step]),
    ordered by (cost, lexicographic candidate-index chain).

    Determinism: each surviving DP entry carries a ``lexid`` whose order
    equals the lexicographic order of its full candidate-index chain — lex
    order of equal-length chains is (prefix order, last index), so sorting
    step i+1's entries by (prev_lexid, target index) reproduces it without
    materializing chains. Tie-break on equal cost is therefore exactly
    "smallest index chain first", the same rule a brute-force enumeration
    sorted by (cost, index tuple) yields.

    Vectorized: per step the DP state is (C, k) cost/lex arrays; the top-k
    selection per target candidate is one stable argsort on the injective
    combined key ``cost * LEXCAP + lex`` (lex ids < LEXCAP = C*k <= 1024, so
    the key preserves exactly the (cost, lex) order), and lex re-assignment
    is a rank over ``lex * C2 + j2`` — the same (prefix order, last index)
    chain-lex order the tuple sort produced."""
    n = len(cand_t)
    BIG = np.int64(2**62)
    LEXCAP = np.int64(1024)  # > MAX_CANDIDATES * k for any sane k
    # per step: cost (C,k) int64 (BIG = empty), lex (C,k), back (C,k) flat
    # index into the previous step's (C_prev * k) state
    costs: list[np.ndarray] = []
    backs: list[np.ndarray] = []
    c0 = len(cand_t[0])
    cost = np.full((c0, k), BIG, dtype=np.int64)
    lex = np.full((c0, k), BIG, dtype=np.int64)
    cost[:, 0] = cand_c[0].astype(np.int64)
    lex[:, 0] = np.arange(c0)
    costs.append(cost)
    backs.append(np.full((c0, k), -1, dtype=np.int64))
    for i in range(1, n):
        t_prev, t_now, c_now = cand_t[i - 1], cand_t[i], cand_c[i].astype(np.int64)
        pc, pl = costs[-1].ravel(), lex.ravel()  # (P,)
        c2 = len(t_now)
        pen = np.where(np.repeat(t_prev, k)[:, None] == t_now[None, :],
                       np.int64(0), np.int64(switch_penalty))
        total = np.where(pc[:, None] >= BIG, BIG,
                         pc[:, None] + pen + c_now[None, :])  # (P, c2)
        key = np.where(total >= BIG, np.int64(2**63 - 1),
                       total * LEXCAP + pl[:, None])
        order = np.argsort(key, axis=0, kind="stable")[:k]  # (k', c2)
        kk = order.shape[0]
        cost = np.full((c2, k), BIG, dtype=np.int64)
        back = np.full((c2, k), -1, dtype=np.int64)
        cost[:, :kk] = np.take_along_axis(total, order, axis=0).T
        back[:, :kk] = order.T
        lex_tmp = np.where(cost >= BIG, BIG, pl[back] * np.int64(c2)
                           + np.arange(c2, dtype=np.int64)[:, None])
        # rank valid entries by (prev lex, target index) == chain lex order
        flat = lex_tmp.ravel()
        valid = flat < BIG
        lex = np.full(flat.shape, BIG, dtype=np.int64)
        vorder = np.argsort(flat[valid], kind="stable")
        ranks = np.empty(len(vorder), dtype=np.int64)
        ranks[vorder] = np.arange(len(vorder))
        lex[valid] = ranks
        lex = lex.reshape(c2, k)
        costs.append(cost)
        backs.append(back)
    fc, fl = costs[-1].ravel(), lex.ravel()
    fkey = np.where(fc >= BIG, np.int64(2**63 - 1), fc * LEXCAP + fl)
    forder = np.argsort(fkey, kind="stable")
    out = []
    for p in forder[: min(k, int((fc < BIG).sum()))]:
        chain = np.empty(n, dtype=np.int64)
        pp = int(p)
        for i in range(n - 1, -1, -1):
            chain[i] = cand_t[i][pp // k]
            pp = int(backs[i].ravel()[pp])
        out.append((int(fc[p]), chain))
    return out


def viterbi_choose_topk(segments_ds, tiles_ref, shape_col: str, seq_col: str,
                        x_col: str, y_col: str, k: int = 3,
                        switch_penalty: int = 10_000_000):
    """Per shape: the K BEST tile chains (k-best Viterbi, O(n·c²·k)) instead
    of just the argmin — mirrors the reference's multi-path enumeration for
    branching candidate graphs. Emits one row per (shape, rank, matched
    point): (shape, rank, total_cost, seq, tile_id); rank 1 = the optimum
    (identical cost to ``viterbi_choose``)."""

    def _choose(g: pd.DataFrame) -> pd.DataFrame:
        from .spatial import _TileState

        st: _TileState = cached_state(tiles_ref, _TileState)
        ix = st.index
        d = g.sort_values([shape_col, seq_col], kind="mergesort")
        px = d[x_col].to_numpy().astype(np.int64)
        py = d[y_col].to_numpy().astype(np.int64)
        sid = d[shape_col].to_numpy()
        seq = d[seq_col].to_numpy().astype(np.int64)
        n = len(d)

        pi, ti = ix.query_points(px, py)
        d2 = (px[pi] - st.cx[ti]) ** 2 + (py[pi] - st.cy[ti]) ** 2
        tids = ix.tile_id[ti]
        order = np.lexsort((tids, d2, pi))
        pi, tids, d2 = pi[order], tids[order], d2[order]

        empty_t = np.empty(0, np.int64)
        cand_t: list[np.ndarray] = [empty_t] * n
        cand_c: list[np.ndarray] = [empty_t] * n
        if len(pi):
            starts = np.flatnonzero(np.r_[True, pi[1:] != pi[:-1]])
            ends = np.append(starts[1:], len(pi))
            for s, e in zip(starts, ends):
                e = min(e, s + MAX_CANDIDATES)
                cand_t[pi[s]] = tids[s:e]
                cand_c[pi[s]] = d2[s:e]

        cols: dict[str, list] = {shape_col: [], "rank": [], "total_cost": [],
                                 seq_col: [], "tile_id": []}
        sh_starts = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]]) if n else []
        sh_ends = np.append(sh_starts[1:], n) if n else []
        for ss, se in zip(sh_starts, sh_ends):
            idxs = [i for i in range(ss, se) if len(cand_t[i])]
            if not idxs:
                continue
            best = _viterbi_topk([cand_t[i] for i in idxs],
                                 [cand_c[i] for i in idxs], switch_penalty, k)
            for rank, (cost, chain) in enumerate(best, start=1):
                cols[shape_col].extend([sid[ss]] * len(idxs))
                cols["rank"].extend([rank] * len(idxs))
                cols["total_cost"].extend([cost] * len(idxs))
                cols[seq_col].extend(seq[i] for i in idxs)
                cols["tile_id"].extend(chain.tolist())
        df = pd.DataFrame(cols)
        for c in ("rank", "total_cost", seq_col, "tile_id"):
            df[c] = df[c].astype(np.int64)
        return df

    return bucketed_groups(segments_ds, [shape_col], _choose)


def _decompose_bucket(g: pd.DataFrame, tiles_ref):
    """Shared per-bucket decomposition core: sort points, pick the best
    containing tile per point, split into paths (maximal matched runs) and
    edges (maximal same-tile runs). Returns (matched_rows_df, px, py) where
    matched_rows_df has (user_id, path_index, path_edge_index, tile_id,
    pt_seq, gi — the row's index into px/py), or (None, None, None) on an
    empty bucket."""
    from .spatial import _TileState

    st: _TileState = cached_state(tiles_ref, _TileState)
    ix = st.index
    d = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    uid = d["user_id"].to_numpy().astype(np.int64)
    px = d["ex"].to_numpy().astype(np.int64)
    py = d["ey"].to_numpy().astype(np.int64)
    n = len(d)
    if n == 0:
        return None, None, None

    # best containing tile per point (containment only; -1 = unmatched)
    pi, ti = ix.query_points(px, py)
    d2 = (px[pi] - st.cx[ti]) ** 2 + (py[pi] - st.cy[ti]) ** 2
    tid = ix.tile_id[ti]
    order = np.lexsort((tid, d2, pi))
    pi_s = pi[order]
    first = np.ones(len(pi_s), dtype=bool)
    first[1:] = pi_s[1:] != pi_s[:-1]
    tile = np.full(n, -1, dtype=np.int64)
    tile[pi_s[first]] = tid[order][first]

    user_start = np.ones(n, dtype=bool)
    user_start[1:] = uid[1:] != uid[:-1]
    # 1-based position within the shape (the SQL ROW_NUMBER)
    gidx = np.arange(n, dtype=np.int64)
    ustart_idx = np.maximum.accumulate(np.where(user_start, gidx, 0))
    pt_seq = gidx - ustart_idx + 1

    matched = tile >= 0
    prev_matched = np.zeros(n, dtype=bool)
    prev_matched[1:] = matched[:-1] & ~user_start[1:]
    prev_tile = np.full(n, -1, dtype=np.int64)
    prev_tile[1:] = tile[:-1]
    new_path = matched & ~prev_matched
    new_edge = matched & (~prev_matched | (prev_tile != tile))

    cp = np.cumsum(new_path)
    ce = np.cumsum(new_edge)
    r = np.flatnonzero(matched)
    # per-user offset: cp at the user's FIRST matched row (new_path there)
    um, cm, cem, npm = uid[r], cp[r], ce[r], new_path[r]
    ufirst = np.ones(len(r), dtype=bool)
    ufirst[1:] = um[1:] != um[:-1]
    path_index = cm - np.maximum.accumulate(np.where(ufirst, cm, 0))
    # per-path offset: ce at the path's first row (monotone carry)
    edge_index = cem - np.maximum.accumulate(np.where(npm, cem, 0))

    rows = pd.DataFrame(
        {
            "user_id": um,
            "path_index": path_index,
            "path_edge_index": edge_index,
            "tile_id": tile[r],
            "pt_seq": pt_seq[r],
            "gi": r,
        }
    )
    return rows, px, py


def path_decompose(points_ds, tiles_ref, est_rows: int | None = None):
    """Path-decomposition data model — the reference's core Step-B output
    shape ``gtfs_shape_shst_match_paths`` with its 4-level index
    (shape, path, edge, section) built from chosen per-point matches
    (``/root/reference/src/services/Conflation/chooseShstMatchesForShape/
    computeSubGraphComponentsTraversals/createPathLineStrings.js:80-174``,
    DDL ``GtfsOsmNetworkDAO/createTableFns.js:22-41``).

    Per shape (user): points in (ts, event_id) order take their best
    containing tile (min squared centroid distance, tie by tile_id — the
    chosen match). A PATH is a maximal run of consecutively matched points
    (unmatched points break paths, like disconnected subgraph components);
    an EDGE is a maximal same-tile run inside a path (like one shstReference
    section of a traversal). Output one row per edge:
    (user_id, path_index, path_edge_index, tile_id, seq_start, seq_end,
    n_pts) — fully SQL-expressible, so the driver's DuckDB oracle checks it
    exactly.

    Expects point columns (user_id, ts, event_id, ex, ey)."""

    def _decompose(g: pd.DataFrame) -> pd.DataFrame:
        rows, _, _ = _decompose_bucket(g, tiles_ref)
        if rows is None:
            return pd.DataFrame({c: np.array([], dtype=np.int64) for c in
                                 ["user_id", "path_index", "path_edge_index",
                                  "tile_id", "seq_start", "seq_end", "n_pts"]})
        out = rows.groupby(
            ["user_id", "path_index", "path_edge_index", "tile_id"],
            as_index=False, sort=False,
        ).agg(seq_start=("pt_seq", "min"), seq_end=("pt_seq", "max"),
              n_pts=("pt_seq", "size"))
        out["n_pts"] = out["n_pts"].astype(np.int64)
        return out

    return bucketed_groups(points_ds, ["user_id"], _decompose, est_rows=est_rows)


def path_sequentiality(points_ds, tiles_ref, est_rows: int | None = None):
    """Sequentiality of consecutive decomposed paths — ≙ the reference's
    ``getSequentiality`` gap-distance + relative-bearing comparator
    (``/root/reference/src/utils/gis/getSequentiality.js:16-64``), kept
    integer-exact: per consecutive path pair (i, i+1) inside a shape emit
    (user_id, path_index=i, gap_d2, dir_dot, dir_cross, pair_valid) where
    gap_d2 is the squared distance from path i's last point to path i+1's
    first point and dir_dot/dir_cross compare path i's final direction
    vector with path i+1's initial one (both 0 with pair_valid=0 when either
    path has a single point). Integer dot/cross replace floating bearings so
    the DuckDB oracle matches bit-for-bit."""

    def _seq(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "path_index", "gap_d2", "dir_dot", "dir_cross", "pair_valid"]
        rows, px, py = _decompose_bucket(g, tiles_ref)
        if rows is None or len(rows) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64) for c in cols})
        p2 = rows.groupby(["user_id", "path_index"], as_index=False, sort=False).agg(
            fs=("gi", "min"), ls=("gi", "max")
        )
        p2 = p2.sort_values(["user_id", "path_index"], kind="mergesort")
        u = p2["user_id"].to_numpy()
        pidx = p2["path_index"].to_numpy()
        fs = p2["fs"].to_numpy()
        ls = p2["ls"].to_numpy()
        # consecutive pairs within a user (path_index is dense per user)
        a = np.flatnonzero((u[1:] == u[:-1]) & (pidx[1:] == pidx[:-1] + 1))
        b = a + 1
        gap = (px[fs[b]] - px[ls[a]]) ** 2 + (py[fs[b]] - py[ls[a]]) ** 2
        valid = (ls[a] > fs[a]) & (ls[b] > fs[b])
        # clip gather indices: np.where evaluates both branches, and a
        # single-point path at the bucket edge would index out of bounds
        la1 = np.maximum(ls[a] - 1, 0)
        fb1 = np.minimum(fs[b] + 1, len(px) - 1)
        ax = np.where(valid, px[ls[a]] - px[la1], 0)
        ay = np.where(valid, py[ls[a]] - py[la1], 0)
        bx = np.where(valid, px[fb1] - px[fs[b]], 0)
        by = np.where(valid, py[fb1] - py[fs[b]], 0)
        return pd.DataFrame(
            {
                "user_id": u[a],
                "path_index": pidx[a],
                "gap_d2": gap,
                "dir_dot": ax * bx + ay * by,
                "dir_cross": ax * by - ay * bx,
                "pair_valid": valid.astype(np.int64),
            }
        )

    return bucketed_groups(points_ds, ["user_id"], _seq, est_rows=est_rows)


def anneal_axiomatic(cand_t: list[np.ndarray], cand_c: list[np.ndarray],
                     strict: float, relaxed: float, factor: float = np.sqrt(2.0)):
    """Threshold-annealing axiomatic chooser — ≙
    ``chooseOptimalShstMatches/index.js:29-273`` + ``findAxiomaticPaths.js:16-98``:
    starting from a STRICT distance threshold and geometrically relaxing by
    ``factor`` toward ``relaxed``, a step is fixed "axiomatically" when
    exactly ONE of its candidates passes the current threshold; once fixed,
    it constrains its neighbors (a neighbor keeps only its fixed-adjacent
    tile when it has it among passing candidates — the reference's
    cross-segment axiomatic propagation). Levels iterate each to a fixpoint.
    Sweeps are SYNCHRONOUS (Jacobi): every undecided step is recomputed from
    the PREVIOUS sweep's fixed set, so the fixpoint is scan-order-independent
    and a recursive-SQL oracle mirrors it bit-for-bit (the i-1 neighbor still
    wins ties over i+1 within a sweep). Returns (chosen_value_per_step with
    -1 for undecided, level_decided_at per step with -1 for undecided). The
    undecided remainder is what the reference hands to its O(2^n) search
    (here: the Viterbi DP)."""
    n = len(cand_t)
    chosen = np.full(n, -1, dtype=np.int64)
    level_at = np.full(n, -1, dtype=np.int64)
    thr = float(strict)
    level = 0
    while True:
        # fixpoint at this threshold level (synchronous sweeps)
        progressed = True
        while progressed:
            progressed = False
            prev = chosen.copy()
            for i in range(n):
                if prev[i] >= 0 or len(cand_t[i]) == 0:
                    continue
                passing = cand_t[i][cand_c[i] <= thr]
                # neighbor constraint: a PREV-sweep-fixed neighbor's tile
                # among the passing candidates wins outright (continuity)
                pick = -1
                for j in (i - 1, i + 1):
                    if 0 <= j < n and prev[j] >= 0 and prev[j] in passing:
                        pick = int(prev[j])
                        break
                if pick < 0 and len(passing) == 1:
                    pick = int(passing[0])  # the axiom: unique passing candidate
                if pick >= 0:
                    chosen[i] = pick
                    level_at[i] = level
                    progressed = True
        if thr >= relaxed:
            break
        thr = min(thr * factor, float(relaxed))
        level += 1
    return chosen, level_at


def annealed_choose(points_ds, tiles_ref, strict: float = 250_000.0,
                    relaxed: float = 16_000_000.0, est_rows: int | None = None):
    """Per shape: threshold-annealed axiomatic choice over each point's
    containing-tile candidate set (squared-centroid-distance thresholds
    annealing strict→relaxed by √2, ≙ the reference's (0.1 km, …)→(0.01 km,
    …) ladder), then the exact Viterbi DP resolves the non-axiomatic
    remainder (replacing the O(2^n) enumeration,
    ``findNonAxiomaticPaths.js:12-320``). Output one row per point:
    (user_id, seq, tile_id, decided_by, anneal_level) with decided_by
    1=axiom, 2=viterbi, 0=no candidates."""

    def _choose(g: pd.DataFrame) -> pd.DataFrame:
        from .spatial import _TileState

        st: _TileState = cached_state(tiles_ref, _TileState)
        ix = st.index
        d = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy().astype(np.int64)
        seq = d["event_id"].to_numpy().astype(np.int64)
        px = d["ex"].to_numpy().astype(np.int64)
        py = d["ey"].to_numpy().astype(np.int64)
        n = len(d)
        cols = ["user_id", "seq", "tile_id", "decided_by", "anneal_level"]
        if n == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64) for c in cols})

        pi, ti = ix.query_points(px, py)
        d2 = ((px[pi] - st.cx[ti]) ** 2 + (py[pi] - st.cy[ti]) ** 2).astype(np.float64)
        tids = ix.tile_id[ti]
        order = np.lexsort((tids, d2, pi))
        pi, tids, d2 = pi[order], tids[order], d2[order]
        empty_t, empty_c = np.empty(0, np.int64), np.empty(0, np.float64)
        cand_t: list[np.ndarray] = [empty_t] * n
        cand_c: list[np.ndarray] = [empty_c] * n
        if len(pi):
            starts = np.flatnonzero(np.r_[True, pi[1:] != pi[:-1]])
            ends = np.append(starts[1:], len(pi))
            for s, e in zip(starts, ends):
                e = min(e, s + MAX_CANDIDATES)
                cand_t[pi[s]] = tids[s:e]
                cand_c[pi[s]] = d2[s:e]

        out_tile = np.full(n, -1, dtype=np.int64)
        out_by = np.zeros(n, dtype=np.int64)
        out_lvl = np.full(n, -1, dtype=np.int64)
        sh_starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        sh_ends = np.append(sh_starts[1:], n)
        for ss, se in zip(sh_starts, sh_ends):
            ct = cand_t[ss:se]
            cc = cand_c[ss:se]
            ax, lvl = anneal_axiomatic(ct, cc, strict, relaxed)
            rem = [k for k in range(se - ss) if ax[k] < 0 and len(ct[k])]
            out_tile[ss:se] = ax
            out_by[ss:se][ax >= 0] = 1
            out_lvl[ss:se] = lvl
            if rem:
                vt = _viterbi([ct[k] for k in rem], [cc[k] for k in rem], 1e7)
                for k, t in zip(rem, vt):
                    out_tile[ss + k] = t
                    out_by[ss + k] = 2
        return pd.DataFrame(
            {"user_id": uid, "seq": seq, "tile_id": out_tile,
             "decided_by": out_by, "anneal_level": out_lvl}
        )

    return bucketed_groups(points_ds, ["user_id"], _choose, est_rows=est_rows)


def similarity_gated_rematch(points_ds, tiles_ref, radius: int = 4000,
                             sim_threshold: float = 6_000_000.0,
                             buffer_dist: int = 2000,
                             est_rows: int | None = None):
    """Iterative re-match with the reference's similarity accept-gate — ≙ the
    T3 loop whose round-2+ geometry mutations are only accepted when the
    comparator passes (T4 length-ratio <= 0.05 / T5 similarity <= 0.008,
    ``replaceFeaturesGeomsWithOsrmRoute.js:128-289``): round 1 matches each
    point to its best containing tile; round 2 relaxes to the nearest
    centroid within ``radius`` for the unmatched remainder, but the round-2
    matches are kept ONLY if the full chosen chain stays similar to the
    shape (``geom.line_similarity_exact`` <= ``sim_threshold``; cents
    scale, integer-exact decisions -> SQL-mirrorable). One row per
    shape: (user_id, n_points, n_round1, n_round2, accepted, sim_q2)."""
    from ..functions import geom

    def _gate(g: pd.DataFrame) -> pd.DataFrame:
        from .spatial import _TileState

        st: _TileState = cached_state(tiles_ref, _TileState)
        ix = st.index
        d = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy().astype(np.int64)
        px = d["ex"].to_numpy().astype(np.int64)
        py = d["ey"].to_numpy().astype(np.int64)
        n = len(d)
        cols = ["user_id", "n_points", "n_round1", "n_round2", "accepted", "sim_q2"]
        if n == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64) for c in cols})

        # round 1: best containing tile (containment only)
        pi, ti = ix.query_points(px, py)
        d2 = (px[pi] - st.cx[ti]) ** 2 + (py[pi] - st.cy[ti]) ** 2
        order = np.lexsort((ix.tile_id[ti], d2, pi))
        pi_s = pi[order]
        first = np.ones(len(pi_s), dtype=bool)
        first[1:] = pi_s[1:] != pi_s[:-1]
        tidx1 = np.full(n, -1, dtype=np.int64)  # tile INDEX per point
        tidx1[pi_s[first]] = ti[order][first]

        # round 2: nearest centroid within radius for unmatched points
        tidx2 = tidx1.copy()
        un = np.flatnonzero(tidx1 < 0)
        if len(un):
            qi, t2, d2k = ix.knn_centroids(px[un], py[un], 1)
            ok = d2k <= radius * radius
            tidx2[un[qi[ok]]] = t2[ok]

        rows = []
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            m1 = tidx1[s:e] >= 0
            m2 = tidx2[s:e] >= 0
            n_r1 = int(m1.sum())
            n_r2 = int(m2.sum()) - n_r1
            accepted = np.int64(0)
            sim_q2 = np.int64(-1)
            if n_r2 > 0 and m2.sum() >= 2 and (e - s) >= 2:
                sel = tidx2[s:e][m2]
                chain = np.stack([st.cx[sel], st.cy[sel]], axis=1).astype(np.int64)
                shape_xy = np.stack([px[s:e], py[s:e]], axis=1).astype(np.int64)
                sim = geom.line_similarity_exact(shape_xy, chain, buffer_dist)
                sim_q2 = np.int64(np.floor(min(sim, 1e12) * 100 + 0.5))
                accepted = np.int64(1) if sim <= sim_threshold else np.int64(0)
            rows.append({
                "user_id": np.int64(uid[s]),
                "n_points": np.int64(e - s),
                "n_round1": np.int64(n_r1),
                "n_round2": np.int64(n_r2 if accepted or n_r2 == 0 else 0),
                "accepted": accepted,
                "sim_q2": sim_q2,
            })
        return pd.DataFrame(rows)

    return bucketed_groups(points_ds, ["user_id"], _gate, est_rows=est_rows)


def path_metadata_merge(points_ds, tiles_ref, est_rows: int | None = None):
    """Metadata path merge over the decomposed paths — ≙
    ``mergePathLineStringsUsingMetadata`` + D5 overlapped-path removal:
    each decomposed path's ordered edge-tile sequence is its metadata id
    list; subset paths drop and suffix/prefix-overlapping paths splice to a
    fixpoint (``geom.merge_paths_by_ids``). One row per shape:
    (user_id, n_paths, n_merged, n_edges_before, n_edges_after)."""
    from ..functions.geom import merge_paths_by_ids

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n_paths", "n_merged", "n_edges_before", "n_edges_after"]
        rows, _, _ = _decompose_bucket(g, tiles_ref)
        if rows is None or len(rows) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64) for c in cols})
        # ordered edge-tile sequence per (user, path)
        edges = rows.drop_duplicates(["user_id", "path_index", "path_edge_index"])
        out = []
        for u, grp in edges.groupby("user_id", sort=False):
            paths = [
                p.sort_values("path_edge_index")["tile_id"].tolist()
                for _, p in grp.groupby("path_index", sort=False)
            ]
            merged = merge_paths_by_ids(paths)
            out.append({
                "user_id": np.int64(u),
                "n_paths": np.int64(len(paths)),
                "n_merged": np.int64(len(merged)),
                "n_edges_before": np.int64(sum(len(p) for p in paths)),
                "n_edges_after": np.int64(sum(len(p) for p in merged)),
            })
        return pd.DataFrame(out)

    return bucketed_groups(points_ds, ["user_id"], _merge, est_rows=est_rows)


def path_linestrings(points_ds, tiles_ref, est_rows: int | None = None,
                     union_tol: float = 1.0):
    """Path → LineString materialization with ``pathDecompositionInfo`` — ≙
    ``createPathLineStrings.js:80-174``: each decomposed path becomes a
    polyline of its chosen tiles' centroids (in edge order), then the
    per-shape path set is UNIONED to a fixpoint with the two merge
    algorithms (``geom.union_paths_by_ids_geo`` ≙
    ``unionPathLineStrings.js:54-135``, id-centric: the polyline is always
    the centroid chain of the id list, so the whole fixpoint is a
    pure-integer computation with an exact SQL mirror). One row per unioned
    path: (user_id, path_index, n_edges, path_len_c, decomp_json) —
    decomp_json is the compact-JSON pathDecompositionInfo
    (``[{"id":..,"len":..}, ...]``, the last edge carries no onward
    segment, len 0); per-edge lengths are cents
    ``floor(sqrt(d2) * 100 + 0.5)`` of exact int64 squared distances and
    path_len_c is their INT sum (order-free, bit-equal in SQL)."""
    import json

    from ..functions import geom

    # centroid coords are exact ints, so dist <= tol  <=>  d2 <= floor(tol^2)
    tol2 = int(np.floor(np.float64(union_tol) * np.float64(union_tol)))

    def _paths(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "path_index", "n_edges", "path_len_c", "decomp_json"]
        rows, px, py = _decompose_bucket(g, tiles_ref)
        if rows is None or len(rows) == 0:
            out = {c: np.array([], dtype=np.int64) for c in cols}
            out["decomp_json"] = np.array([], dtype=object)
            return pd.DataFrame(out)
        from .spatial import _TileState

        st: _TileState = cached_state(tiles_ref, _TileState)
        centro = {int(t): (int(cx), int(cy))
                  for t, cx, cy in zip(st.index.tile_id, st.cx, st.cy)}
        edges = rows.drop_duplicates(["user_id", "path_index", "path_edge_index"])
        out = []
        for u, grp in edges.groupby("user_id", sort=False):
            paths = [
                p.sort_values("path_edge_index")["tile_id"].tolist()
                for _, p in grp.groupby("path_index", sort=False)
            ]
            merged = geom.union_paths_by_ids_geo(paths, centro, tol2)
            for k, idl in enumerate(merged):
                xy = np.array([centro[int(t)] for t in idl], dtype=np.int64)
                d = np.diff(xy, axis=0)
                cents = np.floor(
                    np.sqrt((d * d).sum(1).astype(np.float64)) * 100 + 0.5
                ).astype(np.int64)
                lens = np.concatenate([cents, np.zeros(1, dtype=np.int64)])
                info = [{"id": int(t), "len": int(c)} for t, c in zip(idl, lens)]
                out.append({
                    "user_id": np.int64(u),
                    "path_index": np.int64(k),
                    "n_edges": np.int64(len(idl)),
                    "path_len_c": np.int64(cents.sum()),
                    "decomp_json": json.dumps(info, separators=(",", ":")),
                })
        return pd.DataFrame(out)

    return bucketed_groups(points_ds, ["user_id"], _paths, est_rows=est_rows)


def choose_and_score(points_ds, tiles_ref, shape_col: str, seq_col: str,
                     x_col: str, y_col: str, switch_penalty: float = 1e7,
                     resample_n: int = 32):
    """Step-C analog (SURVEY §3.2): choose the tile chain per shape (Viterbi),
    assemble the chosen tiles' centroid polyline in sequence order, and score
    it against the shape with the discrete Fréchet distance on equal-count
    curves — ≙ ``loadChosenShstMatchesScores`` + ``frechet.js:8-35``,
    reformulated INTEGER-EXACT (stride-picked vertices + squared-distance
    Fréchet DP, see ``stages.segments``) so the DuckDB oracle reproduces it
    bit-for-bit. Returns one row per shape:
    (shape, n_points, n_matched, frechet_sq);
    frechet_sq = -1 when fewer than 2 segments matched."""

    def _score(g: pd.DataFrame) -> pd.DataFrame:
        from .spatial import _TileState

        st: _TileState = cached_state(tiles_ref, _TileState)
        ix = st.index
        d = g.sort_values([shape_col, seq_col], kind="mergesort")
        px = d[x_col].to_numpy().astype(np.int64)
        py = d[y_col].to_numpy().astype(np.int64)
        sid = d[shape_col].to_numpy()
        n = len(d)

        pi, ti = ix.query_points(px, py)
        d2 = ((px[pi] - st.cx[ti]) ** 2 + (py[pi] - st.cy[ti]) ** 2).astype(np.float64)
        tids = ix.tile_id[ti]
        order = np.lexsort((tids, d2, pi))
        pi, tids, d2 = pi[order], tids[order], d2[order]
        empty_t, empty_c = np.empty(0, np.int64), np.empty(0, np.float64)
        cand_t: list[np.ndarray] = [empty_t] * n
        cand_c: list[np.ndarray] = [empty_c] * n
        if len(pi):
            starts = np.flatnonzero(np.r_[True, pi[1:] != pi[:-1]])
            ends = np.append(starts[1:], len(pi))
            for s, e in zip(starts, ends):
                e = min(e, s + MAX_CANDIDATES)
                cand_t[pi[s]] = tids[s:e]
                cand_c[pi[s]] = d2[s:e]

        # tile_id -> integer centroid lookup
        centro = {int(t): (int(cx), int(cy))
                  for t, cx, cy in zip(ix.tile_id, st.cx, st.cy)}
        from .segments import frechet_sq_int, stride_pick

        rows = []
        sh_starts = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]]) if n else []
        sh_ends = np.append(sh_starts[1:], n) if n else []
        for ss, se in zip(sh_starts, sh_ends):
            idxs = [i for i in range(ss, se) if len(cand_t[i])]
            score = np.int64(-1)
            if len(idxs) >= 2:
                chosen = _viterbi([cand_t[i] for i in idxs], [cand_c[i] for i in idxs],
                                  switch_penalty)
                path = np.array([centro[int(t)] for t in chosen], dtype=np.int64)
                shape_xy = np.stack([px[ss:se], py[ss:se]], axis=1).astype(np.int64)
                score = np.int64(frechet_sq_int(
                    stride_pick(shape_xy, resample_n), stride_pick(path, resample_n)
                ))
            rows.append(
                {
                    shape_col: sid[ss],
                    "n_points": np.int64(se - ss),
                    "n_matched": np.int64(len(idxs)),
                    "frechet_sq": score,
                }
            )
        return pd.DataFrame(rows)

    return bucketed_groups(points_ds, [shape_col], _score)


def _viterbi_hmm(cand_t: list[np.ndarray], cand_c: list[np.ndarray],
                 cand_x: list[np.ndarray], cand_y: list[np.ndarray],
                 obs_x: np.ndarray, obs_y: np.ndarray,
                 gap_weight: int) -> np.ndarray:
    """Exact min-cost chain with MOVEMENT-FEASIBILITY transitions (the HMM
    map-matching core, Newson & Krumm 2009 in integer form): extending
    candidate i at step t-1 to candidate j at step t costs

        gap_weight * | L1(centroid_i, centroid_j) - L1(obs_{t-1}, obs_t) |

    so a jump between distant tiles is cheap exactly when the observations
    jumped the same distance — unlike ``_viterbi``'s flat switch penalty.
    All int64; ties resolve to the FIRST (lowest-index) minimum, matching
    the SQL mirror's list_position(list_min) and the (d2, tile_id) candidate
    pre-sort. Returns the chosen candidate VALUE per step."""
    w = np.int64(gap_weight)
    backs: list[np.ndarray] = []
    prev_cost: np.ndarray | None = None
    for t in range(len(cand_t)):
        c = cand_c[t].astype(np.int64)
        if prev_cost is None:
            cost = c.copy()
            backs.append(np.full(len(c), -1, dtype=np.int64))
        else:
            gap = np.int64(abs(int(obs_x[t]) - int(obs_x[t - 1]))
                           + abs(int(obs_y[t]) - int(obs_y[t - 1])))
            l1 = (np.abs(cand_x[t - 1][:, None] - cand_x[t][None, :])
                  + np.abs(cand_y[t - 1][:, None] - cand_y[t][None, :]))
            trans = prev_cost[:, None] + w * np.abs(l1 - gap)
            back = np.argmin(trans, axis=0)  # first min == SQL list_position
            cost = trans[back, np.arange(len(c))] + c
            backs.append(back)
        prev_cost = cost
    out = np.empty(len(cand_t), dtype=np.int64)
    j = int(np.argmin(prev_cost))
    for k in range(len(cand_t) - 1, -1, -1):
        out[k] = cand_t[k][j]
        j = int(backs[k][j])
    return out


def hmm_match(segments_ds, tiles_ref, shape_col: str, seq_col: str,
              x_col: str, y_col: str, gap_weight: int = 64):
    """Sequence-aware (HMM-style) trajectory→tile matching — the engine's
    analog of the reference's OSRM ``.match()`` recovery path
    (``/root/reference/src/services/Conflation/SharedStreetsMatcher/geometryMutators/replaceFeaturesGeomsWithOsrmRoute.js:44-126``,
    which ships unmatched features through an HMM map matcher before
    re-matching). Per trajectory, choose one tile per observation minimizing

        Σ_t d2(obs_t, tile_t)                                     (emission)
      + Σ_t gap_weight·|L1(tile_{t-1}, tile_t) − L1(obs_{t-1}, obs_t)|
                                                                (transition)

    The transition term is the inter-candidate GAP-FEASIBILITY cost of
    classic HMM map matching: candidate pairs whose centroid displacement
    disagrees with the observed displacement pay in proportion. Exact int64
    arithmetic throughout (L1 metric, integer-squared emission) makes the
    recursive-CTE oracle bit-exact. Observations with no containing tile are
    emitted with tile_id = -1 and skipped by the chain; the gap of the
    transition that bridges them is measured between the two MATCHED
    observations it connects. Returns (shape, seq, tile_id, n_candidates).

    Partitioning assumption: one trajectory = one group (bucketed by shape
    key); candidate sets capped at MAX_CANDIDATES by (d2, tile_id)."""

    def _choose(g: pd.DataFrame) -> pd.DataFrame:
        from .spatial import _TileState

        st: _TileState = cached_state(tiles_ref, _TileState)
        ix = st.index
        d = g.sort_values([shape_col, seq_col], kind="mergesort")
        px = d[x_col].to_numpy().astype(np.int64)
        py = d[y_col].to_numpy().astype(np.int64)
        sid = d[shape_col].to_numpy()
        seq = d[seq_col].to_numpy().astype(np.int64)
        n = len(d)

        pi, ti = ix.query_points(px, py)
        d2 = ((px[pi] - st.cx[ti]) ** 2 + (py[pi] - st.cy[ti]) ** 2).astype(np.int64)
        tids = ix.tile_id[ti]
        cxs = st.cx[ti].astype(np.int64)
        cys = st.cy[ti].astype(np.int64)
        order = np.lexsort((tids, d2, pi))
        pi, tids, d2 = pi[order], tids[order], d2[order]
        cxs, cys = cxs[order], cys[order]

        e_t, e_c = np.empty(0, np.int64), np.empty(0, np.int64)
        cand_t: list[np.ndarray] = [e_t] * n
        cand_c: list[np.ndarray] = [e_c] * n
        cand_x: list[np.ndarray] = [e_c] * n
        cand_y: list[np.ndarray] = [e_c] * n
        if len(pi):
            starts = np.flatnonzero(np.r_[True, pi[1:] != pi[:-1]])
            ends = np.append(starts[1:], len(pi))
            for s, e in zip(starts, ends):
                e = min(e, s + MAX_CANDIDATES)
                cand_t[pi[s]] = tids[s:e]
                cand_c[pi[s]] = d2[s:e]
                cand_x[pi[s]] = cxs[s:e]
                cand_y[pi[s]] = cys[s:e]

        out_tile = np.full(n, -1, dtype=np.int64)
        sh_starts = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]]) if n else []
        sh_ends = np.append(sh_starts[1:], n) if n else []
        for ss, se in zip(sh_starts, sh_ends):
            idxs = [i for i in range(ss, se) if len(cand_t[i])]
            if not idxs:
                continue
            chosen = _viterbi_hmm(
                [cand_t[i] for i in idxs], [cand_c[i] for i in idxs],
                [cand_x[i] for i in idxs], [cand_y[i] for i in idxs],
                px[idxs], py[idxs], gap_weight)
            out_tile[idxs] = chosen
        return pd.DataFrame(
            {
                shape_col: sid,
                seq_col: seq,
                "tile_id": out_tile,
                "n_candidates": np.array([len(c) for c in cand_t], dtype=np.int64),
            }
        )

    return bucketed_groups(segments_ds, [shape_col], _choose)
