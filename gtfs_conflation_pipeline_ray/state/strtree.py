"""Packed STR (Sort-Tile-Recursive) R-tree over axis-aligned rectangles.

The north-star architecture names "STRtree-backed point-in-polygon and kNN
candidate joins" explicitly; this is that index, as an alternative backend to
:class:`state.grid_index.GridIndex` with the SAME probe surface
(``query_points`` / ``query_rects`` / ``knn_centroids``) and identical
results (parity-tested in ``tests/test_strtree.py``; the locally-gated
queries ``spatial_join_pairs_strtree`` / ``knn_tiles_strtree`` share the grid
backend's DuckDB oracles). ≙ the reference's SQLite geopoly R*-tree virtual
table (``/root/reference/src/daos/ConflationMapDAO/createTableFns.js:18-21``).

Why both backends exist: the uniform grid wins when tile extents are
near-uniform (O(1) bucket lookup, no tree descent); STR wins when extents are
heavily skewed (a grid must either rasterize big rects over many buckets or
expand every probe window to the max half-extent, while the R-tree's leaf
MBRs adapt to local density). Pick per dataset; both are a handful of flat
numpy arrays built once per worker from a `ray.put`-broadcast table.

Bulk load is the classic STR packing [Leutenegger, Lopez & Edgington, ICDE
1997]: sort by center x, cut into ~sqrt(N/B) vertical slices, sort each slice
by center y, pack runs of B into nodes; repeat on the node MBRs until a level
fits in one root run. Build and probes are vectorized numpy — probes walk the
tree level-by-level as a (query, node) frontier with no per-row Python.
"""

from __future__ import annotations

import numpy as np

from .grid_index import _gather_ranges


def _str_order(cx: np.ndarray, cy: np.ndarray, cap: int) -> np.ndarray:
    """STR packing order: vertical slices of ``cap * ceil(sqrt(ceil(n/cap)))``
    entries by center x, then center y within each slice — consecutive runs
    of ``cap`` in the returned permutation form spatially tight nodes."""
    n = len(cx)
    if n <= 1:
        return np.arange(n, dtype=np.int64)
    n_nodes = -(-n // cap)
    n_slices = int(np.ceil(np.sqrt(n_nodes)))
    slice_sz = -(-n_nodes // n_slices) * cap
    by_x = np.argsort(cx, kind="stable")
    slice_id = np.empty(n, dtype=np.int64)
    slice_id[by_x] = np.arange(n, dtype=np.int64) // slice_sz
    return np.lexsort((cy, slice_id))


class STRtree:
    """Packed R-tree over N rectangles; flat struct-of-arrays per level.

    ``levels[0]`` groups the (STR-ordered) items; ``levels[i]`` groups
    ``levels[i-1]``'s nodes; ``levels[-1]`` is the root run (≤ cap nodes,
    scanned densely per probe). Each level stores its node MBRs plus EXPLICIT
    child (start, count) ranges into the level below, so re-packing a level
    spatially never has to reshuffle the levels beneath it (and the one
    short group per level stays correct wherever packing places it).
    """

    def __init__(
        self,
        tile_id: np.ndarray,
        x0: np.ndarray,
        y0: np.ndarray,
        x1: np.ndarray,
        y1: np.ndarray,
        node_cap: int = 16,
    ):
        self.tile_id = np.asarray(tile_id)
        x0 = np.asarray(x0, dtype=np.int64)
        y0 = np.asarray(y0, dtype=np.int64)
        x1 = np.asarray(x1, dtype=np.int64)
        y1 = np.asarray(y1, dtype=np.int64)
        self.cap = int(node_cap)
        order = _str_order((x0 + x1) // 2, (y0 + y1) // 2, self.cap)
        self.item_idx = order  # packed position -> original row
        self.x0, self.y0 = x0[order], y0[order]
        self.x1, self.y1 = x1[order], y1[order]
        # centroid extent for the kNN full-coverage bound
        if len(x0):
            ccx, ccy = (self.x0 + self.x1) // 2, (self.y0 + self.y1) // 2
            self._cext = (int(ccx.min()), int(ccy.min()), int(ccx.max()), int(ccy.max()))
        else:
            self._cext = (0, 0, 0, 0)
        self.levels: list[tuple[np.ndarray, ...]] = []
        cur = (self.x0, self.y0, self.x1, self.y1)
        while len(cur[0]) > self.cap:
            m = len(cur[0])
            starts = np.arange(0, m, self.cap, dtype=np.int64)
            counts = np.minimum(self.cap, m - starts)
            nx0 = np.minimum.reduceat(cur[0], starts)
            ny0 = np.minimum.reduceat(cur[1], starts)
            nx1 = np.maximum.reduceat(cur[2], starts)
            ny1 = np.maximum.reduceat(cur[3], starts)
            nodes_order = _str_order((nx0 + nx1) // 2, (ny0 + ny1) // 2, self.cap)
            self.levels.append(
                (nx0[nodes_order], ny0[nodes_order], nx1[nodes_order],
                 ny1[nodes_order], starts[nodes_order], counts[nodes_order])
            )
            cur = self.levels[-1][:4]

    # ---- frontier descent ---------------------------------------------------
    def _descend(self, n_queries: int, keep_fn) -> tuple[np.ndarray, np.ndarray]:
        """Walk the tree top-down as a vectorized (query, node) frontier.
        ``keep_fn(qrows, nrows, (lx0, ly0, lx1, ly1)) -> bool mask`` prunes at
        every level, gathering from the LEVEL's box arrays itself (lazily —
        the x test runs first and the y arrays are only gathered for
        x-survivors, which halves the gather traffic on the item level where
        the frontier is ~5x the hit count). Sound whenever the predicate is
        monotone under box inclusion (true of an item ⇒ true of every
        ancestor MBR), which holds for the containment / overlap probes used
        here. Returns pairs (query_idx, packed_item_idx) that survive at the
        item level."""
        e = np.empty(0, dtype=np.int64)
        if not len(self.x0) or not n_queries:
            return e, e
        top = self.levels[-1][:4] if self.levels else (self.x0, self.y0, self.x1, self.y1)
        nroot = len(top[0])
        fq = np.repeat(np.arange(n_queries, dtype=np.int64), nroot)
        fn = np.tile(np.arange(nroot, dtype=np.int64), n_queries)
        m = keep_fn(fq, fn, top)
        fq, fn = fq[m], fn[m]
        for lvl in range(len(self.levels) - 1, -1, -1):
            if not len(fq):
                return e, e
            cs = self.levels[lvl][4][fn]
            cc = self.levels[lvl][5][fn]
            fq = np.repeat(fq, cc)
            fn = _gather_ranges(cs, cc)
            below = self.levels[lvl - 1][:4] if lvl else (self.x0, self.y0, self.x1, self.y1)
            m = keep_fn(fq, fn, below)
            fq, fn = fq[m], fn[m]
        return fq, fn

    # ---- point-in-rectangle (inclusive bounds, mirrors SQL BETWEEN) --------
    def query_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        px = np.asarray(px, dtype=np.int64)
        py = np.asarray(py, dtype=np.int64)

        def _contains(q, n, boxes):
            # gather each query coord ONCE, test x first, and gather the y
            # box arrays only for x-survivors (the frontier at the item
            # level is ~5x the hit count — these two tricks are ~40% of the
            # probe's wall time)
            qx = px[q]
            keep = np.flatnonzero((qx >= boxes[0][n]) & (qx <= boxes[2][n]))
            nk = n[keep]
            qy = py[q[keep]]
            m = np.zeros(len(q), dtype=bool)
            m[keep[(qy >= boxes[1][nk]) & (qy <= boxes[3][nk])]] = True
            return m

        fq, fn = self._descend(len(px), _contains)
        return fq, self.item_idx[fn]

    # ---- rect overlap (strict, positive area — mirrors GridIndex) ----------
    def query_rects(
        self, qx0: np.ndarray, qy0: np.ndarray, qx1: np.ndarray, qy1: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        qx0 = np.asarray(qx0, dtype=np.int64)
        qy0 = np.asarray(qy0, dtype=np.int64)
        qx1 = np.asarray(qx1, dtype=np.int64)
        qy1 = np.asarray(qy1, dtype=np.int64)

        def _overlap(q, n, boxes):
            keep = np.flatnonzero((qx0[q] < boxes[2][n]) & (qx1[q] > boxes[0][n]))
            qk, nk = q[keep], n[keep]
            m = np.zeros(len(q), dtype=bool)
            m[keep[(qy0[qk] < boxes[3][nk]) & (qy1[qk] > boxes[1][nk])]] = True
            return m

        fq, fn = self._descend(len(qx0), _overlap)
        return fq, self.item_idx[fn]

    # ---- exact kNN over rect centroids --------------------------------------
    def knn_centroids(self, qx: np.ndarray, qy: np.ndarray, k: int,
                      cand_cap: int = 1 << 24) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Exact k nearest rect centroids by integer squared Euclidean
        distance, ties by tile_id ascending — identical contract to
        ``GridIndex.knn_centroids``. Search-box doubling: probe a Chebyshev
        box of half-width r around each query (tree-pruned — a centroid lies
        inside its rect's MBR, so box∩MBR prunes soundly — then an exact
        centroid-in-box filter). A query RESOLVES once its k-th smallest
        Euclidean d² ≤ r² (everything outside the box is farther than r), or
        once its box provably covers the whole centroid extent; otherwise it
        re-probes with 4r. Expected O(log) rounds; each round is one
        vectorized descent over the still-pending queries."""
        qx = np.asarray(qx, dtype=np.int64)
        qy = np.asarray(qy, dtype=np.int64)
        n = len(self.x0)
        k = min(k, n)
        if k == 0 or not len(qx):
            e = np.empty(0, dtype=np.int64)
            return e, e, e
        ccx = (self.x0 + self.x1) // 2
        ccy = (self.y0 + self.y1) // 2
        tid_packed = self.tile_id[self.item_idx]
        ex0, ey0, ex1, ey1 = self._cext
        span = max(ex1 - ex0, ey1 - ey0, 1)
        r = max(int(span * np.sqrt(k / n)), 1)
        out_t = np.empty((len(qx), k), dtype=np.int64)
        out_d = np.empty((len(qx), k), dtype=np.int64)
        pending = np.arange(len(qx), dtype=np.int64)
        while len(pending):
            # bounded intermediates: once the box reaches span scale, tree
            # pruning no longer bounds the frontier (worst case pending x n
            # item rows — the sparse/far-probe regime), so process pending in
            # slices of ≤ cand_cap/n queries; early rounds keep one slice
            step = max(1, cand_cap // max(n, 1)) if 2 * r >= span else len(pending)
            resolved = np.zeros(len(pending), dtype=bool)
            for start in range(0, len(pending), step):
                sl = pending[start:start + step]
                m_sl = len(sl)
                bx0, by0 = qx[sl] - r, qy[sl] - r
                bx1, by1 = qx[sl] + r, qy[sl] + r
                # box covers every centroid -> the candidate set is complete
                # and the kth distance is exact regardless of r
                full = (bx0 <= ex0) & (by0 <= ey0) & (bx1 >= ex1) & (by1 >= ey1)

                def _overlap(q, nn, boxes):
                    # inclusive: a centroid exactly at Chebyshev distance r counts
                    keep = np.flatnonzero((bx0[q] <= boxes[2][nn]) & (bx1[q] >= boxes[0][nn]))
                    qk, nk = q[keep], nn[keep]
                    m = np.zeros(len(q), dtype=bool)
                    m[keep[(by0[qk] <= boxes[3][nk]) & (by1[qk] >= boxes[1][nk])]] = True
                    return m

                fq, fn = self._descend(m_sl, _overlap)
                cx, cy = ccx[fn], ccy[fn]
                inbox = (cx >= bx0[fq]) & (cx <= bx1[fq]) & (cy >= by0[fq]) & (cy <= by1[fq])
                fq, fn = fq[inbox], fn[inbox]
                d2 = (qx[sl][fq] - ccx[fn]) ** 2 + (qy[sl][fq] - ccy[fn]) ** 2
                counts = np.bincount(fq, minlength=m_sl)
                enough = counts >= k
                if enough.any():
                    order = np.lexsort((tid_packed[fn], d2, fq))
                    fq_s, fn_s, d2_s = fq[order], fn[order], d2[order]
                    gstart = np.concatenate(([0], np.cumsum(counts)))
                    rank = np.arange(len(fq_s), dtype=np.int64) - gstart[fq_s]
                    topk = rank < k
                    # k-th best distance per enough-query, aligned with
                    # flatnonzero(enough) (rank==k-1 rows appear in fq order)
                    kth = d2_s[topk][rank[topk] == k - 1]
                    eidx = np.flatnonzero(enough)
                    r2 = min(r * r, 1 << 62)  # keep the int64 comparison safe;
                    # a query whose kth distance exceeds 2^62 resolves via `full`
                    resolved_local = eidx[(kth <= r2) | full[eidx]]
                    if len(resolved_local):
                        res_set = np.zeros(m_sl, dtype=bool)
                        res_set[resolved_local] = True
                        keep = topk & res_set[fq_s]
                        rows = sl[fq_s[keep]]
                        out_t[rows, rank[keep]] = self.item_idx[fn_s[keep]]
                        out_d[rows, rank[keep]] = d2_s[keep]
                        resolved[start + np.flatnonzero(res_set)] = True
            pending = pending[~resolved]
            r *= 4
        qi = np.repeat(np.arange(len(qx), dtype=np.int64), k)
        return qi, out_t.ravel(), out_d.ravel()
