"""Spatial stages: candidate point-in-polygon join, kNN join, tile
assignment, rectangle-overlap refine.

Reference parity (SURVEY.md §2):
  - candidate join  ≙ J4/J9 — `shst match` candidate generation + geopoly
    probe (``/root/reference/src/daos/GtfsConflationMapJoinDAO/loaders.js:139-155``,
    ``ConflationMapDAO/generators.js:9-47``)
  - refine          ≙ J5 — cospatiality intersection/overlap refinement
    (``GtfsConflationMapJoinDAO/loaders.js:159-275``)
  - tile assignment ≙ O1/M4 — geoprox_key spatial bucketing
    (``src/utils/getGeoProximityKey.js:8-46``)

Execution model: the tile/reference side is SMALL relative to probes
(conflation map vs every shape segment in the reference), so it is broadcast
once (`ray.put`) and indexed once per WORKER (``util.cached_state``) — the
probe side streams through stateless ``map_batches`` tasks in zero-copy Arrow
batches. Stateless tasks + worker-level cache beat an actor pool here: the
index builds in milliseconds, tasks stay elastic across concurrent stage
executions, and no CPUs are reserved away from the read/write operators. No
shuffle happens in the join itself — only downstream aggregates shuffle,
after per-batch partial aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..state.grid_index import GridIndex
from ..state.strtree import STRtree
from .util import cached_state


def build_tile_index(tiles: pa.Table, world: int = 65536,
                     bucket_size: int | None = None) -> GridIndex:
    """Build a :class:`GridIndex` from a tile table with columns
    (tile_id, ref_id, level, cx, cy, hw, hh).

    ``bucket_size=None`` adapts to the DATA: buckets ~1/8 of the median tile
    width keep the candidate-to-hit ratio near 1 (measured 4-9x faster
    probes than a fixed 2048 on wide tiles) while the per-worker build stays
    in the low hundreds of ms."""
    cx = tiles["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
    cy = tiles["cy"].to_numpy(zero_copy_only=False).astype(np.int64)
    hw = tiles["hw"].to_numpy(zero_copy_only=False).astype(np.int64)
    hh = tiles["hh"].to_numpy(zero_copy_only=False).astype(np.int64)
    tid = tiles["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if bucket_size is None:
        med = float(np.median(np.maximum(hw, hh)) * 2 if len(hw) else world)
        bucket_size = int(np.clip(2 ** np.round(np.log2(max(med / 8.0, 1.0))), 128, 4096))
    return GridIndex(tid, cx - hw, cy - hh, cx + hw, cy + hh, world=world, bucket_size=bucket_size)


class _TileState:
    """Per-worker join state: grid index + payload columns."""

    def __init__(self, tiles: pa.Table):
        self.index = build_tile_index(tiles)
        self.ref_id = tiles["ref_id"].to_numpy(zero_copy_only=False)
        self.level = tiles["level"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.cx = tiles["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.cy = tiles["cy"].to_numpy(zero_copy_only=False).astype(np.int64)


class _TileStateSTR(_TileState):
    """Same join state over the packed STR R-tree backend
    (``state/strtree.py`` — the north star's "STRtree-backed" wording;
    results are identical, the tree wins on heavily skewed tile extents)."""

    def __init__(self, tiles: pa.Table):
        super().__init__(tiles)
        # leaf cap 8: tighter leaf MBRs cut item-level tests ~17% on the
        # point probe (heavily overlapping tiles); kNN is cap-insensitive
        self.index = STRtree(
            self.index.tile_id, self.index.x0, self.index.y0,
            self.index.x1, self.index.y1, node_cap=8,
        )


_BACKENDS = {"grid": _TileState, "strtree": _TileStateSTR}


def shard_tiles(tiles: pa.Table, n_shards: int, world: int = 65536) -> list[tuple[int, int, pa.Table]]:
    """Split the tile table into ``n_shards`` x-range shards for the
    reference-side-outgrows-worker-memory regime (the sharding plan from
    ``state/grid_index.py``): shard s owns x-range [lo, hi) and holds every
    tile whose rect INTERSECTS that range (boundary tiles replicated), so a
    point probes exactly the one shard owning its x — containment results
    stay complete without any cross-shard pass. Returns
    [(lo, hi, shard_table)]."""
    cx = tiles["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
    hw = tiles["hw"].to_numpy(zero_copy_only=False).astype(np.int64)
    x0, x1 = cx - hw, cx + hw
    step = max(world // n_shards, 1)
    out = []
    for s in range(n_shards):
        lo = s * step
        hi = world if s == n_shards - 1 else (s + 1) * step
        mask = (x1 >= lo) & (x0 < hi)
        out.append((lo, hi, tiles.filter(pa.array(mask))))
    return out


def sharded_candidate_join(points, shard_refs: list, x_col: str, y_col: str,
                           carry_cols: list[str]):
    """Point-in-tile candidate join against a SHARDED reference side:
    ``shard_refs`` = [(lo, hi, ray.ObjectRef-of-shard-table)]. Each batch
    partitions its points by x-range and probes only the shards it touches;
    a worker builds (and caches) only the shard indexes its batches need —
    bounded per-worker memory even when the full tile table does not fit,
    and with spatially-sorted input each worker touches ~one shard.
    Output rows identical to the unsharded ``candidate_join``."""
    bounds = np.array([lo for lo, _, _ in shard_refs] + [shard_refs[-1][1]],
                      dtype=np.int64)

    def _probe(batch: pa.Table) -> pa.Table:
        px = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        which = np.clip(np.searchsorted(bounds, px, side="right") - 1,
                        0, len(shard_refs) - 1)
        parts = []
        for s in np.unique(which):
            st: _TileState = cached_state(shard_refs[int(s)][2], _TileState)
            rows = np.flatnonzero(which == s)
            pi, ti = st.index.query_points(px[rows], py[rows])
            sel = rows[pi]
            cols: dict[str, object] = {}
            for c in carry_cols:
                cols[c] = batch[c].take(pa.array(sel))
            cols[x_col] = px[sel]
            cols[y_col] = py[sel]
            cols["tile_id"] = st.index.tile_id[ti]
            cols["ref_id"] = st.ref_id[ti]
            cols["level"] = st.level[ti]
            parts.append(pa.table(cols))
        if not parts:
            sch = [(c, batch.schema.field(c).type) for c in carry_cols + [x_col, y_col]]
            empty = {c: pa.array([], type=t) for c, t in sch}
            empty["tile_id"] = pa.array([], type=pa.int64())
            empty["ref_id"] = pa.array([], type=pa.int64())
            empty["level"] = pa.array([], type=pa.int64())
            return pa.table(empty)
        return pa.concat_tables(parts)

    return points.map_batches(_probe, batch_format="pyarrow", batch_size=8192)


def candidate_join(points, tiles_ref, x_col: str, y_col: str, carry_cols: list[str],
                   concurrency=None, backend: str = "grid"):
    """Point-in-tile candidate spatial join: one output row per (point, tile)
    containment pair. ``tiles_ref`` is a `ray.put` handle to the tile table
    (shipped once; indexed once per worker). ``backend``: "grid" (uniform
    buckets; near-uniform extents) or "strtree" (packed R-tree; skewed
    extents) — identical output either way."""
    state_cls = _BACKENDS[backend]

    def _probe(batch: pa.Table) -> pa.Table:
        st: _TileState = cached_state(tiles_ref, state_cls)
        px = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pi, ti = st.index.query_points(px, py)
        cols: dict[str, object] = {}
        for c in carry_cols:
            cols[c] = batch[c].take(pa.array(pi))
        cols[x_col] = px[pi]
        cols[y_col] = py[pi]
        cols["tile_id"] = st.index.tile_id[ti]
        cols["ref_id"] = st.ref_id[ti]
        cols["level"] = st.level[ti]
        return pa.table(cols)

    return points.map_batches(_probe, batch_format="pyarrow", batch_size=8192)


class _HexState:
    """Per-worker point-in-POLYGON state: bbox grid index + the 6 hexagon
    vertex arrays derived from each tile's (cx, cy, hw, hh). The hexagon is
    the tile rect's inscribed hexagon: (cx±hw, cy), (cx±hw//2, cy±hh) —
    closed-form in the tile params so the SQL oracle regenerates it exactly."""

    def __init__(self, tiles: pa.Table):
        self.index = build_tile_index(tiles)
        self.cx = tiles["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.cy = tiles["cy"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.hw = tiles["hw"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.hh = tiles["hh"].to_numpy(zero_copy_only=False).astype(np.int64)


def point_in_polygon_join(points, tiles_ref, x_col: str, y_col: str,
                          carry_cols: list[str], concurrency=None):
    """TRUE point-in-polygon candidate join (≙ the reference's SQLite
    ``geopoly_contains_point`` probe, ``ConflationMapDAO/generators.js:9-47``
    — the rect-only ``candidate_join`` covers the bbox prefilter half):
    polygons are per-tile hexagons; candidates come from the bbox grid index,
    then an INTEGER-EXACT crossing-parity (ray-casting) test keeps only the
    contained pairs. The per-edge predicate

        cross ⇔ (y1 > py) != (y2 > py)
                AND sign((px-x1)·(y2-y1) - (py-y1)·(x2-x1)) == -sign(y2-y1)

    is pure int64 arithmetic (no division), so engine and DuckDB oracle agree
    bit-for-bit even for boundary points. Vectorized: 6 fused numpy passes
    over the candidate-pair arrays per batch — no per-point Python."""

    def _probe(batch: pa.Table) -> pa.Table:
        st: _HexState = cached_state(tiles_ref, _HexState)
        px = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pi, ti = _hex_contains(st, px, py)
        cols: dict[str, object] = {}
        for c in carry_cols:
            cols[c] = batch[c].take(pa.array(pi))
        cols["tile_id"] = st.index.tile_id[ti]
        return pa.table(cols)

    return points.map_batches(_probe, batch_format="pyarrow", batch_size=8192)


def _hex_contains(st: _HexState, px: np.ndarray, py: np.ndarray):
    """bbox candidates + exact crossing-parity filter → (point_idx, tile_idx).

    Algebraically collapsed form of the 6-edge even-odd loop (2x faster on
    the bandwidth-bound candidate stream, bit-identical to the SQL oracle's
    per-edge predicate): in tile-centered coords (dx, dy) the two horizontal
    edges can never straddle dy (their `cond` is identically false), the two
    upper slanted edges share the straddle condition cU = (0>dy)!=(h>dy) and
    the two lower ones cL = (0>dy)!=(-h>dy) (mutually exclusive for h>0), so
    parity-of-crossings reduces to an XOR of the two same-band orientation
    tests. t0/t2/t3/t5 below are EXACTLY the original per-edge t values of
    edges (w,0)→(h2,h), (-h2,h)→(-w,0), (-w,0)→(-h2,-h), (h2,-h)→(w,0),
    with the (y2>y1)-sign folded in (dye = ±h)."""
    pi, ti = st.index.query_points(px, py)
    dx = px[pi] - st.cx[ti]
    dy = py[pi] - st.cy[ti]
    w = st.hw[ti]
    h = st.hh[ti]
    h2 = w // 2
    s = h2 - w  # slant run (≤ 0)
    g0 = 0 > dy
    cU = g0 != (h > dy)
    cL = g0 != (-h > dy)
    t0 = (dx - w) * h - dy * s
    t2 = -(dx + h2) * h - (dy - h) * s
    t3 = -(dx + w) * h + dy * s
    t5 = (dx - h2) * h + (dy + h) * s
    inside = (cU & ((t0 < 0) != (t2 > 0))) | (cL & ((t3 > 0) != (t5 < 0)))
    return pi[inside], ti[inside]


def point_in_polygon_counts(points, tiles_ref, x_col: str, y_col: str,
                            n_buckets: int | None = None):
    """Fused polygon-containment count per tile: the probe emits PER-BATCH
    ``np.bincount`` partials instead of the (huge) pair set — at sf0.1 the
    pair set is ~18M rows; the partials shuffle at most #tiles rows per
    batch (the flagship ``tile_stats`` plan applied to the polygon probe)."""
    from .relational import partial_groupby_sum

    def _probe(batch: pa.Table) -> pa.Table:
        st: _HexState = cached_state(tiles_ref, _HexState)
        px = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _pi, ti = _hex_contains(st, px, py)
        counts = np.bincount(ti, minlength=len(st.index.tile_id))
        nz = np.flatnonzero(counts)
        return pa.table(
            {"tile_id": st.index.tile_id[nz], "n_inside": counts[nz].astype(np.int64)}
        )

    # 32768 like the flagship tile_stats probe: each partial batch emits up to
    # #tiles rows, so bigger batches cut the combine's input 4x (measured
    # 4.1-6.1s -> ~3.9-4.1s at sf0.1/32cpu; finer read blocks made it WORSE
    # by multiplying partial rows)
    partials = points.map_batches(_probe, batch_format="pyarrow", batch_size=32768)
    return partial_groupby_sum(partials, ["tile_id"], ["n_inside"],
                               n_buckets=n_buckets)


def best_tile_join(points, tiles_ref, x_col: str, y_col: str, carry_cols: list[str],
                   radius: int | None = None):
    """One row per point: the BEST matching tile — the containing tile with
    min (squared centroid distance, tile_id); if none contains the point and
    ``radius`` is given, fall back to the nearest tile centroid within that
    radius (``match_round`` 1 = containment, 2 = radius fallback). Points with
    no match are dropped.

    ≙ the reference's iterative re-match driver loop (T3,
    ``shstMatchFeatures.js:283-379``): round 1 = direct match, later rounds
    relax geometry for the unmatched remainder — here both rounds are
    resolved in ONE map-side pass per batch (the candidate set for a point
    never crosses a batch boundary, so the argmin is exact)."""

    def _best(batch: pa.Table) -> pa.Table:
        st: _TileState = cached_state(tiles_ref, _TileState)
        px = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pi, ti = st.index.query_points(px, py)
        d2 = (px[pi] - st.cx[ti]) ** 2 + (py[pi] - st.cy[ti]) ** 2
        tid = st.index.tile_id[ti]
        order = np.lexsort((tid, d2, pi))
        pi_s = pi[order]
        first = np.ones(len(pi_s), dtype=bool)
        first[1:] = pi_s[1:] != pi_s[:-1]
        sel_pi = pi_s[first]
        sel_tid = tid[order][first]
        sel_d2 = d2[order][first]
        rounds = np.ones(len(sel_pi), dtype=np.int64)
        if radius is not None:
            matched = np.zeros(len(px), dtype=bool)
            matched[sel_pi] = True
            un = np.flatnonzero(~matched)
            if len(un):
                qi, ti2, d2k = st.index.knn_centroids(px[un], py[un], 1)
                inrad = d2k <= radius * radius
                sel_pi = np.concatenate([sel_pi, un[qi[inrad]]])
                sel_tid = np.concatenate([sel_tid, st.index.tile_id[ti2[inrad]]])
                sel_d2 = np.concatenate([sel_d2, d2k[inrad]])
                rounds = np.concatenate([rounds, np.full(int(inrad.sum()), 2, dtype=np.int64)])
        cols: dict[str, object] = {}
        for c in carry_cols:
            cols[c] = batch[c].take(pa.array(sel_pi))
        cols["tile_id"] = sel_tid
        cols["dist2"] = sel_d2
        cols["match_round"] = rounds
        return pa.table(cols)

    # batch_size 8192: <= one read block at bench scale (so tasks = blocks and
    # all cores engage); at production block sizes this only sets UDF call
    # granularity inside a task, not task parallelism
    return points.map_batches(_best, batch_format="pyarrow", batch_size=8192)


def knn_join(points, tiles_ref, k: int, x_col: str, y_col: str, carry_cols: list[str],
             concurrency=None, backend: str = "grid"):
    """k-nearest-tile join (exact, deterministic tie-break by tile_id)."""
    state_cls = _BACKENDS[backend]

    def _knn(batch: pa.Table) -> pa.Table:
        st: _TileState = cached_state(tiles_ref, state_cls)
        qx = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qy = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qi, ti, d2 = st.index.knn_centroids(qx, qy, k)
        kk = min(k, len(st.index.tile_id))
        cols: dict[str, object] = {}
        for c in carry_cols:
            cols[c] = batch[c].take(pa.array(qi))
        cols["tile_id"] = st.index.tile_id[ti]
        cols["knn_rank"] = np.tile(np.arange(1, kk + 1, dtype=np.int64), len(qx))
        cols["dist2"] = d2
        return pa.table(cols)

    return points.map_batches(_knn, batch_format="pyarrow", batch_size=8192)


def assign_cells(points, x_col: str, y_col: str, levels: list[int], world: int = 65536):
    """Multi-resolution tile assignment: for each level (cell size in world
    units), emit (level_size, cell_x, cell_y) per point — vectorized flat-map.

    ≙ the reference's geoprox_key prefix bucketing at varying precision
    (``getGeoProximityKey.js:28-34``)."""
    lv = np.asarray(levels, dtype=np.int64)

    def _assign(batch: pa.Table) -> pa.Table:
        px = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(px)
        lsz = np.repeat(lv, n)
        pxr = np.tile(px, len(lv))
        pyr = np.tile(py, len(lv))
        return pa.table(
            {"level_size": lsz, "cell_x": pxr // lsz, "cell_y": pyr // lsz}
        )

    return points.map_batches(_assign, batch_format="pyarrow", batch_size=8192)


def tile_overlap_pairs(tiles_ds, tiles_ref, concurrency=None):
    """Self spatial join of the tile set: unordered overlapping pairs with
    positive intersection area — the refine half of the filter-and-refine
    join (≙ J5 cospatiality, intersection > threshold keep-rule,
    ``GtfsConflationMapJoinDAO/loaders.js:56,240``)."""

    def _overlap(batch: pa.Table) -> pa.Table:
        st: _TileState = cached_state(tiles_ref, _TileState)
        ix = st.index
        qid = batch["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        qx0 = batch["x0"].to_numpy(zero_copy_only=False).astype(np.int64)
        qy0 = batch["y0"].to_numpy(zero_copy_only=False).astype(np.int64)
        qx1 = batch["x1"].to_numpy(zero_copy_only=False).astype(np.int64)
        qy1 = batch["y1"].to_numpy(zero_copy_only=False).astype(np.int64)
        qi, ti = ix.query_rects(qx0, qy0, qx1, qy1)
        iw = np.minimum(qx1[qi], ix.x1[ti]) - np.maximum(qx0[qi], ix.x0[ti])
        ih = np.minimum(qy1[qi], ix.y1[ti]) - np.maximum(qy0[qi], ix.y0[ti])
        a, b = qid[qi], ix.tile_id[ti]
        keep = a < b  # each unordered pair once, no self-pairs
        return pa.table(
            {"tile_a": a[keep], "tile_b": b[keep], "inter_area": (iw * ih)[keep]}
        )

    return tiles_ds.map_batches(_overlap, batch_format="pyarrow", batch_size=8192)


class _SegIndexState:
    """Per-worker segment-intersection join state: int64 endpoints + a
    :class:`GridIndex` over segment bboxes inflated by 1 in DOUBLED
    coordinates. ``query_rects`` is strict (positive-area overlap), so
    probing exact-doubled (even) query bboxes against +1-inflated (odd)
    segment bboxes makes the strict test EQUAL inclusive bbox overlap in
    original coordinates — the bbox term of the inclusive intersection
    predicate, with no closed-vs-open ambiguity (same parity trick as the
    buffer-PIP rects)."""

    def __init__(self, t: pa.Table):
        self.tile_id = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.ax = t["ax"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.ay = t["ay"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.bx = t["bx"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.by = t["by"].to_numpy(zero_copy_only=False).astype(np.int64)
        x0 = 2 * np.minimum(self.ax, self.bx) - 1
        x1 = 2 * np.maximum(self.ax, self.bx) + 1
        y0 = 2 * np.minimum(self.ay, self.by) - 1
        y1 = 2 * np.maximum(self.ay, self.by) + 1
        self.index = GridIndex(np.arange(len(x0), dtype=np.int64),
                               x0, y0, x1, y1, world=131072)


def segment_intersect_counts(probes, segs_ref, px: str = "px", py: str = "py",
                             qx: str = "qx", qy: str = "qy",
                             batch_size: int = 32768):
    """Exact segment×segment intersection join: per indexed segment, the
    count of probe segments it intersects (inclusive — touching endpoints
    and collinear overlap count).

    ≙ the segment-crossing detection behind turf ``kinks``/``lineIntersect``
    that gates the reference's similarity scoring
    (``/root/reference/src/utils/gis/getSimilarity.js:138-147`` refuses
    self-intersecting LineStrings), re-expressed as a filter-and-refine
    broadcast join: candidates from the inflated-bbox grid probe (the bbox
    term of the predicate — see :class:`_SegIndexState`), refined by integer
    orientation SIGNS:

        intersects ⟺ bboxOverlap ∧ sign(d1)·sign(d2) ≤ 0 ∧ sign(d3)·sign(d4) ≤ 0

    with d1..d4 the four point-vs-line cross products. Signs are compared —
    never the raw d products, whose 2^70 magnitude would overflow int64;
    each d itself is < 2^35 here. Exact, so the DuckDB mirror is the same
    four sign() predicates. Segments broadcast once (``ray.put``); probes
    stream through a fused probe+bincount combiner, so the pair set never
    materializes (the buffer-PIP pattern)."""
    from .relational import partial_groupby_sum

    def _probe(batch: pa.Table) -> pa.Table:
        st: _SegIndexState = cached_state(segs_ref, _SegIndexState,
                                          token="_SegIndexState")
        ppx = batch[px].to_numpy(zero_copy_only=False).astype(np.int64)
        ppy = batch[py].to_numpy(zero_copy_only=False).astype(np.int64)
        pqx = batch[qx].to_numpy(zero_copy_only=False).astype(np.int64)
        pqy = batch[qy].to_numpy(zero_copy_only=False).astype(np.int64)
        pi, si = st.index.query_rects(
            2 * np.minimum(ppx, pqx), 2 * np.minimum(ppy, pqy),
            2 * np.maximum(ppx, pqx), 2 * np.maximum(ppy, pqy))
        ax, ay = st.ax[si], st.ay[si]
        bx, by = st.bx[si], st.by[si]
        cx, cy = ppx[pi], ppy[pi]
        dx, dy = pqx[pi], pqy[pi]
        rx, ry = dx - cx, dy - cy          # probe direction
        sx, sy = bx - ax, by - ay          # segment direction
        d1 = rx * (ay - cy) - ry * (ax - cx)
        d2 = rx * (by - cy) - ry * (bx - cx)
        d3 = sx * (cy - ay) - sy * (cx - ax)
        d4 = sx * (dy - ay) - sy * (dx - ax)
        ok = (np.sign(d1) * np.sign(d2) <= 0) & (np.sign(d3) * np.sign(d4) <= 0)
        counts = np.bincount(si[ok], minlength=len(st.tile_id))
        nz = np.flatnonzero(counts)
        return pa.table({"tile_id": st.tile_id[nz],
                         "n_cross": counts[nz].astype(np.int64)})

    partials = probes.map_batches(_probe, batch_format="pyarrow",
                                  batch_size=batch_size)
    return partial_groupby_sum(partials, ["tile_id"], ["n_cross"])


class _RectIndexState:
    """Per-worker rect-probe join state — the transpose of
    :class:`_SegIndexState`: here the RECTANGLES are indexed (+1-inflated in
    DOUBLED coordinates) and segments probe with their exact-doubled bboxes,
    so the grid's strict positive-area test equals INCLUSIVE bbox overlap in
    original coordinates (the same parity trick as the buffer-PIP rects)."""

    def __init__(self, t: pa.Table):
        self.tile_id = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.x0 = t["x0"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.y0 = t["y0"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.x1 = t["x1"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.y1 = t["y1"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.index = GridIndex(np.arange(len(self.x0), dtype=np.int64),
                               2 * self.x0 - 1, 2 * self.y0 - 1,
                               2 * self.x1 + 1, 2 * self.y1 + 1, world=131072)


def segment_rect_spans(segs, rects_ref, carry_cols: list[str],
                       ax: str = "ax", ay: str = "ay",
                       bx: str = "bx", by: str = "by",
                       out_col: str = "n_tiles", batch_size: int = 16384):
    """Exact segment×rectangle intersection fan-out: per probe segment, the
    count of indexed rects the segment TRULY intersects (inclusive — touching
    counts). This is the tile-clip fan-out of a vector-tile service (every
    MVT emission must know which tile boxes each feature crosses; the
    engine's mbtiles sink slices on exactly this predicate) and the rect
    analog of the reference's geopoly probe
    (``ConflationMapDAO/loaders.js:104-113`` buffers segments into polygons
    and asks which probes fall inside).

    Separating-axis-exact predicate: candidate by inclusive bbox overlap
    (grid probe, see :class:`_RectIndexState`), refined by "the rect's four
    corners do not all lie STRICTLY on one side of the segment's line" —
    for a convex polygon vs a segment the SAT axes are exactly {x, y,
    segment normal}, so bbox + corner-signs is complete, not a heuristic.
    Each cross product is < 2^35 here, so int64 is exact and the DuckDB
    mirror is the same corner-sign conjunction. A degenerate (point)
    segment makes all four crosses 0 and correctly degrades to
    point-in-rect via the bbox term.

    The rect set broadcasts once (``ray.put``); segments stream, and the
    per-segment count FINISHES inside its own batch (``np.bincount`` over
    batch-local rows), so this join has NO shuffle at any scale."""

    def _probe(batch: pa.Table) -> pa.Table:
        st: _RectIndexState = cached_state(rects_ref, _RectIndexState,
                                           token="_RectIndexState")
        sax = batch[ax].to_numpy(zero_copy_only=False).astype(np.int64)
        say = batch[ay].to_numpy(zero_copy_only=False).astype(np.int64)
        sbx = batch[bx].to_numpy(zero_copy_only=False).astype(np.int64)
        sby = batch[by].to_numpy(zero_copy_only=False).astype(np.int64)
        qi, ri = st.index.query_rects(
            2 * np.minimum(sax, sbx), 2 * np.minimum(say, sby),
            2 * np.maximum(sax, sbx), 2 * np.maximum(say, sby))
        sx, sy = (sbx - sax)[qi], (sby - say)[qi]
        pax, pay = sax[qi], say[qi]
        x0, y0 = st.x0[ri], st.y0[ri]
        x1, y1 = st.x1[ri], st.y1[ri]
        c1 = sx * (y0 - pay) - sy * (x0 - pax)
        c2 = sx * (y0 - pay) - sy * (x1 - pax)
        c3 = sx * (y1 - pay) - sy * (x0 - pax)
        c4 = sx * (y1 - pay) - sy * (x1 - pax)
        ok = ~(((c1 > 0) & (c2 > 0) & (c3 > 0) & (c4 > 0))
               | ((c1 < 0) & (c2 < 0) & (c3 < 0) & (c4 < 0)))
        counts = np.bincount(qi[ok], minlength=len(batch))
        nz = np.flatnonzero(counts)
        cols: dict[str, object] = {}
        for c in carry_cols:
            cols[c] = batch[c].take(pa.array(nz))
        cols[out_col] = counts[nz].astype(np.int64)
        return pa.table(cols)

    return segs.map_batches(_probe, batch_format="pyarrow",
                            batch_size=batch_size)


def _dbscan_pairs(points, eps: int, id_col: str, x_col: str, y_col: str,
                  supercell: int, cpa: int, est_rows: int | None):
    """eps-neighbor pair generation for :func:`grid_dbscan`: the
    supercell-with-halo self-join. Each point ships ONCE to the supercell
    that owns it (h=1) plus a halo copy to every neighboring supercell whose
    region its eps-box touches (h=0; ~4·eps/S of points, <4% at the default
    S) — so the shuffle moves ~1.03 rows per point, not the 9 probe copies
    of the textbook cell-replication join. Inside a supercell the kernel
    probes the 3×3 eps-cell neighborhood with nine searchsorted passes over
    one key-sorted array. Pair (a,b) is emitted exactly once per direction:
    a is a home row only in its owning supercell, and b has exactly one copy
    (owned XOR halo) there; keys are (supercell, eps-cell) composite so a
    bucket holding several supercells never cross-pairs them."""
    from .relational import bucketed_groups

    km = np.int64(1) << 23  # composite key stride: cell ids < cpa² < 2^23

    def _emit(batch: pa.Table) -> pa.Table:
        pid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = (x // eps + 1) * cpa + (y // eps + 1)
        sx0, sx1 = (x - eps) // supercell, (x + eps) // supercell
        sy0, sy1 = (y - eps) // supercell, (y + eps) // supercell
        ox, oy = x // supercell, y // supercell
        outs = []
        for a, ma in ((sx0, None), (sx1, sx1 != sx0)):
            for b, mb in ((sy0, None), (sy1, sy1 != sy0)):
                m = None
                if ma is not None:
                    m = ma
                if mb is not None:
                    m = mb if m is None else (m & mb)
                sel = slice(None) if m is None else np.flatnonzero(m)
                sc = (a[sel] + 2) * 1024 + (b[sel] + 2)
                outs.append(pa.table({
                    "key": sc * km + cell[sel],
                    "sc": sc,
                    "h": ((a[sel] == ox[sel]) & (b[sel] == oy[sel])).astype(np.int8),
                    "pid": pid[sel], "x": x[sel], "y": y[sel],
                }))
        return pa.concat_tables(outs)

    emitted = points.map_batches(_emit, batch_format="pyarrow",
                                 batch_size=8192)

    _empty = {"pid_a": np.array([], dtype=np.int64),
              "pid_b": np.array([], dtype=np.int64)}
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        key = df["key"].to_numpy().astype(np.int64)
        pid = df["pid"].to_numpy().astype(np.int64)
        x = df["x"].to_numpy().astype(np.int64)
        y = df["y"].to_numpy().astype(np.int64)
        o = np.argsort(key, kind="stable")
        key, pid, x, y = key[o], pid[o], x[o], y[o]
        hm = df["h"].to_numpy()[o] == 1
        hk, hp, hx, hy = key[hm], pid[hm], x[hm], y[hm]
        out_a, out_b = [], []
        for dx, dy in offsets:
            tk = hk + dx * cpa + dy
            lo = np.searchsorted(key, tk, "left")
            cnt = np.searchsorted(key, tk, "right") - lo
            tot = int(cnt.sum())
            if tot == 0:
                continue
            ai = np.repeat(np.arange(len(hk)), cnt)
            bi = np.repeat(lo, cnt) + np.arange(tot) - np.repeat(
                np.cumsum(cnt) - cnt, cnt)
            ok = ((np.abs(hx[ai] - x[bi]) <= eps)
                  & (np.abs(hy[ai] - y[bi]) <= eps) & (hp[ai] != pid[bi]))
            out_a.append(hp[ai[ok]])
            out_b.append(pid[bi[ok]])
        if not out_a:
            return pd.DataFrame(_empty)
        return pd.DataFrame({"pid_a": np.concatenate(out_a),
                             "pid_b": np.concatenate(out_b)})

    return bucketed_groups(emitted, ["sc"], _pairs,
                           est_rows=est_rows).map_batches(
        lambda t: t, batch_format="pyarrow", batch_size=8192).materialize()


def grid_dbscan(points, eps: int, min_pts: int, id_col: str = "point_id",
                x_col: str = "px", y_col: str = "py", world: int = 65536,
                supercell: int = 4096, n_parts: int = 8,
                est_rows: int | None = None, plan: str = "auto",
                broadcast_labels_max: int = 4_000_000):
    """Density-based spatial clustering (DBSCAN, Ester et al. 1996) under the
    Chebyshev (L∞) metric on the integer world grid — the density analog of
    the reference's match-equivalence grouping: where the reference clusters
    segments through pairwise match edges
    (``/root/reference/src/daos/GtfsOsmNetworkDAO/loaders.js:39-49``), DBSCAN
    clusters points through pairwise ε-proximity with a density (core) gate.

    Semantics (deterministic variant):
      - neighbor:  |Δx| ≤ eps AND |Δy| ≤ eps, self excluded
      - core:      |N_eps(p)| ≥ min_pts, COUNTING p itself (the classic rule)
      - cluster:   connected components of the core–core neighbor graph,
                   labeled by the component-min core id (exact fixpoint via
                   :func:`..stages.dedup.dedup_clusters`)
      - border:    non-core with ≥1 core neighbor → MIN cluster id among its
                   core neighbors (classic DBSCAN is scan-order-dependent
                   here; the min rule makes it deterministic and SQL-exact)
      - noise:     everything else, cluster_id = -1

    Scale shape: pair generation is the supercell-with-halo self-join
    (:func:`_dbscan_pairs` — ~1.03 shuffled rows per point, vectorized 3×3
    eps-cell probe). Degrees ride a combiner-first grouped sum; the CC loop
    is the pointer-doubling engine bounded by the edge-touched node set.
    Size-based plan selection for label attachment (the dedup_clusters
    rule): when the CLUSTERED subset (cores + attached borders — sparse
    relative to the corpus in every dedup/blocking regime) fits a broadcast
    (≤ ``broadcast_labels_max``), labels ship to workers via ``ray.put`` and
    the corpus takes ONE streaming map pass with zero further shuffles;
    otherwise every attachment is a hash join, partition counts sized to the
    data. ``plan``: "auto" | "broadcast" | "join". Uniform-ish density is
    the documented assumption (true of phash keys); a skewed world wants
    eps-adaptive supercells, which compose with the same kernel.

    Returns (id_col, role 'core'|'border'|'noise', cluster_id int64).
    """
    from .dedup import dedup_clusters
    from .relational import bucketed_groups, partial_groupby_sum

    cpa = world // eps + 3  # eps-cells per axis incl. ±1 halo shift
    pairs = _dbscan_pairs(points, eps, id_col, x_col, y_col, supercell, cpa,
                          est_rows)

    def _ident(t: pa.Table) -> pa.Table:
        return t

    # partition counts sized to the DATA (the dedup_clusters rule): a handful
    # of pair rows over 8 hash partitions leaves empty partitions, and an
    # empty partition downstream of a chained hash join carries no schema —
    # pyarrow's join then rejects the key reference. One partition at gate
    # scale, growing with the pair set at real scale.
    np_pairs = max(1, min(n_parts, pairs.count() // 50_000 + 1))
    np_pts = (max(1, min(n_parts, est_rows // 50_000 + 1))
              if est_rows else n_parts)

    def _all_noise(batch: pa.Table) -> pa.Table:
        pid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: pid,
                         "role": np.full(len(pid), "noise", dtype=object),
                         "cluster_id": np.full(len(pid), -1, dtype=np.int64)})

    deg = partial_groupby_sum(
        pairs.map_batches(
            lambda t: pa.table({"pid": t["pid_a"]}),
            batch_format="pyarrow", batch_size=8192),
        ["pid"], [], count_as="deg", n_buckets=np_pairs).map_batches(
        _ident, batch_format="pyarrow", batch_size=8192)
    # core: deg neighbors + the point itself >= min_pts
    cores = deg.filter(expr=f"deg >= {min_pts - 1}").map_batches(
        lambda t: pa.table({"cpid": t["pid"]}),
        batch_format="pyarrow", batch_size=8192).materialize()

    n_cores = cores.count()
    # no core anywhere -> no clusters, no borders: every point is noise
    # (also keeps empty-side hash joins, which lack a schema, out of the plan)
    if n_cores == 0:
        return points.map_batches(_all_noise, batch_format="pyarrow",
                                  batch_size=8192)

    if plan == "broadcast" or (plan == "auto"
                               and n_cores <= broadcast_labels_max):
        return _dbscan_attach_broadcast(
            points, pairs, cores, min_pts, id_col, np_pairs,
            dedup_clusters, bucketed_groups)
    return _dbscan_attach_join(
        points, pairs, cores, id_col, np_pairs, np_pts,
        dedup_clusters, bucketed_groups, _all_noise)


def _dbscan_attach_broadcast(points, pairs, cores, min_pts, id_col,
                             np_pairs, dedup_clusters, bucketed_groups):
    """Label-attachment tail, broadcast plan: core set + cluster labels ship
    once via ``ray.put`` (sorted arrays, searchsorted membership per batch);
    the corpus streams through ONE map pass. Chosen when the clustered
    subset fits worker memory — the common regime for density blocking."""
    core_arr = np.sort(cores.to_pandas()["cpid"].to_numpy().astype(np.int64))
    core_ref = ray.put(core_arr)

    def _is_core(ids: np.ndarray, arr: np.ndarray) -> np.ndarray:
        ix = np.searchsorted(arr, ids)
        ix = np.minimum(ix, len(arr) - 1)
        return arr[ix] == ids

    def _cedges(batch: pa.Table) -> pa.Table:
        arr = cached_state(core_ref, lambda a: a, token="_dbscan_cores")
        a = batch["pid_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["pid_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _is_core(a, arr) & _is_core(b, arr)
        return pa.table({"doc_a": a[m], "doc_b": b[m]})

    cedges = pairs.map_batches(_cedges, batch_format="pyarrow",
                               batch_size=8192)
    core_ids = ray.data.from_arrow(pa.table({"doc_id": core_arr}))
    corelab = dedup_clusters(core_ids, cedges, n_parts=np_pairs)
    lab_df = corelab.to_pandas()  # bounded: one row per core
    lab_pid = lab_df["doc_id"].to_numpy().astype(np.int64)
    o = np.argsort(lab_pid)
    lab_ref = ray.put((lab_pid[o],
                       lab_df["cluster_id"].to_numpy().astype(np.int64)[o]))

    def _lab_of(ids: np.ndarray, lp: np.ndarray, lc: np.ndarray):
        ix = np.minimum(np.searchsorted(lp, ids), len(lp) - 1)
        return lc[ix], lp[ix] == ids

    def _border_cand(batch: pa.Table) -> pa.Table:
        lp, lc = cached_state(lab_ref, lambda a: a, token="_dbscan_corelab")
        a = batch["pid_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["pid_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        bl, b_core = _lab_of(b, lp, lc)
        _, a_core = _lab_of(a, lp, lc)
        m = b_core & ~a_core
        return pa.table({"pid": a[m], "cl": bl[m]})

    def _bmin_pre(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("pid", as_index=False, sort=False).min()

    border = bucketed_groups(
        pairs.map_batches(_border_cand, batch_format="pyarrow",
                          batch_size=8192),
        ["pid"], _bmin_pre, pre_fn=_bmin_pre, n_buckets=np_pairs).map_batches(
        lambda t: t, batch_format="pyarrow", batch_size=8192)
    bdf = border.to_pandas()  # bounded: borders are core-adjacent only
    if len(bdf) == 0:  # no borders: empty Dataset.to_pandas() drops schema
        bp = np.array([], dtype=np.int64)
        bc = np.array([], dtype=np.int64)
    else:
        bp = bdf["pid"].to_numpy().astype(np.int64)
        bc = bdf["cl"].to_numpy().astype(np.int64)
    o = np.argsort(bp)
    blab_ref = ray.put((bp[o], bc[o]))

    def _assemble(batch: pa.Table) -> pa.Table:
        lp, lc = cached_state(lab_ref, lambda a: a, token="_dbscan_corelab")
        bpp, bcc = cached_state(blab_ref, lambda a: a, token="_dbscan_blab")
        pid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cl, is_core = _lab_of(pid, lp, lc)
        if len(bpp):
            bl, is_border = _lab_of(pid, bpp, bcc)
        else:
            bl = np.zeros(len(pid), dtype=np.int64)
            is_border = np.zeros(len(pid), dtype=bool)
        is_border &= ~is_core
        role = np.where(is_core, "core",
                        np.where(is_border, "border", "noise"))
        cluster = np.where(is_core, cl, np.where(is_border, bl, -1))
        return pa.table({id_col: pid, "role": role.astype(object),
                         "cluster_id": cluster.astype(np.int64)})

    return points.map_batches(_assemble, batch_format="pyarrow",
                              batch_size=8192)


def _dbscan_attach_join(points, pairs, cores, id_col, np_pairs, np_pts,
                        dedup_clusters, bucketed_groups, _all_noise):
    """Label-attachment tail, join plan (the at-scale path): every
    attachment is a hash join with data-sized partition counts; nothing is
    ever collected to the driver, so the clustered subset may exceed any
    single worker."""
    cores_m = cores.map_batches(
        lambda t: pa.table({"cpid": t["cpid"],
                            "is_core": np.ones(len(t), dtype=bool)}),
        batch_format="pyarrow", batch_size=8192).materialize()

    # pairs whose PROBE end is core (feeds both the core-core edge set and
    # the border attachment)
    b_core = pairs.join(cores_m, "inner", np_pairs,
                        on=("pid_b",), right_on=("cpid",))
    b_core = b_core.map_batches(
        lambda t: pa.table({"pid_a": t["pid_a"], "pid_b": t["pid_b"]}),
        batch_format="pyarrow", batch_size=8192).materialize()

    # core-core edges -> connected components (min-label fixpoint)
    cedges = b_core.join(cores_m, "inner", np_pairs,
                         on=("pid_a",), right_on=("cpid",))
    cedges = cedges.map_batches(
        lambda t: pa.table({"doc_a": t["pid_a"], "doc_b": t["pid_b"]}),
        batch_format="pyarrow", batch_size=8192)
    core_ids = cores.map_batches(
        lambda t: pa.table({"doc_id": t["cpid"]}),
        batch_format="pyarrow", batch_size=8192)
    corelab = dedup_clusters(core_ids, cedges, n_parts=np_pairs).map_batches(
        lambda t: pa.table({"lpid": t["doc_id"], "cl": t["cluster_id"]}),
        batch_format="pyarrow", batch_size=8192).materialize()

    # border: non-core with >=1 core neighbor -> min core-neighbor cluster
    blab = b_core.join(corelab, "inner", np_pairs,
                       on=("pid_b",), right_on=("lpid",)).materialize()
    blab = blab.join(cores_m, "left_outer", np_pairs,
                     on=("pid_a",), right_on=("cpid",))

    def _bmin_pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["is_core"].isna()][["pid_a", "cl"]]
        return df.groupby("pid_a", as_index=False, sort=False).min()

    def _bmin(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("pid_a", as_index=False, sort=False).min()

    border = bucketed_groups(blab, ["pid_a"], _bmin, pre_fn=_bmin_pre,
                             n_buckets=np_pairs)
    border = border.map_batches(  # also normalizes pandas blocks to Arrow
        lambda t: pa.table({"bpid": t["pid_a"], "bcl": t["cl"]}),
        batch_format="pyarrow", batch_size=8192).materialize()

    out = points.join(corelab, "left_outer", np_pts,
                      on=(id_col,), right_on=("lpid",))
    if border.count() > 0:  # empty-side hash joins lack a schema
        out = out.join(border, "left_outer", np_pts,
                       on=(id_col,), right_on=("bpid",))
    else:
        out = out.map_batches(
            lambda t: t.append_column(
                "bcl", pa.array(np.full(len(t), np.nan), type=pa.float64())),
            batch_format="pyarrow", batch_size=8192)

    def _assemble(batch: pa.Table) -> pa.Table:
        pid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = batch["cl"].to_numpy(zero_copy_only=False).astype(np.float64)
        bcl = batch["bcl"].to_numpy(zero_copy_only=False).astype(np.float64)
        is_core = ~np.isnan(cl)
        is_border = ~is_core & ~np.isnan(bcl)
        role = np.where(is_core, "core", np.where(is_border, "border", "noise"))
        cluster = np.where(is_core, np.nan_to_num(cl, nan=0.0),
                           np.where(is_border, np.nan_to_num(bcl, nan=0.0),
                                    -1.0)).astype(np.int64)
        return pa.table({id_col: pid, "role": role.astype(object),
                         "cluster_id": cluster})

    return out.map_batches(_assemble, batch_format="pyarrow", batch_size=8192)


class _IdwState:
    """Per-worker IDW state: grid index over site boxes (cx±R, cy±R) so a
    point probe finds exactly the sites whose box-radius neighborhood
    contains it."""

    def __init__(self, payload):
        sites, radius = payload
        sid = sites["site_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = sites["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
        cy = sites["cy"].to_numpy(zero_copy_only=False).astype(np.int64)
        from ..state.grid_index import GridIndex
        self.index = GridIndex(sid, cx - radius, cy - radius,
                               cx + radius, cy + radius)
        self.cx, self.cy = cx, cy


def idw_grid(points, sites_ref, radius: int, x_col: str, y_col: str,
             val_col: str, scale: int = 1_048_576, batch_size: int = 32768):
    """Inverse-distance-weighted interpolation partials at site locations
    (Shepard 1968, integer form): for each site, over the points within
    BOX radius R, weight w = scale // (1 + d²) with Euclidean d² — every
    step int64-exact so the SQL mirror reproduces it bit-for-bit. The
    spatial-smoothing / field-estimation primitive of a sensor/probe
    pipeline (≙ the reference's snap-deviation statistics generalized to a
    weighted field, ``src/utils/gis/getSimilarity.js:24-102``).

    Scale shape: sites broadcast once (`ray.put`; the small dimension side,
    like every tile index here), points stream map-side, and the join and
    combiner are FUSED — each batch emits per-site (n, Σw, Σw·v) partials
    via bincount, so the (point, site) pair set never materializes and the
    only shuffle is the site-sized grouped sum.

    Returns (site_id, n_pts, sum_w, sum_wv) for sites with ≥1 point in
    range.
    """
    from .relational import partial_groupby_sum

    def _probe(batch: pa.Table) -> pa.Table:
        st: _IdwState = cached_state(sites_ref, _IdwState,
                                     token="_idw_sites")
        px = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pi, si = st.index.query_points(px, py)
        dx = px[pi] - st.cx[si]
        dy = py[pi] - st.cy[si]
        w = scale // (1 + dx * dx + dy * dy)
        n_sites = len(st.index.tile_id)
        cnt = np.bincount(si, minlength=n_sites)
        sw = np.bincount(si, weights=w.astype(np.float64),
                         minlength=n_sites)
        swv = np.bincount(si, weights=(w * v[pi]).astype(np.float64),
                          minlength=n_sites)
        nz = np.flatnonzero(cnt)
        return pa.table({"site_id": st.index.tile_id[nz],
                         "n_pts": cnt[nz].astype(np.int64),
                         "sum_w": np.rint(sw[nz]).astype(np.int64),
                         "sum_wv": np.rint(swv[nz]).astype(np.int64)})

    partials = points.map_batches(_probe, batch_format="pyarrow",
                                  batch_size=batch_size)
    agg = partial_groupby_sum(partials, ["site_id"],
                              ["n_pts", "sum_w", "sum_wv"])
    return agg.map_batches(
        lambda t: t.select(["site_id", "n_pts", "sum_w", "sum_wv"]),
        batch_format="pyarrow", batch_size=batch_size)


def stay_point_islands(points, key_col: str, seq_col: str, x_col: str,
                       y_col: str, k: int = 4, r: int = 16,
                       est_rows: int | None = None):
    """Trajectory stay-point (dwell) detection, Li et al. 2008 windowed
    form: point i of a trajectory is a STAY CORE iff the next ``k`` points
    of the same trajectory all lie within Chebyshev radius ``r`` of it
    (max over the window of |x_j - x_i| and |y_j - y_i| <= r, full window
    required); maximal runs of consecutive cores are merged into dwell
    ISLANDS. The dwell/stop-extraction primitive of every GPS trace
    pipeline — the reference's TripTracker emits traversal events exactly
    where this emits island boundaries (``src/.../trafficAnalysis``; the
    generalization is anchor-relative rather than stop-list-relative).

    Scale shape: ONE trajectory-bucketed shuffle (the bucketed-combine
    pattern — partial per-batch work is impossible here because the window
    spans batch splits, so the combiner is identity and per-bucket work is
    the vectorized shift scan below); everything after the shuffle is
    O(k·n) numpy shifts, no per-row Python. Window max over the next k
    rows is computed as an elementwise max over the k shifted arrays —
    exact, branch-free, and oracle-mirrorable as MAX/MIN OVER (ROWS
    BETWEEN CURRENT ROW AND k FOLLOWING).

    Returns one row per island: (key, start_seq, end_seq, n_core).
    """
    from .relational import bucketed_groups

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, seq_col], kind="mergesort")
        key = df[key_col].to_numpy()
        x = df[x_col].to_numpy().astype(np.int64)
        y = df[y_col].to_numpy().astype(np.int64)
        seq = df[seq_col].to_numpy().astype(np.int64)
        n = len(df)
        core = np.ones(n, dtype=bool)
        for s in range(1, k + 1):
            # shifted-by-s comparison; rows whose window crosses a
            # trajectory boundary (or the end) fail the full-window rule
            good = np.zeros(n, dtype=bool)
            m = n - s
            if m > 0:
                good[:m] = ((key[s:] == key[:m])
                            & (np.abs(x[s:] - x[:m]) <= r)
                            & (np.abs(y[s:] - y[:m]) <= r))
            core &= good
        if not core.any():
            return pd.DataFrame({key_col: key[:0], "start_seq": seq[:0],
                                 "end_seq": seq[:0],
                                 "n_core": np.array([], dtype=np.int64)})
        # islands: consecutive-core runs within a trajectory (positions are
        # row-adjacent after the sort, so run boundaries are core→not-core
        # transitions or key changes)
        ci = np.flatnonzero(core)
        new_island = np.ones(len(ci), dtype=bool)
        if len(ci) > 1:
            adj = (ci[1:] == ci[:-1] + 1) & (key[ci[1:]] == key[ci[:-1]])
            new_island[1:] = ~adj
        isl = np.cumsum(new_island) - 1
        n_isl = isl[-1] + 1
        starts = np.full(n_isl, np.iinfo(np.int64).max)
        ends = np.full(n_isl, np.iinfo(np.int64).min)
        np.minimum.at(starts, isl, seq[ci])
        np.maximum.at(ends, isl, seq[ci])
        counts = np.bincount(isl, minlength=n_isl)
        first = ci[np.flatnonzero(new_island)]
        return pd.DataFrame({key_col: key[first], "start_seq": starts,
                             "end_seq": ends,
                             "n_core": counts.astype(np.int64)})

    return bucketed_groups(points, [key_col], _scan, est_rows=est_rows)


def traj_step_stats(points, key_col: str, seq_col: str, x_col: str,
                    y_col: str, jump: int = 64, est_rows: int | None = None):
    """Per-trajectory step statistics under the Chebyshev step metric:
    n_pts, path_len = sum of max(|dx|,|dy|) over consecutive steps,
    max_step, and n_jumps = steps exceeding ``jump`` (the travel/teleport
    discriminator used to sessionize GPS traces before stay-point
    detection). Same scale shape as :func:`stay_point_islands`: ONE
    trajectory-bucketed shuffle of 4-int rows, then an O(n) vectorized
    shift scan per bucket; single-point trajectories report zeros."""
    from .relational import bucketed_groups

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, seq_col], kind="mergesort")
        key = df[key_col].to_numpy()
        x = df[x_col].to_numpy().astype(np.int64)
        y = df[y_col].to_numpy().astype(np.int64)
        same = key[1:] == key[:-1]
        step = np.maximum(np.abs(np.diff(x)), np.abs(np.diff(y)))
        pts = pd.DataFrame({key_col: key}).groupby(key_col, sort=True).size()
        sf = pd.DataFrame({key_col: key[1:][same], "step": step[same]})
        agg = sf.groupby(key_col, sort=True)["step"].agg(
            path_len="sum", max_step="max",
            n_jumps=lambda s: int((s > jump).sum()))
        out = pts.rename("n_pts").to_frame().join(agg, how="left")
        out = out.fillna(0).astype(np.int64).reset_index()
        return out[[key_col, "n_pts", "path_len", "max_step", "n_jumps"]]

    return bucketed_groups(points, [key_col], _scan, est_rows=est_rows)


def grid_moran(points, x_col: str, y_col: str, cell: int, band_div: int = 16,
               est_rows: int | None = None):
    """Spatial-autocorrelation COMPONENTS (the integer pieces of Moran's I
    over a density raster): v = point count per ``cell``-sized grid cell;
    per band (``cx // band_div``) emit n_cells, sum_v, sum_v2, and over
    8-neighborhood cell pairs n_pairs and sum_cross = Σ v_i·v_j. The
    downstream statistic I = (N/W)·Σw(vi−m)(vj−m)/Σ(vi−m)² assembles from
    exactly these sums — kept raw so everything stays int64-exact.

    Scale shape: points collapse to the grid map-side (combiner), every
    later exchange is GRID-sized, not data-sized. Neighbor pairs use the
    4-directed-shift trick (E, SE, S, SW) so each undirected pair counts
    once: shifted probe rows carry their source band, ONE bucketed
    shuffle on the landing coordinate matches them against base cells,
    and band partials combine in a final band-sized groupby."""
    from .relational import bucketed_groups, partial_groupby_sum

    def _cells_of(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cx": x // cell, "cy": y // cell})

    raw = points.map_batches(_cells_of, batch_format="pyarrow",
                             batch_size=8192)
    cells = partial_groupby_sum(raw, ["cx", "cy"], [], count_as="v")

    dirs = ((1, 0), (1, 1), (0, 1), (-1, 1))

    def _expand(df: pd.DataFrame) -> pd.DataFrame:
        base = df.assign(kind=np.int64(0), band=df["cx"].to_numpy() // band_div)
        shifted = []
        for dx, dy in dirs:
            shifted.append(pd.DataFrame({
                "cx": df["cx"].to_numpy() + dx,
                "cy": df["cy"].to_numpy() + dy,
                "v": df["v"].to_numpy(),
                "kind": np.int64(1),
                "band": df["cx"].to_numpy() // band_div,
            }))
        return pd.concat([base] + shifted, ignore_index=True)

    exp = cells.map_batches(_expand, batch_format="pandas", batch_size=4096)

    def _match(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["kind"] == 0]
        shift = g[g["kind"] == 1]
        cell_part = (base.groupby("band", sort=True)
                     .agg(n_cells=("v", "size"), sum_v=("v", "sum"),
                          sum_v2=("v", lambda s: int((s.to_numpy(np.int64)
                                                      ** 2).sum())))
                     .reset_index())
        m = shift.merge(base[["cx", "cy", "v"]], on=["cx", "cy"],
                        how="inner", suffixes=("_src", ""))
        if len(m):
            m["cross"] = m["v_src"].to_numpy(np.int64) * m["v"].to_numpy(np.int64)
            pair_part = (m.groupby("band", sort=True)
                         .agg(n_pairs=("cross", "size"),
                              sum_cross=("cross", "sum")).reset_index())
        else:
            pair_part = pd.DataFrame({"band": np.array([], np.int64),
                                      "n_pairs": np.array([], np.int64),
                                      "sum_cross": np.array([], np.int64)})
        out = cell_part.merge(pair_part, on="band", how="outer").fillna(0)
        return out.astype({c: np.int64 for c in out.columns})

    parts = bucketed_groups(exp, ["cx", "cy"], _match, est_rows=est_rows)
    return partial_groupby_sum(
        parts, ["band"], ["n_cells", "sum_v", "sum_v2", "n_pairs",
                          "sum_cross"])


def quadkey_rollup(points, x_col: str, y_col: str, cell: int, zoom: int,
                   min_zoom: int):
    """Tile-PYRAMID aggregation: point counts per quadkey tile at every zoom
    in [min_zoom, zoom] — the raster-pyramid build behind every slippy-map
    tile service (the reference emits one mbtiles level per conflation-map
    zoom; here the levels are one groupby, not one pass each).

    Scale shape: points collapse to leaf cells MAP-SIDE (combiner), so the
    only data-sized work is the first pass; each leaf row then fans out to
    its (zoom - min_zoom + 1) ancestor PREFIXES (quadkey parent = string
    prefix — no re-encode), and one grid-sized bucketed groupby finishes all
    pyramid levels at once. At 10^12 rows the exchange is still bounded by
    4^zoom * levels, never the input."""
    from ..functions.cells import quadkey
    from .relational import partial_groupby_sum

    def _leaf(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"qk": quadkey(x // cell, y // cell, zoom)})

    leaves = points.map_batches(_leaf, batch_format="pyarrow",
                                batch_size=8192)
    leaves = partial_groupby_sum(leaves, ["qk"], [], count_as="n_points")

    def _pyramid(batch: pa.Table) -> pa.Table:
        qk = batch["qk"].to_numpy(zero_copy_only=False)
        v = batch["n_points"].to_numpy(zero_copy_only=False).astype(np.int64)
        zs, keys, vals = [], [], []
        for z in range(min_zoom, zoom + 1):
            zs.append(np.full(len(qk), z, dtype=np.int64))
            keys.append(qk.astype(f"U{z}").astype(f"U{zoom}"))
            vals.append(v)
        return pa.table({"zoom": np.concatenate(zs) if zs else np.array([], np.int64),
                         "quadkey": np.concatenate(keys) if keys else np.array([], "U1"),
                         "n_points": np.concatenate(vals) if vals else np.array([], np.int64)})

    fan = leaves.map_batches(_pyramid, batch_format="pyarrow", batch_size=4096)
    return partial_groupby_sum(fan, ["zoom", "quadkey"], ["n_points"])


def grid_box_blur(points, x_col: str, y_col: str, cell: int,
                  est_rows: int | None = None):
    """3x3 BOX-FILTER convolution over the point-density raster — the
    smoothing pass in front of every heatmap / KDE-style density product:
    blur(c) = Σ v over the 9-cell neighborhood of c, emitted for every
    OCCUPIED base cell together with how many occupied neighbors
    contributed (n_nbrs, so downstream can normalize by support, not by 9).

    Scale shape: identical to :func:`grid_moran` — points collapse to the
    grid map-side, each occupied cell fans out to its 9 landing positions,
    ONE grid-sized bucketed shuffle matches contributions to base cells.
    The raster never densifies: empty cells cost nothing."""
    from .relational import bucketed_groups, partial_groupby_sum

    def _cells_of(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cx": x // cell, "cy": y // cell})

    raw = points.map_batches(_cells_of, batch_format="pyarrow",
                             batch_size=8192)
    cells = partial_groupby_sum(raw, ["cx", "cy"], [], count_as="v")

    def _expand(df: pd.DataFrame) -> pd.DataFrame:
        cx = df["cx"].to_numpy(np.int64)
        cy = df["cy"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        outs = [pd.DataFrame({"cx": cx, "cy": cy, "v": v,
                              "kind": np.int64(0)})]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(pd.DataFrame({"cx": cx + dx, "cy": cy + dy,
                                          "v": v, "kind": np.int64(1)}))
        return pd.concat(outs, ignore_index=True)

    exp = cells.map_batches(_expand, batch_format="pandas", batch_size=4096)

    def _match(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["kind"] == 0][["cx", "cy", "v"]]
        contrib = (g[g["kind"] == 1]
                   .groupby(["cx", "cy"], sort=True)["v"]
                   .agg(blur_sum="sum", n_nbrs="size").reset_index())
        out = base.merge(contrib, on=["cx", "cy"], how="left")
        return out.astype({c: np.int64 for c in out.columns})

    return bucketed_groups(exp, ["cx", "cy"], _match, est_rows=est_rows)


def traj_resample(points, key_col: str, seq_col: str, x_col: str,
                  y_col: str, step: int = 8, est_rows: int | None = None):
    """Trajectory RESAMPLING onto a fixed time grid (the normalization pass
    in front of trajectory similarity / map matching — turn irregular GPS
    pings into comparable fixed-rate traces): for every multiple of
    ``step`` inside a trajectory's observed [min_seq, max_seq] span, the
    position linearly interpolated between the bracketing observations,
    all in exact int64 floor arithmetic:

        x(t) = x0 + (x1 - x0) * (t - s0) // (s1 - s0)

    Keys are shuffle-parallel (one trajectory-bucketed exchange), the
    in-key pass is one vectorized repeat/arange expansion — O(obs +
    samples), no per-sample Python."""
    from .relational import bucketed_groups

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, seq_col], kind="mergesort")
        key = df[key_col].to_numpy(np.int64)
        s = df[seq_col].to_numpy(np.int64)
        x = df[x_col].to_numpy(np.int64)
        y = df[y_col].to_numpy(np.int64)
        n = len(df)
        last = np.r_[key[1:] != key[:-1], True]
        # consecutive in-trajectory pairs [i, i+1)
        pi = np.flatnonzero(~last)
        s0, s1 = s[pi], s[pi + 1]
        t_first = -((-s0) // step) * step          # ceil to grid
        cnt = np.maximum(0, -((t_first - s1) // step))  # t in [t_first, s1)
        rep = np.repeat(pi, cnt)
        off = np.arange(len(rep), dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt)
        t = np.repeat(t_first, cnt) + off * step
        d = t - s[rep]
        span = s[rep + 1] - s[rep]
        xi = x[rep] + (x[rep + 1] - x[rep]) * d // span
        yi = y[rep] + (y[rep + 1] - y[rep]) * d // span
        # trajectory-final observation lands on the grid -> emit verbatim
        fi = np.flatnonzero(last & (s % step == 0))
        out = pd.DataFrame({
            key_col: np.concatenate([key[rep], key[fi]]),
            "t": np.concatenate([t, s[fi]]),
            "x_i": np.concatenate([xi, x[fi]]),
            "y_i": np.concatenate([yi, y[fi]]),
        })
        return out.sort_values([key_col, "t"], kind="mergesort")

    return bucketed_groups(points, [key_col], _scan, est_rows=est_rows)


def flow_vectors(points, key_col: str, seq_col: str, x_col: str, y_col: str,
                 cell: int, est_rows: int | None = None):
    """Movement VECTOR FIELD from trajectory steps (the OD-flow rasterizer
    behind every traffic/mobility heat-arrow map): each consecutive
    in-trajectory step (p_i -> p_{i+1}) contributes its displacement to the
    grid cell of its ORIGIN; per cell emit n_steps, Σdx, Σdy — the exact
    integer pieces of the cell's mean flow direction.

    One trajectory-bucketed shuffle computes steps (vectorized lag inside
    the bucket) AND collapses them to per-cell partials before the final
    grid-sized combine — displacements never leave their bucket row-wise."""
    from .relational import bucketed_groups, partial_groupby_sum

    def _steps(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key_col, seq_col], kind="mergesort")
        k = d[key_col].to_numpy()
        x = d[x_col].to_numpy(np.int64)
        y = d[y_col].to_numpy(np.int64)
        same = np.r_[False, k[1:] == k[:-1]]
        dx = np.r_[0, np.diff(x)][same]
        dy = np.r_[0, np.diff(y)][same]
        ox = x[np.r_[same[1:], False]]
        oy = y[np.r_[same[1:], False]]
        out = pd.DataFrame({"cx": ox // cell, "cy": oy // cell,
                            "dx": dx, "dy": dy})
        return (out.assign(n_steps=np.int64(1))
                   .groupby(["cx", "cy"], as_index=False, sort=False)
                   .agg(n_steps=("n_steps", "sum"), sum_dx=("dx", "sum"),
                        sum_dy=("dy", "sum")))

    steps = bucketed_groups(points, [key_col], _steps, est_rows=est_rows)
    return partial_groupby_sum(steps, ["cx", "cy"],
                               ["n_steps", "sum_dx", "sum_dy"])


def od_matrix(points, key_col: str, seq_col: str, x_col: str, y_col: str,
              cell: int, est_rows: int | None = None):
    """ORIGIN-DESTINATION matrix: each trajectory contributes one trip from
    the grid cell of its FIRST observation to the cell of its LAST; output
    is trip counts per (origin cell, destination cell) — the mobility-
    analytics rollup between zones. One trajectory-bucketed pass picks the
    endpoints (vectorized first/last per sorted group), then a matrix-sized
    combine."""
    from .relational import bucketed_groups, partial_groupby_sum

    def _ends(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key_col, seq_col], kind="mergesort")
        k = d[key_col].to_numpy()
        x = d[x_col].to_numpy(np.int64)
        y = d[y_col].to_numpy(np.int64)
        first = np.r_[True, k[1:] != k[:-1]]
        last = np.r_[k[1:] != k[:-1], True]
        return pd.DataFrame({
            "o_cx": x[first] // cell, "o_cy": y[first] // cell,
            "d_cx": x[last] // cell, "d_cy": y[last] // cell,
        })

    ends = bucketed_groups(points, [key_col], _ends, est_rows=est_rows)
    return partial_groupby_sum(ends, ["o_cx", "o_cy", "d_cx", "d_cy"], [],
                               count_as="n_trips")


class _TileStateCore(_TileState):
    """Tile-CORE variant: each rect shrunk to 1/8 half-widths before
    indexing — the high-confidence interior of a tile (the shrink is the
    inverse of the reference's 5 m buffer-and-probe,
    ``ConflationMapDAO/loaders.js:104-113``). The core set undercovers the
    world at every scale, so the anti-join below never degenerates to an
    empty audit as the full rects saturate coverage."""

    SHRINK = 8

    def __init__(self, tiles: pa.Table):
        for col in ("hw", "hh"):
            i = tiles.schema.get_field_index(col)
            v = tiles[col].to_numpy(zero_copy_only=False).astype(np.int64)
            tiles = tiles.set_column(i, col, pa.array(v // self.SHRINK))
        super().__init__(tiles)


def uncovered_cell_counts(points, tiles_ref, x_col: str, y_col: str,
                          id_col: str, cell: int = 1024, grid_w: int = 64):
    """Spatial ANTI-join fused with its rollup: points contained by NO tile
    CORE (the complement of ``candidate_join`` — coverage-gap auditing, the
    "which probes matched nothing" question every conflation run asks; ≙ the
    unmatched-feature set that feeds the reference's OSRM recovery loop),
    aggregated map-side to per-grid-cell (count, min id) partials so the only
    shuffle is grid-sized. The uncovered point set itself never
    materializes — at 100 TB the gap report stays cell-sized. The result is
    schema-stable even when every point is covered (empty-result seed)."""
    state_cls = _TileStateCore

    def _probe(batch: pa.Table) -> pa.Table:
        st: _TileState = cached_state(tiles_ref, state_cls)
        px = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pi, _ti = st.index.query_points(px, py)
        covered = np.zeros(len(px), dtype=bool)
        covered[pi] = True
        keep = ~covered
        cid = (py[keep] // cell) * np.int64(grid_w) + (px[keep] // cell)
        df = pd.DataFrame({"cell_id": cid, "uid": pid[keep]})
        g = df.groupby("cell_id", as_index=False).agg(
            n_uncovered=("uid", "size"), min_point_id=("uid", "min"))
        return pa.Table.from_pandas(g.astype(np.int64), preserve_index=False)

    partials = points.map_batches(_probe, batch_format="pyarrow",
                                  batch_size=32768)

    from .relational import bucketed_groups

    agg = {"n_uncovered": "sum", "min_point_id": "min"}

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cell_id", as_index=False, sort=True).agg(agg)

    out = bucketed_groups(partials, ["cell_id"], _final)
    # schema seed: a fully-covered input yields ZERO groups, and an empty
    # Dataset has no schema — union one 0-row block so downstream consumers
    # (and the driver's schema check) always see the output columns
    seed = pa.table({
        "cell_id": pa.array([], pa.int64()),
        "n_uncovered": pa.array([], pa.int64()),
        "min_point_id": pa.array([], pa.int64()),
    })
    return out.union(ray.data.from_arrow(seed))


def grid_slope_aspect(points, x_col: str, y_col: str, cell: int,
                      est_rows: int | None = None):
    """Central-difference GRADIENT over the point-density raster (the
    slope/aspect pass of DEM processing, run on density instead of
    elevation): for every OCCUPIED cell, dx = v(E) − v(W), dy = v(N) − v(S)
    with absent neighbors contributing 0, slope² = dx² + dy² (exact), and a
    9-class integer aspect code (3·(sgn dx + 1) + sgn dy + 1 — the octant
    split needs tan 22.5° and would not be integer-exact).

    Scale shape = :func:`grid_box_blur`: points collapse to the grid
    map-side, each occupied cell fans out SIGNED contributions to its 4
    von-Neumann neighbors, one grid-sized bucketed shuffle matches them to
    base cells. Empty cells cost nothing."""
    from .relational import bucketed_groups, partial_groupby_sum

    def _cells_of(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cx": x // cell, "cy": y // cell})

    raw = points.map_batches(_cells_of, batch_format="pyarrow", batch_size=8192)
    cells = partial_groupby_sum(raw, ["cx", "cy"], [], count_as="v")

    def _expand(df: pd.DataFrame) -> pd.DataFrame:
        cx = df["cx"].to_numpy(np.int64)
        cy = df["cy"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        z = np.zeros_like(v)
        outs = [pd.DataFrame({"cx": cx, "cy": cy, "v": v, "wdx": z, "wdy": z,
                              "kind": np.int64(0)})]
        # this cell is the EAST neighbor of (cx-1, cy): +v to its dx; etc.
        for dcx, dcy, wdx, wdy in ((-1, 0, v, z), (1, 0, -v, z),
                                   (0, -1, z, v), (0, 1, z, -v)):
            outs.append(pd.DataFrame({"cx": cx + dcx, "cy": cy + dcy,
                                      "v": z, "wdx": wdx, "wdy": wdy,
                                      "kind": np.int64(1)}))
        return pd.concat(outs, ignore_index=True)

    exp = cells.map_batches(_expand, batch_format="pandas", batch_size=4096)

    def _match(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["kind"] == 0][["cx", "cy", "v"]]
        grads = (g[g["kind"] == 1]
                 .groupby(["cx", "cy"], sort=True)[["wdx", "wdy"]]
                 .sum().reset_index().rename(columns={"wdx": "dx", "wdy": "dy"}))
        out = base.merge(grads, on=["cx", "cy"], how="left").fillna(0)
        dx = out["dx"].to_numpy(np.int64)
        dy = out["dy"].to_numpy(np.int64)
        out["dx"], out["dy"] = dx, dy
        out["slope2"] = dx * dx + dy * dy
        out["aspect_class"] = 3 * (np.sign(dx) + 1) + np.sign(dy) + 1
        return out.astype({c: np.int64 for c in out.columns})

    return bucketed_groups(exp, ["cx", "cy"], _match, est_rows=est_rows)


def grid_distance_transform(points, x_col: str, y_col: str, cell: int,
                            world: int = 65536) -> pd.DataFrame:
    """Exact L1 (city-block) DISTANCE TRANSFORM over the point-density
    raster — the proximity field behind buffering, corridor extraction and
    accessibility maps: sources are the DENSE cells (v ≥ (max_v + 1) // 2,
    a data-derived threshold that always yields ≥ 1 source), and every grid
    cell gets dist_l1 = min over sources of |Δcx| + |Δcy|.

    Scale shape: the data-sized work (points → per-cell counts) collapses
    map-side via the partial-combine, so only the GRID-sized cell table
    (≤ (world/cell)² rows — bounded by construction, like
    :func:`grid_box_blur`'s output) reaches the driver, where the classic
    Rosenfeld–Pfaltz two-raster-scan chamfer runs vectorized (each scan is
    a per-row ``minimum.accumulate`` — exact for L1, pytest-pinned against
    the brute-force min-over-sources). At a bigger world the same sweep
    tiles into block rows with halo exchange; the per-cell collapse is the
    part that touches data volume."""
    from .relational import partial_groupby_sum

    g = world // cell

    def _cells_of(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cx": x // cell, "cy": y // cell})

    raw = points.map_batches(_cells_of, batch_format="pyarrow", batch_size=8192)
    cells = partial_groupby_sum(raw, ["cx", "cy"], [], count_as="v").to_pandas()

    v = np.zeros((g, g), dtype=np.int64)
    v[cells["cx"].to_numpy(np.int64), cells["cy"].to_numpy(np.int64)] = (
        cells["v"].to_numpy(np.int64))
    thr = (int(v.max()) + 1) // 2
    src = v >= thr
    inf = np.int64(1) << 40
    d = np.where(src, np.int64(0), inf)
    idx = np.arange(g, dtype=np.int64)
    for i in range(g):  # forward scan: N + W mask
        if i:
            np.minimum(d[i], d[i - 1] + 1, out=d[i])
        d[i] = np.minimum.accumulate(d[i] - idx) + idx
    for i in range(g - 1, -1, -1):  # backward scan: S + E mask
        if i < g - 1:
            np.minimum(d[i], d[i + 1] + 1, out=d[i])
        d[i] = (np.minimum.accumulate((d[i] + idx)[::-1])[::-1]) - idx
    cx, cy = np.meshgrid(idx, idx, indexing="ij")
    return pd.DataFrame({
        "cx": cx.ravel(), "cy": cy.ravel(), "v": v.ravel(),
        "is_src": src.ravel(), "dist_l1": d.ravel(),
    })


def marching_squares(points, x_col: str, y_col: str, cell: int,
                     est_rows: int | None = None):
    """Marching-squares ISOLINE extraction over the point-density raster —
    the contouring pass of every heatmap / choropleth product (turf
    isolines / GDAL contour parity): cells collapse map-side to the
    density grid, the iso-threshold is the ceil-MEAN of the occupied
    cells (data-derived, so the contour is non-trivial at every data
    scale), and every 2x2 corner window crossed by the iso-level emits
    its classic 4-bit case code (bit0 = (wx, wy) hot, bit1 = (wx+1, wy),
    bit2 = (wx, wy+1), bit3 = (wx+1, wy+1); codes 1..14 are the crossing
    cases, 0/15 are fully outside/inside and are dropped).

    Scale shape: points collapse to the grid map-side; only HOT cells fan
    out (x4) to the windows they corner; one grid-sized bucketed shuffle
    sums the disjoint bit contributions (sum ≡ OR here). The two global
    scalars (Σv, n_cells) are the only driver-side values."""
    from ray.data.aggregate import Count, Sum

    from .relational import bucketed_groups, partial_groupby_sum

    def _cells_of(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cx": x // cell, "cy": y // cell})

    raw = points.map_batches(_cells_of, batch_format="pyarrow",
                             batch_size=8192)
    # materialize POST-collapse: the raster is grid-bounded (≤ (65536/cell)²
    # rows), and both the threshold scan and the fan-out read it — without
    # this the lazy plan would re-run the full point read twice
    cells = partial_groupby_sum(raw, ["cx", "cy"], [], count_as="v").materialize()

    agg = cells.aggregate(Sum("v"), Count())
    thr = (int(agg["sum(v)"]) + int(agg["count()"]) - 1) // int(agg["count()"])

    def _expand(df: pd.DataFrame) -> pd.DataFrame:
        hot = df[df["v"].to_numpy(np.int64) >= thr]
        cx = hot["cx"].to_numpy(np.int64)
        cy = hot["cy"].to_numpy(np.int64)
        return pd.DataFrame({
            "wx": np.concatenate([cx, cx - 1, cx, cx - 1]),
            "wy": np.concatenate([cy, cy, cy - 1, cy - 1]),
            "b": np.repeat(np.array([1, 2, 4, 8], np.int64), len(cx)),
        })

    exp = cells.map_batches(_expand, batch_format="pandas", batch_size=8192)

    def _codes(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["wx", "wy"], as_index=False, sort=True)["b"]
                .sum().rename(columns={"b": "case_code"}))
        out = out[out["case_code"] < 15]
        return out.astype({c: np.int64 for c in out.columns})

    return bucketed_groups(exp, ["wx", "wy"], _codes, est_rows=est_rows)


def rect_union_area(rects, cell: int = 4096, est_rows: int | None = None):
    """EXACT area of the union of (possibly heavily overlapping) rectangles
    — the coverage-area primitive behind "how much of the map does this
    layer cover" (the 2D sibling of the 1D sweep in
    ``user_interval_coverage``): classic strip decomposition (distinct x
    bounds -> vertical strips; per strip, the union length of the covering
    rects' y intervals; area = Σ strip_width × covered_y), made
    distributed by FIRST dicing every rect onto a coarse cell grid so each
    cell runs its own bounded local sweep — union area is additive over a
    partition of the plane, so the per-cell exact answers sum without any
    cross-cell state. One (rects × ≤(w/cell+1)²)-bounded fan-out shuffle;
    the per-cell sweep is fully vectorized (ragged strip expansion + the
    segment-offset running-max trick — no per-island Python).

    Input columns: x0 < x1, y0 < y1 (int64, half-open). Returns one row
    per occupied cell: (gx, gy, covered_area)."""
    from .relational import bucketed_groups

    BIG = np.int64(1) << 21  # > any in-cell coordinate span; segments the cummax

    def _dice(df: pd.DataFrame) -> pd.DataFrame:
        x0 = df["x0"].to_numpy(np.int64)
        x1 = df["x1"].to_numpy(np.int64)
        y0 = df["y0"].to_numpy(np.int64)
        y1 = df["y1"].to_numpy(np.int64)
        gx0, gx1 = x0 // cell, (x1 - 1) // cell
        gy0, gy1 = y0 // cell, (y1 - 1) // cell
        nx = (gx1 - gx0 + 1).astype(np.int64)
        ny = (gy1 - gy0 + 1).astype(np.int64)
        reps = nx * ny
        ri = np.repeat(np.arange(len(x0)), reps)
        off = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
        cgx = gx0[ri] + off % nx[ri]
        cgy = gy0[ri] + off // nx[ri]
        return pd.DataFrame({
            "gx": cgx, "gy": cgy,
            "x0": np.maximum(x0[ri], cgx * cell),
            "x1": np.minimum(x1[ri], (cgx + 1) * cell),
            "y0": np.maximum(y0[ri], cgy * cell),
            "y1": np.minimum(y1[ri], (cgy + 1) * cell),
        })

    diced = rects.map_batches(_dice, batch_format="pandas", batch_size=8192)

    def _cell_sweep(x0, x1, y0, y1) -> int:
        xs = np.unique(np.concatenate([x0, x1]))
        s0 = np.searchsorted(xs, x0)
        s1 = np.searchsorted(xs, x1)
        reps = s1 - s0
        ri = np.repeat(np.arange(len(x0)), reps)
        off = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
        strip = s0[ri] + off
        ys0, ys1 = y0[ri], y1[ri]
        order = np.lexsort((ys1, ys0, strip))
        strip, ys0, ys1 = strip[order], ys0[order], ys1[order]
        seg_start = np.r_[True, strip[1:] != strip[:-1]]
        seg_id = np.cumsum(seg_start) - 1
        cm = np.maximum.accumulate(ys1 + seg_id * BIG) - seg_id * BIG
        prev_cm = np.r_[np.int64(0), cm[:-1]]
        new_isl = seg_start | (ys0 > prev_cm)
        isl_id = np.cumsum(new_isl) - 1
        isl_start = np.flatnonzero(new_isl)
        isl_end = np.r_[isl_start[1:], len(strip)] - 1
        lens = cm[isl_end] - ys0[isl_start]
        widths = (xs[strip + 1] - xs[strip])[isl_start]
        return int((lens * widths).sum())

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["gx", "gy"], kind="mergesort")
        gx = d["gx"].to_numpy(np.int64)
        gy = d["gy"].to_numpy(np.int64)
        x0 = d["x0"].to_numpy(np.int64)
        x1 = d["x1"].to_numpy(np.int64)
        y0 = d["y0"].to_numpy(np.int64)
        y1 = d["y1"].to_numpy(np.int64)
        key = gx * (1 << 32) + gy
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ends = np.r_[starts[1:], len(d)]
        area = np.fromiter(
            (_cell_sweep(x0[s:e], x1[s:e], y0[s:e], y1[s:e])
             for s, e in zip(starts, ends)), np.int64, len(starts))
        return pd.DataFrame({"gx": gx[starts], "gy": gy[starts],
                             "covered_area": area})

    return bucketed_groups(diced, ["gx", "gy"], _final, est_rows=est_rows)


def octant_codes(dx: np.ndarray, dy: np.ndarray) -> np.ndarray:
    """8-way integer DIRECTION CLASSIFICATION of step vectors — E=0, NE=1,
    N=2, NW=3, W=4, SW=5, SE=7, stationary=8 — with pure sign/compare
    arithmetic (no atan2): axis classes claim steps with 2·|minor| <=
    |major| (ties to the axis), diagonals take the rest. The CASE order is
    the contract; the SQL mirror replays it verbatim."""
    adx, ady = np.abs(dx), np.abs(dy)
    return np.select(
        [
            (dx == 0) & (dy == 0),
            (2 * ady <= adx) & (dx > 0),
            2 * ady <= adx,
            (2 * adx <= ady) & (dy > 0),
            2 * adx <= ady,
            (dx > 0) & (dy > 0),
            (dx < 0) & (dy > 0),
            (dx < 0) & (dy < 0),
        ],
        [8, 0, 4, 2, 6, 1, 3, 5],
        default=7,
    ).astype(np.int64)


def traj_turn_stats(points, key_col: str, seq_col: str, x_col: str,
                    y_col: str, est_rows: int | None = None):
    """Per-trajectory TURNING-BEHAVIOR statistics over the octant codes of
    consecutive steps: n_steps, n_turns (octant changes between adjacent
    steps), n_stationary (zero steps), and dom_oct (the modal octant,
    smallest code on ties) — the heading-dynamics summary of movement
    analytics (vehicle / pedestrian / drift discrimination). Same scale
    shape as :func:`traj_step_stats`: ONE trajectory-bucketed shuffle of
    4-int rows + an O(n) vectorized shift scan per bucket."""
    from .relational import bucketed_groups

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, seq_col], kind="mergesort")
        key = df[key_col].to_numpy()
        x = df[x_col].to_numpy().astype(np.int64)
        y = df[y_col].to_numpy().astype(np.int64)
        same = key[1:] == key[:-1]            # step i valid
        oc = octant_codes(np.diff(x), np.diff(y))
        sk, so = key[1:][same], oc[same]

        counts = (pd.DataFrame({key_col: sk, "oct": so, "one": 1})
                  .groupby([key_col, "oct"], sort=False)["one"].sum()
                  .reset_index()
                  .sort_values(["one", "oct"], ascending=[False, True],
                               kind="mergesort"))
        dom = counts.drop_duplicates(key_col)[[key_col, "oct"]].rename(
            columns={"oct": "dom_oct"})

        pairv = same[1:] & same[:-1]          # steps i and i+1 in one traj
        turn = (oc[1:] != oc[:-1]) & pairv
        base = pd.DataFrame({key_col: sk, "stat": (so == 8).astype(np.int64)})
        agg = base.groupby(key_col, sort=True).agg(
            n_steps=("stat", "size"), n_stationary=("stat", "sum"))
        turns = (pd.DataFrame({key_col: key[2:][pairv],
                               "t": turn[pairv].astype(np.int64)})
                 .groupby(key_col, sort=True)["t"].sum().rename("n_turns"))
        out = (agg.join(turns, how="left").reset_index()
               .merge(dom, on=key_col, how="left"))
        out["n_turns"] = out["n_turns"].fillna(0)
        for c in ("n_steps", "n_stationary", "n_turns", "dom_oct"):
            out[c] = out[c].astype(np.int64)
        return out[[key_col, "n_steps", "n_turns", "n_stationary",
                    "dom_oct"]]

    return bucketed_groups(points, [key_col], _scan, est_rows=est_rows)


def grid_heat_diffusion(points, x_col: str, y_col: str, cell: int,
                        rounds: int = 2, est_rows: int | None = None):
    """Fixed-round HEAT DIFFUSION over the point-density raster — the
    iterative 5-point-stencil simulation pattern (PDE relaxation, heatmap
    smoothing-to-steady-state):

        v_{k+1}(c) = (4·v_k(c) + Σ_{4-neighbors} v_k(n)) // 8

    in exact floor arithmetic, zero cells dropped after each round (the
    support grows one ring per round, so sparsity is preserved up to
    rounds rings). Scale shape per round: each occupied cell fans out to
    5 weighted landing positions, ONE grid-sized bucketed combine sums
    them — the raster never densifies beyond the occupied support + ring.
    The oracle unrolls rounds as MATERIALIZED weighted-offset joins."""
    from .relational import bucketed_groups, partial_groupby_sum

    def _cells_of(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cx": x // cell, "cy": y // cell})

    raw = points.map_batches(_cells_of, batch_format="pyarrow",
                             batch_size=8192)
    state = partial_groupby_sum(raw, ["cx", "cy"], [], count_as="v",
                                est_rows=est_rows)

    offs = [(0, 0, 4), (1, 0, 1), (-1, 0, 1), (0, 1, 1), (0, -1, 1)]

    for _ in range(rounds):
        def _expand(df: pd.DataFrame) -> pd.DataFrame:
            cx = df["cx"].to_numpy(np.int64)
            cy = df["cy"].to_numpy(np.int64)
            v = df["v"].to_numpy(np.int64)
            return pd.concat(
                [pd.DataFrame({"cx": cx + dx, "cy": cy + dy, "v": v * wgt})
                 for dx, dy, wgt in offs], ignore_index=True)

        exp = state.map_batches(_expand, batch_format="pandas",
                                batch_size=8192)

        def _combine(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby(["cx", "cy"], as_index=False, sort=False)["v"].sum()
            s["v"] = s["v"].to_numpy(np.int64) // 8
            return s[s["v"] > 0]

        state = bucketed_groups(exp, ["cx", "cy"], _combine,
                                pre_fn=lambda d: d.groupby(
                                    ["cx", "cy"], as_index=False,
                                    sort=False)["v"].sum())

    return state


def grid_nearest_sites(points, sites_ref, x_col: str, y_col: str, cell: int,
                       est_rows: int | None = None):
    """Discrete VORONOI partition of the point-density raster: every
    occupied cell is assigned to its nearest site (exact integer squared
    distance between the cell CENTER and the site position; ties to the
    smallest site_id), then rolled up per site — the nearest-facility /
    coverage-allocation primitive (service areas, label placement, shard
    assignment by geography). ≙ the reference's nearest-match selection
    (min-deviation pick, `snapGtfsStopsSequenceToGtfsShape.js:64-84`)
    lifted from per-stop candidates to a full raster partition.

    ``sites_ref``: ``ray.put`` of an Arrow table (site_id, sx, sy) — the
    site table is dimension-sized, so it is broadcast ONCE per worker and
    the argmin runs map-side; the only shuffle is the grid-sized per-site
    rollup. Returns (site_id, n_cells, mass) for sites that win ≥1 cell."""
    import ray as _ray

    from .relational import partial_groupby_sum
    from .util import cached_state

    def _cells_of(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cx": x // cell, "cy": y // cell})

    raw = points.map_batches(_cells_of, batch_format="pyarrow",
                             batch_size=8192)
    cells = partial_groupby_sum(raw, ["cx", "cy"], [], count_as="v",
                                est_rows=est_rows)

    def _build(tab: pa.Table):
        return (tab["site_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                tab["sx"].to_numpy(zero_copy_only=False).astype(np.int64),
                tab["sy"].to_numpy(zero_copy_only=False).astype(np.int64))

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        sid, sx, sy = cached_state(sites_ref, _build,
                                   token="grid_nearest_sites.sites")
        ccx = df["cx"].to_numpy(np.int64) * cell + cell // 2
        ccy = df["cy"].to_numpy(np.int64) * cell + cell // 2
        # cells × sites distance matrix; both sides bounded (grid ≤ 64²
        # cells per batch, sites dimension-sized), all int64-exact
        d2 = ((ccx[:, None] - sx[None, :]) ** 2
              + (ccy[:, None] - sy[None, :]) ** 2)
        # argmin with (d2, site_id) tie-break: sites are pre-sorted by id,
        # so np.argmin's first-hit rule IS the smallest-id tie-break
        order = np.argsort(sid, kind="stable")
        best = order[np.argmin(d2[:, order], axis=1)]
        return pd.DataFrame({"site_id": sid[best],
                             "n_cells": np.int64(1),
                             "mass": df["v"].to_numpy(np.int64)})

    assigned = cells.map_batches(_assign, batch_format="pandas",
                                 batch_size=8192)
    return partial_groupby_sum(assigned, ["site_id"], ["n_cells", "mass"])


def str_pack_pages(pts, n_rows: int, cap: int = 64, page_stride: int = 1_000_000,
                   x_col: str = "px", y_col: str = "py", id_col: str = "point_id",
                   x_chunk: int = 256):
    """SORT-TILE-RECURSIVE R-tree bulk load as a distributed operator — the
    page/leaf assignment of the STR packing (Leutenegger et al.) the engine's
    broadcast :class:`~..state.strtree.STRtree` builds in-memory, expressed
    over an UNBOUNDED point set so the index itself can be constructed at
    100 TB: points are ranked globally by (x, id), cut into S vertical slabs
    of ``cap·S`` rows (S = ⌈√⌈n/cap⌉⌉, the classic STR slab count), and each
    slab is ranked by (y, id) and cut into pages of ``cap``. Emits one row
    per PAGE: (page_id, n_entries, x0, y0, x1, y1) — the leaf MBR table a
    packed R-tree materializes.

    Scale shape: the global x-rank is a TWO-PHASE prefix sum (the
    ``pack_sequences`` pattern): per-value-chunk counts (x // x_chunk; the
    chunk table is value-domain-bounded) cumsum'd on the driver and
    broadcast, then ONE bucketed shuffle ranks within chunks — equal x land
    in the same chunk, so chunk order extends to the exact global (x, id)
    order. The slab pass is a second bucketed shuffle keyed on slab; a slab
    holds cap·S ≈ cap·√(n/cap) rows (8M at n = 10¹²) — bounded per worker.
    S is computed as ⌈√⌈n/cap⌉⌉ in IEEE double (both engine and oracle), so
    the cut points agree bit-exactly."""
    import math

    from .relational import bucketed_groups, partial_groupby_sum

    S = int(math.ceil(math.sqrt(math.ceil(n_rows / float(cap)))))
    slab_rows = cap * S

    def _chunked(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"_chunk": x // x_chunk, "x": x, "y": y, "pid": ids})

    chunked = pts.map_batches(_chunked, batch_format="pyarrow",
                              batch_size=65536)

    counts = partial_groupby_sum(chunked, ["_chunk"], [], count_as="c",
                                 est_rows=n_rows).to_pandas()
    counts = counts.sort_values("_chunk")
    cids = counts["_chunk"].to_numpy().astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(counts["c"].to_numpy())[:-1]]).astype(np.int64)
    off_ref = ray.put((cids, offs))

    def _slab(df: pd.DataFrame) -> pd.DataFrame:
        ids_, offs_ = cached_state(off_ref, lambda m: m,
                                   token="str_pack.chunk_offsets")
        df = df.sort_values(["_chunk", "x", "pid"], kind="mergesort")
        ck = df["_chunk"].to_numpy(np.int64)
        pos = np.arange(len(df), dtype=np.int64)
        first = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        base = np.repeat(pos[first], np.diff(np.r_[first, len(ck)]))
        xrank = offs_[np.searchsorted(ids_, ck)] + (pos - base)
        return pd.DataFrame({"slab": xrank // slab_rows,
                             "x": df["x"].to_numpy(np.int64),
                             "y": df["y"].to_numpy(np.int64),
                             "pid": df["pid"].to_numpy(np.int64)})

    slabs = bucketed_groups(chunked, ["_chunk"], _slab, est_rows=n_rows)

    def _pages(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["slab", "y", "pid"], kind="mergesort")
        sl = df["slab"].to_numpy(np.int64)
        pos = np.arange(len(df), dtype=np.int64)
        first = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1]])
        base = np.repeat(pos[first], np.diff(np.r_[first, len(sl)]))
        page = sl * page_stride + (pos - base) // cap
        x = df["x"].to_numpy(np.int64)
        y = df["y"].to_numpy(np.int64)
        out = pd.DataFrame({"page_id": page, "x": x, "y": y})
        g = out.groupby("page_id", as_index=False, sort=False)
        return g.agg(n_entries=("x", "size"), x0=("x", "min"), y0=("y", "min"),
                     x1=("x", "max"), y1=("y", "max")).astype(
                         {"n_entries": np.int64})

    return bucketed_groups(slabs, ["slab"], _pages, est_rows=n_rows)


def quadtree_leaves(pts, x_col: str = "px", y_col: str = "py",
                    cap: int = 256, max_depth: int = 8,
                    world_bits: int = 16, est_rows: int | None = None):
    """Adaptive QUADTREE bulk build — the tiling-service twin of
    :func:`str_pack_pages`: split a quadrant while it holds more than
    ``cap`` points, down to ``max_depth``. Emits one row per occupied LEAF
    (depth, qx, qy, n_points): a node is a leaf iff its count <= cap and
    its parent's count > cap (root included when the whole set fits), plus
    overfull leaves pinned at max_depth. This is the reference's
    geo-proximity-key prefix tree (`getGeoProximityKey.js:8-46` truncates
    the interleaved key to exactly such quadrant prefixes) made adaptive.

    Scale shape: the per-POINT pass is one map-side combiner (counts at
    max_depth), so the shuffle is VALUE-DOMAIN-bounded at 4^max_depth
    cells regardless of row count; the depth rollup + leaf selection run
    on that bounded table (<= 65536 rows at the default depth 8 — choose
    max_depth so 4^max_depth stays driver-sized, the same contract as the
    density-raster ops)."""
    from .relational import partial_groupby_sum

    shift = world_bits - max_depth

    def _cells(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"qx": x >> shift, "qy": y >> shift})

    cells = pts.map_batches(_cells, batch_format="pyarrow", batch_size=65536)
    c = partial_groupby_sum(cells, ["qx", "qy"], [], count_as="n",
                            est_rows=est_rows).to_pandas()

    # rollup counts per depth (bounded: 4^max_depth cells at the deepest)
    levels: dict[int, pd.DataFrame] = {max_depth: c}
    for d in range(max_depth - 1, -1, -1):
        ch = levels[d + 1]
        p = pd.DataFrame({"qx": ch["qx"].to_numpy() // 2,
                          "qy": ch["qy"].to_numpy() // 2,
                          "n": ch["n"].to_numpy()})
        levels[d] = p.groupby(["qx", "qy"], as_index=False, sort=False).sum()

    out_d, out_x, out_y, out_n = [], [], [], []
    root = levels[0]
    if int(root["n"].iloc[0]) <= cap:
        out_d.append(0); out_x.append(0); out_y.append(0)
        out_n.append(int(root["n"].iloc[0]))
    else:
        for d in range(1, max_depth + 1):
            cur, par = levels[d], levels[d - 1]
            pn = par.set_index(["qx", "qy"])["n"]
            parent_n = pn.loc[list(zip(cur["qx"] // 2, cur["qy"] // 2))].to_numpy()
            if d < max_depth:
                m = (cur["n"].to_numpy() <= cap) & (parent_n > cap)
            else:  # overfull nodes become leaves at the depth floor
                m = parent_n > cap
            sel = cur[m]
            out_d.extend([d] * len(sel))
            out_x.extend(sel["qx"].tolist())
            out_y.extend(sel["qy"].tolist())
            out_n.extend(sel["n"].tolist())
    return pa.table({
        "depth": pa.array(out_d, pa.int64()),
        "qx": pa.array(np.asarray(out_x, np.int64)),
        "qy": pa.array(np.asarray(out_y, np.int64)),
        "n_points": pa.array(np.asarray(out_n, np.int64)),
    })


def morton_bbox_intervals(x0: int, x1: int, y0: int, y1: int,
                          world_bits: int = 16) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decompose an inclusive bbox into maximal quadtree cells = disjoint
    MORTON-CODE INTERVALS (the BIGMIN / z-order range-scan decomposition):
    level-by-level descent, a cell fully inside emits, disjoint drops,
    partial splits into its 4 children. Returns (depth, lo, hi) sorted by
    lo; every point in the bbox falls in exactly one [lo, hi] and no point
    outside does. Vectorized per level; output is O(perimeter) cells."""
    from ..functions.cells import morton_encode

    qx = np.zeros(1, np.int64)
    qy = np.zeros(1, np.int64)
    out_d: list[np.ndarray] = []
    out_qx: list[np.ndarray] = []
    out_qy: list[np.ndarray] = []
    for d in range(world_bits + 1):
        if len(qx) == 0:
            break
        size = 1 << (world_bits - d)
        cx0, cy0 = qx * size, qy * size
        cx1, cy1 = cx0 + size - 1, cy0 + size - 1
        inside = (cx0 >= x0) & (cx1 <= x1) & (cy0 >= y0) & (cy1 <= y1)
        disjoint = (cx1 < x0) | (cx0 > x1) | (cy1 < y0) | (cy0 > y1)
        if inside.any():
            out_d.append(np.full(int(inside.sum()), d, np.int64))
            out_qx.append(qx[inside])
            out_qy.append(qy[inside])
        part = ~inside & ~disjoint
        px_, py_ = qx[part], qy[part]
        qx = np.concatenate([px_ * 2, px_ * 2 + 1, px_ * 2, px_ * 2 + 1])
        qy = np.concatenate([py_ * 2, py_ * 2, py_ * 2 + 1, py_ * 2 + 1])
    assert len(qx) == 0, "descent must terminate at single-unit cells"
    depth = np.concatenate(out_d) if out_d else np.empty(0, np.int64)
    cqx = np.concatenate(out_qx) if out_qx else np.empty(0, np.int64)
    cqy = np.concatenate(out_qy) if out_qy else np.empty(0, np.int64)
    span = (world_bits - depth).astype(np.uint64)
    lo = (morton_encode(cqx.astype(np.uint64) << span,
                        cqy.astype(np.uint64) << span)).astype(np.int64)
    hi = lo + (np.int64(1) << (2 * span.astype(np.int64))) - 1
    order = np.argsort(lo, kind="mergesort")
    return depth[order], lo[order], hi[order]


def morton_range_scan(pts, x0: int, x1: int, y0: int, y1: int,
                      x_col: str = "px", y_col: str = "py",
                      world_bits: int = 16, est_rows: int | None = None):
    """Z-ORDER INDEX RANGE SCAN: answer a bbox query through the Morton
    key ONLY — decompose the box into disjoint morton intervals
    (:func:`morton_bbox_intervals`), broadcast the interval table, and
    probe each point's interleaved code with one searchsorted per batch
    (the read-pruning pattern of a Morton-sorted 100 TB layout: each
    interval maps to a contiguous key range = a contiguous file/row-group
    span, so the scan touches only O(perimeter) ranges instead of the
    whole table). Emits one row per interval (lo, hi, n_points) INCLUDING
    empty intervals — the decomposition itself is part of the contract.

    The probe is a fused combiner: each batch emits per-interval partial
    counts, so the shuffle is interval-table-sized."""
    from ..functions.cells import morton_encode
    from .relational import partial_groupby_sum

    depth, lo, hi = morton_bbox_intervals(x0, x1, y0, y1, world_bits)
    iv_ref = ray.put((lo, hi))

    def _probe(batch: pa.Table) -> pa.Table:
        lo_, hi_ = cached_state(iv_ref, lambda t: t,
                                token="morton_range_scan.intervals")
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        code = morton_encode(x, y).astype(np.int64)
        idx = np.searchsorted(lo_, code, side="right") - 1
        ok = (idx >= 0) & (code <= hi_[np.clip(idx, 0, len(hi_) - 1)])
        cnt = np.bincount(idx[ok], minlength=len(lo_))
        nz = np.flatnonzero(cnt)
        return pa.table({"iv": nz.astype(np.int64),
                         "n": cnt[nz].astype(np.int64)})

    partial = pts.map_batches(_probe, batch_format="pyarrow",
                              batch_size=65536)
    agg = partial_groupby_sum(partial, ["iv"], ["n"],
                              est_rows=est_rows).to_pandas()
    n_points = np.zeros(len(lo), np.int64)
    n_points[agg["iv"].to_numpy(np.int64)] = agg["n"].to_numpy(np.int64)
    return pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                     "n_points": pa.array(n_points)})


# D8 direction table: code -> (dx, dy, slope numerator). Cardinal drops
# weight 99, diagonal 70 (99/70 is the classic rational sqrt(2); the
# approximation IS the definition, so engine and oracle are exact).
D8 = [(0, 1, 0, 99), (1, 1, 1, 70), (2, 0, 1, 99), (3, -1, 1, 70),
      (4, -1, 0, 99), (5, -1, -1, 70), (6, 0, -1, 99), (7, 1, -1, 70)]


def d8_direction_table(points, x_col: str, y_col: str, cell: int,
                       est_rows: int | None = None):
    """Shared D8 front half: density raster (one value-domain-bounded
    combiner) + steepest-rational-descent direction per occupied cell
    (9-way fan-out + one grid-sized combine). Returns a Dataset
    (cx, cy, v, dir) — see :func:`grid_flow_d8` for the direction rule."""
    from .relational import bucketed_groups, partial_groupby_sum

    def _cells_of(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cx": x // cell, "cy": y // cell})

    raw = points.map_batches(_cells_of, batch_format="pyarrow",
                             batch_size=8192)
    density = partial_groupby_sum(raw, ["cx", "cy"], [], count_as="v",
                                  est_rows=est_rows)

    opposite = {0: 4, 1: 5, 2: 6, 3: 7, 4: 0, 5: 1, 6: 2, 7: 3}

    def _fan(df: pd.DataFrame) -> pd.DataFrame:
        cx = df["cx"].to_numpy(np.int64)
        cy = df["cy"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        parts = [pd.DataFrame({"cx": cx, "cy": cy,
                               "code": np.int64(-1), "nv": v})]
        for code, dx, dy, _num in D8:
            parts.append(pd.DataFrame({
                "cx": cx + dx, "cy": cy + dy,
                "code": np.int64(opposite[code]), "nv": v}))
        return pd.concat(parts, ignore_index=True)

    fan = density.map_batches(_fan, batch_format="pandas", batch_size=8192)

    num_of = np.zeros(8, np.int64)
    dx_of = np.zeros(8, np.int64)
    dy_of = np.zeros(8, np.int64)
    for code, dx, dy, num in D8:
        num_of[code], dx_of[code], dy_of[code] = num, dx, dy

    def _direction(g: pd.DataFrame) -> pd.DataFrame:
        own = g[g["code"] == -1].set_index(["cx", "cy"])["nv"]
        nb = g[g["code"] >= 0]
        piv = nb.pivot_table(index=["cx", "cy"], columns="code",
                             values="nv", aggfunc="sum", fill_value=0)
        piv = piv.reindex(columns=range(8), fill_value=0)
        piv = piv.reindex(own.index, fill_value=0)
        drops = own.to_numpy(np.int64)[:, None] - piv.to_numpy(np.int64)
        keys = drops * num_of[None, :]
        keys = np.where(drops > 0, keys, np.int64(-1))
        best = np.argmax(keys, axis=1)  # first max = smallest code on ties
        has = keys[np.arange(len(best)), best] >= 0
        d = np.where(has, best, -1).astype(np.int64)
        cx = own.index.get_level_values(0).to_numpy(np.int64)
        cy = own.index.get_level_values(1).to_numpy(np.int64)
        return pd.DataFrame({"cx": cx, "cy": cy,
                             "v": own.to_numpy(np.int64), "dir": d})

    return bucketed_groups(fan, ["cx", "cy"], _direction, est_rows=est_rows)


def grid_flow_d8(points, x_col: str, y_col: str, cell: int,
                 rounds: int = 6, est_rows: int | None = None):
    """D8 FLOW DIRECTION + fixed-round FLOW ACCUMULATION over the
    point-density raster — the hydrology classic (flow routing over a DEM;
    here density is elevation and flow descends): each occupied cell
    points at the neighbor with the steepest rational-weighted drop
    (cardinal drop x 99 vs diagonal drop x 70; ties to the smallest
    direction code; no positive drop = pit, dir -1; absent neighbors have
    elevation 0, so edge cells drain off-raster), then ``rounds``
    synchronous rounds of

        acc_{t+1}(c) = 1 + sum_{n : target(n) = c, c occupied} acc_t(n)

    give the number of cells whose flow path reaches c within <= rounds
    steps (itself included) — the bounded-horizon form of upslope area,
    same contract as `grid_heat_diffusion` / `tile_isochrone`.

    Scale shape: ONE value-domain-bounded combiner builds the raster;
    direction is a 9-way fan-out + one grid-sized combine
    (:func:`d8_direction_table`); each accumulation round is one fan-out
    along the static edge set (broadcast once) + one grid-sized combine.
    Emits (cx, cy, v, dir, acc)."""
    from .relational import bucketed_groups
    from .util import cached_state

    num_of = np.zeros(8, np.int64)
    dx_of = np.zeros(8, np.int64)
    dy_of = np.zeros(8, np.int64)
    for code, dx, dy, num in D8:
        num_of[code], dx_of[code], dy_of[code] = num, dx, dy

    dirs = d8_direction_table(points, x_col, y_col, cell, est_rows=est_rows)

    # static edge table (grid-bounded), broadcast once for the rounds
    dtab = dirs.to_pandas()
    d_arr = dtab["dir"].to_numpy(np.int64)
    has_t = d_arr >= 0
    edges = pd.DataFrame({
        "cx": dtab["cx"].to_numpy(np.int64),
        "cy": dtab["cy"].to_numpy(np.int64),
        "tx": dtab["cx"].to_numpy(np.int64) + np.where(has_t, dx_of[np.clip(d_arr, 0, 7)], 0),
        "ty": dtab["cy"].to_numpy(np.int64) + np.where(has_t, dy_of[np.clip(d_arr, 0, 7)], 0),
        "has": has_t,
    }).set_index(["cx", "cy"])
    edges_ref = ray.put(edges)

    state = ray.data.from_pandas(
        pd.DataFrame({"cx": dtab["cx"].to_numpy(np.int64),
                      "cy": dtab["cy"].to_numpy(np.int64),
                      "acc": np.int64(1)}))

    for _ in range(rounds):
        def _send(df: pd.DataFrame) -> pd.DataFrame:
            e = cached_state(edges_ref, lambda t: t, token="flow_d8.edges")
            idx = pd.MultiIndex.from_arrays(
                [df["cx"].to_numpy(np.int64), df["cy"].to_numpy(np.int64)])
            ee = e.loc[idx]
            m = ee["has"].to_numpy()
            out = [pd.DataFrame({"cx": df["cx"].to_numpy(np.int64),
                                 "cy": df["cy"].to_numpy(np.int64),
                                 "inc": np.int64(0), "occ": np.int64(1)})]
            if m.any():
                out.append(pd.DataFrame({
                    "cx": ee["tx"].to_numpy(np.int64)[m],
                    "cy": ee["ty"].to_numpy(np.int64)[m],
                    "inc": df["acc"].to_numpy(np.int64)[m],
                    "occ": np.int64(0)}))
            return pd.concat(out, ignore_index=True)

        sent = state.map_batches(_send, batch_format="pandas",
                                 batch_size=8192)

        def _gather(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby(["cx", "cy"], as_index=False, sort=False).agg(
                inc=("inc", "sum"), occ=("occ", "sum"))
            s = s[s["occ"] > 0]
            return pd.DataFrame({"cx": s["cx"].to_numpy(np.int64),
                                 "cy": s["cy"].to_numpy(np.int64),
                                 "acc": 1 + s["inc"].to_numpy(np.int64)})

        state = bucketed_groups(sent, ["cx", "cy"], _gather,
                                est_rows=est_rows)

    acc = state.to_pandas().set_index(["cx", "cy"])["acc"]
    acc = acc.loc[pd.MultiIndex.from_arrays(
        [dtab["cx"].to_numpy(np.int64), dtab["cy"].to_numpy(np.int64)])]
    return pa.table({
        "cx": pa.array(dtab["cx"].to_numpy(np.int64)),
        "cy": pa.array(dtab["cy"].to_numpy(np.int64)),
        "v": pa.array(dtab["v"].to_numpy(np.int64)),
        "dir": pa.array(dtab["dir"].to_numpy(np.int64)),
        "acc": pa.array(acc.to_numpy(np.int64)),
    })


def grid_flow_basins(points, x_col: str, y_col: str, cell: int,
                     doublings: int = 7, est_rows: int | None = None):
    """WATERSHED / BASIN DELINEATION over the D8 flow forest
    (:func:`d8_direction_table`): every occupied cell follows its flow
    direction to a TERMINAL cell — a pit, or the last occupied cell
    before the flow leaves the raster — and is labeled with that
    terminal's coordinates. The flow graph is a functional forest (each
    step strictly decreases elevation, so no cycles); the terminal chase
    is POINTER DOUBLING: succ ← succ∘succ for ``doublings`` rounds covers
    chains up to 2^doublings long (128 at the default — an upper bound on
    any monotone path in a 64×64 raster is its cell count, and pytest
    pins a long-chain case). PRAM list-ranking, the same device as
    `part_hierarchy_rollup`; the successor table is grid-sized, so the
    doubling runs as 7 self-compositions on the bounded table. Emits
    (cx, cy, bx, by) — cell → basin terminal."""
    dirs = d8_direction_table(points, x_col, y_col, cell, est_rows=est_rows)
    dtab = dirs.to_pandas()

    dx_of = np.zeros(8, np.int64)
    dy_of = np.zeros(8, np.int64)
    for code, dx, dy, _num in D8:
        dx_of[code], dy_of[code] = dx, dy

    cx = dtab["cx"].to_numpy(np.int64)
    cy = dtab["cy"].to_numpy(np.int64)
    d = dtab["dir"].to_numpy(np.int64)
    has = d >= 0
    tx = cx + np.where(has, dx_of[np.clip(d, 0, 7)], 0)
    ty = cy + np.where(has, dy_of[np.clip(d, 0, 7)], 0)
    # successor = target if occupied else self (terminal self-loop)
    occ = pd.MultiIndex.from_arrays([cx, cy])
    pos = pd.Series(np.arange(len(cx)), index=occ)
    tpos = pos.reindex(pd.MultiIndex.from_arrays([tx, ty])).to_numpy()
    succ = np.where(has & ~np.isnan(tpos),
                    np.nan_to_num(tpos, nan=0).astype(np.int64),
                    np.arange(len(cx)))
    for _ in range(doublings):
        succ = succ[succ]
    return pa.table({
        "cx": pa.array(cx), "cy": pa.array(cy),
        "bx": pa.array(cx[succ]), "by": pa.array(cy[succ]),
    })


def bresenham_batch(x0, y0, x1, y1):
    """Vectorized classic Bresenham over a BATCH of integer cell segments
    (all octants, combined diagonal step): returns (n_cells, cell_sum)
    where n_cells counts plotted cells (Chebyshev distance + 1) and
    cell_sum = Σ (31·x + 17·y) over the plotted cells — a position-
    sensitive checksum, so a mirrored or transposed walk cannot pass.
    The step loop runs max Chebyshev-distance times over the WHOLE batch
    (numpy masks), never per segment — the vector→raster paint primitive
    every tile emission needs, as a batch kernel."""
    x = x0.astype(np.int64).copy()
    y = y0.astype(np.int64).copy()
    x1 = x1.astype(np.int64)
    y1 = y1.astype(np.int64)
    dx = np.abs(x1 - x)
    dy = -np.abs(y1 - y)
    sx = np.where(x < x1, 1, -1)
    sy = np.where(y < y1, 1, -1)
    err = dx + dy
    n_cells = np.ones(len(x), np.int64)
    cell_sum = 31 * x + 17 * y
    active = (x != x1) | (y != y1)
    while active.any():
        e2 = 2 * err
        stepx = active & (e2 >= dy)
        stepy = active & (e2 <= dx)
        err[stepx] += dy[stepx]
        x[stepx] += sx[stepx]
        err[stepy] += dx[stepy]
        y[stepy] += sy[stepy]
        n_cells[active] += 1
        cell_sum[active] += 31 * x[active] + 17 * y[active]
        active = (x != x1) | (y != y1)
    return n_cells, cell_sum


def bresenham_cells(segs, cell: int = 256):
    """Rasterize bounded segments onto the coarse cell grid with classic
    Bresenham (:func:`bresenham_batch`): one output row per segment with
    the plotted-cell count and position checksum. Endpoint coords must be
    non-negative (floor == trunc division, mirroring SQL ``//``); the
    walk length is bounded by the segment's Chebyshev cell span, so a
    ±1000-unit segment at cell=256 is ≤ 5 steps — the loop is over steps,
    not rows, and nothing shuffles."""

    def _raster(batch: pa.Table) -> pa.Table:
        ax = batch["ax"].to_numpy(zero_copy_only=False).astype(np.int64)
        ay = batch["ay"].to_numpy(zero_copy_only=False).astype(np.int64)
        bx = batch["bx"].to_numpy(zero_copy_only=False).astype(np.int64)
        by = batch["by"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_cells, cell_sum = bresenham_batch(ax // cell, ay // cell,
                                            bx // cell, by // cell)
        return pa.table({
            "user_id": batch["user_id"],
            "seg_i": batch["seg_i"],
            "n_cells": pa.array(n_cells),
            "cell_sum": pa.array(cell_sum),
        })

    return segs.map_batches(_raster, batch_format="pyarrow", batch_size=65536)


def viewshed_visible(elev: np.ndarray, ox: int, oy: int, antenna: int = 2):
    """R3 VIEWSHED over an integer elevation grid: every cell is a target;
    the observer sits at (ox, oy) with an ``antenna`` offset; target T at
    Bresenham step count K is visible iff NO intermediate path cell P at
    step k satisfies (e(P) − eO)·K ≥ (e(T) − eO)·k — the cross-multiplied
    (division-free, integer-exact) form of "an intermediate line-of-sight
    slope at least the target's blocks it" with step index as distance,
    ties blocking. Vectorized: ONE Bresenham mask walk advances every
    target's ray simultaneously (loop over ≤ max-Chebyshev steps, not
    over targets). Returns (tx, ty, eT, K, visible) arrays over all
    targets except the observer."""
    h, w = elev.shape
    cy, cx = np.mgrid[0:h, 0:w]
    tx = cx.ravel().astype(np.int64)
    ty = cy.ravel().astype(np.int64)
    keep = ~((tx == ox) & (ty == oy))
    tx, ty = tx[keep], ty[keep]
    e_t = elev[ty, tx].astype(np.int64)
    e_o = int(elev[oy, ox]) + antenna
    big_k = np.maximum(np.abs(tx - ox), np.abs(ty - oy))
    dx = np.abs(tx - ox)
    dy = -np.abs(ty - oy)
    sx = np.where(ox < tx, 1, -1)
    sy = np.where(oy < ty, 1, -1)
    err = dx + dy
    x = np.full_like(tx, ox)
    y = np.full_like(ty, oy)
    vis = np.ones(len(tx), bool)
    kmax = int(big_k.max()) if len(big_k) else 0
    for k in range(1, kmax):  # intermediate steps only (k = 1 .. K-1)
        adv = big_k - 1 >= k
        if not adv.any():
            break
        e2 = 2 * err
        stepx = adv & (e2 >= dy)
        stepy = adv & (e2 <= dx)
        err[stepx] += dy[stepx]
        x[stepx] += sx[stepx]
        err[stepy] += dx[stepy]
        y[stepy] += sy[stepy]
        blocked = (elev[y[adv], x[adv]] - e_o) * big_k[adv] >= \
            (e_t[adv] - e_o) * k
        va = vis[adv]
        va &= ~blocked
        vis[adv] = va
    return tx, ty, e_t, big_k, vis


def grid_viewshed(points, x_col: str, y_col: str, cell: int = 1024,
                  grid_n: int = 64, ox: int = 32, oy: int = 32,
                  antenna: int = 2, est_rows: int | None = None):
    """Viewshed delineation over the point-density raster (density as
    elevation): which cells can a mast at (ox, oy) see — the DEM classic
    next to D8 flow routing (`grid_flow_d8`), and the coverage-planning
    face of the raster suite. ONE value-domain-bounded combiner builds
    the raster; the viewshed itself runs on the ≤ grid_n² row table
    (:func:`viewshed_visible`, one vectorized mask walk). Emits one row
    per VISIBLE target cell: (cx, cy, v, k_steps)."""
    from .relational import partial_groupby_sum

    def _cells_of(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cx": x // cell, "cy": y // cell})

    raw = points.map_batches(_cells_of, batch_format="pyarrow",
                             batch_size=8192)
    density = partial_groupby_sum(raw, ["cx", "cy"], [], count_as="v",
                                  est_rows=est_rows)
    dtab = density.to_pandas()  # grid-bounded: <= grid_n^2 rows
    elev = np.zeros((grid_n, grid_n), np.int64)
    elev[dtab["cy"].to_numpy(np.int64), dtab["cx"].to_numpy(np.int64)] = \
        dtab["v"].to_numpy(np.int64)
    tx, ty, e_t, big_k, vis = viewshed_visible(elev, ox, oy, antenna)
    return ray.data.from_pandas(pd.DataFrame({
        "cx": tx[vis], "cy": ty[vis], "v": e_t[vis],
        "k_steps": big_k[vis].astype(np.int64)}))
