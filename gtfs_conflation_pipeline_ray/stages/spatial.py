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

Execution model: the tile/reference side is SMALL relative to probes, so it is
broadcast once (`ray.put`) and indexed per actor in ``__init__``
(:class:`~..state.grid_index.GridIndex`); the probe side streams through
``map_batches`` in zero-copy Arrow batches. No shuffle is needed for the join
itself — only downstream aggregates shuffle, after per-batch partial
aggregation where possible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..state.grid_index import GridIndex
from .util import pool_size


def build_tile_index(tiles: pa.Table, world: int = 65536, bucket_size: int = 2048) -> GridIndex:
    """Build a :class:`GridIndex` from a tile table with columns
    (tile_id, ref_id, level, cx, cy, hw, hh)."""
    cx = tiles["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
    cy = tiles["cy"].to_numpy(zero_copy_only=False).astype(np.int64)
    hw = tiles["hw"].to_numpy(zero_copy_only=False).astype(np.int64)
    hh = tiles["hh"].to_numpy(zero_copy_only=False).astype(np.int64)
    tid = tiles["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return GridIndex(tid, cx - hw, cy - hh, cx + hw, cy + hh, world=world, bucket_size=bucket_size)


class _TileJoiner:
    """Actor-pool callable: holds the tile GridIndex, probes each Arrow batch.

    State (the index) is built ONCE per actor from the broadcast object-store
    ref — the Ray-native analog of the reference's per-process shst tile cache
    / memoized OSRM handle (``SharedStreetsMatcher/shstMatchFeatures.js:49-118``,
    ``replaceFeaturesGeomsWithOsrmRoute.js:28-42``).
    """

    def __init__(self, tiles_ref, x_col: str, y_col: str, carry_cols: list[str]):
        tiles: pa.Table = ray.get(tiles_ref)
        self.index = build_tile_index(tiles)
        self.ref_id = tiles["ref_id"].to_numpy(zero_copy_only=False)
        self.level = tiles["level"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.x_col, self.y_col, self.carry = x_col, y_col, carry_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch[self.y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pi, ti = self.index.query_points(px, py)
        cols: dict[str, object] = {}
        for c in self.carry:
            cols[c] = batch[c].take(pa.array(pi))
        cols[self.x_col] = px[pi]
        cols[self.y_col] = py[pi]
        cols["tile_id"] = self.index.tile_id[ti]
        cols["ref_id"] = self.ref_id[ti]
        cols["level"] = self.level[ti]
        return pa.table(cols)


def candidate_join(
    points, tiles_ref, x_col: str, y_col: str, carry_cols: list[str],
    concurrency: int | None = None,
):
    """Point-in-tile candidate spatial join: one output row per (point, tile)
    containment pair. ``tiles_ref`` is a `ray.put` handle to the tile table."""
    return points.map_batches(
        _TileJoiner,
        fn_constructor_args=(tiles_ref, x_col, y_col, carry_cols),
        batch_format="pyarrow",
        batch_size=32768,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


class _KnnJoiner:
    """Actor-pool callable: exact kNN of each probe point to tile centroids."""

    def __init__(self, tiles_ref, k: int, x_col: str, y_col: str, carry_cols: list[str]):
        tiles: pa.Table = ray.get(tiles_ref)
        self.index = build_tile_index(tiles)
        self.k, self.x_col, self.y_col, self.carry = k, x_col, y_col, carry_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = batch[self.x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qy = batch[self.y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qi, ti, d2 = self.index.knn_centroids(qx, qy, self.k)
        k = min(self.k, len(self.index.tile_id))
        cols: dict[str, object] = {}
        for c in self.carry:
            cols[c] = batch[c].take(pa.array(qi))
        cols["tile_id"] = self.index.tile_id[ti]
        cols["knn_rank"] = np.tile(np.arange(1, k + 1, dtype=np.int64), len(qx))
        cols["dist2"] = d2
        return pa.table(cols)


def knn_join(points, tiles_ref, k: int, x_col: str, y_col: str, carry_cols: list[str],
             concurrency: int | None = None):
    """k-nearest-tile join (exact, deterministic tie-break by tile_id)."""
    return points.map_batches(
        _KnnJoiner,
        fn_constructor_args=(tiles_ref, k, x_col, y_col, carry_cols),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


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
            {
                "level_size": lsz,
                "cell_x": pxr // lsz,
                "cell_y": pyr // lsz,
            }
        )

    return points.map_batches(_assign, batch_format="pyarrow", batch_size=65536)


class _RectOverlap:
    """Actor-pool callable: rect-vs-tile overlap with intersection area —
    the refine half of the filter-and-refine spatial join (≙ J5 cospatiality,
    intersection length > threshold keep-rule,
    ``GtfsConflationMapJoinDAO/loaders.js:56,240``)."""

    def __init__(self, tiles_ref):
        tiles: pa.Table = ray.get(tiles_ref)
        self.index = build_tile_index(tiles)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qid = batch["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        qx0 = batch["x0"].to_numpy(zero_copy_only=False).astype(np.int64)
        qy0 = batch["y0"].to_numpy(zero_copy_only=False).astype(np.int64)
        qx1 = batch["x1"].to_numpy(zero_copy_only=False).astype(np.int64)
        qy1 = batch["y1"].to_numpy(zero_copy_only=False).astype(np.int64)
        qi, ti = self.index.query_rects(qx0, qy0, qx1, qy1)
        ix = self.index
        ax0, ay0, ax1, ay1 = qx0[qi], qy0[qi], qx1[qi], qy1[qi]
        bx0, by0, bx1, by1 = ix.x0[ti], ix.y0[ti], ix.x1[ti], ix.y1[ti]
        iw = np.minimum(ax1, bx1) - np.maximum(ax0, bx0)
        ih = np.minimum(ay1, by1) - np.maximum(ay0, by0)
        a = qid[qi]
        b = ix.tile_id[ti]
        keep = a < b  # each unordered pair once, no self-pairs
        return pa.table(
            {
                "tile_a": a[keep],
                "tile_b": b[keep],
                "inter_area": (iw * ih)[keep],
            }
        )


def tile_overlap_pairs(tiles_ds, tiles_ref, concurrency: int | None = None):
    """Self spatial join of the tile set: unordered overlapping pairs with
    positive intersection area."""
    return tiles_ds.map_batches(
        _RectOverlap,
        fn_constructor_args=(tiles_ref,),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
