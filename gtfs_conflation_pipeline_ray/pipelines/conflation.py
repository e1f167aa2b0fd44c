"""Flagship conflation pipeline over the driver testdata: derive probe points
and reference tiles, run the candidate spatial join (broadcast grid index,
actor pool), assign multi-resolution cells, and aggregate per tile.

This is the sandbox stand-in for the engine's native image+phash pipeline
(``pipelines/image_conflation.py``) — same operators, driven from the TPC-H
parquet so the driver's DuckDB oracle can check it exactly.

Reference lifecycle parity: mirrors §3.2's conflation core — spatially
ordered candidate generation (≙ `shst match` over geoprox-sorted segments),
refine, and grouped aggregation — with the single-threaded iterator pipeline
re-expressed as streaming Dataset stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..sources import testdata as td
from ..stages import spatial
from ..stages.relational import partial_groupby_sum
from ..functions.numeric import cents


def read_points(sf_dir: str):
    """lineitem → derived probe points (column-pruned read, vectorized derive)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"],
    )
    return ds.map_batches(td.points_batch, batch_format="pyarrow", batch_size=65536)


def tiles_ref(sf_dir: str):
    """Broadcast handle for the (small) tile table — `ray.put` ONCE per run."""
    return ray.put(td.tiles_table(sf_dir))


def spatial_join_pairs(sf_dir: str, concurrency: int | None = None):
    """Candidate point-in-tile join: (point_id, tile_id, ref_id, level)."""
    pts = read_points(sf_dir)
    joined = spatial.candidate_join(
        pts, tiles_ref(sf_dir), "px", "py", ["point_id"], concurrency=concurrency
    )
    return joined.select_columns(["point_id", "tile_id", "ref_id", "level"])


def tile_stats(sf_dir: str, concurrency: int | None = None):
    """Flagship: candidate join + per-tile aggregate
    (tile_id, n_points, sum_qty_c). Pre-aggregates inside batches before the
    grouped shuffle."""
    pts = read_points(sf_dir)

    def _qty(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "qty_c", pa.array(cents(batch["l_quantity"].to_numpy(zero_copy_only=False)))
        )

    pts = pts.map_batches(_qty, batch_format="pyarrow", batch_size=65536)
    joined = spatial.candidate_join(
        pts, tiles_ref(sf_dir), "px", "py", ["point_id", "qty_c"], concurrency=concurrency
    )
    agg = partial_groupby_sum(joined, ["tile_id"], ["qty_c"], count_as="n_points")
    return agg.map_batches(
        lambda t: t.select(["tile_id", "qty_c", "n_points"]).rename_columns(
            ["tile_id", "sum_qty_c", "n_points"]
        ),
        batch_format="pyarrow",
    )
