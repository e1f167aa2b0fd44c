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


def _auto_blocks(path: str) -> int | None:
    """Block-count override for FEW-FILE inputs: Ray's default splits a
    single parquet file into 2x-CPU tiny blocks, and every extra block
    multiplies downstream scheduling + combine partials (measured at sf0.1:
    64 blocks -> 3.6s, 32 -> 2.1s for the polygon probe). One block per CPU
    is the sweet spot; when the input already has >= CPU-count files (the
    100 TB case) the default per-file layout is right, so return None."""
    import glob
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        n_files = len(glob.glob(f"{path}/*.parquet"))
    else:
        n_files = 1
    cpus = int(ray.cluster_resources().get("CPU", 32))
    if n_files >= cpus:
        return None
    if n_files == 1:  # footer-only row count caps blocks for tiny tables
        nrows = pq.ParquetFile(path).metadata.num_rows
        return max(1, min(cpus, nrows))
    return cpus


def read_points(sf_dir: str):
    """lineitem → derived probe points (column-pruned read, vectorized derive)."""
    path = f"{sf_dir}/lineitem.parquet"
    ds = ray.data.read_parquet(
        path,
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"],
        override_num_blocks=_auto_blocks(path),
    )
    return ds.map_batches(td.points_batch, batch_format="pyarrow", batch_size=8192)


def tiles_ref(sf_dir: str):
    """Broadcast handle for the (small) tile table — `ray.put` ONCE per run."""
    return ray.put(td.tiles_table(sf_dir))


def spatial_join_pairs(sf_dir: str, concurrency: int | None = None,
                       backend: str = "grid"):
    """Candidate point-in-tile join: (point_id, tile_id, ref_id, level).
    ``backend`` selects the per-worker index (uniform grid or packed STR
    R-tree) — output identical either way."""
    pts = read_points(sf_dir)
    joined = spatial.candidate_join(
        pts, tiles_ref(sf_dir), "px", "py", ["point_id"], concurrency=concurrency,
        backend=backend,
    )
    return joined.select_columns(["point_id", "tile_id", "ref_id", "level"])


def spatial_join_pairs_sharded(sf_dir: str, n_shards: int = 8):
    """Identical join semantics (and oracle) to ``spatial_join_pairs``, but
    the reference side is x-range SHARDED (``stages.spatial.shard_tiles``) —
    the beyond-worker-memory regime that matters at 100 TB (≙ reference J4,
    `GtfsConflationMapJoinDAO/loaders.js:139-155` at statewide scale): no
    worker ever builds the full tile index, each batch probes only the shards
    its x-range touches."""
    pts = read_points(sf_dir)
    shards = spatial.shard_tiles(td.tiles_table(sf_dir), n_shards)
    shard_refs = [(lo, hi, ray.put(t)) for lo, hi, t in shards]
    joined = spatial.sharded_candidate_join(pts, shard_refs, "px", "py", ["point_id"])
    return joined.select_columns(["point_id", "tile_id", "ref_id", "level"])


def tile_stats(sf_dir: str, concurrency: int | None = None):
    """Flagship: candidate join + per-tile aggregate
    (tile_id, n_points, sum_qty_c). The join and the combiner are FUSED: each
    batch probes the grid index and emits per-tile (sum, count) partials
    directly via bincount — the ~40x-larger (point, tile) pair set never
    materializes, only tiny per-batch partials enter the grouped shuffle."""
    from ..stages.spatial import _TileState
    from ..stages.util import cached_state

    pts = read_points(sf_dir)
    ref = tiles_ref(sf_dir)

    def _probe_agg(batch: pa.Table) -> pa.Table:
        st: _TileState = cached_state(ref, _TileState)
        ix = st.index
        px = batch["px"].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch["py"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty_c = cents(batch["l_quantity"].to_numpy(zero_copy_only=False))
        pi, ti = ix.query_points(px, py)
        n_tiles = len(ix.tile_id)
        cnt = np.bincount(ti, minlength=n_tiles)
        sq = np.bincount(ti, weights=qty_c[pi].astype(np.float64), minlength=n_tiles)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "tile_id": ix.tile_id[nz],
                "qty_c": np.rint(sq[nz]).astype(np.int64),  # int sums, exact in f64
                "n_points": cnt[nz].astype(np.int64),
            }
        )

    # 32768 (not 65536): ~2x the task count on a 32-core node, so the probe
    # stage saturates the CPUs instead of running ~10 oversized tasks
    partials = pts.map_batches(_probe_agg, batch_format="pyarrow", batch_size=32768)
    agg = partial_groupby_sum(partials, ["tile_id"], ["qty_c", "n_points"])
    return agg.map_batches(
        lambda t: t.select(["tile_id", "qty_c", "n_points"]).rename_columns(
            ["tile_id", "sum_qty_c", "n_points"]
        ),
        batch_format="pyarrow",
    )
