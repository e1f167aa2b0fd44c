"""End-to-end HYDROLOGY / TERRAIN-ANALYTICS pipeline — the composed,
checkpointed face of the raster operator suite (each piece is
oracle-backed individually in the registry):

  A. RASTER    probe points → density DEM (value-domain-bounded combiner)
  B. ROUTE     D8 steepest-descent direction + bounded flow accumulation
               (``spatial.grid_flow_d8``)
  C. BASINS    watershed delineation by pointer doubling
               (``spatial.grid_flow_basins``)
  D. ZONAL     per-basin rollup (cell count, drained elevation mass,
               max accumulation) — the zonal-statistics join every
               watershed report ends with

Every stage commits through :class:`state.checkpoint.StageCheckpoint`
(atomic rename + manifest), matching ``gtfs_pipeline`` /
``image_conflation`` / ``curation``: a killed run resumes without
recompute. The rasters are value-domain-bounded (≤ 4096 rows at
cell=1024), so stages B–D run on bounded tables while stage A streams
the full point set."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray

from ..state.checkpoint import StageCheckpoint
from ..stages import spatial
from . import conflation


def run_hydrology(sf_dir: str, out_dir: str, *, cell: int = 1024,
                  rounds: int = 6) -> dict:
    lineage = {"sf_dir": sf_dir, "cell": cell, "rounds": rounds}
    metrics: dict = {}

    # --- stage A+B: density raster + D8 routing + accumulation ---------
    ck_b = StageCheckpoint(f"{out_dir}/flow", "flow", lineage)

    def _write_flow(tmp_dir: str) -> int:
        pts = conflation.read_points(sf_dir)
        flow = spatial.grid_flow_d8(pts, "px", "py", cell=cell,
                                    rounds=rounds)
        if isinstance(flow, pa.Table):
            flow = ray.data.from_arrow(flow)
        flow = flow.materialize()
        flow.write_parquet(tmp_dir)
        return flow.count()

    res_b = ck_b.run_partition("all", _write_flow)
    metrics["flow_cells"] = res_b.rows
    metrics["flow_skipped"] = res_b.skipped

    # --- stage C: basin labels -----------------------------------------
    ck_c = StageCheckpoint(f"{out_dir}/basins", "basins", lineage)

    def _write_basins(tmp_dir: str) -> int:
        pts = conflation.read_points(sf_dir)
        basins = spatial.grid_flow_basins(pts, "px", "py", cell=cell)
        ds = ray.data.from_arrow(basins) if isinstance(basins, pa.Table) \
            else basins
        ds = ds.materialize()
        ds.write_parquet(tmp_dir)
        return ds.count()

    res_c = ck_c.run_partition("all", _write_basins)
    metrics["basin_cells"] = res_c.rows
    metrics["basins_skipped"] = res_c.skipped

    # --- stage D: per-basin zonal rollup -------------------------------
    ck_d = StageCheckpoint(f"{out_dir}/zonal", "zonal", lineage)

    def _write_zonal(tmp_dir: str) -> int:
        flow = ray.data.read_parquet(f"{out_dir}/flow").to_pandas()
        basins = ray.data.read_parquet(f"{out_dir}/basins").to_pandas()
        j = flow.merge(basins, on=["cx", "cy"])
        z = j.groupby(["bx", "by"], as_index=False).agg(
            n_cells=("v", "size"), v_sum=("v", "sum"),
            acc_max=("acc", "max")).astype("int64")
        ds = ray.data.from_pandas(z).materialize()
        ds.write_parquet(tmp_dir)
        return ds.count()

    res_d = ck_d.run_partition("all", _write_zonal)
    metrics["n_basins"] = res_d.rows
    metrics["zonal_skipped"] = res_d.skipped
    return metrics
