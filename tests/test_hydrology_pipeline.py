"""End-to-end golden test for the composed hydrology pipeline
(pipelines/hydrology.py): exact stage counts on the deterministic
sf0.001 fixture, zonal mass conservation, and full-resume on re-run."""

import glob

import pyarrow.parquet as pq

from gtfs_conflation_pipeline_ray.pipelines.hydrology import run_hydrology

SF = "/root/testdata/sf0.001"

# Golden counts on sf0.001 at cell=1024: 3143 occupied raster cells,
# collapsing into 2936 basin terminals.
GOLD = {"flow_cells": 3143, "basin_cells": 3143, "n_basins": 2936}


def _read(out, stage):
    files = sorted(glob.glob(f"{out}/{stage}/part-*/*.parquet"))
    return pq.ParquetDataset(files).read()


def test_hydrology_pipeline_golden_and_resume(ray_session, tmp_path):
    out = str(tmp_path / "hydro")
    m1 = run_hydrology(SF, out)
    for k, v in GOLD.items():
        assert m1[k] == v, (k, m1[k])
    assert not m1["flow_skipped"]

    # zonal conservation: every occupied cell lands in exactly one basin
    # and the drained elevation mass equals the raster total
    flow = _read(out, "flow")
    zonal = _read(out, "zonal")
    assert sum(zonal["n_cells"].to_pylist()) == GOLD["flow_cells"]
    assert sum(zonal["v_sum"].to_pylist()) == sum(flow["v"].to_pylist())
    # basin terminals are themselves occupied cells
    cells = set(zip(flow["cx"].to_pylist(), flow["cy"].to_pylist()))
    assert all((bx, by) in cells
               for bx, by in zip(zonal["bx"].to_pylist(),
                                 zonal["by"].to_pylist()))

    m2 = run_hydrology(SF, out)
    assert m2["flow_skipped"] and m2["basins_skipped"] and m2["zonal_skipped"]
    for k, v in GOLD.items():
        assert m2[k] == v
