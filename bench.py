"""Benchmark harness.

Headline: the flagship spatial-join + tile-aggregation pipeline over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1), plus per-query timings for
the full registry and the engine-native image pipeline over a cached
generated fixture (BASELINE.json input shape, N=100k).

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the headline at num_cpus=8 and num_cpus=32 in fresh
processes on the same input and reports throughputs + scaling efficiency
(the sandbox stand-in for the N vs 4N node criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
IMAGE_BENCH_DIR = os.environ.get("GRAFT_IMAGE_BENCH_DIR", "/tmp/graft_image_bench_100k")
IMAGE_BENCH_N = int(os.environ.get("GRAFT_IMAGE_BENCH_N", "100000"))


def _consume(ds) -> int:
    """Execute a Dataset fully and return its row count (streaming; no
    driver-side materialization of the data)."""
    try:
        return ds.count()
    except AttributeError:
        return len(ds)  # pandas/arrow results


def _ensure_image_fixture() -> str:
    from gtfs_conflation_pipeline_ray.sources.fixtures import write_fixture

    marker = f"{IMAGE_BENCH_DIR}/.complete-{IMAGE_BENCH_N}"
    if not os.path.exists(marker):
        write_fixture(IMAGE_BENCH_DIR, n_images=IMAGE_BENCH_N, n_tiles=2000,
                      rows_per_file=25000)
        open(marker, "w").write("ok")
    return IMAGE_BENCH_DIR


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NCPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from gtfs_conflation_pipeline_ray.pipelines import conflation
    from gtfs_conflation_pipeline_ray.pipelines.queries import QUERIES

    # warm the OS page cache so we measure compute + shuffle, not cold disk
    import pyarrow.parquet as pq

    n_lineitem = 0
    for t in ["lineitem", "orders", "customer", "part", "events", "documents", "embeddings"]:
        tab = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "lineitem":
            n_lineitem = tab.num_rows
        del tab

    # headline: flagship spatial join + tile aggregation
    t0 = time.time()
    _consume(conflation.tile_stats(SF_DIR))
    headline = time.time() - t0

    qtimes: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        _consume(fn(SF_DIR))
        qtimes[name] = round(time.time() - t0, 3)

    # engine-native image pipeline (BASELINE input shape) over cached fixture
    img_dir = _ensure_image_fixture()
    import shutil
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="graft_img_bench_")
    from gtfs_conflation_pipeline_ray.pipelines.image_conflation import run_pipeline

    t0 = time.time()
    run_pipeline(f"{img_dir}/images", f"{img_dir}/ref_tiles.parquet", out_dir,
                 n_partitions=8)
    image_sec = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)

    result = {
        "metric": "flagship_spatial_join_tile_agg",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NCPUS,
        "lineitem_rows": n_lineitem,
        "headline_rows_per_sec": round(n_lineitem / headline, 1),
        "image_pipeline_sec": round(image_sec, 3),
        "image_rows_per_sec": round(IMAGE_BENCH_N / image_sec, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same headline job at two parallelism levels in fresh processes."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    # efficiency over BOTH the sf headline and the image pipeline
    eff_head = (lo["value"] / hi["value"]) / (32 / 8)
    eff_img = (lo["image_pipeline_sec"] / hi["image_pipeline_sec"]) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "rows_per_sec_8": lo["headline_rows_per_sec"],
        "rows_per_sec_32": hi["headline_rows_per_sec"],
        "headline_scaling_efficiency": round(eff_head, 3),
        "image_sec_8": lo["image_pipeline_sec"],
        "image_sec_32": hi["image_pipeline_sec"],
        "image_rows_per_sec_8": lo["image_rows_per_sec"],
        "image_rows_per_sec_32": hi["image_rows_per_sec"],
        "image_scaling_efficiency": round(eff_img, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
