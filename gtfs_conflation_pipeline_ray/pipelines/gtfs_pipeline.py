"""End-to-end GTFS feed conflation — the reference's primary user journey as
ONE checkpointed Ray Data pipeline:

    gtfs.zip → shape points (quantized int grid) → candidate spatial match →
    Viterbi tile choose → path decomposition → per-trip stop fitting →
    layered parquet outputs + manifest

Reference lifecycle parity (SURVEY.md §3.2): raw_gtfs_into_sqlite (S1/S2) →
gtfs_as_geojson point derivation (M1/M2/M3) → shst matching (T1/J4) →
chooseShstMatches (J6, Viterbi) → path decomposition
(``createPathLineStrings.js``) → snapGtfsStopsSequenceToGtfsShape (T6-style
greedy monotonic fit) → per-stage table outputs (S3) with sidecar manifest
(S8). Each stage is a streaming Dataset transform; the expensive
match+choose stage is CHECKPOINTED per shape-hash partition so a killed run
resumes without recompute.

Scale notes: the tile side is broadcast once (`ray.put`) and indexed per
worker; shape/stop rows co-shuffle by shape-key bucket for the per-shape
kernels (no driver-side grouping); stop fitting ships the shape polyline and
the trip's stops into the SAME bucket via a tagged union — no broadcast of
the (potentially huge) shape table.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..sources.io import read_gtfs_zip
from ..stages import choose as chs
from ..stages.relational import bucketed_groups, partial_groupby_sum
from ..stages.segments import seg_len_c
from ..state.checkpoint import StageCheckpoint

WORLD = 65536


def feed_extent(shapes_ds) -> dict:
    """One small aggregate pass: the feed's lat/lon bounding box (≙ the
    reference's feed extent used for its geoprox key normalization)."""
    from ray.data.aggregate import Max, Min

    r = shapes_ds.aggregate(Min("shape_pt_lat"), Max("shape_pt_lat"),
                            Min("shape_pt_lon"), Max("shape_pt_lon"))
    return {
        "min_lat": float(r["min(shape_pt_lat)"]),
        "max_lat": float(r["max(shape_pt_lat)"]),
        "min_lon": float(r["min(shape_pt_lon)"]),
        "max_lon": float(r["max(shape_pt_lon)"]),
    }


def _quantizer(extent: dict):
    """Affine lat/lon → integer world-grid quantizer (M3: coordinate
    rounding onto the engine's exact int grid)."""
    dlat = max(extent["max_lat"] - extent["min_lat"], 1e-9)
    dlon = max(extent["max_lon"] - extent["min_lon"], 1e-9)

    def _q(lat: np.ndarray, lon: np.ndarray):
        y = np.floor((lat - extent["min_lat"]) / dlat * (WORLD - 1)).astype(np.int64)
        x = np.floor((lon - extent["min_lon"]) / dlon * (WORLD - 1)).astype(np.int64)
        return np.clip(x, 0, WORLD - 1), np.clip(y, 0, WORLD - 1)

    return _q


def _shape_keys(ids: list[str]) -> np.ndarray:
    """Deterministic int64 shape key from the shape_id string (FNV-1a) — no
    driver-side id map, shard-order independent."""
    from ..functions.text import fnv1a64_batch

    return fnv1a64_batch(ids).view(np.int64)


def shape_points(shapes_ds, extent: dict, n_partitions: int):
    """shapes.txt rows → (shape_key, shape_id, gi, x, y, part)."""
    q = _quantizer(extent)

    def _pts(batch: pa.Table) -> pa.Table:
        ids = batch["shape_id"].to_pylist()
        key = _shape_keys([str(s) for s in ids])
        lat = batch["shape_pt_lat"].to_numpy(zero_copy_only=False).astype(np.float64)
        lon = batch["shape_pt_lon"].to_numpy(zero_copy_only=False).astype(np.float64)
        x, y = q(lat, lon)
        return pa.table(
            {
                "shape_key": key,
                "shape_id": pa.array([str(s) for s in ids], type=pa.string()),
                "gi": batch["shape_pt_sequence"].to_numpy(zero_copy_only=False).astype(np.int64),
                "x": x,
                "y": y,
                "part": (key % np.int64(n_partitions) + n_partitions) % n_partitions,
            }
        )

    return shapes_ds.map_batches(_pts, batch_format="pyarrow", batch_size=8192)


def decompose_paths(chosen_ds, est_rows: int | None = None):
    """Chosen (shape_key, gi, tile_id) chains → path/edge decomposition
    (maximal non-gap runs = paths, equal-tile runs = edges; ≙ the reference's
    path decomposition over chosen matches)."""

    def _decomp(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in g.groupby("shape_key", sort=False):
            d = grp.sort_values("gi", kind="mergesort")
            tiles = d["tile_id"].to_numpy()
            gis = d["gi"].to_numpy()
            path_idx = -1
            edge_idx = 0
            prev_tile = None
            in_path = False
            for t, gi in zip(tiles, gis):
                if t < 0:
                    in_path = False
                    prev_tile = None
                    continue
                if not in_path:
                    path_idx += 1
                    edge_idx = 0
                    in_path = True
                    prev_tile = None
                if prev_tile is not None and t != prev_tile:
                    edge_idx += 1
                if prev_tile is None or t != prev_tile:
                    rows.append({"shape_key": key, "path_index": path_idx,
                                 "edge_index": edge_idx, "tile_id": t,
                                 "seq_start": gi, "seq_end": gi})
                else:
                    rows[-1]["seq_end"] = gi
                prev_tile = t
        cols = ["shape_key", "path_index", "edge_index", "tile_id",
                "seq_start", "seq_end"]
        if not rows:
            return pd.DataFrame({c: np.array([], dtype=np.int64) for c in cols})
        return pd.DataFrame(rows)[cols]

    return bucketed_groups(chosen_ds, ["shape_key"], _decomp, est_rows=est_rows)


def fit_trip_stops(shape_pts_ds, stop_pts_ds, est_rows: int | None = None,
                   method: str = "greedy"):
    """Monotonic stop→shape fitting per trip (≙
    ``snapGtfsStopsSequenceToGtfsShape.js``). Two fidelity levels:

    - ``method="greedy"`` (default): each stop snaps to the exact
      integer-squared-distance-closest shape VERTEX at or after the previous
      stop's vertex (integer-exact; the ``segments.stop_fit`` rule).
    - ``method="dp"``: the reference's least-squares DP — minimize TOTAL
      squared segment-projection deviation subject to monotone along-order
      (``geom.fit_points_monotonic``, the global optimum the reference's
      O(P·S²) DP computes; snap_gi then reports the chosen segment's left
      vertex, dev_sq/along_c the projection values floored to ints).

    Shape rows and trip-stop rows co-shuffle into the same shape-key bucket
    via a tagged union — no shape-table broadcast."""
    if method not in ("greedy", "dp"):
        raise ValueError(f"unknown fit method {method!r}")

    def _tag(kind: int):
        def _f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "shape_key": batch["shape_key"],
                    "kind": np.full(n, kind, dtype=np.int8),
                    "trip_id": batch["trip_id"] if kind == 1
                    else pa.array([""] * n, type=pa.string()),
                    "gi": batch["gi"],
                    "x": batch["x"],
                    "y": batch["y"],
                }
            )
        return _f

    tagged = shape_pts_ds.map_batches(_tag(0), batch_format="pyarrow").union(
        stop_pts_ds.map_batches(_tag(1), batch_format="pyarrow"))

    def _fit(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, grp in g.groupby("shape_key", sort=False):
            sh = grp[grp["kind"] == 0].sort_values("gi", kind="mergesort")
            if len(sh) < 2:
                continue
            xyi = np.stack([sh["x"].to_numpy(), sh["y"].to_numpy()], axis=1).astype(np.int64)
            cum = np.zeros(len(xyi), dtype=np.int64)
            cum[1:] = np.cumsum(seg_len_c(xyi))
            stops = grp[grp["kind"] == 1]
            for trip, tg in stops.groupby("trip_id", sort=False):
                td = tg.sort_values("gi", kind="mergesort")
                sx = td["x"].to_numpy().astype(np.int64)
                sy = td["y"].to_numpy().astype(np.int64)
                seqs = td["gi"].to_numpy().astype(np.int64)
                if method == "dp":
                    from ..functions import geom

                    pts = np.stack([sx, sy], axis=1).astype(np.float64)
                    d, along = geom.fit_points_monotonic(pts, xyi.astype(np.float64))
                    cl = geom.cum_lengths(xyi.astype(np.float64))
                    seg = np.clip(np.searchsorted(cl, along, side="right") - 1,
                                  0, len(xyi) - 2)
                    for i in range(len(td)):
                        out.append({"trip_id": trip,
                                    "stop_sequence": int(seqs[i]),
                                    "snap_gi": int(seg[i]) + 1,
                                    "dev_sq": int(np.floor(d[i] * d[i] + 0.5)),
                                    "along_c": int(np.floor(along[i] * 100 + 0.5)),
                                    "shape_key": int(key)})
                    continue
                prev = 0
                for i in range(len(td)):
                    d2 = ((xyi[prev:, 0] - sx[i]) ** 2
                          + (xyi[prev:, 1] - sy[i]) ** 2)
                    v = prev + int(np.argmin(d2))  # first min = smallest idx
                    out.append({"trip_id": trip, "stop_sequence": int(seqs[i]),
                                "snap_gi": v + 1, "dev_sq": int(d2[v - prev]),
                                "along_c": int(cum[v]),
                                "shape_key": int(key)})
                    prev = v
        cols = ["trip_id", "stop_sequence", "snap_gi", "dev_sq", "along_c",
                "shape_key"]
        if not out:
            return pd.DataFrame({
                "trip_id": np.array([], dtype=object),
                "stop_sequence": np.array([], dtype=np.int64),
                "snap_gi": np.array([], dtype=np.int64),
                "dev_sq": np.array([], dtype=np.int64),
                "along_c": np.array([], dtype=np.int64),
                "shape_key": np.array([], dtype=np.int64),
            })
        return pd.DataFrame(out)[cols]

    return bucketed_groups(tagged, ["shape_key"], _fit, est_rows=est_rows)


def run_pipeline(zip_path: str, tiles_path: str, out_dir: str,
                 n_partitions: int = 4, extract_dir: str | None = None,
                 stop_fit_method: str = "greedy",
                 choose_method: str = "viterbi") -> dict:
    """Checkpointed end-to-end run. Returns metrics; resumable (completed
    match partitions are skipped via the manifest).

    ``choose_method`` selects the sequential matcher: ``"viterbi"`` (flat
    switch penalty, the reference's chooseShstMatches analog) or ``"hmm"``
    (gap-feasibility transitions, the reference's OSRM .match() recovery
    analog — ``stages.choose.hmm_match``). Recorded in the checkpoint
    lineage so a resume with a different matcher rebuilds."""
    if choose_method not in ("viterbi", "hmm"):
        raise ValueError(f"unknown choose method {choose_method!r}")
    tables = read_gtfs_zip(
        zip_path, ["shapes", "stops", "trips", "stop_times"],
        extract_dir=extract_dir or f"{out_dir}/_feed")
    extent = feed_extent(tables["shapes"])
    tiles_ref = ray.put(pq.read_table(tiles_path))

    # stage A: quantized shape points (one streaming pass, written once).
    # write_parquet is not atomic, so a killed run must not leave a partial
    # directory the next run silently accepts: write to a temp dir, stamp a
    # lineage marker, and os.rename into place — the resume guard then
    # requires BOTH the directory and a marker matching this run's inputs
    # (reusing out_dir with a different zip/extent/partitioning rebuilds).
    pts_dir = f"{out_dir}/shape_points"
    pts_lineage = {"zip": zip_path, "extent": extent,
                   "n_partitions": n_partitions}
    marker = os.path.join(pts_dir, "_LINEAGE.json")

    def _pts_complete() -> bool:
        try:
            with open(marker) as f:
                return json.load(f) == pts_lineage
        except (OSError, ValueError):
            return False

    if not _pts_complete():
        import shutil as _sh
        import uuid as _uuid
        _sh.rmtree(pts_dir, ignore_errors=True)  # drop any partial output
        tmp = f"{pts_dir}.tmp-{os.getpid()}-{_uuid.uuid4().hex[:8]}"
        shape_points(tables["shapes"], extent, n_partitions).write_parquet(tmp)
        with open(os.path.join(tmp, "_LINEAGE.json"), "w") as f:
            json.dump(pts_lineage, f, sort_keys=True)
        os.rename(tmp, pts_dir)  # atomic commit

    # stage B (checkpointed): candidate match + Viterbi choose per partition
    ck = StageCheckpoint(f"{out_dir}/matches", "gtfs_matches",
                         lineage={"zip": zip_path, "tiles": tiles_path,
                                  "extent": extent,
                                  "n_partitions": n_partitions,
                                  "choose_method": choose_method})

    def _write(tmp_dir: str, part: int) -> int:
        src = ray.data.read_parquet(pts_dir, filter=pc.field("part") == part)
        if choose_method == "hmm":
            chosen = chs.hmm_match(src, tiles_ref, "shape_key", "gi", "x", "y")
        else:
            chosen = chs.viterbi_choose(src, tiles_ref, "shape_key", "gi", "x", "y")
        chosen = chosen.map_batches(
            lambda t: t.sort_by([("shape_key", "ascending"), ("gi", "ascending")]),
            batch_format="pyarrow")
        chosen.write_parquet(tmp_dir)
        return sum(pq.ParquetFile(f).metadata.num_rows
                   for f in glob.glob(f"{tmp_dir}/*.parquet"))

    # partitions run CONCURRENTLY (the image pipeline's lesson — a
    # sequential partition loop pays per-execution spinup serially); the
    # manifest is thread-safe
    from concurrent.futures import ThreadPoolExecutor

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    workers = max(1, min(n_partitions, 8, cpus // 2))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        results = list(pool.map(
            lambda p: ck.run_partition(f"{p:04d}", lambda tmp: _write(tmp, p)),
            range(n_partitions)))
    match_files = [f for r in results
                   for f in glob.glob(f"{ck.part_dir(r.key)}/*.parquet")
                   if pq.ParquetFile(f).metadata.num_rows > 0]

    # stages C/D/E are cheap derived rollups, recomputed idempotently from
    # the committed matches each run — clear their dirs so a resume doesn't
    # append duplicate files next to the previous run's output
    import shutil

    for d in ("paths", "stop_fit", "tile_stats"):
        shutil.rmtree(f"{out_dir}/{d}", ignore_errors=True)

    # stage C: path decomposition over the committed chosen chains
    est = sum(r.rows for r in results)
    decompose_paths(ray.data.read_parquet(match_files), est_rows=est
                    ).write_parquet(f"{out_dir}/paths")

    # stage D: per-trip stop fitting (tagged-union co-shuffle by shape key)
    q = _quantizer(extent)

    def _stop_pts(batch: pa.Table) -> pa.Table:
        lat = batch["stop_lat"].to_numpy(zero_copy_only=False).astype(np.float64)
        lon = batch["stop_lon"].to_numpy(zero_copy_only=False).astype(np.float64)
        x, y = q(lat, lon)
        return pa.table(
            {
                "shape_key": _shape_keys([str(s) for s in batch["shape_id"].to_pylist()]),
                "trip_id": batch["trip_id"],
                "gi": batch["stop_sequence"].to_numpy(zero_copy_only=False).astype(np.int64),
                "x": x,
                "y": y,
            }
        )

    trip_shape = tables["trips"].select_columns(["trip_id", "shape_id"])
    st = tables["stop_times"].select_columns(["trip_id", "stop_id", "stop_sequence"])
    stops = tables["stops"].select_columns(["stop_id", "stop_lat", "stop_lon"])
    trip_stops = st.join(trip_shape, "inner", 4, on=("trip_id",), right_on=("trip_id",))
    trip_stops = trip_stops.join(stops, "inner", 4, on=("stop_id",), right_on=("stop_id",))
    stop_pts = trip_stops.map_batches(_stop_pts, batch_format="pyarrow", batch_size=8192)
    shape_pts = ray.data.read_parquet(pts_dir, columns=["shape_key", "gi", "x", "y"])
    fit_trip_stops(shape_pts, stop_pts, est_rows=est,
                   method=stop_fit_method).write_parquet(f"{out_dir}/stop_fit")

    # stage E: per-tile rollup over chosen matches (combiner-first)
    chosen = ray.data.read_parquet(match_files, columns=["tile_id"])
    chosen = chosen.map_batches(
        lambda t: t.filter(pc.field("tile_id") >= 0), batch_format="pyarrow")

    def _cnt(batch: pa.Table) -> pa.Table:
        return batch.append_column("n", pa.array(np.ones(batch.num_rows, np.int64)))

    partial_groupby_sum(chosen.map_batches(_cnt, batch_format="pyarrow"),
                        ["tile_id"], ["n"]).write_parquet(f"{out_dir}/tile_stats")

    def _nrows(d: str) -> int:
        return sum(pq.ParquetFile(f).metadata.num_rows
                   for f in glob.glob(f"{d}/*.parquet"))

    return {
        "extent": extent,
        "partitions": [(r.key, r.rows, r.skipped) for r in results],
        "match_rows": sum(r.rows for r in results),
        "path_edges": _nrows(f"{out_dir}/paths"),
        "stop_fit_rows": _nrows(f"{out_dir}/stop_fit"),
        "tiles_matched": _nrows(f"{out_dir}/tile_stats"),
    }
