"""CLI pipeline driver — the engine's `ray job submit`-able entry point.

≙ the reference's yargs stage registry (`run` + `src/pipeline_transforms/*`,
SURVEY.md §2.10): every stage/query is addressable by name from one driver,
new stages are added by registering a callable. Usage:

    python run.py list
    python run.py query spatial_tile_stats --sf-dir /root/testdata/sf0.01 --out /tmp/out
    python run.py image-pipeline --images DIR --tiles ref_tiles.parquet --out DIR \
        [--partitions 8] [--validate] [--partition-by shard|phash]

On a cluster: ``ray job submit --working-dir . -- python run.py ...`` — the
script initializes Ray only when no session exists (`ray job submit` provides
one), per the driver contract.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    return ray


def cmd_list(_args) -> int:
    from gtfs_conflation_pipeline_ray.pipelines.queries import ORACLE_SQL, QUERIES

    for name in QUERIES:
        kind = "oracle" if name in ORACLE_SQL else "rows-only"
        print(f"{name:28s} {kind}")
    print(f"\n{len(QUERIES)} queries ({len(ORACLE_SQL)} with exact DuckDB oracles); "
          "plus stages: image-pipeline, media-pipeline")
    return 0


def cmd_query(args) -> int:
    ray = _ensure_ray()
    from gtfs_conflation_pipeline_ray.pipelines.queries import QUERIES

    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; see `python run.py list`", file=sys.stderr)
        return 2
    t0 = time.time()
    res = QUERIES[args.name](args.sf_dir)
    if args.out:
        if isinstance(res, ray.data.Dataset):
            res.write_parquet(args.out)
            n = sum(
                __import__("pyarrow.parquet", fromlist=["ParquetFile"]).ParquetFile(f).metadata.num_rows
                for f in __import__("glob").glob(f"{args.out}/*.parquet")
            )
        else:  # pandas / arrow result
            import pyarrow as pa
            import pyarrow.parquet as pq

            tab = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
            import os

            os.makedirs(args.out, exist_ok=True)
            pq.write_table(tab, f"{args.out}/part-0.parquet")
            n = tab.num_rows
    else:
        n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
    print(json.dumps({"query": args.name, "rows": int(n),
                      "sec": round(time.time() - t0, 3)}))
    return 0


def cmd_image_pipeline(args) -> int:
    _ensure_ray()
    from gtfs_conflation_pipeline_ray.pipelines.image_conflation import run_pipeline

    t0 = time.time()
    metrics = run_pipeline(args.images, args.tiles, args.out,
                           n_partitions=args.partitions, validate=args.validate,
                           partition_by=args.partition_by, neardup=args.neardup,
                           features=args.features,
                           index_backend=args.index_backend)
    out = {"match_rows": metrics.get("match_rows"),
           "partitions": len(metrics.get("partitions", [])),
           "skipped": sum(1 for _, _, sk in metrics.get("partitions", []) if sk),
           "sec": round(time.time() - t0, 3)}
    if "invalid_rows" in metrics:
        out["invalid_rows"] = metrics["invalid_rows"]
    if "neardup_pairs" in metrics:
        out["neardup_pairs"] = metrics["neardup_pairs"]
    if "feature_rows" in metrics:
        out["feature_rows"] = metrics["feature_rows"]
    print(json.dumps(out))
    return 0


def cmd_media_pipeline(args) -> int:
    """Multimodal demo pipeline over deterministic audio/video fixtures:
    audio decode+featurize (+ optional resample to --target-sr), video
    frame-sample features, and the keyframe near-dup pair report."""
    ray = _ensure_ray()
    import os

    import pyarrow.parquet as pq

    from gtfs_conflation_pipeline_ray.sources import fixtures as fx
    from gtfs_conflation_pipeline_ray.stages import media as ms

    t0 = time.time()
    os.makedirs(args.out, exist_ok=True)
    audio_path = f"{args.out}/audio.parquet"
    video_path = f"{args.out}/videos.parquet"
    pq.write_table(fx.audio_table(args.rows), audio_path, row_group_size=1024)
    pq.write_table(fx.videos_table(args.rows), video_path, row_group_size=1024)
    out = {"rows": args.rows}
    feats = ms.audio_features(ray.data.read_parquet(audio_path))
    feats.write_parquet(f"{args.out}/audio_features")
    out["audio_ok"] = int(feats.sum("ok") or 0)
    if args.target_sr:
        receipts = ms.resample_audio_shards([audio_path], args.target_sr,
                                            f"{args.out}/audio_resampled")
        out["resampled"] = int(receipts.sum("rows") or 0)
    frames = ms.sample_frames(ray.data.read_parquet(video_path),
                              every_n=args.every_n)
    frames.write_parquet(f"{args.out}/frame_features")
    out["frames_sampled"] = frames.count()
    nd = ms.video_keyframe_neardup(ray.data.read_parquet(video_path),
                                   every_n=args.every_n)
    nd.write_parquet(f"{args.out}/keyframe_neardup")
    out["neardup_pairs"] = nd.count()
    out["sec"] = round(time.time() - t0, 3)
    print(json.dumps(out))
    return 0


def cmd_gtfs_pipeline(args) -> int:
    """End-to-end GTFS feed conflation: zip -> match -> choose -> paths ->
    stop fit -> layered outputs (the reference's primary user journey)."""
    _ensure_ray()
    from gtfs_conflation_pipeline_ray.pipelines.gtfs_pipeline import run_pipeline

    t0 = time.time()
    m = run_pipeline(args.zip, args.tiles, args.out, n_partitions=args.partitions,
                     stop_fit_method=args.stop_fit)
    print(json.dumps({
        "match_rows": m["match_rows"], "path_edges": m["path_edges"],
        "stop_fit_rows": m["stop_fit_rows"], "tiles_matched": m["tiles_matched"],
        "skipped": sum(1 for _, _, sk in m["partitions"] if sk),
        "sec": round(time.time() - t0, 3),
    }))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="run.py", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries/stages")
    q = sub.add_parser("query", help="run one registry query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None, help="write result parquet here")
    ip = sub.add_parser("image-pipeline", help="checkpointed image conflation run")
    ip.add_argument("--images", required=True)
    ip.add_argument("--tiles", required=True)
    ip.add_argument("--out", required=True)
    ip.add_argument("--partitions", type=int, default=8)
    ip.add_argument("--validate", action="store_true")
    ip.add_argument("--partition-by", choices=["shard", "phash"], default="shard")
    ip.add_argument("--neardup", action="store_true",
                    help="also emit the phash Hamming near-dup pair report")
    ip.add_argument("--features", action="store_true",
                    help="also emit the per-image feature layer (sums + aHash)")
    ip.add_argument("--index-backend", choices=["grid", "strtree"], default="grid",
                    help="per-worker spatial index (strtree for skewed tile extents)")
    mp = sub.add_parser("media-pipeline",
                        help="audio/video multimodal demo over fixtures")
    mp.add_argument("--out", required=True)
    mp.add_argument("--rows", type=int, default=2000)
    mp.add_argument("--every-n", type=int, default=3)
    mp.add_argument("--target-sr", type=int, default=0,
                    help="also resample audio to this rate (0 = skip)")
    gp = sub.add_parser("gtfs-pipeline",
                        help="end-to-end GTFS zip -> conflation outputs")
    gp.add_argument("--zip", required=True)
    gp.add_argument("--tiles", required=True)
    gp.add_argument("--out", required=True)
    gp.add_argument("--partitions", type=int, default=4)
    gp.add_argument("--stop-fit", choices=["greedy", "dp"], default="greedy",
                    help="vertex-greedy (exact ints) or the reference's least-squares DP")
    args = p.parse_args(argv)
    return {"list": cmd_list, "query": cmd_query,
            "image-pipeline": cmd_image_pipeline,
            "media-pipeline": cmd_media_pipeline,
            "gtfs-pipeline": cmd_gtfs_pipeline}[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
