"""Engine-native pipeline over the image+caption table (BASELINE.json
input_hint): phash → (x, y) cell decode, candidate spatial join against
ref_tiles, scored best-tile matching, multi-resolution tile assignment, and
per-tile aggregation — with checkpointed, resumable partitioned outputs.

Stage map to the reference lifecycle (SURVEY.md §3.2):
  decode_cells      ≙ geojson/geoprox key derivation (M4) — phash de-interleave
  candidate join    ≙ `shst match` candidate generation (T1/J4)
  best-tile choose  ≙ chooseShstMatchesForShape argmax (per-probe, map-side)
  tile assignment   ≙ geoprox bucketing (O1) + conflation-map join rollup
  validate_images   ≙ the runtime invariant assertions (§5) — decode + dims

Scale design: ``bytes`` NEVER enters a shuffle — the spatial stages read only
(image_id, phash) via parquet column pruning; pixel validation is a separate
actor-pool stage that re-reads bytes by shard (SURVEY §7.6-5). Partitions are
pinned phash ranges (parquet row-group pruning at the read); each writes its
own output dir + manifest entry, so a killed run resumes without recompute.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray

from ..functions import codecs
from ..functions.cells import morton_cell, morton_decode
from ..stages.util import cached_state, pool_size
from ..state.checkpoint import StageCheckpoint, phash_partitions
from ..state.grid_index import GridIndex

CELL_BITS = 6  # cell side = 64 world units


def read_images_meta(images_dir: str, phash_range: tuple[int, int] | None = None):
    """Column-pruned read of the image table WITHOUT bytes (the spatial path).
    ``phash_range`` pushes a row-group-prunable filter into the read."""
    flt = None
    if phash_range is not None:
        lo, hi = phash_range
        flt = pc.field("phash") >= lo
        if hi is not None:
            flt = flt & (pc.field("phash") < hi)
    return ray.data.read_parquet(images_dir, columns=["image_id", "phash"], filter=flt)


def decode_cells_batch(batch: pa.Table) -> pa.Table:
    """phash → (x, y) de-interleave + Morton cell id (vectorized)."""
    ph = batch["phash"].to_numpy(zero_copy_only=False)
    x, y = morton_decode(ph)
    cell = morton_cell(x, y, CELL_BITS).view(np.int64)
    return pa.table(
        {
            "image_id": batch["image_id"],
            "phash": ph,
            "x": x.astype(np.int64),
            "y": y.astype(np.int64),
            "cell_id": cell,
        }
    )


class _MatcherState:
    """Per-worker matcher state: grid index over ref_tiles + payload cols."""

    def __init__(self, t: pa.Table):
        from ..stages.spatial import build_tile_index

        self.index = build_tile_index(t)  # data-adaptive bucket size
        self.cx = t["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.cy = t["cy"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.ref_id = t["ref_id"].to_numpy(zero_copy_only=False)


class _MatcherStateSTR(_MatcherState):
    """Matcher state over the packed STR R-tree (``state/strtree.py``) —
    identical probe results; the right backend when ref-tile extents are
    heavily skewed (see the backend note in ``stages/spatial.py``)."""

    def __init__(self, t: pa.Table):
        super().__init__(t)
        from ..state.strtree import STRtree

        ix = self.index
        self.index = STRtree(ix.tile_id, ix.x0, ix.y0, ix.x1, ix.y1)


_MATCHER_BACKENDS = {"grid": _MatcherState, "strtree": _MatcherStateSTR}


def match_images(images_dir: str, tiles_ref, phash_range=None, concurrency: int | None = None,
                 backend: str = "grid"):
    """decode cells → candidate join + best-tile choose, one stateless-task
    pass (tile index broadcast once, built once per worker via cached_state).
    Per batch: emit each probe's candidate tiles AND its chosen best tile
    (min squared centroid distance among containing tiles, tie tile_id) —
    the scored-matching step, fully map-side (no shuffle)."""
    state_cls = _MATCHER_BACKENDS[backend]

    def _match(batch: pa.Table) -> pa.Table:
        st: _MatcherState = cached_state(tiles_ref, state_cls)
        px = batch["x"].to_numpy(zero_copy_only=False)
        py = batch["y"].to_numpy(zero_copy_only=False)
        pi, ti = st.index.query_points(px, py)
        d2 = (px[pi] - st.cx[ti]) ** 2 + (py[pi] - st.cy[ti]) ** 2
        # best (d2, tile_id) per probe via lexsort + first-occurrence
        tile_ids = st.index.tile_id[ti]
        order = np.lexsort((tile_ids, d2, pi))
        pi_s, ti_s, d2_s = pi[order], tile_ids[order], d2[order]
        first = np.ones(len(pi_s), dtype=bool)
        first[1:] = pi_s[1:] != pi_s[:-1]
        return pa.table(
            {
                "image_id": batch["image_id"].take(pa.array(pi_s)),
                "cell_id": batch["cell_id"].take(pa.array(pi_s)),
                "tile_id": ti_s,
                "ref_id": st.ref_id[np.asarray(ti)[order]],
                "dist2": d2_s,
                "is_best": first,
            }
        )

    ds = read_images_meta(images_dir, phash_range)
    ds = ds.map_batches(decode_cells_batch, batch_format="pyarrow", batch_size=8192)
    return ds.map_batches(_match, batch_format="pyarrow", batch_size=8192)


class _Validator:
    """Payload validation batch fn: decode every image payload, check dims;
    lossy formats additionally round-trip re-encode to confirm the stub codec
    holds the >=40dB invariant. Stateless (no model/index), so it runs as
    elastic tasks, not an actor pool. Emits (image_id, ok, err)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        fmts = batch["fmt"].to_pylist()
        ok = np.ones(len(ids), dtype=bool)
        errs = []
        for i in range(len(ids)):
            try:
                img = codecs.decode(blobs[i], fmts[i])
                if img.shape != (hs[i], ws[i], 3):
                    raise ValueError(f"dims {img.shape} != ({hs[i]},{ws[i]},3)")
                if fmts[i] not in codecs.LOSSLESS:
                    if fmts[i] == "jfif":  # real JPEG: archival-quality RT
                        rt = codecs.decode(
                            codecs.encode_jfif(img, quality=100), "jfif")
                    else:
                        rt = codecs.decode(codecs.encode(img, fmts[i]),
                                           fmts[i])
                    if codecs.psnr(img, rt) < 40.0:
                        raise ValueError("lossy round trip below 40dB")
                errs.append("")
            except Exception as e:  # poison-row quarantine, not job abort
                ok[i] = False
                errs.append(f"{type(e).__name__}: {e}")
        return pa.table(
            {"image_id": batch["image_id"], "ok": ok, "err": pa.array(errs, type=pa.string())}
        )


def validate_images(images_dir: str, concurrency: int | None = None):
    """Payload validation pass — the only stage that touches ``bytes``.

    The binary payloads must NOT transit the object store: Ray 2.49 does not
    fuse ReadParquet with map_batches, so a plain read->validate plan ships
    every image blob through plasma (measured ~70% kernel time, 10x
    slowdown). Instead the work units are (file, row_group) descriptors and
    each task reads + decodes its shard locally — bytes live only inside the
    task; the output is the tiny (image_id, ok, err) table. Same structure a
    custom Datasource read would have."""
    import glob as _glob

    import pyarrow.parquet as _pq

    units = []
    for f in sorted(_glob.glob(f"{images_dir}/*.parquet")):
        n_rg = _pq.ParquetFile(f).metadata.num_row_groups
        units.extend({"path": f, "rg": g} for g in range(n_rg))
    ds = ray.data.from_items(units)
    validator = _Validator()

    def _validate_shard(batch: pa.Table) -> pa.Table:
        outs = []
        for path, rg in zip(batch["path"].to_pylist(), batch["rg"].to_pylist()):
            tab = _pq.ParquetFile(path).read_row_group(
                rg, columns=["image_id", "bytes", "w", "h", "fmt"]
            )
            outs.append(validator(tab))
        return pa.concat_tables(outs)

    return ds.map_batches(_validate_shard, batch_format="pyarrow", batch_size=1)


def featurize_images(images_dir: str):
    """Per-image feature extraction (exact channel sums + aHash) with the
    same shard-local byte handling as :func:`validate_images`: work units are
    (file, row_group) descriptors; each task reads + decodes its shard
    locally, so the binary payloads never transit the object store. Output
    rows are the small typed feature table."""
    import glob as _glob

    import pyarrow.parquet as _pq

    from ..stages.media import ImageFeaturizer

    units = []
    for f in sorted(_glob.glob(f"{images_dir}/*.parquet")):
        n_rg = _pq.ParquetFile(f).metadata.num_row_groups
        units.extend({"path": f, "rg": g} for g in range(n_rg))
    featurizer = ImageFeaturizer()

    def _featurize_shard(batch: pa.Table) -> pa.Table:
        outs = []
        for path, rg in zip(batch["path"].to_pylist(), batch["rg"].to_pylist()):
            tab = _pq.ParquetFile(path).read_row_group(
                rg, columns=["image_id", "bytes", "fmt"])
            outs.append(featurizer(tab))
        return pa.concat_tables(outs)

    return ray.data.from_items(units).map_batches(
        _featurize_shard, batch_format="pyarrow", batch_size=1)


def shard_partitions(images_dir: str, n_partitions: int) -> list[tuple[str, list[str]]]:
    """Input-shard partitioning: the sorted file list chunked into
    ``n_partitions`` contiguous groups — "one output directory per input
    shard". No redundant scans (each partition reads exactly its files; a
    phash-RANGE partition over spatially-unsorted input re-reads every row
    group per partition). Deterministic: file order is lexicographic and the
    grouping depends only on (file list, n_partitions), which the manifest
    pins for resume."""
    import glob

    files = sorted(glob.glob(f"{images_dir}/*.parquet"))
    n = max(1, min(n_partitions, len(files)))
    per = (len(files) + n - 1) // n
    return [
        (f"{i:04d}", files[i * per : (i + 1) * per])
        for i in range((len(files) + per - 1) // per)
    ]


def neardup_images(images_dir: str, max_hamming: int = 3,
                   band_member_cap: int = 4096):
    """phash Hamming near-duplicate image pairs — the dedup-before-training
    stage a 10^12-image corpus runs first. Column-pruned read of
    (image_id, phash) only (bytes never leave storage); the band shuffle
    moves 4 small rows per image (see ``dedup.phash_neardup_pairs``; with
    max_hamming=3 banding recall is pigeonhole-exact UNLESS a band bucket
    exceeds ``band_member_cap``). This corpus's Morton-derived phash only
    occupies the low 32 bits, so the two upper bands are degenerate (one
    bucket holding everything) — the cap bounds that bucket's quadratic
    verify and every capped drop is logged; a well-distributed perceptual
    hash never concentrates a 16-bit band like this."""
    from ..stages.dedup import phash_neardup_pairs

    src = ray.data.read_parquet(images_dir, columns=["image_id", "phash"])
    return phash_neardup_pairs(src, phash_col="phash", id_col="image_id",
                               max_hamming=max_hamming,
                               band_member_cap=band_member_cap)


def run_pipeline(images_dir: str, ref_tiles_path: str, out_dir: str,
                 n_partitions: int = 8, concurrency: int | None = None,
                 validate: bool = False, partition_by: str = "shard",
                 neardup: bool = False, features: bool = False,
                 index_backend: str = "grid") -> dict:
    """Checkpointed end-to-end run: per partition, write ``matches/part-K``
    (all candidate pairs + best flags); then global tile_stats + cell_stats
    from the committed partitions. Returns metrics.

    ``partition_by``: "shard" (default — input-file groups; no redundant
    scans) or "phash" (key ranges; right when the table is laid out /
    clustered by phash so row-group stats prune, the layout a 100 TB
    deployment would use).

    Resumable: completed partitions are skipped via the manifest; outputs are
    deterministic (content-derived ordering, SURVEY §7.6-1/7)."""
    import pyarrow.parquet as pq

    tiles_ref = ray.put(pq.read_table(ref_tiles_path))
    ck = StageCheckpoint(f"{out_dir}/matches", "matches",
                         lineage={"images": images_dir, "ref_tiles": ref_tiles_path,
                                  "cell_bits": CELL_BITS, "n_partitions": n_partitions,
                                  "partition_by": partition_by,
                                  "index_backend": index_backend})

    def _write(tmp_dir: str, src, phash_range) -> int:
        ds = match_images(src, tiles_ref, phash_range, concurrency,
                          backend=index_backend)
        # Local (per-block) canonical ordering instead of a global sort: the
        # row MULTISET per partition is deterministic (content-derived), and
        # parity/resume checks compare canonically sorted content — so the
        # all-to-all sort shuffle buys nothing but wall time. Each written
        # block is internally ordered by (image_id, tile_id).
        ds = ds.map_batches(
            lambda t: t.sort_by([("image_id", "ascending"), ("tile_id", "ascending")]),
            batch_format="pyarrow",
        )
        ds.write_parquet(tmp_dir)
        # row count from the written files' parquet footers — no re-execution
        import glob
        import pyarrow.parquet as _pq

        return sum(
            _pq.ParquetFile(f).metadata.num_rows for f in glob.glob(f"{tmp_dir}/*.parquet")
        )

    if partition_by == "shard":
        jobs = [(key, files, None) for key, files in shard_partitions(images_dir, n_partitions)]
    else:
        jobs = [(key, images_dir, (lo, hi)) for key, lo, hi in phash_partitions(n_partitions)]

    # Partitions run CONCURRENTLY (thread per partition; Ray Data executions
    # share the cluster with backpressure) — a sequential partition loop pays
    # per-execution spinup serially and wrecks scaling. Checkpoint manifest
    # updates are thread-safe (StageCheckpoint holds a lock).
    from concurrent.futures import ThreadPoolExecutor

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # concurrent partition jobs amortize per-execution spinup, but more
    # in-flight executions than ~cpus/2 just thrash the scheduler
    workers = max(1, min(len(jobs), 8, cpus // 2))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        results = list(
            pool.map(
                lambda j: ck.run_partition(j[0], lambda tmp: _write(tmp, j[1], j[2])),
                jobs,
            )
        )

    # global rollups over the committed matches (aggregate shuffle; small)
    import glob

    # skip 0-row files: an empty streamed partition can emit a schemaless file
    part_files = sorted(
        f
        for r in results
        for f in glob.glob(f"{ck.part_dir(r.key)}/*.parquet")
        if pq.ParquetFile(f).metadata.num_rows > 0
    )
    if not part_files:
        return {"partitions": [(r.key, r.rows, r.skipped) for r in results], "match_rows": 0}
    # column-pruned reads (int columns only — never re-decode the string
    # payload columns); the two rollups run concurrently
    from ..stages.relational import partial_groupby_sum

    def _tile_stats():
        best = ray.data.read_parquet(part_files, columns=["tile_id", "is_best"]).map_batches(
            lambda t: t.filter(t["is_best"]).select(["tile_id"]), batch_format="pyarrow"
        )
        partial_groupby_sum(best, ["tile_id"], [], count_as="n_images").write_parquet(
            f"{out_dir}/tile_stats"
        )

    def _cell_stats():
        cells = ray.data.read_parquet(part_files, columns=["cell_id"])
        partial_groupby_sum(cells, ["cell_id"], [], count_as="n_pairs").write_parquet(
            f"{out_dir}/cell_stats"
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(pool.map(lambda f: f(), [_tile_stats, _cell_stats]))
    metrics = {
        "partitions": [(r.key, r.rows, r.skipped) for r in results],
        "match_rows": sum(r.rows for r in results),
    }
    if neardup:
        # near-dup pair report (dedup-before-processing stage)
        neardup_images(images_dir).write_parquet(f"{out_dir}/neardup_pairs")
        import glob as _glob

        metrics["neardup_pairs"] = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in _glob.glob(f"{out_dir}/neardup_pairs/*.parquet")
        )
    if features:
        # per-image feature layer (channel sums + aHash) — shard-local bytes
        featurize_images(images_dir).write_parquet(f"{out_dir}/features")
        import glob as _glob

        metrics["feature_rows"] = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in _glob.glob(f"{out_dir}/features/*.parquet")
        )
    if validate:
        # payload validation pass (the per-row invariant: decode + dims +
        # lossy round-trip >= 40dB) — quarantined failures land in errors/
        v = validate_images(images_dir, concurrency)
        bad = v.map_batches(
            lambda t: t.filter(pc.invert(t["ok"])), batch_format="pyarrow"
        )
        bad.write_parquet(f"{out_dir}/errors")
        import glob as _glob

        metrics["invalid_rows"] = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in _glob.glob(f"{out_dir}/errors/*.parquet")
        )
    return metrics
