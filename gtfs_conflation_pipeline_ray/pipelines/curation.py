"""End-to-end LLM TRAINING-DATA CURATION pipeline — the composed,
checkpointed face of the text/dedup operator suite (each piece is
oracle-backed individually in the registry; this wires them the way a
production corpus build does):

  A. FILTER    quality screen (alpha_ratio ≥ 0.5, n_chars ≥ 64) +
               language id == 'en', partitioned by doc bucket
  B. DEDUP     exact content-hash dedup (keep min doc_id), then
               MinHash-LSH near-dup removal (verified pairs; the larger
               id of each pair drops)
  C. PACK      token-sequence packing (``textops.pack_sequences``) into
               fixed-length training sequences

Every stage commits through :class:`state.checkpoint.StageCheckpoint`
(atomic tmp-dir rename + manifest), so a killed run resumes without
recomputing finished partitions — the same contract as
``gtfs_pipeline.run_pipeline`` and ``image_conflation.run_pipeline``.

Scale shape: text shuffles only where the semantics need it (the hash
and band shuffles of stage B); the filter is embarrassingly parallel
over doc buckets; packing's global token axis uses pack_sequences'
chunked prefix-sum broadcast. At 100 TB each stage's partition count
rises with the input; nothing here materializes the corpus."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray

from ..state.checkpoint import StageCheckpoint
from ..stages import dedup, textops


def _read_docs(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def run_curation(sf_dir: str, out_dir: str, *, seq_len: int = 128,
                 n_partitions: int = 4) -> dict:
    """Run the three curation stages under ``out_dir``; returns metrics
    (per-stage row counts + skipped flags, deterministic given inputs)."""
    lineage = {"sf_dir": sf_dir, "seq_len": seq_len,
               "n_partitions": n_partitions, "layout": "file-sharded"}
    metrics: dict = {}
    import time as _time
    _t0 = _time.perf_counter()

    # --- stage A: quality + language filter, INPUT-FILE sharded --------
    # Each checkpoint partition owns a strided subset of the input parquet
    # files (the resumable-output contract: one output dir per input
    # shard), so the corpus is read exactly ONCE across partitions — not
    # n_partitions times through an id-hash filter. A single-file input
    # degenerates to one working partition; at 100 TB the file list is the
    # shard list.
    import glob as _glob

    doc_path = f"{sf_dir}/documents.parquet"
    files = (sorted(_glob.glob(f"{doc_path}/*.parquet"))
             if os.path.isdir(doc_path) else [doc_path])
    ck_a = StageCheckpoint(f"{out_dir}/filtered", "filter", lineage)

    def _write_part(part: int):
        def _write(tmp_dir: str) -> int:
            sel = files[part::n_partitions]
            if not sel:
                return 0

            def _keep(batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0:
                    return batch
                from ..functions import text as tx

                texts = batch["text"].to_pylist()
                c = tx.quality_counts(texts)
                langs = np.array(list(tx.lang_id(texts)), dtype=object)
                nc = np.maximum(c["n_chars"], 1)
                ok = ((c["n_alpha"] * 2 >= nc) & (c["n_chars"] >= 64)
                      & (langs == "en"))
                return batch.filter(pa.array(ok))

            docs = ray.data.read_parquet(sel, columns=["doc_id", "text"])
            kept = docs.map_batches(_keep, batch_format="pyarrow",
                                    batch_size=4096).materialize()
            kept.write_parquet(tmp_dir)
            return kept.count()

        return ck_a.run_partition(str(part), _write)

    # partitions run CONCURRENTLY (thread-submitted Ray Data jobs; the
    # checkpoint's per-partition O_EXCL lock keeps this safe) — serially,
    # each job pays ~1.5s executor spinup, a fixed cost that dominated the
    # 16-CPU scaling leg across 8 partitions
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(4, n_partitions)) as pool:
        results_a = list(pool.map(_write_part, range(n_partitions)))
    kept_total = sum(r.rows for r in results_a)
    skipped_a = sum(int(r.skipped) for r in results_a)
    metrics["filtered_rows"] = kept_total
    metrics["filter_parts_skipped"] = skipped_a
    metrics["filter_wall_s"] = round(_time.perf_counter() - _t0, 2)
    _t0 = _time.perf_counter()

    # --- stage B: exact + near dedup (global) --------------------------
    ck_b = StageCheckpoint(f"{out_dir}/deduped", "dedup", lineage)

    def _write_dedup(tmp_dir: str) -> int:
        kept = ray.data.read_parquet(f"{out_dir}/filtered")
        hashed = textops.content_hash(kept)
        groups = dedup.exact_dedup_groups(hashed, "text_hash", "doc_id")
        # id sets travel as SORTED int64 arrays behind ONE ray.put each:
        # the per-batch membership test is a vectorized np.isin (binary
        # search), not a Python loop — and workers share the object-store
        # copy instead of re-pickling a Python set per task.
        # collect ONLY the keeper ids (23 MB at 3M docs) — pulling the md5
        # string column to the driver measured 26s serial at 3M docs
        keep_ref = ray.put(np.sort(
            groups.select_columns(["keep_doc_id"]).to_pandas()
            ["keep_doc_id"].to_numpy().astype(np.int64)))

        def _only_keepers(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return batch.filter(pa.array(np.isin(ids, ray.get(keep_ref))))

        uniq = kept.map_batches(_only_keepers, batch_format="pyarrow",
                                batch_size=4096).materialize()
        sigs = dedup.minhash_signatures(uniq)
        # size-based plan: the ride-along verify tiles full signatures
        # through the band shuffle (8 KB/doc x 16 bands — 44 GB of spill at
        # 3M docs); past ~200k docs switch to the join-based plan, which
        # moves packed signatures twice total. Bit-identical results.
        n_uniq = int(len(ray.get(keep_ref)))
        if n_uniq > 200_000:
            pairs = dedup.lsh_verified_pairs_joined(sigs,
                                                    jaccard_threshold=0.5,
                                                    est_rows=n_uniq)
        else:
            pairs = dedup.lsh_verified_pairs(sigs, jaccard_threshold=0.5)
        drop_ref = ray.put(np.sort(pairs.to_pandas()["doc_b"]
                                   .to_numpy().astype(np.int64)))

        def _drop_neardups(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return batch.filter(pa.array(~np.isin(ids, ray.get(drop_ref))))

        final = uniq.map_batches(_drop_neardups, batch_format="pyarrow",
                                 batch_size=4096).materialize()
        final.write_parquet(tmp_dir)
        return final.count()

    res_b = ck_b.run_partition("all", _write_dedup)
    metrics["deduped_rows"] = res_b.rows
    metrics["dedup_skipped"] = res_b.skipped
    metrics["dedup_wall_s"] = round(_time.perf_counter() - _t0, 2)
    _t0 = _time.perf_counter()

    # --- stage C: sequence packing -------------------------------------
    ck_c = StageCheckpoint(f"{out_dir}/sequences", "pack", lineage)

    def _write_pack(tmp_dir: str) -> int:
        docs = ray.data.read_parquet(f"{out_dir}/deduped")
        seqs = textops.pack_sequences(docs, seq_len=seq_len,
                                      chunk=256).materialize()
        seqs.write_parquet(tmp_dir)
        return seqs.count()

    res_c = ck_c.run_partition("all", _write_pack)
    metrics["sequence_rows"] = res_c.rows
    metrics["pack_skipped"] = res_c.skipped
    metrics["pack_wall_s"] = round(_time.perf_counter() - _t0, 2)
    return metrics
