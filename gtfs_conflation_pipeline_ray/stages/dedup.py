"""Deduplication stages: exact (content-hash shuffle + per-group keep-rule),
MinHash+LSH near-dup, SimHash, n-gram Jaccard verification.

Exact dedup ≙ the reference's ``UNIQUE + INSERT OR IGNORE`` content-tuple
dedup (D2, ``/root/reference/src/daos/GtfsOsmNetworkDAO/loaders.js:39-49``):
hash-partition by the content key, keep the deterministic first per group.
Near-dup (MinHash/LSH, SimHash) are the scale-path additions: shingle →
signature per batch, explode to (band, band_hash) rows, groupby bands for
candidates, verify with signature agreement — the canonical
shuffle-by-band pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import text as tx
from .util import pool_size


def exact_dedup_groups(ds, hash_col: str, id_col: str):
    """Per content-hash: deterministic keeper (min id) + duplicate count.
    Returns (hash_col, keep_<id_col>, dup_count)."""

    def _keep(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                hash_col: [g[hash_col].iloc[0]],
                f"keep_{id_col}": [np.int64(g[id_col].min())],
                "dup_count": [np.int64(len(g))],
            }
        )

    return ds.groupby(hash_col).map_groups(_keep, batch_format="pandas")


def minhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, shingle_k: int = 3,
                       concurrency: int | None = None):
    """Per-doc MinHash signature as ``num_perm`` int64 columns ``mh{i}``
    (flat columns instead of a list column keep downstream band explosion
    zero-copy). Permutation params are built once per actor."""

    class _Sig:
        def __init__(self):
            self.a, self.b = tx.minhash_params(num_perm)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch[text_col].to_pylist()
            sigs = np.empty((len(texts), num_perm), dtype=np.uint64)
            for i, t in enumerate(texts):
                sigs[i] = tx.minhash_signature(tx.shingle_hashes(t, shingle_k), self.a, self.b)
            cols = {id_col: batch[id_col]}
            s64 = sigs.view(np.int64)
            for j in range(num_perm):
                cols[f"mh{j}"] = s64[:, j].copy()
            return pa.table(cols)

    return ds.map_batches(_Sig, batch_format="pyarrow", batch_size=2048,
                          concurrency=pool_size(concurrency))


def lsh_candidate_pairs(sig_ds, id_col: str = "doc_id", num_perm: int = 64,
                        bands: int = 16):
    """MinHash-LSH: fold each signature into ``bands`` band-hashes, explode to
    (band_id, band_hash, id) rows, groupby band bucket → emit candidate pairs
    (a < b). The groupby is the only shuffle and moves just
    (band_id, band_hash, id) triples — never the documents."""
    rows_per_band = num_perm // bands

    def _bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig = np.stack(
            [batch[f"mh{j}"].to_numpy(zero_copy_only=False) for j in range(num_perm)], axis=1
        ).astype(np.uint64)
        folded = np.empty((n, bands), dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        for b in range(bands):
            h = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
            for r in range(rows_per_band):
                h = (h ^ sig[:, b * rows_per_band + r]) * prime
            folded[:, b] = h
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "band_id": np.repeat(np.arange(bands, dtype=np.int64), n),
                "band_hash": folded.T.reshape(-1).view(np.int64),
                id_col: np.tile(ids, bands),
            }
        )

    exploded = sig_ds.map_batches(_bands, batch_format="pyarrow", batch_size=8192)

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id" if id_col == "doc_id" else id_col].unique().astype(np.int64))
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ii], "doc_b": ids[jj]})

    pairs = exploded.groupby(["band_id", "band_hash"]).map_groups(_pairs, batch_format="pandas")
    # distinct pairs across bands
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def simhash(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, simhash) — 64-bit SimHash of word-hash features."""

    def _sh(batch: pa.Table) -> pa.Table:
        out = np.array(
            [tx.simhash64(tx.word_hashes(t)) for t in batch[text_col].to_pylist()],
            dtype=np.uint64,
        ).view(np.int64)
        return pa.table({id_col: batch[id_col], "simhash": out})

    return ds.map_batches(_sh, batch_format="pyarrow", batch_size=4096)
