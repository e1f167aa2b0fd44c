"""Text-analysis stages over the `documents` table: token stats, quality
ratios, language ID, fingerprints. All are stateless-per-row batch transforms;
the language-ID profile set is compiled once per actor (stateful stage).

These are the large-scale-training-data operators the BASELINE grades as
first-class alongside the reference parity set.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import text as tx
from .util import pool_size


def token_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_tokens, n_chars) — vectorized per batch."""

    def _stats(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": tx.token_counts(texts),
                "n_chars": np.fromiter((len(t) for t in texts), np.int64, len(texts)),
            }
        )

    return ds.map_batches(_stats, batch_format="pyarrow", batch_size=8192)


def quality_scores(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_chars, alpha_ratio, digit_ratio) — ratios are exact int/int
    double divisions (bit-identical to the SQL oracle)."""

    def _q(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        c = tx.quality_counts(texts)
        nc = np.maximum(c["n_chars"], 1).astype(np.float64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_chars": c["n_chars"],
                "alpha_ratio": c["n_alpha"] / nc,
                "digit_ratio": c["n_digit"] / nc,
            }
        )

    return ds.map_batches(_q, batch_format="pyarrow", batch_size=8192)


def lang_id(ds, text_col: str = "text", id_col: str = "doc_id", concurrency: int | None = None):
    """(doc_id, lang_pred) — stateless tasks; the language profiles are
    module-level constants (compiled at import, once per worker process)."""

    def _lang(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.table(
            {
                id_col: batch[id_col],
                "lang_pred": pa.array(list(tx.lang_id(texts)), type=pa.string()),
            }
        )

    return ds.map_batches(_lang, batch_format="pyarrow", batch_size=4096)


def content_hash(ds, text_col: str = "text", out_col: str = "text_hash"):
    """MD5 hex digest of the utf-8 text — matches DuckDB ``md5(text)``."""

    def _h(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[text_col].to_pylist()]
        return batch.append_column(out_col, pa.array(hs, type=pa.string()))

    return ds.map_batches(_h, batch_format="pyarrow", batch_size=8192)


def fingerprints(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, fp) winnowing document fingerprint (int64 view of uint64)."""

    def _fp(batch: pa.Table) -> pa.Table:
        fps = np.array(
            [tx.winnow_fingerprint(t) for t in batch[text_col].to_pylist()], dtype=np.uint64
        ).view(np.int64)
        return pa.table({id_col: batch[id_col], "fp": fps})

    return ds.map_batches(_fp, batch_format="pyarrow", batch_size=4096)
