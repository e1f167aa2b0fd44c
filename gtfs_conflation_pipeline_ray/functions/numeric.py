"""Numeric helpers shared by the Ray stages and kept bit-identical to the
DuckDB oracle expressions.

Cross-engine exactness policy: money/value aggregates are quantized PER ROW to
integer "cents" with ``floor(x*scale + 0.5)`` — the per-row double arithmetic
is IEEE-identical in numpy and DuckDB, so the int64 sums are exactly equal
regardless of summation order. (A raw double SUM would differ in the last ulps
between engines because reduction order differs.) The reference has the same
concern in miniature: it stringifies every value before insert
(``/root/reference/src/utils/formatRowForSqliteInsert.js:12-15``).
"""

from __future__ import annotations

import numpy as np


def cents(x: np.ndarray, scale: int = 100) -> np.ndarray:
    """floor(x*scale + 0.5) as int64 — matches SQL
    ``CAST(FLOOR(x * scale + 0.5) AS BIGINT)`` bit-for-bit."""
    return np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5).astype(np.int64)


def cents_sql(expr: str, scale: int = 100) -> str:
    return f"CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)"
