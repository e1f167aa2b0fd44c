"""Stream-shaped operators over the ordered `events` log: tumbling windows,
gap sessionization, interval (range) joins.

Ray Data has no event-time watermarks; the reference has none either
(SURVEY.md §2.9). Stream semantics here = partition by key, sort by ts inside
the group, compute windows with vectorized numpy — exactly how the reference's
TripTracker consumes stop_times ``ORDER BY trip_id, stop_sequence``
(``/root/reference/src/daos/GtfsScheduledTrafficDAO/TripTracker.js:22-320``);
the interval join mirrors J7's
``departure_seg_idx <= gtfs_shape_index < arrival_seg_idx`` range predicate
(``GtfsConflationScheduleJoinDAO/loaders.js:151-208``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..state.grid_index import _gather_ranges
from .util import pool_size


def sessionize(ds, key: str, ts_col: str, gap_seconds: int, out_col: str = "n_sessions"):
    """Per-key session count with a fixed inactivity gap (gaps-and-islands).

    Bucketed-combine pattern (see ``relational``): keys hash into B buckets;
    inside a bucket the whole computation is vectorized — sort by (key, ts),
    a session starts at each key change or gap > threshold. The in-group sort
    is explicit (never relies on input order, SURVEY §2.9)."""
    from .relational import grouped_agg

    gap_us = np.int64(gap_seconds) * 1_000_000

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key, ts_col], kind="mergesort")
        ts = d[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        k = d[key].to_numpy()
        new_key = np.ones(len(d), dtype=bool)
        new_key[1:] = k[1:] != k[:-1]
        gap = np.ones(len(d), dtype=bool)
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        start = new_key | gap
        return (
            pd.DataFrame({key: k, out_col: start.astype(np.int64)})
            .groupby(key, as_index=False, sort=False)[out_col]
            .sum()
        )

    return grouped_agg(ds, [key], _final)


def tumbling_window(ds, ts_col: str, out_ts_col: str = "hour_ts"):
    """Add a string-formatted hour-floor column (vectorized Arrow kernels) for
    downstream grouped aggregation. String output keeps the DuckDB oracle
    comparison timestamp-representation-safe."""
    import pyarrow.compute as pc

    def _floor(batch: pa.Table) -> pa.Table:
        h = pc.strftime(pc.floor_temporal(batch[ts_col], unit="hour"), format="%Y-%m-%d %H:00:00")
        return batch.append_column(out_ts_col, h)

    return ds.map_batches(_floor, batch_format="pyarrow", batch_size=65536)


_TS_BITS = np.int64(42)  # enough for ~139 years of microseconds offsets


class _WindowState:
    """Per-worker interval-join state: windows sorted by composite
    (key, start_ts) for two-binary-search range probes."""

    def __init__(self, w: pa.Table, key: str, ts_col: str):
        wk = w[key].to_numpy(zero_copy_only=False).astype(np.int64)
        wts = w[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        wid = w["window_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.base = np.int64(wts.min() if len(wts) else 0)
        comp = self.composite(wk, wts)
        order = np.argsort(comp, kind="stable")
        self.comp, self.wid = comp[order], wid[order]

    def composite(self, k: np.ndarray, ts: np.ndarray) -> np.ndarray:
        # clamp keeps out-of-range probe bounds monotonic without overflow
        off = np.clip(ts - self.base, -1, (np.int64(1) << _TS_BITS) - 2) + 1
        return (k << _TS_BITS) | off


def interval_join(probes, windows_ref, key: str, ts_col: str, window_len_us: int,
                  concurrency: int | None = None):
    """Equi(key) + range(ts in [w.ts, w.ts+len)) join: each probe row finds
    windows with start_ts in (probe_ts - len, probe_ts] of the same key via
    two vectorized binary searches on a composite (key, ts) code. The window
    side is broadcast once and sorted once per worker (``cached_state``);
    probes stream through stateless Arrow tasks. Returns probe rows annotated
    with ``window_id`` (one output row per matching pair)."""
    from .util import cached_state

    len_us = np.int64(window_len_us)

    def _probe(batch: pa.Table) -> pa.Table:
        st: _WindowState = cached_state(windows_ref, lambda w: _WindowState(w, key, ts_col))
        pk = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        pts = batch[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        starts = np.searchsorted(st.comp, st.composite(pk, pts - len_us), side="right")
        ends = np.searchsorted(st.comp, st.composite(pk, pts), side="right")
        counts = ends - starts
        pi = np.repeat(np.arange(len(pk), dtype=np.int64), counts)
        wi = _gather_ranges(starts, counts)
        cols = {c: batch[c].take(pa.array(pi)) for c in batch.column_names}
        cols["window_id"] = st.wid[wi]
        return pa.table(cols)

    return probes.map_batches(_probe, batch_format="pyarrow", batch_size=32768)
