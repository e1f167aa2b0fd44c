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
    """Per-key session count with a fixed inactivity gap. Group = one key;
    inside the group we sort by ts explicitly (never rely on input order)."""
    gap_us = np.int64(gap_seconds) * 1_000_000

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64))
        n = 1 + int((np.diff(ts) > gap_us).sum()) if len(ts) else 0
        return pd.DataFrame({key: [g[key].iloc[0]], out_col: [np.int64(n)]})

    return ds.groupby(key).map_groups(_sessions, batch_format="pandas")


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


class _IntervalJoiner:
    """Actor-pool callable for the equi+range interval join: broadcast the
    (small) window side sorted by composite (key, start_ts); each probe row
    finds its matching windows — start_ts in (probe_ts - len, probe_ts] within
    the same key — with two vectorized binary searches on the composite code.

    State (sorted composite array + window ids) is built once per actor from
    the `ray.put` ref; probes stream through in Arrow batches.
    """

    def __init__(self, windows_ref, key: str, ts_col: str, window_len_us: int):
        w: pa.Table = ray.get(windows_ref)
        wk = w[key].to_numpy(zero_copy_only=False).astype(np.int64)
        wts = w[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        wid = w["window_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.base = np.int64(wts.min() if len(wts) else 0)
        comp = self._composite(wk, wts)
        order = np.argsort(comp, kind="stable")
        self.comp, self.wid = comp[order], wid[order]
        self.key, self.ts_col = key, ts_col
        self.len_us = np.int64(window_len_us)

    def _composite(self, k: np.ndarray, ts: np.ndarray) -> np.ndarray:
        # clamp keeps out-of-range probe bounds monotonic without overflow
        off = np.clip(ts - self.base, -1, (np.int64(1) << _TS_BITS) - 2) + 1
        return (k << _TS_BITS) | off

    def __call__(self, batch: pa.Table) -> pa.Table:
        pk = batch[self.key].to_numpy(zero_copy_only=False).astype(np.int64)
        pts = batch[self.ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        starts = np.searchsorted(self.comp, self._composite(pk, pts - self.len_us), side="right")
        ends = np.searchsorted(self.comp, self._composite(pk, pts), side="right")
        counts = ends - starts
        pi = np.repeat(np.arange(len(pk), dtype=np.int64), counts)
        wi = _gather_ranges(starts, counts)
        cols = {c: batch[c].take(pa.array(pi)) for c in batch.column_names}
        cols["window_id"] = self.wid[wi]
        return pa.table(cols)


def interval_join(probes, windows_ref, key: str, ts_col: str, window_len_us: int,
                  concurrency: int | None = None):
    """Equi(key) + range(ts in [w.ts, w.ts+len)) join; returns probe rows
    annotated with ``window_id`` (one output row per matching pair). The
    window side must carry a ``window_id`` column."""
    return probes.map_batches(
        _IntervalJoiner,
        fn_constructor_args=(windows_ref, key, ts_col, window_len_us),
        batch_format="pyarrow",
        batch_size=32768,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
