"""Traffic/schedule stages — the reference's scheduled-traffic lifecycle
re-expressed over the events log + tile set (SURVEY.md §3.3):

  TripTracker sequential per-trip state (T6,
  ``/root/reference/src/daos/GtfsScheduledTrafficDAO/TripTracker.js:22-320``)
  → per-user ordered event pairs (segments) with travel times;
  interval/range join to the map (J7,
  ``GtfsConflationScheduleJoinDAO/loaders.js:151-208``)
  → best-tile spatial join per segment start;
  travel-time distribution + grouped rollup (A2/A3,
  ``loaders.js:212-285``) → per (tile, epoch) aggregates.

Partitioning: per-user grouping for the sequential step (bucketed, in-group
sort by ts — the ordering the reference got from SQLite ORDER BY), then the
map-side broadcast spatial join, then a partial-aggregated shuffle on
(tile_id, epoch). The trip state never crosses a user boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .relational import bucketed_groups, partial_groupby_sum


def segments_from_events(points_ds):
    """Per-user consecutive event pairs: each row = a traversal segment
    (start point, 5-min epoch of start, travel time to the next event).
    Input columns: user_id, ts, event_id, ex, ey. Output adds
    epoch5m + tt_ms and drops each user's last event (no successor)."""

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy()
        ts = d["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        same_next = np.zeros(len(d), dtype=bool)
        same_next[:-1] = uid[1:] == uid[:-1]
        nxt = np.roll(ts, -1)
        out = d.loc[same_next, ["user_id", "event_id", "ex", "ey"]].copy()
        out["epoch5m"] = (ts[same_next] // 1_000_000) // 300
        out["tt_ms"] = (nxt[same_next] - ts[same_next]) // 1000
        return out

    return bucketed_groups(points_ds, ["user_id"], _final)


def traffic_rollup(points_ds, tiles_ref):
    """Full chain: segments -> best containing tile of the segment start
    (candidate join + per-point argmin refine) -> (tile_id, epoch5m)
    aggregate of segment count + total travel time."""
    from .spatial import best_tile_join

    segs = segments_from_events(points_ds)
    best = best_tile_join(segs, tiles_ref, "ex", "ey",
                          ["user_id", "event_id", "epoch5m", "tt_ms"])
    return partial_groupby_sum(best, ["tile_id", "epoch5m"], ["tt_ms"], count_as="n_segs")
