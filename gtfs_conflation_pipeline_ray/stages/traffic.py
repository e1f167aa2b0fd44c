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


def segments_from_events(points_ds, est_rows: int | None = None):
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

    return bucketed_groups(points_ds, ["user_id"], _final, est_rows=est_rows)


def trip_traversals(events_ds, est_rows: int | None = None):
    """TripTracker stop→segment FIFO matching — ≙ T6
    (``/root/reference/src/daos/GtfsScheduledTrafficDAO/TripTracker.js:22-320``):
    each user's 'signup' events are the trip's STOPS (ordered by ts,
    event_id); the user's full event polyline provides the shape SEGMENTS
    (segment s spans points s..s+1, 1-based). Each stop snaps to the nearest
    segment start (tie → smaller index) under the FIFO no-backtracking
    constraint (running max over stop order — segments are only ever popped,
    never revisited). Output one traversal per consecutive stop pair:
    (user_id, stop_seq, departure_seg_idx, arrival_seg_idx, departure_ts_s,
    arrival_ts_s) — the exact row shape J7's range join consumes
    (``GtfsConflationScheduleJoinDAO/loaders.js:151-208``).

    Input columns: user_id, ts, event_id, ex, ey, event_type."""

    cols_out = ["user_id", "stop_seq", "departure_seg_idx", "arrival_seg_idx",
                "departure_ts_s", "arrival_ts_s"]

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy().astype(np.int64)
        ts = d["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ex = d["ex"].to_numpy().astype(np.int64)
        ey = d["ey"].to_numpy().astype(np.int64)
        is_stop = (d["event_type"].to_numpy() == "signup")
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.append(starts[1:], len(d))
        rows = {c: [] for c in cols_out}
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue  # no segments -> stops unmatchable (dropped)
            sidx = np.flatnonzero(is_stop[s:e])
            if len(sidx) < 2:
                continue  # need two stops for a traversal
            # segment starts = first n-1 points; snap each stop
            gx, gy = ex[s : e - 1], ey[s : e - 1]
            sx, sy = ex[s + sidx], ey[s + sidx]
            d2 = (sx[:, None] - gx[None, :]) ** 2 + (sy[:, None] - gy[None, :]) ** 2
            naive = np.argmin(d2, axis=1) + 1  # first min = smallest seg idx
            mono = np.maximum.accumulate(naive)
            st_ts = ts[s + sidx] // 1_000_000
            rows["user_id"].append(np.full(len(sidx) - 1, uid[s], dtype=np.int64))
            rows["stop_seq"].append(np.arange(1, len(sidx), dtype=np.int64))
            rows["departure_seg_idx"].append(mono[:-1])
            rows["arrival_seg_idx"].append(mono[1:])
            rows["departure_ts_s"].append(st_ts[:-1])
            rows["arrival_ts_s"].append(st_ts[1:])
        return pd.DataFrame(
            {c: (np.concatenate(v) if v else np.array([], dtype=np.int64))
             for c, v in rows.items()}
        )

    return bucketed_groups(events_ds, ["user_id"], _final, est_rows=est_rows)


def trip_seg_traffic(events_ds, est_rows: int | None = None):
    """A2+J7+A3 chain over the traversals: range-join each traversal onto its
    segment index interval [departure, arrival), distribute its travel time
    over those segments proportionally to integer segment length (exact
    BIGINT arithmetic, ≙ the len/speed weight distribution in
    ``GtfsConflationScheduleJoinDAO/loaders.js:212-263``), then roll up
    SUM(travel time) per (user_id, seg_idx) — the reference's final
    ``SUM GROUP BY`` (``loaders.js:265-285``)."""

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy().astype(np.int64)
        ts = d["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ex = d["ex"].to_numpy().astype(np.int64)
        ey = d["ey"].to_numpy().astype(np.int64)
        is_stop = (d["event_type"].to_numpy() == "signup")
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.append(starts[1:], len(d))
        out_u, out_s, out_tt = [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            sidx = np.flatnonzero(is_stop[s:e])
            if len(sidx) < 2:
                continue
            gx, gy = ex[s : e - 1], ey[s : e - 1]
            dx = ex[s + 1 : e] - gx
            dy = ey[s + 1 : e] - gy
            len_c = np.floor(np.sqrt((dx * dx + dy * dy).astype(np.float64)) * 100 + 0.5).astype(np.int64)
            cum = np.concatenate(([0], np.cumsum(len_c)))
            sx, sy = ex[s + sidx], ey[s + sidx]
            d2 = (sx[:, None] - gx[None, :]) ** 2 + (sy[:, None] - gy[None, :]) ** 2
            mono = np.maximum.accumulate(np.argmin(d2, axis=1) + 1)
            tt_ms = (ts[s + sidx][1:] - ts[s + sidx][:-1]) // 1000
            for k in range(len(sidx) - 1):
                dep, arr = int(mono[k]), int(mono[k + 1])
                if arr <= dep:
                    continue
                segs = np.arange(dep, arr, dtype=np.int64)
                lc = len_c[dep - 1 : arr - 1]
                tot = cum[arr - 1] - cum[dep - 1]
                share = (tt_ms[k] * lc) // tot if tot > 0 else np.zeros(len(lc), np.int64)
                out_u.append(np.full(len(segs), uid[s], dtype=np.int64))
                out_s.append(segs)
                out_tt.append(share)
        if not out_u:
            return pd.DataFrame({"user_id": np.array([], np.int64),
                                 "seg_idx": np.array([], np.int64),
                                 "tt_ms": np.array([], np.int64),
                                 "n_trav": np.array([], np.int64)})
        df = pd.DataFrame({"user_id": np.concatenate(out_u),
                           "seg_idx": np.concatenate(out_s),
                           "tt_ms": np.concatenate(out_tt)})
        out = df.groupby(["user_id", "seg_idx"], as_index=False, sort=False).agg(
            tt_ms=("tt_ms", "sum"), n_trav=("tt_ms", "size"))
        out["n_trav"] = out["n_trav"].astype(np.int64)
        return out

    return bucketed_groups(events_ds, ["user_id"], _final, est_rows=est_rows)


def traffic_rollup(points_ds, tiles_ref, est_rows: int | None = None):
    """Full chain: segments -> best containing tile of the segment start
    (candidate join + per-point argmin refine) -> (tile_id, epoch5m)
    aggregate of segment count + total travel time."""
    from .spatial import best_tile_join

    segs = segments_from_events(points_ds, est_rows=est_rows)
    best = best_tile_join(segs, tiles_ref, "ex", "ey",
                          ["user_id", "event_id", "epoch5m", "tt_ms"])
    return partial_groupby_sum(best, ["tile_id", "epoch5m"], ["tt_ms"], count_as="n_segs")
