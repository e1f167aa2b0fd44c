"""Segment/shape stages: per-shape polyline assembly and the reference's
fit / slice / score kernels run per group.

≙ the reference's `gtfs_network` + scoring lifecycle (SURVEY.md §3.1/§3.2):
shapes are assembled from an ordered point log (M2 sequential assemble,
``/root/reference/src/daos/GeoJsonGtfsDAO/loaders.js:32-83`` — with the
sortedness assumption replaced by an explicit in-group sort), then per-shape
kernels (stop-fit DP, lineSliceAlong, Fréchet scoring, RDP, snap stats) run
inside bucketed groups — whole shape in one group, the partitioning
assumption the sequential kernels rely on (SURVEY §7 build step 4/6/7).

Shapes here derive from the `events` table: each user's ordered event stream
is a polyline in the tile-grid plane (deterministic integer derivation shared
with the SQL oracle in pipelines/queries.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import geom
from .relational import bucketed_groups

# deterministic event -> planar point derivation (int64-exact, SQL-replicable)
EVENT_XY_SQL = """
SELECT user_id, ts, event_id,
       (event_id * 48271 + user_id * 977) % 65536 AS ex,
       (event_id * 69621 + 13) % 65536 AS ey
FROM events
"""


def event_points_batch(t: pa.Table) -> pa.Table:
    eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "user_id": uid,
            "ts": t["ts"],
            "event_id": eid,
            "ex": (eid * 48271 + uid * 977) % 65536,
            "ey": (eid * 69621 + 13) % 65536,
        }
    )


def per_shape(ds, fn, extra_sort: list[str] | None = None):
    """Run ``fn(user_id, coords) -> dict | list[dict]`` once per shape
    (user), with the shape's points sorted by (ts, event_id) — the explicit
    in-group ordering the reference implicitly got from SQLite (SURVEY §2.9).

    Bucketed execution: users hash into B buckets; inside a bucket the sort
    and group-boundary detection are vectorized, then the (per-group heavy)
    kernel runs per shape.
    """

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy()
        xy = np.stack([d["ex"].to_numpy(), d["ey"].to_numpy()], axis=1).astype(np.float64)
        new = np.ones(len(d), dtype=bool)
        new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(d))
        rows: list[dict] = []
        for s, e in zip(starts, ends):
            out = fn(int(uid[s]), xy[s:e])
            if isinstance(out, dict):
                rows.append(out)
            else:
                rows.extend(out)
        return pd.DataFrame(rows)

    return bucketed_groups(ds, ["user_id"], _final)


def shape_stats(ds):
    """(user_id, n_points, length_c): per-shape vertex count + polyline
    length in integer centi-units (per-segment quantized so the SQL oracle
    sums match exactly)."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        if len(xy) < 2:
            return {"user_id": uid, "n_points": np.int64(len(xy)), "length_c": np.int64(0)}
        d = np.diff(xy, axis=0)
        seg = np.sqrt(d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1])  # matches SQL sqrt(dx*dx+dy*dy)
        seg_c = np.floor(seg * 100 + 0.5).astype(np.int64)
        return {
            "user_id": uid,
            "n_points": np.int64(len(xy)),
            "length_c": np.int64(seg_c.sum()),
        }

    return per_shape(ds, _fn)


def shape_frechet_halves(ds):
    """(user_id, frechet_q2): discrete Fréchet distance between the first and
    second half of each shape, resampled to equal point counts — ≙ the
    reference's curve-similarity score (``frechet.js:8-35``)."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        if len(xy) < 4:
            return {"user_id": uid, "frechet_q2": np.int64(-1)}
        mid = len(xy) // 2
        a = geom.resample(xy[:mid], 32)
        b = geom.resample(xy[mid:], 32)
        f = geom.frechet_distance(a, b)
        return {"user_id": uid, "frechet_q2": np.int64(np.floor(f * 100 + 0.5))}

    return per_shape(ds, _fn)


def shape_simplify_stats(ds, tol: float = 500.0):
    """(user_id, n_points, n_simplified, length_c, simplified_length_c) —
    RDP simplification stats (≙ similarity preprocessing, M9/RDP)."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        simp = geom.rdp_simplify(xy, tol)
        return {
            "user_id": uid,
            "n_points": np.int64(len(xy)),
            "n_simplified": np.int64(len(simp)),
            "length_c": np.int64(np.floor(geom.polyline_length(xy) * 100 + 0.5)),
            "simplified_length_c": np.int64(np.floor(geom.polyline_length(simp) * 100 + 0.5)),
        }

    return per_shape(ds, _fn)


def shape_slices(ds, n_slices: int = 3):
    """Per shape: slice into n equal-length chunks; one row per chunk with
    its own length — ≙ lineSliceAlong shape segmentation
    (``GtfsNetworkDAO/loaders/index.js:31-168``)."""

    def _fn(uid: int, xy: np.ndarray) -> list[dict]:
        total = geom.polyline_length(xy)
        rows = []
        for i in range(n_slices):
            a, b = total * i / n_slices, total * (i + 1) / n_slices
            sl = geom.line_slice_along(xy, a, b) if total > 0 else xy[:1]
            rows.append(
                {
                    "user_id": uid,
                    "slice_idx": np.int64(i),
                    "slice_len_q2": np.int64(np.floor(geom.polyline_length(sl) * 100 + 0.5)),
                    "n_vertices": np.int64(len(sl)),
                }
            )
        return rows

    return per_shape(ds, _fn)


def shape_snap_stats(ds):
    """Per shape: snap-deviation summary of the shape's own midpoints to its
    RDP-simplified self — ≙ A10 snap statistics
    (``utils/gis/getSimilarity.js:24-102``). Quantized outputs."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        if len(xy) < 4:
            return {"user_id": uid, "mean_q2": np.int64(-1), "q90_q2": np.int64(-1)}
        simp = geom.rdp_simplify(xy, 800.0)
        if len(simp) < 2:
            return {"user_id": uid, "mean_q2": np.int64(-1), "q90_q2": np.int64(-1)}
        st = geom.snap_stats(xy, simp)
        return {
            "user_id": uid,
            "mean_q2": np.int64(np.floor(st["mean"] * 100 + 0.5)),
            "q90_q2": np.int64(np.floor(st["q90"] * 100 + 0.5)),
        }

    return per_shape(ds, _fn)


def shape_bearing_splits(ds, max_turn_deg: float = 67.5):
    """(user_id, n_parts, longest_part_len_q2): smoothness split per shape
    (≙ M9)."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        parts = geom.bearing_splits(xy, max_turn_deg)
        lens = [geom.polyline_length(p) for p in parts]
        return {
            "user_id": uid,
            "n_parts": np.int64(len(parts)),
            "longest_part_len_q2": np.int64(np.floor(max(lens) * 100 + 0.5)) if lens else np.int64(0),
        }

    return per_shape(ds, _fn)


def shape_cospatiality(ds, buffer_dist: float = 400.0, min_len: float = 2.0):
    """(user_id, n_intervals, overlap_q2): cospatial along-intervals of each
    shape against its RDP-simplified self (≙ J5 refine offsets). EXACT
    analytic buffered intervals with the reference's short-island cleanup
    (``geom.cospatial_intervals_exact`` replaces the round-1 512-sample
    approximation)."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        simp = geom.rdp_simplify(xy, 1200.0)
        iv = (geom.cospatial_intervals_exact(xy, simp, buffer_dist, min_len)
              if len(simp) >= 2 else [])
        overlap = sum(e - s for s, e in iv)
        return {
            "user_id": uid,
            "n_intervals": np.int64(len(iv)),
            "overlap_q2": np.int64(np.floor(overlap * 100 + 0.5)),
        }

    return per_shape(ds, _fn)


def shape_merge_roundtrip(ds, n_slices: int = 3):
    """Slice each shape into chunks, merge them back end-to-start, and report
    part count + merged length (≙ merge kernels; a fixpoint sanity: slices of
    a connected shape merge back to one part)."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        total = geom.polyline_length(xy)
        if total <= 0:
            return {"user_id": uid, "merged_parts": np.int64(0), "merged_len_q2": np.int64(0)}
        slices = [
            geom.line_slice_along(xy, total * i / n_slices, total * (i + 1) / n_slices)
            for i in range(n_slices)
        ]
        merged = geom.merge_chains(slices, tol=1e-6)
        mlen = sum(geom.polyline_length(p) for p in merged)
        return {
            "user_id": uid,
            "merged_parts": np.int64(len(merged)),
            "merged_len_q2": np.int64(np.floor(mlen * 100 + 0.5)),
        }

    return per_shape(ds, _fn)


def stop_fit(ds, n_stops: int = 8):
    """Per shape: derive an ordered synthetic stop sequence (every k-th
    vertex, jittered deterministically) and fit it to the shape with the
    monotonic no-backtracking DP — ≙ fitStopsToPath
    (``snapGtfsStopsSequenceToGtfsShape.js:33-204``). One row per stop:
    (user_id, stop_idx, along_q2, dev_q2)."""

    def _fn(uid: int, xy: np.ndarray) -> list[dict]:
        if len(xy) < 3:
            return []
        k = max(1, len(xy) // n_stops)
        stops = xy[::k][:n_stops].copy()
        # deterministic off-line jitter
        jit = ((np.arange(len(stops)) * 2654435761 + uid) % 7).astype(np.float64) - 3.0
        stops += jit[:, None]
        dev, along = geom.fit_points_monotonic(stops, xy)
        return [
            {
                "user_id": uid,
                "stop_idx": np.int64(i),
                "along_q2": np.int64(np.floor(along[i] * 100 + 0.5)),
                "dev_q2": np.int64(np.floor(dev[i] * 100 + 0.5)),
            }
            for i in range(len(stops))
        ]

    return per_shape(ds, _fn)
