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


# ---------------------------------------------------------------------------
# integer-exact shape kernels (every query below carries an exact DuckDB
# oracle): coordinates are int64 grid units; lengths are quantized PER
# SEGMENT to centi-units before integer summation; float ops are restricted
# to single correctly-rounded expressions mirrored verbatim in the SQL
# ---------------------------------------------------------------------------

def seg_len_c(xyi: np.ndarray) -> np.ndarray:
    """Per-segment length in integer centi-units: floor(sqrt(dx²+dy²)*100+.5).
    sqrt of an exact int is one correctly rounded double op — numpy and
    DuckDB agree bit-for-bit, so integer sums match exactly."""
    d = np.diff(xyi, axis=0)
    seg = np.sqrt((d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]).astype(np.float64))
    return np.floor(seg * 100 + 0.5).astype(np.int64)


def rdp_keep_int(xyi: np.ndarray, tol2: int) -> np.ndarray:
    """Ramer-Douglas-Peucker keep-mask with INTEGER-EXACT comparisons:
    d > tol  ⇔  cross² > tol²·|ab|²  (same-denominator argmax = argmax
    |cross|, first index on ties). cross² is evaluated as a product of two
    exact doubles (cross ≤ 2·65535² < 2^53) against the exact int tol²·|ab|²
    — the one float expression, mirrored verbatim in the SQL oracle."""
    n = len(xyi)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    if n < 3:
        return keep
    stack = [(0, n - 1)]
    while stack:
        s, e = stack.pop()
        if e <= s + 1:
            continue
        ax, ay = xyi[s]
        dx, dy = xyi[e, 0] - ax, xyi[e, 1] - ay
        ab2 = int(dx) * int(dx) + int(dy) * int(dy)
        px = xyi[s + 1 : e, 0] - ax
        py = xyi[s + 1 : e, 1] - ay
        if ab2 == 0:
            key = px * px + py * py
            i = int(np.argmax(key))
            split = int(key[i]) > tol2
        else:
            cross = np.abs(dx * py - dy * px)
            i = int(np.argmax(cross))
            cf = float(cross[i])
            split = cf * cf > float(tol2 * ab2)
        if split:
            m = s + 1 + i
            keep[m] = True
            stack.append((s, m))
            stack.append((m, e))
    return keep


def point_seg_d2f(px: np.ndarray, py: np.ndarray, line: np.ndarray) -> np.ndarray:
    """(P,) exact min squared distance (double) of each point to the
    polyline. Per (point, segment): the projection-inside test is pure
    integer (0 ≤ dot ≤ |ab|²); the inside distance cross²/|ab|² and the
    endpoint distances are single correctly-rounded double expressions over
    exact ints, so the elementwise values — and therefore the min — are
    bit-identical in DuckDB."""
    a = line[:-1]
    b = line[1:]
    abx = (b[:, 0] - a[:, 0]).astype(np.int64)
    aby = (b[:, 1] - a[:, 1]).astype(np.int64)
    ab2 = abx * abx + aby * aby  # ≤ 2·65535², int64-safe
    apx = px[:, None] - a[None, :, 0]
    apy = py[:, None] - a[None, :, 1]
    dot = apx * abx[None, :] + apy * aby[None, :]
    cross = apx * aby[None, :] - apy * abx[None, :]
    d2a = (apx * apx + apy * apy).astype(np.float64)
    bpx = px[:, None] - b[None, :, 0]
    bpy = py[:, None] - b[None, :, 1]
    d2b = (bpx * bpx + bpy * bpy).astype(np.float64)
    crossf = cross.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        inside = crossf * crossf / np.maximum(ab2, 1).astype(np.float64)
    d2 = np.where(dot < 0, d2a, np.where(dot > ab2[None, :], d2b, inside))
    d2 = np.where(ab2[None, :] == 0, d2a, d2)
    return d2.min(axis=1)


def frechet_sq_int(a: np.ndarray, b: np.ndarray) -> int:
    """Discrete Fréchet distance SQUARED between int polylines — the whole
    DP runs on exact int64 squared distances (max/min only), so the result
    is an integer both engines compute identically."""
    dx = a[:, 0][:, None] - b[:, 0][None, :]
    dy = a[:, 1][:, None] - b[:, 1][None, :]
    d = dx * dx + dy * dy
    n, m = d.shape
    ca = np.empty((n, m), dtype=np.int64)
    ca[0, 0] = d[0, 0]
    for j in range(1, m):
        ca[0, j] = max(ca[0, j - 1], d[0, j])
    for i in range(1, n):
        ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
        prev = ca[i - 1]
        row = ca[i]
        for j in range(1, m):
            row[j] = max(d[i, j], min(prev[j], prev[j - 1], row[j - 1]))
    return int(ca[-1, -1])


def dtw_sq_int(a: np.ndarray, b: np.ndarray) -> int:
    """Dynamic-time-warping cost between int polylines: sum of SQUARED
    point distances along the optimal monotone warp path — the classic
    trajectory-similarity kernel next to :func:`frechet_sq_int` (Fréchet
    takes the max over the path; DTW the sum, so it rewards globally tight
    alignment instead of punishing one bad step). All int64 (+/min only):
    coords < 2^16, so a cell cost < 2^34 and a 47-step path sum < 2^40."""
    dx = a[:, 0][:, None] - b[:, 0][None, :]
    dy = a[:, 1][:, None] - b[:, 1][None, :]
    d = dx * dx + dy * dy
    n, m = d.shape
    ca = np.empty((n, m), dtype=np.int64)
    ca[0, :] = np.cumsum(d[0, :])
    ca[1:, 0] = d[0, 0] + np.cumsum(d[1:, 0])
    for i in range(1, n):
        prev = ca[i - 1]
        row = ca[i]
        for j in range(1, m):
            row[j] = d[i, j] + min(prev[j], prev[j - 1], row[j - 1])
    return int(ca[-1, -1])


def stride_pick(xyi: np.ndarray, k: int = 32) -> np.ndarray:
    """≤k representative vertices by exact index selection
    (idx_j = j·(n-1)//(k-1)) — the integer-exact stand-in for float
    resampling before curve scoring (duplicate picks on short inputs are
    kept: deterministic)."""
    n = len(xyi)
    if n <= 1:
        return xyi
    j = np.arange(k, dtype=np.int64)
    return xyi[j * (n - 1) // (k - 1)]


def shape_frechet_halves(ds):
    """(user_id, frechet_sq): discrete Fréchet distance (squared, exact int)
    between the first and second half of each shape, each half reduced to
    ≤32 stride-picked vertices — ≙ the reference's curve-similarity score
    (``frechet.js:8-35``), reformulated integer-exact for the DuckDB
    oracle."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        if len(xy) < 4:
            return {"user_id": uid, "frechet_sq": np.int64(-1)}
        xyi = xy.astype(np.int64)
        mid = len(xyi) // 2
        a = stride_pick(xyi[:mid], 32)
        b = stride_pick(xyi[mid:], 32)
        return {"user_id": uid, "frechet_sq": np.int64(frechet_sq_int(a, b))}

    return per_shape(ds, _fn)


# rotation grid for the rotation-restricted similarity: 9 angles k*pi/40,
# k in [-4, 4] (= exactly the reference's restrictRotationAngle 0.1*pi sweep
# bound), each as the rational matrix (cos, sin) * 1024 rounded to int — the
# SAME integer constants are embedded in the SQL mirror, so the rotation is
# exact on both sides by construction (the approximation IS the definition).
ROT_CS = ((-4, 974, -316), (-3, 996, -239), (-2, 1011, -160), (-1, 1021, -80),
          (0, 1024, 0), (1, 1021, 80), (2, 1011, 160), (3, 996, 239),
          (4, 974, 316))


def shape_rotfrechet_halves(ds):
    """(user_id, rot_frechet_sq, best_rot): ROTATION-RESTRICTED curve
    similarity between the two halves of each shape — the engine's analog of
    the reference's ``curve-matcher shapeSimilarity`` with
    ``restrictRotationAngle: 0.1π``
    (``/root/reference/src/services/Conflation/chooseShstMatchesForShape/scoreChosenPaths/frechet.js:8-35``):
    both halves stride-picked to 32 vertices (≙ rebalanceCurve), translated
    to their first vertex (≙ the procrustes translation normalization), then
    the second half swept over the 9-angle grid ``ROT_CS``; the score is the
    minimum discrete-Fréchet² over the sweep (scaled by 1024² from the
    rotation denominators) and ``best_rot`` the smallest angle index
    achieving it. All int64, bit-exact vs the recursive-CTE oracle."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        if len(xy) < 4:
            return {"user_id": uid, "rot_frechet_sq": np.int64(-1),
                    "best_rot": np.int64(0)}
        xyi = xy.astype(np.int64)
        mid = len(xyi) // 2
        a = stride_pick(xyi[:mid], 32)
        b = stride_pick(xyi[mid:], 32)
        a = (a - a[0]) * np.int64(1024)
        b0 = b - b[0]
        best = None
        best_k = 0
        for k, c, sn in ROT_CS:
            rb = np.stack([b0[:, 0] * c - b0[:, 1] * sn,
                           b0[:, 0] * sn + b0[:, 1] * c], axis=1)
            f = int(frechet_sq_int(a, rb))
            if best is None or f < best:
                best, best_k = f, k
        return {"user_id": uid, "rot_frechet_sq": np.int64(best),
                "best_rot": np.int64(best_k)}

    return per_shape(ds, _fn)


def shape_dtw_halves(ds):
    """(user_id, dtw_sq): dynamic-time-warping cost (sum of squared point
    distances over the optimal warp, exact int64) between the first and
    second half of each shape, each half stride-picked to 24 vertices —
    the third curve-similarity scorer next to Fréchet and Hausdorff
    (≙ the reference's curve scoring family, ``frechet.js:8-35``; DTW is
    what map-matching literature uses when per-step alignment cost should
    ACCUMULATE). 24 picks keep the oracle's anti-diagonal recursive CTE at
    47 rounds. Shapes with < 4 points score -1 (no two real halves)."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        if len(xy) < 4:
            return {"user_id": uid, "dtw_sq": np.int64(-1)}
        xyi = xy.astype(np.int64)
        mid = len(xyi) // 2
        a = stride_pick(xyi[:mid], 24)
        b = stride_pick(xyi[mid:], 24)
        return {"user_id": uid, "dtw_sq": np.int64(dtw_sq_int(a, b))}

    return per_shape(ds, _fn)


def shape_hausdorff_halves(ds):
    """(user_id, h_ab_sq, h_ba_sq, hausdorff_sq): directed + symmetric
    discrete Hausdorff distance (squared, exact int64) between the first and
    second half of each shape over ALL vertices — no stride pick needed,
    Hausdorff is a max-of-min computed as one vectorized O(n_a·n_b) distance
    matrix per shape. ≙ the reference's curve-similarity scoring
    (``frechet.js:8-35`` computes Fréchet; Hausdorff is its cheap lower
    bound used as a pre-gate), reformulated integer-exact for the DuckDB
    oracle."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        if len(xy) < 4:
            neg = np.int64(-1)
            return {"user_id": uid, "h_ab_sq": neg, "h_ba_sq": neg,
                    "hausdorff_sq": neg}
        xyi = xy.astype(np.int64)
        mid = len(xyi) // 2
        a, b = xyi[:mid], xyi[mid:]
        d2 = ((a[:, None, 0] - b[None, :, 0]) ** 2
              + (a[:, None, 1] - b[None, :, 1]) ** 2)
        h_ab = int(d2.min(axis=1).max())
        h_ba = int(d2.min(axis=0).max())
        return {"user_id": uid, "h_ab_sq": np.int64(h_ab),
                "h_ba_sq": np.int64(h_ba),
                "hausdorff_sq": np.int64(max(h_ab, h_ba))}

    return per_shape(ds, _fn)


def shape_simplify_stats(ds, tol2: int = 250000):
    """(user_id, n_points, n_simplified, length_c, simplified_length_c) —
    RDP simplification stats (≙ similarity preprocessing, M9/RDP), with the
    integer-exact RDP keep rule (tol = 500 grid units → tol² = 250000) and
    per-segment-quantized lengths."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        xyi = xy.astype(np.int64)
        keep = rdp_keep_int(xyi, tol2)
        return {
            "user_id": uid,
            "n_points": np.int64(len(xyi)),
            "n_simplified": np.int64(int(keep.sum())),
            "length_c": np.int64(seg_len_c(xyi).sum()) if len(xyi) > 1 else np.int64(0),
            "simplified_length_c": np.int64(seg_len_c(xyi[keep]).sum())
            if keep.sum() > 1 else np.int64(0),
        }

    return per_shape(ds, _fn)


def shape_slices(ds, n_slices: int = 3):
    """Per shape: slice into n ~equal-length chunks at VERTEX boundaries
    (boundary = first vertex at/past each cumulative-length target, exact
    integer centi-unit arithmetic); one row per chunk —
    ≙ lineSliceAlong shape segmentation
    (``GtfsNetworkDAO/loaders/index.js:31-168``), reformulated vertex-exact
    for the DuckDB oracle."""

    def _fn(uid: int, xy: np.ndarray) -> list[dict]:
        xyi = xy.astype(np.int64)
        cum = np.zeros(len(xyi), dtype=np.int64)
        if len(xyi) > 1:
            cum[1:] = np.cumsum(seg_len_c(xyi))
        total = int(cum[-1])
        rows = []
        for i in range(n_slices):
            a = total * i // n_slices
            b = total * (i + 1) // n_slices
            s = int(np.searchsorted(cum, a, side="left"))
            e = int(np.searchsorted(cum, b, side="left"))
            rows.append(
                {
                    "user_id": uid,
                    "slice_idx": np.int64(i),
                    "slice_len_c": np.int64(int(cum[e]) - int(cum[s])),
                    "n_vertices": np.int64(e - s + 1),
                }
            )
        return rows

    return per_shape(ds, _fn)


def shape_snap_stats(ds, tol2: int = 640000):
    """Per shape: snap-deviation summary of the shape's vertices to its
    RDP-simplified self (tol = 800 → tol² = 640000) — ≙ A10 snap statistics
    (``utils/gis/getSimilarity.js:24-102``). dev per vertex = exact min
    point-to-segment distance, quantized to centi-units; outputs the integer
    deviation SUM and the exact-index p90 (sorted_devs[ceil(0.9·n)-1])."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        if len(xy) < 4:
            return {"user_id": uid, "n_points": np.int64(len(xy)),
                    "sum_dev_c": np.int64(-1), "p90_c": np.int64(-1)}
        xyi = xy.astype(np.int64)
        simp = xyi[rdp_keep_int(xyi, tol2)]
        d2 = point_seg_d2f(xyi[:, 0], xyi[:, 1], simp)
        dev_c = np.floor(np.sqrt(d2) * 100 + 0.5).astype(np.int64)
        n = len(dev_c)
        p90 = int(np.sort(dev_c)[-(-9 * n // 10) - 1])  # ceil(0.9n)-1, 0-based
        return {
            "user_id": uid,
            "n_points": np.int64(n),
            "sum_dev_c": np.int64(dev_c.sum()),
            "p90_c": np.int64(p90),
        }

    return per_shape(ds, _fn)


def shape_bearing_splits(ds):
    """(user_id, n_parts, longest_part_len_c): smoothness split per shape at
    turns sharper than 60° (≙ M9). The turn test is exact:
    turn > 60° ⇔ cos < ½ ⇔ dot < 0, or 4·dot² < |a|²·|b|² for dot ≥ 0 —
    pure integer except one mirrored double product pair; degenerate
    zero-length segments never split."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        xyi = xy.astype(np.int64)
        n = len(xyi)
        lens = seg_len_c(xyi) if n > 1 else np.zeros(0, dtype=np.int64)
        if n < 3:
            return {"user_id": uid, "n_parts": np.int64(1),
                    "longest_part_len_c": np.int64(lens.sum())}
        d = np.diff(xyi, axis=0)
        ax, ay = d[:-1, 0], d[:-1, 1]
        bx, by = d[1:, 0], d[1:, 1]
        dot = ax * bx + ay * by
        l2a = ax * ax + ay * ay
        l2b = bx * bx + by * by
        dotf = dot.astype(np.float64)
        split = np.where(
            (l2a == 0) | (l2b == 0),
            False,
            (dot < 0) | (4.0 * (dotf * dotf) < l2a.astype(np.float64) * l2b.astype(np.float64)),
        )
        cuts = np.flatnonzero(split) + 1  # segment index where a new part starts
        part_of_seg = np.zeros(n - 1, dtype=np.int64)
        part_of_seg[cuts] = 1
        part_of_seg = np.cumsum(part_of_seg)
        part_lens = np.bincount(part_of_seg, weights=lens).astype(np.int64)
        return {
            "user_id": uid,
            "n_parts": np.int64(len(part_lens)),
            "longest_part_len_c": np.int64(part_lens.max()),
        }

    return per_shape(ds, _fn)


def shape_cospatiality(ds, buf2: int = 160000, tol2: int = 1440000):
    """(user_id, n_intervals, overlap_c): cospatial along-intervals of each
    shape against its RDP-simplified self (≙ J5 refine offsets) at vertex
    resolution, integer-exact: a segment is cospatial iff BOTH endpoints lie
    within buffer 400 (buf² = 160000) of the simplified polyline (exact
    point-to-segment d²); intervals are maximal cospatial runs, overlap is
    their per-segment-quantized length sum. (The sub-segment analytic
    interval solver ``geom.cospatial_intervals_exact`` remains the
    fine-grained kernel, pytest-verified against dense sampling.)"""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        xyi = xy.astype(np.int64)
        n = len(xyi)
        if n < 2:
            return {"user_id": uid, "n_intervals": np.int64(0),
                    "overlap_c": np.int64(0)}
        simp = xyi[rdp_keep_int(xyi, tol2)]
        d2 = point_seg_d2f(xyi[:, 0], xyi[:, 1], simp)
        near = d2 <= float(buf2)
        cosp = near[:-1] & near[1:]  # both endpoints of the segment
        lens = seg_len_c(xyi)
        overlap = int(lens[cosp].sum())
        starts = cosp & ~np.r_[False, cosp[:-1]]
        return {
            "user_id": uid,
            "n_intervals": np.int64(int(starts.sum())),
            "overlap_c": np.int64(overlap),
        }

    return per_shape(ds, _fn)


def shape_merge_roundtrip(ds, jitter_mod: int = 5):
    """Slice each shape into three chunks, merge them back end-to-start with
    the REAL greedy merge kernel (``geom.merge_chains`` ≙
    ``mergeLineStringsGeospatially.js:8-107``), and report part count +
    merged length — INTEGER-EXACT reformulation (SURVEY §7.6 exact-oracle
    rule): cuts at vertex indices (n//3, 2n//3), exact endpoint equality
    (tol=0), per-segment quantized lengths (``seg_len_c``). Shapes with
    ``uid % jitter_mod == 0`` get their middle chunk translated +4 in x —
    beyond tol, so the merge genuinely branches (3 parts instead of 1).

    Exactness guard: an ACCIDENTAL endpoint coincidence (two cut vertices
    sharing coordinates) could let the greedy merge join an unintended pair;
    both engine and oracle detect that predicate exactly and emit a loud -1
    sentinel row for such a shape (same pattern as ``path_metadata_merge``'s
    non-convergence sentinel), so the SQL mirror stays exact without
    replicating the greedy loop's order-dependent fallout."""

    def _fn(uid: int, xy: np.ndarray) -> dict:
        xyi = xy.astype(np.int64)
        n = len(xyi)
        if n < 2:
            return {"user_id": uid, "merged_parts": np.int64(0),
                    "merged_len_q2": np.int64(0)}
        total = int(seg_len_c(xyi).sum())
        if n < 4:
            return {"user_id": uid, "merged_parts": np.int64(1),
                    "merged_len_q2": np.int64(total)}
        k1, k2 = n // 3, (2 * n) // 3
        j = 4 if uid % jitter_mod == 0 else 0
        a = xyi[: k1 + 1]
        b = xyi[k1 : k2 + 1].copy()
        c = xyi[k2:]
        b[:, 0] += j
        ends = {"a": (tuple(a[0]), tuple(a[-1])),
                "b": (tuple(b[0]), tuple(b[-1])),
                "c": (tuple(c[0]), tuple(c[-1]))}
        allowed = {("a", "b"), ("b", "c")}  # the construction's shared cuts
        unintended = any(
            ends[p][1] == ends[q][0]
            for p in ends for q in ends
            if p != q and (p, q) not in allowed
        )
        if unintended:
            return {"user_id": uid, "merged_parts": np.int64(-1),
                    "merged_len_q2": np.int64(-1)}
        merged = geom.merge_chains([b, c, a], tol=0.0)
        mlen = sum(int(seg_len_c(p).sum()) for p in merged)
        return {
            "user_id": uid,
            "merged_parts": np.int64(len(merged)),
            "merged_len_q2": np.int64(mlen),
        }

    return per_shape(ds, _fn)


def stop_fit(ds, n_stops: int = 8):
    """Per shape: derive an ordered synthetic stop sequence (every k-th
    vertex, integer-jittered deterministically) and fit it to the shape with
    the GREEDY monotonic no-backtracking rule: each stop snaps to the
    closest vertex (exact integer squared distance, ties → smallest index)
    at or after the previous stop's vertex — ≙ fitStopsToPath
    (``snapGtfsStopsSequenceToGtfsShape.js:33-204``; the float least-squares
    DP remains as ``geom.fit_points_monotonic``, pytest-covered). One row
    per stop: (user_id, stop_idx, along_c, dev_sq) with along = cumulative
    per-segment-quantized length at the snapped vertex."""

    def _fn(uid: int, xy: np.ndarray) -> list[dict]:
        if len(xy) < 3:
            return []
        xyi = xy.astype(np.int64)
        k = max(1, len(xyi) // n_stops)
        stops = xyi[::k][:n_stops].copy()
        jit = ((np.arange(len(stops), dtype=np.int64) * 2654435761 + uid) % 7) - 3
        stops += jit[:, None]
        cum = np.zeros(len(xyi), dtype=np.int64)
        cum[1:] = np.cumsum(seg_len_c(xyi))
        rows = []
        prev = 0
        for i in range(len(stops)):
            d2 = ((xyi[prev:, 0] - stops[i, 0]) ** 2
                  + (xyi[prev:, 1] - stops[i, 1]) ** 2)
            v = prev + int(np.argmin(d2))  # first min = smallest index
            rows.append(
                {
                    "user_id": uid,
                    "stop_idx": np.int64(i),
                    "along_c": np.int64(cum[v]),
                    "dev_sq": np.int64(d2[v - prev]),
                }
            )
            prev = v
        return rows

    return per_shape(ds, _fn)
