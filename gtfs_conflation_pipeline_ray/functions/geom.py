"""Planar polyline geometry kernels (numpy) — the engine's re-implementation
of the reference's turf.js/GDAL expression library (SURVEY.md §2.8):
length / bearing / point-on-line projection / line-slice-along / simplify /
discrete Fréchet / Hausdorff / RMSD snap statistics.

All kernels operate on (n, 2) float64 coordinate arrays in planar grid units
(the engine's tile-grid space). They are pure and per-row/per-group — called
from ``map_batches`` / bucketed group stages; none hold distributed state.

Reference citations:
  - length/slice: turf length / lineSliceAlong usage, e.g.
    ``/root/reference/src/daos/GtfsNetworkDAO/loaders/index.js:31-168``
  - snap/projection DP: ``snapGtfsStopsSequenceToGtfsShape.js:33-204``
  - RMSD edge weights: ``buildShstMatchSubGraphsPerGtfsShapeSegment.js:17-44``
  - Fréchet score: ``scoreChosenPaths/frechet.js:8-35``
  - simplify (RDP): ``utils/lineStringsComparator.js:17-61``
"""

from __future__ import annotations

import numpy as np


def seg_lengths(coords: np.ndarray) -> np.ndarray:
    """Euclidean length of each segment of an (n, 2) polyline -> (n-1,)."""
    d = np.diff(coords, axis=0)
    return np.hypot(d[:, 0], d[:, 1])


def polyline_length(coords: np.ndarray) -> float:
    return float(seg_lengths(coords).sum()) if len(coords) > 1 else 0.0


def cum_lengths(coords: np.ndarray) -> np.ndarray:
    """Cumulative distance along the polyline at each vertex -> (n,)."""
    out = np.zeros(len(coords))
    if len(coords) > 1:
        out[1:] = np.cumsum(seg_lengths(coords))
    return out


def bearings(coords: np.ndarray) -> np.ndarray:
    """Bearing (degrees, 0=+y clockwise) of each segment -> (n-1,)."""
    d = np.diff(coords, axis=0)
    return np.degrees(np.arctan2(d[:, 0], d[:, 1])) % 360.0


def project_points(points: np.ndarray, line: np.ndarray):
    """Project each point onto its nearest location on the polyline.

    Vectorized over (P points x S segments) — the reference's O(S*Ps)
    projection table (``snapGtfsStopsSequenceToGtfsShape.js:32``).
    Returns (dist, along): perpendicular snap distance and distance-along
    the line of the snap location, both (P,).
    """
    a = line[:-1]  # (S, 2)
    ab = line[1:] - a  # (S, 2)
    ab2 = np.maximum((ab * ab).sum(axis=1), 1e-300)
    ap = points[:, None, :] - a[None, :, :]  # (P, S, 2)
    t = np.clip((ap * ab[None, :, :]).sum(axis=2) / ab2[None, :], 0.0, 1.0)
    proj = a[None, :, :] + t[:, :, None] * ab[None, :, :]
    d = np.hypot(*(points[:, None, :] - proj).transpose(2, 0, 1))
    seg = np.argmin(d, axis=1)  # nearest segment per point
    p_idx = np.arange(len(points))
    cl = cum_lengths(line)
    seg_len = np.sqrt(ab2)
    along = cl[seg] + t[p_idx, seg] * seg_len[seg]
    return d[p_idx, seg], along


def fit_points_monotonic(points: np.ndarray, line: np.ndarray):
    """Snap an ORDERED point sequence to the line with a no-backtracking
    constraint: minimize total squared snap deviation subject to
    along[i] <= along[i+1] — the reference's least-squares DP fit
    (``snapGtfsStopsSequenceToGtfsShape.js:97-166``, O(P*S^2) there; here a
    DP over the (P x S) candidate table, vectorized per row).

    Returns (dist, along) per point under the monotonic constraint.
    """
    a = line[:-1]
    ab = line[1:] - a
    ab2 = np.maximum((ab * ab).sum(axis=1), 1e-300)
    ap = points[:, None, :] - a[None, :, :]
    t = np.clip((ap * ab[None, :, :]).sum(axis=2) / ab2[None, :], 0.0, 1.0)
    proj = a[None, :, :] + t[:, :, None] * ab[None, :, :]
    d2 = ((points[:, None, :] - proj) ** 2).sum(axis=2)  # (P, S)
    cl = cum_lengths(line)
    along = cl[:-1][None, :] + t * np.sqrt(ab2)[None, :]  # (P, S)

    P, S = d2.shape
    # DP over candidate segments in along-order per point: sort candidates by
    # along so "previous choice <= current choice" is a prefix-min.
    order = np.argsort(along, axis=1, kind="stable")
    d2s = np.take_along_axis(d2, order, axis=1)
    alongs = np.take_along_axis(along, order, axis=1)
    cost = d2s[0].copy()
    choice = np.zeros((P, S), dtype=np.int64)
    for i in range(1, P):
        # best prefix cost of row i-1 at each of row i's along positions
        # (searchsorted aligns the monotonic along[i-1] <= along[i] constraint)
        prefix = np.minimum.accumulate(cost)
        achiever = np.where(cost == prefix, np.arange(S), 0)
        best_prefix_idx = np.maximum.accumulate(achiever)
        pos = np.searchsorted(alongs[i - 1], alongs[i], side="right") - 1
        feasible = pos >= 0
        posc = np.clip(pos, 0, S - 1)
        choice[i] = np.where(feasible, best_prefix_idx[posc], 0)
        cost = np.where(feasible, prefix[posc], np.inf) + d2s[i]
    # reconstruct
    out_d = np.empty(P)
    out_along = np.empty(P)
    j = int(np.argmin(cost))
    for i in range(P - 1, -1, -1):
        out_d[i] = np.sqrt(d2s[i, j])
        out_along[i] = alongs[i, j]
        j = int(choice[i, j])
    return out_d, out_along


def line_slice_along(line: np.ndarray, start: float, end: float) -> np.ndarray:
    """Sub-polyline between distances [start, end] along the line —
    ≙ turf lineSliceAlong (``GtfsNetworkDAO/loaders/index.js:90-118``)."""
    cl = cum_lengths(line)
    total = cl[-1]
    start = min(max(start, 0.0), total)
    end = min(max(end, start), total)

    def _point_at(dist):
        i = int(np.searchsorted(cl, dist, side="right") - 1)
        i = min(i, len(line) - 2)
        seg = cl[i + 1] - cl[i]
        t = 0.0 if seg <= 0 else (dist - cl[i]) / seg
        return line[i] + t * (line[i + 1] - line[i])

    mid_mask = (cl > start) & (cl < end)
    pts = [np.asarray(_point_at(start))]
    pts.extend(line[mid_mask])
    pts.append(np.asarray(_point_at(end)))
    return np.vstack(pts)


def rdp_simplify(coords: np.ndarray, tol: float) -> np.ndarray:
    """Ramer-Douglas-Peucker simplification (iterative stack form)."""
    n = len(coords)
    if n < 3:
        return coords.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        s, e = stack.pop()
        if e <= s + 1:
            continue
        a, b = coords[s], coords[e]
        ab = b - a
        ab_len = np.hypot(*ab)
        pts = coords[s + 1 : e]
        if ab_len < 1e-300:
            d = np.hypot(*(pts - a).T)
        else:
            d = np.abs(np.cross(ab, pts - a)) / ab_len
        i = int(np.argmax(d))
        if d[i] > tol:
            keep[s + 1 + i] = True
            stack.append((s, s + 1 + i))
            stack.append((s + 1 + i, e))
    return coords[keep]


def resample(coords: np.ndarray, n_points: int) -> np.ndarray:
    """Resample the polyline to n_points equally spaced along its length —
    ≙ the reference's equal-point-count rebalance before shape similarity
    (``frechet.js:12-24``)."""
    cl = cum_lengths(coords)
    if cl[-1] <= 0:
        return np.repeat(coords[:1], n_points, axis=0)
    targets = np.linspace(0.0, cl[-1], n_points)
    idx = np.clip(np.searchsorted(cl, targets, side="right") - 1, 0, len(coords) - 2)
    seg = np.maximum(cl[idx + 1] - cl[idx], 1e-300)
    t = (targets - cl[idx]) / seg
    return coords[idx] + t[:, None] * (coords[idx + 1] - coords[idx])


def frechet_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Discrete Fréchet distance (Eiter & Mannila 1994), vectorized DP by
    anti-diagonal-free row sweep."""
    d = np.hypot(
        *(a[:, None, :] - b[None, :, :]).transpose(2, 0, 1)
    )  # (n, m)
    n, m = d.shape
    ca = np.empty((n, m))
    ca[0, 0] = d[0, 0]
    for j in range(1, m):
        ca[0, j] = max(ca[0, j - 1], d[0, j])
    for i in range(1, n):
        ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
        prev = ca[i - 1]
        row = ca[i]
        # row[j] = max(d[i,j], min(prev[j], prev[j-1], row[j-1])) — sequential
        for j in range(1, m):
            row[j] = max(d[i, j], min(prev[j], prev[j - 1], row[j - 1]))
    return float(ca[-1, -1])


def hausdorff_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric discrete Hausdorff distance between vertex sets."""
    d = np.hypot(*(a[:, None, :] - b[None, :, :]).transpose(2, 0, 1))
    return float(max(d.min(axis=1).max(), d.min(axis=0).max()))


def bearing_splits(coords: np.ndarray, max_turn_deg: float = 67.5) -> list[np.ndarray]:
    """Split a polyline wherever the bearing change between consecutive
    segments exceeds ``max_turn_deg`` — ≙ M9 smoothness splitter
    (``src/utils/splitLineStringUsingSmoothness.js:12-101``). Returns the
    list of sub-polylines (shared split vertices)."""
    if len(coords) < 3:
        return [coords.copy()]
    b = bearings(coords)
    turn = np.abs((np.diff(b) + 180.0) % 360.0 - 180.0)
    cuts = np.flatnonzero(turn > max_turn_deg) + 1  # vertex indices
    parts = []
    prev = 0
    for c in cuts:
        parts.append(coords[prev : c + 1])
        prev = c
    parts.append(coords[prev:])
    return parts


def cospatial_intervals(a: np.ndarray, b: np.ndarray, buffer_dist: float,
                        step: float) -> list[tuple[float, float]]:
    """Along-line intervals of A that are cospatial with B: walk A at
    ``step`` resolution, mark samples within ``buffer_dist`` of B, merge
    consecutive marked samples into (start_along, end_along) intervals —
    ≙ J5 cospatiality offsets
    (``utils/gis/getCospatialityOfLinestrings.js:85-166``, buffered
    intersection + offsets-along). Short islands below one step vanish, like
    the reference's 2 m short-seg cleanup (:446-476)."""
    total = polyline_length(a)
    if total <= 0 or len(b) < 2:
        return []
    # resolution-bounded: never more than 512 samples per line (the reference
    # bounds work similarly via its 100-segment buffers + 2 m cleanup)
    n = min(max(int(np.ceil(total / step)) + 1, 2), 512)
    samples = resample(a, n)
    d, _ = project_points(samples, b)
    inside = d <= buffer_dist
    alongs = np.linspace(0.0, total, n)
    # vectorized run extraction: starts where inside begins, ends where it stops
    diff = np.diff(inside.astype(np.int8))
    starts = np.flatnonzero(diff == 1) + 1
    ends = np.flatnonzero(diff == -1)
    if inside[0]:
        starts = np.r_[0, starts]
    if inside[-1]:
        ends = np.r_[ends, n - 1]
    return [(alongs[s], alongs[e]) for s, e in zip(starts, ends) if alongs[e] > alongs[s]]


def cospatial_intervals_exact(a: np.ndarray, b: np.ndarray, buffer_dist: float,
                              min_len: float = 0.0) -> list[tuple[float, float]]:
    """EXACT along-line intervals of A within ``buffer_dist`` of B — the
    buffered-intersection offsets of J5
    (``utils/gis/getCospatialityOfLinestrings.js:327-517``: GDAL buffer +
    mutual intersection + offsets-along + short-seg cleanup) computed
    analytically instead of by sampling.

    For each A-segment, the set {t in [0,1] : dist(A(t), B-segment) <= r} is
    CONVEX (distance from a point moving on a line to a convex set is convex
    in t), and equals the union of three solvable pieces — within r of either
    endpoint (two quadratics) or of the interior strip (linear band + linear
    projection range) — so its bounds are [min of lows, max of highs] of the
    non-empty pieces. All (A-seg x B-seg) pairs solve in one broadcast pass;
    intervals then merge along A and islands shorter than ``min_len`` drop
    (≙ the reference's 2 m cleanup, ``:446-476``)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if len(a) < 2 or len(b) < 2:
        return []
    r = float(buffer_dist)
    da = a[1:] - a[:-1]                      # (m, 2)
    L = np.hypot(da[:, 0], da[:, 1])
    cumA = np.concatenate(([0.0], np.cumsum(L)))
    db = b[1:] - b[:-1]                      # (n, 2)
    nb2 = (db * db).sum(1)

    e0 = a[:-1, None, :] - b[None, :-1, :]   # a0 - b0  (m, n, 2)
    e1 = a[:-1, None, :] - b[None, 1:, :]    # a0 - b1
    A2 = (da * da).sum(1)[:, None]           # |da|^2  (m, 1)

    def _quad(Bc, Cc):
        # A2 t^2 + 2 Bc t + Cc <= 0
        disc = Bc * Bc - A2 * Cc
        ok = (disc >= 0) & (A2 > 0)
        sq = np.sqrt(np.maximum(disc, 0.0))
        den = np.where(A2 > 0, A2, 1.0)
        lo = np.where(ok, (-Bc - sq) / den, np.inf)
        hi = np.where(ok, (-Bc + sq) / den, -np.inf)
        return lo, hi

    lo0, hi0 = _quad((da[:, None, :] * e0).sum(2), (e0 * e0).sum(2) - r * r)
    lo1, hi1 = _quad((da[:, None, :] * e1).sum(2), (e1 * e1).sum(2) - r * r)

    # interior strip: |cross(e0 + t da, db)| <= r |db|, projection s in [0,1]
    alpha = da[:, None, 0] * db[None, :, 1] - da[:, None, 1] * db[None, :, 0]
    beta = e0[..., 0] * db[None, :, 1] - e0[..., 1] * db[None, :, 0]
    rn = r * np.sqrt(nb2)[None, :]
    g = (da[:, None, :] * db[None, :, :]).sum(2)   # da . db
    h = (e0 * db[None, :, :]).sum(2)               # e0 . db
    with np.errstate(divide="ignore", invalid="ignore"):
        sl_lo = np.where(alpha > 0, (-rn - beta) / alpha,
                 np.where(alpha < 0, (rn - beta) / alpha,
                          np.where(np.abs(beta) <= rn, -np.inf, np.inf)))
        sl_hi = np.where(alpha > 0, (rn - beta) / alpha,
                 np.where(alpha < 0, (-rn - beta) / alpha,
                          np.where(np.abs(beta) <= rn, np.inf, -np.inf)))
        pr_lo = np.where(g > 0, -h / g,
                 np.where(g < 0, (nb2[None, :] - h) / g,
                          np.where((h >= 0) & (h <= nb2[None, :]), -np.inf, np.inf)))
        pr_hi = np.where(g > 0, (nb2[None, :] - h) / g,
                 np.where(g < 0, -h / g,
                          np.where((h >= 0) & (h <= nb2[None, :]), np.inf, -np.inf)))
    st_lo = np.maximum(sl_lo, pr_lo)
    st_hi = np.minimum(sl_hi, pr_hi)
    st_ok = (st_hi >= st_lo) & (nb2[None, :] > 0)
    st_lo = np.where(st_ok, st_lo, np.inf)
    st_hi = np.where(st_ok, st_hi, -np.inf)

    lo = np.clip(np.minimum(np.minimum(lo0, lo1), st_lo), 0.0, 1.0)
    hi = np.clip(np.maximum(np.maximum(hi0, hi1), st_hi), 0.0, 1.0)
    ii, jj = np.nonzero(hi > lo)
    if len(ii) == 0:
        return []
    a_lo = cumA[ii] + lo[ii, jj] * L[ii]
    a_hi = cumA[ii] + hi[ii, jj] * L[ii]
    order = np.argsort(a_lo, kind="stable")
    a_lo, a_hi = a_lo[order], a_hi[order]
    # sweep-merge: a new island starts where lo exceeds the running max hi
    run_hi = np.maximum.accumulate(a_hi)
    new = np.ones(len(a_lo), dtype=bool)
    new[1:] = a_lo[1:] > run_hi[:-1]
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], len(a_lo))
    out = []
    for s, e in zip(starts, ends):
        lo_v, hi_v = a_lo[s], run_hi[e - 1]
        if hi_v - lo_v >= min_len and hi_v > lo_v:
            out.append((float(lo_v), float(hi_v)))
    return out


def line_similarity(a: np.ndarray, b: np.ndarray, buffer_dist: float,
                    simplify_tol: float = 0.0) -> float:
    """Similarity score of two polylines — ≙ ``lineStringsComparator``
    (``/root/reference/src/utils/lineStringsComparator.js:17-61``): translate
    B to A's start, RDP-simplify both, take the length of A NOT within
    ``buffer_dist`` of translated B (the GDAL difference-length analog, via
    the exact cospatial intervals), scaled by the squared start-distance
    penalty. 0 = identical; larger = less similar."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if len(a) < 2 or len(b) < 2:
        return float("inf")
    start_dist = float(np.hypot(*(a[0] - b[0])))
    bt = b - b[0] + a[0]
    if simplify_tol > 0:
        a = rdp_simplify(a, simplify_tol)
        bt = rdp_simplify(bt, simplify_tol)
    cos_len = sum(hi - lo for lo, hi in cospatial_intervals_exact(a, bt, buffer_dist))
    diff_len = max(polyline_length(a) - cos_len, 0.0)
    return diff_len * (1.0 + start_dist) ** 2


_CROSS_GUARD = np.int64(742_000_000)  # |cross| beyond this always exceeds buf2*L2


def points_within_polyline_exact(points: np.ndarray, poly: np.ndarray,
                                 buf2: int) -> np.ndarray:
    """Per-point boolean: is the point within sqrt(buf2) of the polyline —
    decided entirely in int64 (point-to-segment distance as the exact
    rational compare cross^2 <= buf2 * L2, endpoint cases as integer d2),
    so a SQL oracle reproduces every decision bit-for-bit. The cross term
    can exceed int64 when squared, so values past ``_CROSS_GUARD`` (which
    already guarantee cross^2 > buf2 * L2 for in-range coordinates) are
    clamped before squaring — the same clamp the SQL mirror applies."""
    p = np.asarray(points, dtype=np.int64)[:, None, :]    # (P, 1, 2)
    s0 = np.asarray(poly, dtype=np.int64)[:-1][None]      # (1, S, 2)
    s1 = np.asarray(poly, dtype=np.int64)[1:][None]
    seg = s1 - s0
    L2 = (seg * seg).sum(-1)                              # (1, S)
    w = p - s0                                            # (P, S, 2)
    dot = (w * seg).sum(-1)
    d0 = (w * w).sum(-1)
    w1 = p - s1
    d1 = (w1 * w1).sum(-1)
    cross = w[..., 0] * seg[..., 1] - w[..., 1] * seg[..., 0]
    crs = np.where(np.abs(cross) <= _CROSS_GUARD, cross, _CROSS_GUARD + 1)
    perp_ok = crs * crs <= np.int64(buf2) * L2
    ok = np.where(
        (L2 == 0) | (dot <= 0), d0 <= buf2,
        np.where(dot >= L2, d1 <= buf2, perp_ok),
    )
    return ok.any(axis=1)


def line_similarity_exact(a: np.ndarray, b: np.ndarray, buffer_dist: int) -> float:
    """Integer-exact similarity comparator — same objective shape as
    ``line_similarity`` (≙ lineStringsComparator): translate B to A's start,
    take the CENTS length of A's segments NOT cospatial with translated B
    (segment cospatial iff BOTH endpoints within ``buffer_dist`` — the same
    vertex-in-buffer reformulation ``shape_cospatiality``'s exact oracle
    uses), scaled by the squared start-distance penalty. Every decision is
    an int64 predicate and every float op is a correctly-rounded sqrt /
    mul / add in a fixed order, so numpy and a SQL mirror agree bit-for-bit.
    0 = identical; larger = less similar (cents scale)."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    if len(a) < 2 or len(b) < 2:
        return float("inf")
    d2start = int((a[0, 0] - b[0, 0]) ** 2 + (a[0, 1] - b[0, 1]) ** 2)
    bt = b - b[0] + a[0]
    within = points_within_polyline_exact(a, bt, int(buffer_dist) ** 2)
    d = np.diff(a, axis=0)
    len_c = np.floor(np.sqrt((d * d).sum(1).astype(np.float64)) * 100 + 0.5).astype(np.int64)
    cos_c = int(len_c[within[:-1] & within[1:]].sum())
    diff_c = int(len_c.sum()) - cos_c
    start_dist = float(np.sqrt(np.float64(d2start)))
    return float(diff_c) * ((1.0 + start_dist) * (1.0 + start_dist))


def merge_paths_by_ids(paths: list) -> list[list[int]]:
    """Metadata path merge — ≙ ``mergePathLineStringsUsingMetadata``
    (``/root/reference/src/services/Conflation/chooseShstMatchesForShape/
    mergePathLineStringsUsingMetadata.js:9-199``): paths are id sequences
    (shstMatchId lists); repeatedly (a) drop any path whose id SET is a
    subset of another's (D5 overlapped-path removal,
    ``unionPathLineStrings.js:13-52``), then (b) splice two paths when one's
    suffix equals the other's prefix (maximal overlap run, >= 1 id), to a
    fixpoint. Deterministic: candidates scan in index order, longest overlap
    first."""
    ps: list[list[int]] = [list(p) for p in paths if len(p)]
    changed = True
    while changed:
        changed = False
        # (a) subset removal (keep the first of exact duplicates)
        sets = [frozenset(p) for p in ps]
        drop = [False] * len(ps)
        for i in range(len(ps)):
            for j in range(len(ps)):
                if i == j or drop[i] or drop[j]:
                    continue
                if sets[i] < sets[j] or (sets[i] == sets[j] and j < i):
                    drop[i] = True
        if any(drop):
            ps = [p for p, d in zip(ps, drop) if not d]
            changed = True
            continue
        # (b) suffix/prefix splice
        done = False
        for i in range(len(ps)):
            for j in range(len(ps)):
                if i == j:
                    continue
                pi, pj = ps[i], ps[j]
                max_k = min(len(pi), len(pj))
                for k in range(max_k, 0, -1):  # longest overlap first
                    if pi[-k:] == pj[:k]:
                        spliced = pi + pj[k:]
                        ps = [p for t, p in enumerate(ps) if t not in (i, j)]
                        ps.append(spliced)
                        changed = done = True
                        break
                if done:
                    break
            if done:
                break
    return ps


def coords_to_vertex_ids(*lines: np.ndarray) -> list[np.ndarray]:
    """Shared-vertex-ID arrays across polylines — ≙ M11
    (``/root/reference/src/utils/featureCoordsToIdArrays.js:22-41``): every
    EXACT coordinate gets one integer id shared across all input lines, so
    graph construction can key nodes by vertex id instead of coordinate
    strings. Ids are dense and deterministic (first-appearance order over
    the concatenated input). Returns one id array per input line."""
    if not lines:
        return []
    all_xy = np.vstack([np.asarray(l, dtype=np.float64) for l in lines])
    # first-appearance ids: np.unique gives sorted uniques; remap through
    # the order of first occurrence for determinism independent of values
    _, first_idx, inverse = np.unique(
        all_xy.view([("x", np.float64), ("y", np.float64)]).ravel(),
        return_index=True, return_inverse=True,
    )
    order = np.argsort(np.argsort(first_idx))  # unique-row -> appearance rank
    ids = order[inverse]
    out = []
    pos = 0
    for l in lines:
        n = len(l)
        out.append(ids[pos : pos + n].astype(np.int64))
        pos += n
    return out


def union_paths_fixpoint(coords: list, id_lists: list, tol: float):
    """Iterative path union to a FIXPOINT with the reference's two merge
    algorithms alternating — ≙ ``unionPathLineStrings.js:54-135``:
    (a) metadata splice by id-overlap (``merge_paths_by_ids`` semantics,
    applied to the coordinate paths in lockstep) and (b) geospatial
    end-to-start merge within ``tol`` (``mergeLineStringsGeospatially``).
    Repeats until neither algorithm changes the path set. Returns
    (merged_coords, merged_id_lists), deterministic (index order scan)."""
    ps = [np.asarray(c, dtype=np.float64) for c in coords]
    ids = [list(i) for i in id_lists]

    def _meta_round():
        for i in range(len(ps)):
            for j in range(len(ps)):
                if i == j:
                    continue
                si, sj = set(ids[i]), set(ids[j])
                if si and (si < sj or (si == sj and j < i)):
                    del ps[i], ids[i]  # subset path absorbed
                    return True
                mk = min(len(ids[i]), len(ids[j]))
                for k in range(mk, 0, -1):
                    if ids[i][-k:] == ids[j][:k]:
                        ids_new = ids[i] + ids[j][k:]
                        coords_new = np.vstack([ps[i], ps[j][1:]]) if np.allclose(
                            ps[i][-1], ps[j][0]
                        ) else np.vstack([ps[i], ps[j]])
                        for t in sorted((i, j), reverse=True):
                            del ps[t], ids[t]
                        ps.append(coords_new)
                        ids.append(ids_new)
                        return True
        return False

    def _geo_round():
        for i in range(len(ps)):
            for j in range(len(ps)):
                if i == j:
                    continue
                if np.hypot(*(ps[i][-1] - ps[j][0])) <= tol:
                    joined = np.vstack([ps[i], ps[j][1:]]) if np.hypot(
                        *(ps[i][-1] - ps[j][0])
                    ) == 0 else np.vstack([ps[i], ps[j]])
                    ids_new = ids[i] + ids[j]
                    for t in sorted((i, j), reverse=True):
                        del ps[t], ids[t]
                    ps.append(joined)
                    ids.append(ids_new)
                    return True
        return False

    changed = True
    while changed:
        changed = False
        while _meta_round():
            changed = True
        while _geo_round():
            changed = True
    return ps, ids


def union_paths_by_ids_geo(paths: list, centro: dict, tol2: int) -> list[list[int]]:
    """Id-centric two-algorithm path union to a fixpoint — ≙
    ``unionPathLineStrings.js:54-135`` with the path geometry DERIVED from
    the id chain (each id's tile centroid, exact int64 coords), so the whole
    fixpoint is a pure-integer id-list computation with an exact SQL mirror
    (cf. the coordinate-carrying ``union_paths_fixpoint`` variant above).

    Deterministic per-step priority order, identical to the oracle's
    unrolled step CTEs: (1) the metadata algorithm to ITS fixpoint
    (``merge_paths_by_ids``: parallel subset-drop pass, else first-lex
    longest suffix-prefix splice), then (2) ONE geospatial concat — the
    first (i, j) in index order with
    ``dist2(centro[ps[i][-1]], centro[ps[j][0]]) <= tol2`` — then back to
    (1). Every action removes >= 1 path, so the fixpoint is reached in
    < len(paths) steps. Returns the merged id lists (merge results append
    at the END, matching the engine/oracle list bookkeeping)."""
    ps = merge_paths_by_ids(paths)
    while True:
        hit = None
        for i in range(len(ps)):
            for j in range(len(ps)):
                if i == j:
                    continue
                lx, ly = centro[ps[i][-1]]
                fx, fy = centro[ps[j][0]]
                if (lx - fx) * (lx - fx) + (ly - fy) * (ly - fy) <= tol2:
                    hit = (i, j)
                    break
            if hit is not None:
                break
        if hit is None:
            return ps
        i, j = hit
        joined = ps[i] + ps[j]
        ps = [p for t, p in enumerate(ps) if t not in (i, j)]
        ps.append(joined)
        ps = merge_paths_by_ids(ps)


def merge_chains(lines: list[np.ndarray], tol: float) -> list[np.ndarray]:
    """Greedy end-to-start geospatial merge: repeatedly join a line whose
    start is within ``tol`` of another's end (gap bridged by concatenation)
    — ≙ mergeLineStringsGeospatially
    (``utils/gis/mergeLineStringsGeospatially.js:8-107``). Deterministic:
    lines are processed in input order, joins pick the first match."""
    parts = [l.copy() for l in lines if len(l) >= 2]
    merged = True
    while merged and len(parts) > 1:
        merged = False
        for i in range(len(parts)):
            for j in range(len(parts)):
                if i == j:
                    continue
                if np.hypot(*(parts[i][-1] - parts[j][0])) <= tol:
                    joined = np.vstack([parts[i], parts[j][1:]]) if np.hypot(
                        *(parts[i][-1] - parts[j][0])
                    ) == 0 else np.vstack([parts[i], parts[j]])
                    parts = [p for k, p in enumerate(parts) if k not in (i, j)] + [joined]
                    merged = True
                    break
            if merged:
                break
    return parts


def rmsd_to_line(points: np.ndarray, line: np.ndarray) -> float:
    """Root-mean-square snap deviation of points to the line — the
    reference's match edge weight (``buildShstMatchSubGraphsPerGtfsShapeSegment.js:17-44``)."""
    d, _ = project_points(points, line)
    return float(np.sqrt((d**2).mean()))


def snap_stats(points: np.ndarray, line: np.ndarray) -> dict:
    """Mean/stddev/quantiles of vertex snap deviations — ≙ A10
    (``utils/gis/getSimilarity.js:24-102``)."""
    d, _ = project_points(points, line)
    qs = np.quantile(d, [0.1, 0.25, 0.5, 0.75, 0.9])
    return {
        "mean": float(d.mean()),
        "stddev": float(d.std()),
        "q10": float(qs[0]),
        "q25": float(qs[1]),
        "median": float(qs[2]),
        "q75": float(qs[3]),
        "q90": float(qs[4]),
    }


def convex_hull_int(xy: np.ndarray) -> np.ndarray:
    """Andrew monotone-chain convex hull over int64 points — the turf
    ``convex`` parity leftover (the reference buffers + hulls segment
    geometry when building geopoly probes,
    ``/root/reference/src/daos/ConflationMapDAO/loaders.js:104-113``).
    Input order-insensitive: points are deduplicated + lexicographically
    sorted first. Returns hull vertices CCW starting at the
    lexicographically smallest point; collinear points are dropped
    (strict-left-turn retention, ``cross <= 0`` pops). Pure int64 cross
    products — exactly the arithmetic the recursive-CTE SQL mirror runs."""
    pts = np.unique(xy.astype(np.int64), axis=0)  # lexsorted (x, then y)
    n = len(pts)
    if n <= 2:
        return pts

    def _half(p: np.ndarray) -> list[np.ndarray]:
        st: list[np.ndarray] = []
        for q in p:
            while len(st) >= 2 and (
                (st[-1][0] - st[-2][0]) * (q[1] - st[-2][1])
                - (st[-1][1] - st[-2][1]) * (q[0] - st[-2][0])
            ) <= 0:
                st.pop()
            st.append(q)
        return st

    lower = _half(pts)
    upper = _half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.int64)


def shoelace_area2(hull: np.ndarray) -> int:
    """Twice the signed polygon area (int64 shoelace) — positive for the
    CCW hulls ``convex_hull_int`` emits; 0 for degenerate (<3 vertex)
    hulls."""
    if len(hull) < 3:
        return 0
    x, y = hull[:, 0], hull[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    return int((x * yn - xn * y).sum())
