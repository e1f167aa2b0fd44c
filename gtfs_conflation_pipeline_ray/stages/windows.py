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

    return ds.map_batches(_floor, batch_format="pyarrow", batch_size=8192)


def hopping_window(ds, ts_col: str, size_s: int = 3600, hop_s: int = 1800,
                   out_col: str = "win_start_s"):
    """Overlapping (hopping/sliding) windows: each event lands in every
    window of ``size_s`` whose start is a multiple of ``hop_s`` covering its
    timestamp — exactly ``size_s // hop_s`` windows per event when the size
    is a hop multiple. Vectorized flat-map (repeat + tile); the grouped
    aggregate downstream sees (key, window-start) rows. ``out_col`` is the
    epoch-second window start (int64, oracle-exact)."""
    assert size_s % hop_s == 0, "window size must be a multiple of the hop"
    k = size_s // hop_s
    hop_us = np.int64(hop_s) * 1_000_000

    def _hop(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ts)
        m_hi = ts // hop_us  # the latest window start covering the event
        m = np.repeat(m_hi, k) - np.tile(np.arange(k, dtype=np.int64), n)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        cols = {c: batch[c].take(idx) for c in batch.column_names if c != ts_col}
        cols[out_col] = m * hop_s
        return pa.table(cols)

    return ds.map_batches(_hop, batch_format="pyarrow", batch_size=8192)


class _WindowState:
    """Per-worker interval-join state: windows sorted by composite
    (dense key rank, start_ts offset) for two-binary-search range probes.

    The bit budget is sized from the DATA at build time: ``ts_bits`` covers
    the actual window timestamp span and key ranks are densified (unique
    window keys, not raw key values), so arbitrary int64 keys are safe. If
    rank_bits + ts_bits would overflow int64, fall back to a per-key dict of
    sorted ts sub-arrays (still exact; one vectorized searchsorted per
    distinct probe key)."""

    def __init__(self, w: pa.Table, key: str, ts_col: str):
        wk = w[key].to_numpy(zero_copy_only=False).astype(np.int64)
        wts = w[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        wid = w["window_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.base = np.int64(wts.min() if len(wts) else 0)
        self.keys = np.unique(wk)
        span = int(wts.max() - self.base) if len(wts) else 0
        self.ts_bits = np.int64(max(int(span + 2).bit_length(), 2))
        rank_bits = int(len(self.keys)).bit_length()
        self.use_dict = int(self.ts_bits) + rank_bits > 62
        if self.use_dict:
            # exact fallback for (huge span x many keys): per-key sorted ts
            order = np.lexsort((wts, wk))
            wk, wts, wid = wk[order], wts[order], wid[order]
            bounds = np.searchsorted(wk, self.keys, side="left")
            bounds = np.append(bounds, len(wk))
            self.per_key = {
                int(k): (wts[bounds[i]:bounds[i + 1]], wid[bounds[i]:bounds[i + 1]])
                for i, k in enumerate(self.keys)
            }
            return
        comp = self.composite(wk, wts)
        order = np.argsort(comp, kind="stable")
        self.comp, self.wid = comp[order], wid[order]

    def composite(self, k: np.ndarray, ts: np.ndarray) -> np.ndarray:
        # dense rank of the key; unseen probe keys -> sentinel -1 (matches 0)
        r = np.searchsorted(self.keys, k)
        rc = np.minimum(r, len(self.keys) - 1) if len(self.keys) else r * 0
        missing = (r >= len(self.keys)) | (self.keys[rc] != k) if len(self.keys) else r == r
        # clamp keeps out-of-range probe bounds monotonic without overflow;
        # window offsets live in [1, span+1] strictly inside [0, 2^ts_bits-1]
        off = np.clip(ts - self.base, -1, (np.int64(1) << self.ts_bits) - 2) + 1
        comp = (r.astype(np.int64) << self.ts_bits) | off
        return np.where(missing, np.int64(-1), comp)


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
        st: _WindowState = cached_state(windows_ref, lambda w: _WindowState(w, key, ts_col),
                                        token=f"_WindowState:{key}:{ts_col}")
        pk = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        pts = batch[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        if st.use_dict:
            pis, wis = [], []
            for k in np.unique(pk):
                sub = st.per_key.get(int(k))
                if sub is None:
                    continue
                sts, swid = sub
                rows = np.flatnonzero(pk == k)
                s = np.searchsorted(sts, pts[rows] - len_us, side="right")
                e = np.searchsorted(sts, pts[rows], side="right")
                c = e - s
                pis.append(np.repeat(rows, c))
                wis.append(swid[_gather_ranges(s, c)])
            pi = np.concatenate(pis) if pis else np.array([], dtype=np.int64)
            wid = np.concatenate(wis) if wis else np.array([], dtype=np.int64)
        else:
            starts = np.searchsorted(st.comp, st.composite(pk, pts - len_us), side="right")
            ends = np.searchsorted(st.comp, st.composite(pk, pts), side="right")
            counts = ends - starts
            pi = np.repeat(np.arange(len(pk), dtype=np.int64), counts)
            wid = st.wid[_gather_ranges(starts, counts)]
        cols = {c: batch[c].take(pa.array(pi)) for c in batch.column_names}
        cols["window_id"] = wid
        return pa.table(cols)

    return probes.map_batches(_probe, batch_format="pyarrow", batch_size=32768)


class _AsofState:
    """Per-worker as-of-join state: reference rows sorted by (dense key rank,
    ts, ref_id) — the backward probe is ONE binary search on the composite
    (rank << ts_bits | ts offset); ties on (key, ts) resolve to the LARGEST
    ref_id because equal composites are id-ascending and the probe takes the
    last entry <= its own composite. Same data-sized bit budget / dict
    fallback as ``_WindowState``."""

    def __init__(self, r: pa.Table, key: str, ts_col: str, id_col: str):
        rk = r[key].to_numpy(zero_copy_only=False).astype(np.int64)
        rts = r[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        rid = r[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        self.base = np.int64(rts.min() if len(rts) else 0)
        self.keys = np.unique(rk)
        span = int(rts.max() - self.base) if len(rts) else 0
        self.ts_bits = np.int64(max(int(span + 2).bit_length(), 2))
        rank_bits = int(len(self.keys)).bit_length()
        self.use_dict = int(self.ts_bits) + rank_bits > 62
        order = np.lexsort((rid, rts, rk))
        rk, rts, rid = rk[order], rts[order], rid[order]
        if self.use_dict:
            bounds = np.searchsorted(rk, self.keys, side="left")
            bounds = np.append(bounds, len(rk))
            self.per_key = {
                int(k): (rts[bounds[i]:bounds[i + 1]], rid[bounds[i]:bounds[i + 1]])
                for i, k in enumerate(self.keys)
            }
            return
        r_rank = np.searchsorted(self.keys, rk)
        off = rts - self.base + 1  # strictly inside [1, 2^ts_bits - 1]
        self.comp = (r_rank.astype(np.int64) << self.ts_bits) | off
        self.rts, self.rid = rts, rid

    def probe_comp(self, k: np.ndarray, ts: np.ndarray) -> np.ndarray:
        rank = np.searchsorted(self.keys, k)
        rc = np.minimum(rank, len(self.keys) - 1) if len(self.keys) else rank * 0
        missing = ((rank >= len(self.keys)) | (self.keys[rc] != k)
                   if len(self.keys) else k == k)
        off = np.clip(ts - self.base, -1, (np.int64(1) << self.ts_bits) - 2) + 1
        comp = (rank.astype(np.int64) << self.ts_bits) | off
        return np.where(missing, np.int64(-1), comp), rank


def asof_join(probes, ref_ref, key: str, ts_col: str, ref_id_col: str,
              lag_col: str = "lag_us"):
    """Backward as-of join: annotate each probe row with the reference row of
    the SAME key whose ts is the latest at-or-before the probe's ts
    (ties on ts -> largest ref id), plus the exact microsecond lag.
    Unmatched probes keep the row with id = -1 / lag = -1 (left semantics
    without nullable-type drift). The reference side is broadcast once and
    index-sorted once per worker (``cached_state``); probes stream through
    stateless Arrow tasks — the same small-side partitioning assumption as
    the T1 matcher (shard by key range via ``spatial.shard_tiles``-style
    splitting when the reference outgrows worker memory). ``ref_ref`` is a
    ``ray.put`` ObjectRef of the reference pa.Table (id/key/ts columns)."""
    from .util import cached_state

    def _probe(batch: pa.Table) -> pa.Table:
        st: _AsofState = cached_state(ref_ref, lambda r: _AsofState(r, key, ts_col, ref_id_col),
                                      token=f"_AsofState:{key}:{ts_col}:{ref_id_col}")
        pk = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        pts = batch[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        rid_out = np.full(len(pk), -1, dtype=np.int64)
        lag_out = np.full(len(pk), -1, dtype=np.int64)
        if st.use_dict:
            for k in np.unique(pk):
                sub = st.per_key.get(int(k))
                if sub is None:
                    continue
                sts, srid = sub
                rows = np.flatnonzero(pk == k)
                idx = np.searchsorted(sts, pts[rows], side="right") - 1
                hit = idx >= 0
                r = rows[hit]
                rid_out[r] = srid[idx[hit]]
                lag_out[r] = pts[r] - sts[idx[hit]]
        elif len(st.keys):
            comp, rank = st.probe_comp(pk, pts)
            idx = np.searchsorted(st.comp, comp, side="right") - 1
            safe = np.maximum(idx, 0)
            hit = (idx >= 0) & (comp >= 0) & ((st.comp[safe] >> st.ts_bits) == rank)
            rid_out[hit] = st.rid[idx[hit]]
            lag_out[hit] = pts[hit] - st.rts[idx[hit]]
        cols = {c: batch[c] for c in batch.column_names}
        cols[ref_id_col] = pa.array(rid_out)
        cols[lag_col] = pa.array(lag_out)
        return pa.table(cols)

    return probes.map_batches(_probe, batch_format="pyarrow", batch_size=32768)


def funnel(ds, key: str, ts_col: str, type_col: str, steps: list[str]):
    """Ordered-sequence (funnel / CEP-lite) detection: per key, the greedy
    earliest completion of ``steps`` — t₁ = min ts of step 1, t₂ = min ts of
    step 2 STRICTLY after t₁, and so on. The per-key scan a
    MATCH_RECOGNIZE-style engine runs, expressed as one grouped vectorized
    kernel (no per-event Python): inside each bucket, one boolean mask +
    grouped min per step, each conditioned on the previous step's time via a
    key-aligned map.

    Returns (key, steps, t1_us..tk_us) with −1 sentinels for missing steps;
    every key that appears in the input gets a row. Integer µs timestamps
    end-to-end, so the SQL mirror (chained MIN + strict > joins) is exact.
    ≙ the reference's TripTracker forward-only state machine (T6,
    ``GtfsScheduledTrafficDAO/TripTracker.js``) generalized to labeled event
    sequences."""
    from .relational import bucketed_groups

    def _funnel(g: pd.DataFrame) -> pd.DataFrame:
        us = g[ts_col].to_numpy()
        keys = g[key].to_numpy()
        typ = g[type_col].to_numpy()
        out = pd.DataFrame({key: np.unique(keys)})
        prev = pd.Series(np.full(len(out), -1, dtype=np.int64),
                         index=out[key].to_numpy())
        tcols = []
        for i, step in enumerate(steps):
            if i == 0:
                mask = typ == step
            else:
                prev_t = prev.reindex(keys).to_numpy()
                mask = (typ == step) & (prev_t != -1) & (us > prev_t)
            t = (pd.Series(us[mask], index=keys[mask])
                 .groupby(level=0).min()
                 .reindex(out[key].to_numpy()).fillna(-1).astype(np.int64))
            col = f"t{i + 1}_us"
            out[col] = t.to_numpy()
            tcols.append(col)
            prev = t
        done = np.zeros(len(out), dtype=np.int64)
        for col in tcols:
            done += (out[col].to_numpy() != -1).astype(np.int64)
        # steps are chained (a later step requires the earlier), so the count
        # of non-sentinels IS the completed prefix length
        out.insert(1, "steps", done)
        return out

    return bucketed_groups(ds, [key], _funnel)


def ewma_by_key(ds, key: str, order: list[str], val_col: str,
                num: int = 3, den: int = 4):
    """Stateful-streaming EWMA in integer floor arithmetic — the per-key
    sequential recurrence a₀ = v₀, aₜ = ⌊(num·aₜ₋₁ + vₜ) / den⌋ (num/den =
    3/4 ≙ α = 0.25), the exact-integer form of the exponential smoothing
    every metrics pipeline runs. Inherently sequential per key (each step
    reads the previous), so the kernel loops WITHIN a key group over its
    (already vectorized-sorted) value array; keys are independent and
    shuffle-parallel. Returns (key, n_events, ewma_final_c, ewma_max_c).

    Floor division matches DuckDB ``//`` exactly (true floor, not
    truncation), so the recursive-CTE oracle is bit-identical."""
    from .relational import bucketed_groups

    def _ewma(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key, *order], kind="mergesort")
        k = d[key].to_numpy()
        v = d[val_col].to_numpy().astype(np.int64)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(d)]
        keys_out = k[starts]
        n_out = (ends - starts).astype(np.int64)
        fin = np.empty(len(starts), np.int64)
        mx = np.empty(len(starts), np.int64)
        for gi, (s, e) in enumerate(zip(starts, ends)):
            a = int(v[s])
            amax = a
            for t in range(s + 1, e):
                a = (num * a + int(v[t])) // den
                if a > amax:
                    amax = a
            fin[gi] = a
            mx[gi] = amax
        return pd.DataFrame({key: keys_out, "n_events": n_out,
                             "ewma_final_c": fin, "ewma_max_c": mx})

    return bucketed_groups(ds, [key], _ewma)


def rate_limit_by_key(ds, key: str, order: list[str], ts_col: str,
                      cap: int = 3, period: int = 600_000_000):
    """Stateful token-bucket RATE LIMITING — the admission-control pass of
    every event-ingest pipeline, replayed exactly: per key, walk events in
    ``order``; before each event refill ``(t - t_prev) // period`` tokens
    (clamped to ``cap``, bucket starts full), admit iff a token is
    available and spend it. Emits (key, n_events, n_admitted,
    tokens_final). All-integer (timestamps in µs), so the recursive-CTE
    oracle replays the identical steps. Same execution shape as
    :func:`ewma_by_key`: keys shuffle-parallel, steps in-key sequential."""
    from .relational import bucketed_groups

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key, *order], kind="mergesort")
        k = d[key].to_numpy()
        t = d[ts_col].to_numpy().astype(np.int64)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(d)]
        adm = np.empty(len(starts), np.int64)
        fin = np.empty(len(starts), np.int64)
        for gi, (s, e) in enumerate(zip(starts, ends)):
            tokens, admitted, prev = cap, 0, None
            for i in range(s, e):
                if prev is not None:
                    tokens = min(cap, tokens + (int(t[i]) - prev) // period)
                if tokens >= 1:
                    tokens -= 1
                    admitted += 1
                prev = int(t[i])
            adm[gi] = admitted
            fin[gi] = tokens
        return pd.DataFrame({key: k[starts],
                             "n_events": (ends - starts).astype(np.int64),
                             "n_admitted": adm, "tokens_final": fin})

    return bucketed_groups(ds, [key], _scan)


def scd2_intervals(ds, key: str, order: list[str], ts_col: str,
                   val_col: str, sentinel: int = 1 << 62):
    """Type-2 SLOWLY-CHANGING-DIMENSION build: a change stream becomes
    validity intervals — per key ordered by ``order``, each version is
    valid from its own timestamp until the NEXT version's ([from, to)),
    the last one open-ended (``sentinel`` + is_current) — the history
    table every warehouse dimension load maintains, next to the
    latest-wins compaction of ``snapshot_upsert``. One key-bucketed
    shuffle; the in-key pass is a vectorized shift."""
    from .relational import bucketed_groups

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key, *order], kind="mergesort")
        k = d[key].to_numpy()
        ts = d[ts_col].to_numpy().astype(np.int64)
        last = np.r_[k[1:] != k[:-1], True]
        vto = np.r_[ts[1:], np.int64(sentinel)]
        vto[last] = sentinel
        return pd.DataFrame({
            key: k, "valid_from_us": ts, "valid_to_us": vto,
            "value_c": d[val_col].to_numpy().astype(np.int64),
            "is_current": last,
        })

    return bucketed_groups(ds, [key], _scan)


def gap_fill_locf(ds, key: str, day_col: str, order: list[str],
                  val_col: str):
    """Dense-grid GAP FILLING with last-observation-carried-forward — the
    time-series repair pass every metrics/feature store runs before
    training (a sparse per-key daily stream becomes a dense series with
    no holes). Per key: the last value of each present day (greatest
    ``order``, e.g. (ts, event_id)) wins, the day grid spans the key's
    own [min_day, max_day], and absent days copy the previous day's
    value (``is_filled`` marks them).

    Execution shape: the per-(key, day) "last row wins" reduction is
    associative, so it runs as a per-batch combiner BEFORE the one
    key-bucketed shuffle (the shuffle moves at most one row per (key,
    day) per batch, never raw events). The in-bucket pass is fully
    vectorized: a ragged ``arange`` expansion builds every key's dense
    grid at once and the carry-forward is one global
    ``np.maximum.accumulate`` over last-present positions — sound
    across key boundaries because each key's FIRST grid day is always
    present (it is that key's min present day).
    """
    from .relational import bucketed_groups

    def _last_per_day(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key, day_col, *order], kind="mergesort")
        return d.groupby([key, day_col], as_index=False, sort=False,
                         observed=True).last()

    def _fill(g: pd.DataFrame) -> pd.DataFrame:
        d = _last_per_day(g)
        k = d[key].to_numpy()
        day = d[day_col].to_numpy().astype(np.int64)
        v = d[val_col].to_numpy().astype(np.int64)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(d)]
        d0, d1 = day[starts], day[ends - 1]
        reps = d1 - d0 + 1
        off0 = np.cumsum(reps) - reps  # each key's base slot in the grid
        n = int(reps.sum())
        gi = np.repeat(np.arange(len(starts)), reps)  # key index per slot
        grid_day = d0[gi] + (np.arange(n) - off0[gi])
        # scatter present rows onto their grid slots
        row_gi = np.repeat(np.arange(len(starts)), ends - starts)
        slot = off0[row_gi] + (day - d0[row_gi])
        vals = np.zeros(n, np.int64)
        present = np.zeros(n, bool)
        vals[slot] = v
        present[slot] = True
        # LOCF: index of the latest present slot at-or-before each slot
        src = np.maximum.accumulate(np.where(present, np.arange(n), -1))
        return pd.DataFrame({
            key: k[starts][gi], "day": grid_day, "v_c": vals[src],
            "is_filled": (~present).astype(np.int64),
        })

    return bucketed_groups(ds, [key], _fill, pre_fn=_last_per_day)


def greedy_nonoverlap(s: np.ndarray, e: np.ndarray) -> tuple[int, int]:
    """Earliest-end GREEDY ACTIVITY SELECTION over one group's intervals,
    PRE-SORTED by the caller's (e, s, tie) order: scan in end order,
    pick whenever start ≥ the last picked end ([s, e) half-open). The
    greedy is provably optimal in selection count for interval
    scheduling. Returns (n_selected, sum of selected ends)."""
    cur_end = None
    cnt = 0
    tot = 0
    for i in range(len(s)):
        if cur_end is None or s[i] >= cur_end:
            cur_end = int(e[i])
            cnt += 1
            tot += cur_end
    return cnt, tot
