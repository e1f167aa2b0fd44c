"""Relational stage helpers: per-batch partial aggregation, bucketed grouped
combine, broadcast lookup joins, per-group top-k / rank / list-assembly.

Reference parity (SURVEY.md §2): J1-J4/J8 equi-join chains, A1 group->list
assembly (``group_concat`` re-assembly,
``/root/reference/src/daos/GtfsOsmNetworkDAO/generators.js:72-113``), O2-O5
in-group sorts and best-first picks, D7 distinct.

Scale design — the bucketed-combine pattern:
  Ray's built-in ``groupby().aggregate()`` / ``map_groups`` invokes Python per
  GROUP, which collapses at high key cardinality (measured ~850 rows/s on 43k
  groups). Every grouped operator here instead:
    1. combines inside each batch with a vectorized pandas groupby (the
       partial/combiner step — shrinks the shuffle to one row per key/batch),
    2. shuffles by a LOW-cardinality deterministic bucket column
       ``_b = row_hash(keys) % B`` (B ~ cluster CPUs, not #groups),
    3. finishes each bucket with ONE vectorized pandas groupby.
  The all-to-all exchange therefore moves pre-combined rows into B buckets —
  the same partial->final plan a SQL engine runs, expressed in Ray Data.
  Skewed group keys spread across buckets by hash; a single hot GROUP is
  already pre-combined per batch before it ever shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .util import pool_size


_TARGET_ROWS_PER_BUCKET = 2_000_000


def _n_buckets(requested: int | None = None, est_rows: int | None = None) -> int:
    """Bucket count for the grouped-combine shuffle: at least the cluster CPU
    count (parallelism), and scaled UP with the estimated input rows so the
    per-bucket final combine materializes ~``_TARGET_ROWS_PER_BUCKET`` rows,
    not dataset/CPUs (which is an OOM by design at 100x data). Callers that
    stream a fact table pass ``est_rows`` from parquet metadata (a
    metadata-only read, no data scan)."""
    if requested:
        return requested
    try:
        base = max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        base = 16
    if est_rows:
        return max(base, -(-int(est_rows) // _TARGET_ROWS_PER_BUCKET))
    return base


def _bucket_of(df: pd.DataFrame, keys: list[str], n_buckets: int) -> np.ndarray:
    """Deterministic per-row bucket from the key columns (vectorized)."""
    h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int64)


def bucketed_groups(ds, keys: list[str], final_fn, pre_fn=None, n_buckets: int | None = None,
                    est_rows: int | None = None):
    """Generic grouped transform via the bucketed-combine pattern.

    ``pre_fn(df) -> df`` (optional) runs per batch BEFORE the shuffle (the
    combiner); ``final_fn(df) -> df`` runs once per bucket on the union of
    that bucket's rows and must itself group by ``keys`` (vectorized).
    """
    nb = _n_buckets(n_buckets, est_rows)

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        if pre_fn is not None:
            df = pre_fn(df)
        if len(df) == 0:
            return df.assign(_b=np.array([], dtype=np.int64))
        return df.assign(_b=_bucket_of(df, keys, nb))

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return final_fn(g.drop(columns=["_b"]))

    staged = ds.map_batches(_pre, batch_format="pandas", batch_size=8192)
    return staged.groupby("_b").map_groups(_final, batch_format="pandas")


def partial_groupby_sum(ds, keys: list[str], sums: list[str], count_as: str | None = None,
                        n_buckets: int | None = None, est_rows: int | None = None):
    """Grouped sum/count: per-batch partial sums -> bucketed final combine.
    Returns a Dataset with columns keys + sums (+ count_as)."""
    agg = {c: "sum" for c in sums}
    if count_as:
        agg[count_as] = "sum"

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        if count_as:
            df = df.assign(**{count_as: np.int64(1)})
        return df.groupby(keys, as_index=False, sort=False, observed=True).agg(agg)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, as_index=False, sort=False, observed=True).agg(agg)

    return bucketed_groups(ds, keys, _final, pre_fn=_pre, n_buckets=n_buckets,
                           est_rows=est_rows)


def group_topk(
    ds,
    keys: list[str],
    order_by: list[tuple[str, bool]],
    k: int,
    rank_col: str | None = None,
    n_buckets: int | None = None,
    est_rows: int | None = None,
):
    """Per-group top-k with a deterministic total order (always include a
    unique tie-breaker — the reference's order-sensitive keep-rules D3-D5
    made deterministic, SURVEY §7.6-1). Fully vectorized per bucket:
    sort + groupby.head/cumcount, no per-group Python."""
    cols = [c for c, _ in order_by]
    asc = [a for _, a in order_by]

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        # batch-local top-k is a valid combiner for top-k
        d = df.sort_values(cols, ascending=asc, kind="mergesort")
        return d.groupby(keys, sort=False, observed=True).head(k)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(cols, ascending=asc, kind="mergesort")
        d = d.groupby(keys, sort=False, observed=True).head(k)
        if rank_col:
            d = d.sort_values(keys + cols, ascending=[True] * len(keys) + asc, kind="mergesort")
            d[rank_col] = d.groupby(keys, sort=False, observed=True).cumcount() + 1
        return d

    return bucketed_groups(ds, keys, _final, pre_fn=_pre, n_buckets=n_buckets,
                           est_rows=est_rows)


def group_concat(ds, keys: list[str], value_col: str, out_col: str, sep: str = ",",
                 n_buckets: int | None = None, distinct: bool = False,
                 fmt=str, est_rows: int | None = None):
    """Per-group ordered string concatenation — ≙ SQLite
    ``group_concat(... ORDER BY ...)`` list re-assembly (A1); ``distinct=True``
    gives the DISTINCT-list aggregate (A4,
    ``GtfsConflationScheduleJoinDAO/createTableFns.js:26-78``). The in-group
    sort is explicit (the reference relied on DB scan order, SURVEY §2.9);
    ``fmt`` renders each value (must match the SQL representation)."""

    def _concat(v):
        vals = np.unique(v.to_numpy()) if distinct else np.sort(v.to_numpy())
        return sep.join(fmt(x) for x in vals)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(keys, sort=False, observed=True)[value_col].agg(_concat)
        return s.rename(out_col).reset_index()

    # distinct mode has a valid combiner (dedup is idempotent): per-batch
    # (key, value) dedup shrinks a hot key's duplicated values BEFORE the
    # shuffle — the salting-equivalent for this holistic aggregate. The
    # non-distinct mode moves every value by definition (output is
    # group-sized), so there is nothing to combine.
    _pre = (lambda df: df.drop_duplicates(keys + [value_col])) if distinct else None

    return bucketed_groups(ds, keys, _final, pre_fn=_pre, n_buckets=n_buckets,
                           est_rows=est_rows)


def distinct(ds, cols: list[str], n_buckets: int | None = None, est_rows: int | None = None):
    """Distinct tuples: per-batch dedup (combiner) then per-bucket dedup —
    ≙ D7 / SELECT DISTINCT."""

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        return df[cols].drop_duplicates()

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    return bucketed_groups(ds, cols, _final, pre_fn=_pre, n_buckets=n_buckets,
                           est_rows=est_rows)


def grouped_agg(ds, keys: list[str], final_fn, n_buckets: int | None = None,
                est_rows: int | None = None):
    """Escape hatch: arbitrary vectorized per-bucket grouped aggregation
    (``final_fn`` sees all rows of each bucket, must group by keys)."""
    return bucketed_groups(ds, keys, final_fn, n_buckets=n_buckets, est_rows=est_rows)


def broadcast_lookup(ds, small_ref, on: str, mapping: dict[str, str]):
    """Map-side join against a broadcast small table (`ray.put` of a pandas
    DataFrame indexed by the join key). ``mapping`` = {small_col: out_col}.
    Inner semantics: rows without a match are dropped.

    ≙ the reference's memoized small lookups (T7,
    ``RawGtfsDAO/getters.js:9-30``) and 1-row cross joins (J8)."""

    class _Lookup:
        def __init__(self):
            self.small: pd.DataFrame = ray.get(small_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(
                self.small[list(mapping)].rename(columns=mapping),
                left_on=on,
                right_index=True,
                how="inner",
            )

    return ds.map_batches(_Lookup, batch_format="pandas", batch_size=8192,
                          concurrency=pool_size(2))


def anti_join_keys(ds, key_col: str, exclude_ref):
    """Broadcast anti-join: drop rows whose key is in the broadcast key set.
    ≙ the reference's unmatched-set filtering (T3 anti-join by pp_id,
    ``shstMatchFeatures.js:243-281``)."""

    class _Anti:
        def __init__(self):
            keys = ray.get(exclude_ref)
            self.keys = np.sort(np.asarray(keys))

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = batch[key_col].to_numpy(zero_copy_only=False)
            if len(self.keys) == 0:
                return batch
            idx = np.clip(np.searchsorted(self.keys, v), 0, len(self.keys) - 1)
            hit = self.keys[idx] == v
            return batch.filter(pa.array(~hit))

    return ds.map_batches(_Anti, batch_format="pyarrow", batch_size=8192,
                          concurrency=pool_size(2))


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Exact bit length of uint64 values, vectorized (binary-search shifts;
    no float log2, whose 53-bit mantissa misrounds near high powers of 2)."""
    r = np.zeros(w.shape, dtype=np.int64)
    x = w.astype(np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        hit = x >= (np.uint64(1) << np.uint64(s))
        r[hit] += s
        x = np.where(hit, x >> np.uint64(s), x)
    r[x > 0] += 1
    return r


def approx_distinct(ds, keys: list[str], value_col: str, p: int = 10,
                    n_buckets: int | None = None, est_rows: int | None = None):
    """Distributed approximate-distinct-count sketch (HyperLogLog registers)
    — the cardinality analog of ``binned_quantiles``: the shuffle moves at
    most ``groups x 2^p`` pre-combined register rows per batch regardless of
    input size (an exact global distinct needs a full key shuffle; see
    ``distinct``). 100 TB path for "how many unique users/urls per key".

    Every decision is integer-exact and therefore SQL-mirrorable: values
    hash through the closed-form ``splitmix64`` (same mulmod decomposition
    the minhash oracle uses), register = low ``p`` bits, rank = leading-zero
    rank of the remaining 64-p bits (exact bit-length, no float log), and
    the returned estimate is the raw harmonic mean scaled to x1000 with the
    division done in exact big-int arithmetic:

        est_x1000 = floor(m^2 * 1000 * 2^64 / sum_j 2^(64 - M_j))

    (empty registers contribute 2^64). Alpha/bias/linear-counting correction
    is left to the caller — ``n_regs`` (occupied registers) is returned so a
    consumer can apply linear counting in the small-cardinality regime; the
    pytest applies the standard corrections and checks accuracy vs truth."""
    from ..functions import text as tx

    m = 1 << p
    wbits = 64 - p

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        v = np.ascontiguousarray(
            df[value_col].to_numpy().astype(np.int64)).view(np.uint64)
        h = tx.splitmix64(v)
        reg = (h & np.uint64(m - 1)).astype(np.int64)
        w = h >> np.uint64(p)
        rank = np.int64(wbits) - _bitlen_u64(w) + np.int64(1)
        d = df[keys].assign(_reg=reg, _rank=rank)
        return d.groupby(keys + ["_reg"], as_index=False, sort=False,
                         observed=True)["_rank"].max()

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby(keys + ["_reg"], as_index=False, sort=False,
                      observed=True)["_rank"].max()
        h = h.sort_values(keys + ["_reg"], kind="mergesort")
        ranks = h["_rank"].to_numpy()
        kv = h[keys].to_numpy()
        new = np.ones(len(h), dtype=bool)
        new[1:] = (kv[1:] != kv[:-1]).any(axis=1)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(h))
        rows = []
        num = (m * m * 1000) << 64  # exact big-int numerator
        for s, e in zip(starts, ends):
            n_regs = int(e - s)
            S = (m - n_regs) << 64
            for r in ranks[s:e]:
                S += 1 << (64 - int(r))
            rows.append(tuple(h.iloc[s][keys]) + (n_regs, num // S))
        return pd.DataFrame(rows, columns=keys + ["n_regs", "est_x1000"]) \
            .astype({"n_regs": np.int64, "est_x1000": np.int64})

    return bucketed_groups(ds, keys, _final, pre_fn=_pre, n_buckets=n_buckets,
                           est_rows=est_rows)


def binned_quantiles(ds, keys: list[str], value_col: str, vmax: int,
                     n_bins: int = 4096,
                     qs: tuple = ((1, 10), (1, 4), (1, 2), (3, 4), (9, 10)),
                     names: tuple = ("q10", "q25", "q50", "q75", "q90"),
                     n_buckets: int | None = None, est_rows: int | None = None):
    """Distributed APPROXIMATE-quantile aggregate via a fixed-width integer
    histogram — the global-distribution analog of the per-pair snap stats
    (A10, ``functions/geom.py::snap_stats``).

    Each batch bins ``value_col`` (non-negative ints in [0, vmax]) into
    ``bin = v * n_bins // (vmax + 1)`` and emits (keys, bin, cnt) partials, so
    the shuffle moves at most ``groups x n_bins`` pre-combined rows per batch
    regardless of input size — this is the 100 TB path where an exact global
    quantile would need a full sort. The per-bucket final cumulates the
    histogram and reports, for each q = qn/qd, the LOWER EDGE of the first bin
    whose cumulative count reaches ``ceil(n * qn / qd)`` (nearest-rank on the
    binned distribution; error bounded by one bin width = (vmax+1)/n_bins).
    Every decision is integer arithmetic, so a SQL oracle reproduces the
    output bit-for-bit even though the quantile itself is approximate.
    """

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy().astype(np.int64)
        d = df[keys].assign(_bin=v * np.int64(n_bins) // np.int64(vmax + 1),
                            _cnt=np.int64(1))
        return d.groupby(keys + ["_bin"], as_index=False, sort=False,
                         observed=True)["_cnt"].sum()

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby(keys + ["_bin"], as_index=False, sort=False,
                      observed=True)["_cnt"].sum()
        h = h.sort_values(keys + ["_bin"], kind="mergesort")
        gb = h.groupby(keys, sort=False, observed=True)
        cum = gb["_cnt"].cumsum().to_numpy()
        n = gb["_cnt"].transform("sum").to_numpy()
        edge = h["_bin"].to_numpy() * np.int64(vmax + 1) // np.int64(n_bins)
        out = h[keys].drop_duplicates().reset_index(drop=True)
        out["n"] = gb["_cnt"].sum().to_numpy()
        cnt = h["_cnt"].to_numpy()
        for (qn, qd), name in zip(qs, names):
            target = (n * np.int64(qn) + np.int64(qd) - 1) // np.int64(qd)
            pick = (cum >= target) & (cum - cnt < target)
            sel = h.loc[pick, keys].assign(**{name: edge[pick]})
            out = out.merge(sel, on=keys, how="left")
            out[name] = out[name].fillna(-1).astype(np.int64)
        return out

    return bucketed_groups(ds, keys, _final, pre_fn=_pre, n_buckets=n_buckets,
                           est_rows=est_rows)


def hash_sample(ds, id_col: str, default_permille: int,
                strata_col: str | None = None,
                strata_permille: dict | None = None):
    """Deterministic stratified sampling: keep a row iff
    ``(((id & 0xFFFFFFFF) * 2654435761) mod 2^32) mod 1000 < rate``, where
    the rate comes from the row's stratum (``strata_permille``) or
    ``default_permille``. The Knuth multiplicative hash decorrelates the
    keep-set from any id ordering/assignment pattern while staying a pure
    integer function — the sample is reproducible across runs/cluster sizes
    and SQL-mirrorable (no RNG state, no per-partition seed to coordinate).
    The id is masked to its low 32 bits BEFORE the multiply: the product
    then fits uint64 exactly (no wrap), and the two's-complement mask is the
    same operation DuckDB's ``id & 4294967295`` performs, so engine and
    oracle agree over the FULL int64 id domain (negative ids included), not
    just ids < 2^32. Embarrassingly parallel: a stateless Arrow mask per
    batch, no shuffle."""
    m = np.uint64(2654435761)
    rates = {k: np.int64(v) for k, v in (strata_permille or {}).items()}

    def _mask(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        masked = (ids & np.int64(0xFFFFFFFF)).astype(np.uint64)
        h = ((masked * m) % np.uint64(1 << 32)) % np.uint64(1000)
        rate = np.full(len(ids), default_permille, dtype=np.int64)
        if strata_col is not None and rates:
            sv = batch[strata_col].to_numpy(zero_copy_only=False)
            for k, r in rates.items():
                rate[sv == k] = r
        return batch.filter(pa.array(h.astype(np.int64) < rate))

    return ds.map_batches(_mask, batch_format="pyarrow", batch_size=8192)


def bloom_semi_join(facts, keys_ref, fact_key: str, bits_log2: int = 20,
                    n_hashes: int = 4, batch_size: int = 32768):
    """Bloom-prefiltered EXACT semi-join: keep fact rows whose ``fact_key``
    is in the broadcast key set.

    The 100 TB membership pattern: a Bloom bitset of the key set (2^bits_log2
    bits = 128 KiB at the default — ~1000x smaller than a 10M-key int64
    broadcast) prunes the fact stream MAP-SIDE; the (rare) survivors are
    verified against the exact sorted key array, so false positives never
    reach the output and the result is EXACTLY the semi-join — the oracle is
    plain ``WHERE key IN (...)``, no sketch semantics to mirror. At real
    scale the bitset broadcasts where the key set cannot; here both ride the
    same ``ray.put`` ref and the verify is a searchsorted. ≙ the reference's
    memoized small-lookup joins (T7/J8) hardened for an unbounded fact side.

    ``keys_ref``: ``ray.put`` of an int64 numpy array (the key set).
    Returns the filtered fact Dataset (all columns)."""
    from .util import cached_state

    class _BloomState:
        def __init__(self, keys: np.ndarray):
            keys = np.asarray(keys, dtype=np.int64)
            self.keys = np.sort(keys)
            m = np.uint64(1 << bits_log2)
            bits = np.zeros((1 << bits_log2) // 64 + 1, dtype=np.uint64)
            h = keys.view(np.uint64)
            for i in range(n_hashes):
                # splitmix64-style remix per hash function, then mod m
                salt = np.uint64((0x9E3779B97F4A7C15 * (i + 1))
                                 & 0xFFFFFFFFFFFFFFFF)  # wrap in python int
                z = h + salt
                z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                pos = (z ^ (z >> np.uint64(31))) % m
                np.bitwise_or.at(bits, (pos // np.uint64(64)).astype(np.int64),
                                 np.uint64(1) << (pos % np.uint64(64)))
            self.bits = bits
            self.m = m

        def maybe_contains(self, v: np.ndarray) -> np.ndarray:
            h = v.astype(np.int64).view(np.uint64)
            ok = np.ones(len(v), dtype=bool)
            for i in range(n_hashes):
                salt = np.uint64((0x9E3779B97F4A7C15 * (i + 1))
                                 & 0xFFFFFFFFFFFFFFFF)  # wrap in python int
                z = h + salt
                z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                pos = (z ^ (z >> np.uint64(31))) % self.m
                ok &= (self.bits[(pos // np.uint64(64)).astype(np.int64)]
                       >> (pos % np.uint64(64))) & np.uint64(1) == 1
            return ok

    def _filter(batch: pa.Table) -> pa.Table:
        st: _BloomState = cached_state(keys_ref, _BloomState, token="_BloomState")
        v = batch[fact_key].to_numpy(zero_copy_only=False).astype(np.int64)
        cand = st.maybe_contains(v)          # bloom prune (map-side, tiny state)
        idx = np.flatnonzero(cand)
        if len(idx):                         # exact verify of the survivors
            pos = np.searchsorted(st.keys, v[idx])
            pos_ok = pos < len(st.keys)
            hit = np.zeros(len(idx), dtype=bool)
            hit[pos_ok] = st.keys[pos[pos_ok]] == v[idx][pos_ok]
            idx = idx[hit]
        return batch.take(pa.array(idx, pa.int64()))

    return facts.map_batches(_filter, batch_format="pyarrow",
                             batch_size=batch_size)


def kmv_distinct(ds, keys: list[str], value_col: str, k: int = 64,
                 n_buckets: int | None = None):
    """K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002) — the
    fourth sketch next to HLL registers (``approx_distinct``), Misra-Gries
    (heavy hitters) and Count-Min: per group keep the ``k`` smallest
    distinct ``splitmix64`` hashes of the value; the unbiased-form
    estimate is ``(k-1) * 2^64 // h_k`` (k-th smallest hash, hashes
    uniform on [0, 2^64)), exact big-int floor so a HUGEINT oracle
    mirrors it bit-for-bit. Groups with fewer than ``k`` distinct values
    report their exact count (splitmix64 is a bijection on uint64, so
    distinct hashes == distinct values).

    Shuffle bound: each batch contributes at most ``k`` rows per group —
    the merge property (k smallest of a union = k smallest of the
    per-part k-smallest) is what makes KMV a one-pass distributed
    sketch. Returns keys + (n_exact, kmv_est)."""
    from ..functions import text as tx

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        v = np.ascontiguousarray(
            df[value_col].to_numpy().astype(np.int64)).view(np.uint64)
        # _h stays uint64: "k smallest" must rank in UNSIGNED order (the
        # oracle's non-negative HUGEINT order); a signed view would sort
        # hashes >= 2^63 first
        d = df[keys].assign(_h=tx.splitmix64(v))
        d = d.drop_duplicates(keys + ["_h"])
        d = d.sort_values(keys + ["_h"], kind="mergesort")
        return d.groupby(keys, as_index=False, sort=False,
                         observed=True).head(k)

    def _est(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(keys + ["_h"]).sort_values(
            keys + ["_h"], kind="mergesort")
        gb = d.groupby(keys, as_index=False, sort=False, observed=True)
        top = gb.head(k)
        kv = top[keys].to_numpy()
        h = top["_h"].to_numpy().astype(np.uint64)
        starts = np.flatnonzero(
            np.r_[True, (kv[1:] != kv[:-1]).any(axis=1)])
        ends = np.r_[starts[1:], len(top)]
        nd = gb.size()["size"].to_numpy()  # distinct in this bucket's union
        out_est = np.empty(len(starts), np.int64)
        for i, (s, e) in enumerate(zip(starts, ends)):
            if nd[i] >= k:
                hk = int(h[s + k - 1])
                out_est[i] = ((k - 1) << 64) // hk
            else:
                out_est[i] = nd[i]
        res = top.iloc[starts][keys].reset_index(drop=True)
        res["n_min_hashes"] = np.minimum(nd, k).astype(np.int64)
        res["kmv_est"] = out_est
        return res

    staged = ds.map_batches(_pre, batch_format="pandas", batch_size=32768)
    return bucketed_groups(staged, keys, _est)


def group_median2(ds, keys: list[str], val_col: str,
                  n_buckets: int | None = None, est_rows: int | None = None):
    """EXACT grouped median, doubled to stay in int64 (``med2`` = the sum
    of the two middle order statistics for even n, twice the middle one
    for odd n — so med2/2 is the textbook median and no 0.5 ever appears
    in the comparison): the one aggregate the streaming partials can't
    compute (an exact median needs the group's full value multiset), so
    groups shuffle whole by key — the documented partitioning assumption
    is that a single group's values fit one worker (use
    ``binned_quantiles`` for the sketch-shaped scale path). The in-bucket
    pass is fully vectorized: one sort, boundary arithmetic picks both
    middles for every group at once."""

    def _med(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(keys + [val_col], kind="mergesort")
        kv = d[keys].to_numpy()
        v = d[val_col].to_numpy().astype(np.int64)
        starts = np.flatnonzero(
            np.r_[True, (kv[1:] != kv[:-1]).any(axis=1)])
        ends = np.r_[starts[1:], len(d)]
        n = ends - starts
        lo = starts + (n - 1) // 2   # rn = (n+1)//2, 0-based
        hi = starts + n // 2         # rn = (n+2)//2, 0-based
        out = d.iloc[starts][keys].reset_index(drop=True)
        out["n_rows"] = n.astype(np.int64)
        out["med2"] = v[lo] + v[hi]
        return out

    return bucketed_groups(ds, keys, _med, n_buckets=n_buckets,
                           est_rows=est_rows)


def abc_classes(ds, key_col: str, val_col: str, band_width: int = 1 << 20,
                a_tenths: int = 7, b_tenths: int = 9,
                est_rows: int | None = None):
    """PARETO / ABC CLASSIFICATION — rank items by value descending and
    split at cumulative-share thresholds (A: first 70 %, B: to 90 %, C:
    rest) — the inventory / revenue-concentration classic. The global
    RANKED prefix sum is two-phase so no full sort ever lands one worker:
    (1) items hash into VALUE BANDS (``val // band_width`` — band order IS
    rank order between bands), per-band totals cumsum'd on the driver over
    the bounded band list and broadcast; (2) one band-bucketed shuffle
    finishes the within-band (val desc, key asc) cumsum. Thresholds
    compare cross-multiplied (cum·10 vs total·{7,9}) so no division enters.
    Ties are impossible in the full (val, key) order, making the window
    mirror exact. Returns (key, val, abc_class)."""
    from .util import cached_state

    def _band(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_band=df[val_col].to_numpy(np.int64) // band_width)

    banded = ds.map_batches(_band, batch_format="pandas",
                            batch_size=65536).materialize()

    sums = partial_groupby_sum(banded.select_columns(["_band", val_col]),
                               ["_band"], [val_col]).to_pandas()
    sums = sums.sort_values("_band", ascending=False)
    bands = sums["_band"].to_numpy(np.int64)
    tots = sums[val_col].to_numpy(np.int64)
    total = int(tots.sum())
    offs = np.concatenate([[0], np.cumsum(tots)[:-1]])
    off_ref = ray.put((bands, offs))

    def _classify(g: pd.DataFrame) -> pd.DataFrame:
        bnds, boffs = cached_state(off_ref, lambda m: m, token="abc_offsets")
        g = g.sort_values([val_col, key_col], ascending=[False, True],
                          kind="mergesort")
        v = g[val_col].to_numpy(np.int64)
        bk = g["_band"].to_numpy(np.int64)
        cs = np.cumsum(v)
        first = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        base = np.repeat(cs[first] - v[first],
                         np.diff(np.r_[first, len(bk)]))
        # descending bands array -> index by searchsorted on negated keys
        pos = np.searchsorted(-bnds, -bk)
        cum = boffs[pos] + (cs - base)
        cls = np.where(cum * 10 <= total * a_tenths, "A",
                       np.where(cum * 10 <= total * b_tenths, "B", "C"))
        return pd.DataFrame({key_col: g[key_col].to_numpy(),
                             val_col: v, "abc_class": cls})

    return bucketed_groups(banded, ["_band"], _classify,
                           est_rows=est_rows)
