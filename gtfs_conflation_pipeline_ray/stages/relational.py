"""Relational stage helpers: per-batch partial aggregation, broadcast lookup
joins, per-group top-k / rank / list-assembly.

Reference parity (SURVEY.md §2): J1-J4/J8 equi-join chains, A1 group->list
assembly (``group_concat`` re-assembly,
``/root/reference/src/daos/GtfsOsmNetworkDAO/generators.js:72-113``), O2-O5
in-group sorts and best-first picks, D7 distinct.

Scale notes:
  - ``partial_groupby_sum`` combines inside each batch BEFORE the shuffle, so
    the all-to-all exchange moves one row per (key, batch) instead of one per
    input row — the pre-aggregation pattern the 100 TB path requires.
  - Small sides are broadcast (`ray.put` once, read per actor/task), never
    shuffled; large-large joins use ``Dataset.join`` (hash partitioned).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .util import pool_size


def partial_groupby_sum(ds, keys: list[str], sums: list[str], count_as: str | None = None):
    """Per-batch partial sum/count by ``keys`` (vectorized pandas groupby per
    batch), then the global ``groupby().aggregate`` over the (much smaller)
    partials. Returns a Dataset with columns keys + sums (+ count_as)."""
    from ray.data.aggregate import Sum

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        agg = {c: "sum" for c in sums}
        if count_as:
            df = df.assign(**{count_as: np.int64(1)})
            agg[count_as] = "sum"
        out = df.groupby(keys, as_index=False, sort=False).agg(agg)
        return out

    partial = ds.map_batches(_partial, batch_format="pandas", batch_size=65536)
    aggs = [Sum(c, alias_name=c) for c in sums]
    if count_as:
        aggs.append(Sum(count_as, alias_name=count_as))
    return partial.groupby(keys).aggregate(*aggs)


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
            out = df.merge(
                self.small[list(mapping)].rename(columns=mapping),
                left_on=on,
                right_index=True,
                how="inner",
            )
            return out

    return ds.map_batches(_Lookup, batch_format="pandas", batch_size=65536,
                          concurrency=pool_size(2))


def group_topk(
    ds,
    keys: list[str],
    order_by: list[tuple[str, bool]],
    k: int,
    rank_col: str | None = None,
):
    """Per-group top-k with a deterministic total order.

    ``order_by`` = [(col, ascending), ...] — always include a unique
    tie-breaker column so results are engine-independent (the reference's
    order-sensitive keep-rules D3-D5 made deterministic, SURVEY §7.6-1).
    """
    cols = [c for c, _ in order_by]
    asc = [a for _, a in order_by]

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(cols, ascending=asc, kind="mergesort").head(k)
        if rank_col:
            g = g.assign(**{rank_col: np.arange(1, len(g) + 1, dtype=np.int64)})
        return g

    return ds.groupby(keys).map_groups(_topk, batch_format="pandas")


def group_concat(ds, keys: list[str], value_col: str, out_col: str, sep: str = ","):
    """Per-group ordered string concatenation — ≙ SQLite
    ``group_concat(... ORDER BY ...)`` list re-assembly (A1). The group's sort
    is explicit (the reference relied on DB scan order, SURVEY §2.9)."""

    def _concat(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value_col].to_numpy())
        return pd.DataFrame(
            {**{k: [g[k].iloc[0]] for k in keys}, out_col: [sep.join(map(str, v))]}
        )

    return ds.groupby(keys).map_groups(_concat, batch_format="pandas")


def distinct(ds, cols: list[str]):
    """Distinct tuples: per-batch dedup (combiner) then a grouped first —
    ≙ D7 / SELECT DISTINCT."""

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[cols].drop_duplicates()

    pre = ds.map_batches(_dedup, batch_format="pandas", batch_size=65536)
    return pre.groupby(cols).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


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
            idx = np.searchsorted(self.keys, v)
            idx = np.clip(idx, 0, len(self.keys) - 1)
            hit = (len(self.keys) > 0) & (self.keys[idx] == v)
            return batch.filter(pa.array(~hit))

    return ds.map_batches(_Anti, batch_format="pyarrow", batch_size=65536,
                          concurrency=pool_size(2))
