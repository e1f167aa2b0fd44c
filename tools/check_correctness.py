"""Local stand-in for the driver's correctness gate: run each queries() entry
and its oracle_sql() through DuckDB on the same parquet, compare row count,
column names, and order-insensitive value hashes.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    rc, sc = sorted(ray_df.columns), sorted(sql_df.columns)
    if rc != sc:
        problems.append(f"cols: ray={rc} sql={sc}")
        return problems
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            ka, kb = av.dtype.kind, bv.dtype.kind
            # driver-hash proxy: a value hash over rendered/encoded values is
            # dtype-sensitive (e.g. DuckDB SUM -> HUGEINT -> float64 renders
            # 304800.0 vs int64 304800) even when values are numerically
            # equal — the exact failure mode of round-3 image_decode_features.
            kind_norm = {"i": "i", "u": "i", "b": "b", "f": "f"}
            if kind_norm.get(ka, "O") != kind_norm.get(kb, "O"):
                problems.append(
                    f"col {c}: dtype-kind ray={av.dtype} sql={bv.dtype}"
                    " (numerically equal values would still hash-diverge)")
            if ka == "f" or kb == "f":
                af = av.astype(np.float64)
                bf = bv.astype(np.float64)
                # bit-exact (catches 0.0 vs -0.0), NaN==NaN
                same = (af.view(np.int64) == bf.view(np.int64)) | (
                    np.isnan(af) & np.isnan(bf))
                ok = bool(same.all())
                bad = np.flatnonzero(~same)
            else:
                same = av == bv
                ok = bool(np.asarray(same).all())
                bad = np.flatnonzero(~np.asarray(same))
            if not ok:
                problems.append(f"col {c}: {len(bad)} mismatched (first: row {bad[0]}: ray={av[bad[0]]!r} sql={bv[bad[0]]!r})")
    return problems


_sql_cache: dict = {}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray error: {type(ex).__name__}: {ex}")
            n_bad += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(ray_df)} rows  [{t1-t0:.1f}s]")
            n_ok += 1
            continue
        try:
            # memoize by SQL text: shared oracles (e.g. the sharded join
            # variant reuses the unsharded join's SQL) run once per gate
            key = oracles[name]
            if key not in _sql_cache:
                _sql_cache[key] = con.execute(key).df()
            sql_df = _sql_cache[key]
        except Exception as ex:
            print(f"FAIL {name}: sql error: {ex}")
            n_bad += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems) + f"  [{t1-t0:.1f}s]")
            n_bad += 1
        else:
            print(f"ok {name}: {len(ray_df)} rows  [{t1-t0:.1f}s]")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
