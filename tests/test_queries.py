"""In-suite slice of the driver's correctness gate: run a representative set
of registry queries at sf0.001 and compare row-count + sorted values against
the DuckDB oracle (the full gate is tools/check_correctness.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# fast, structurally diverse subset (one per operator family)
SUBSET = [
    "spatial_tile_stats",     # broadcast-index spatial join + grouped agg
    "knn_tiles",              # exact kNN join
    "iterative_match",        # containment + radius fallback rounds
    "pricing_summary",        # grouped int-cents sums
    "order_line_counts",      # left outer join
    "event_window_join",      # interval join
    "price_rank_topk",        # per-group rank
    "events_sessionize",      # gaps-and-islands
    "doc_exact_dedup",        # content-hash dedup
    "unit_normalize",         # mixed-unit inference
    "traffic_rollup",         # sequential segments + spatial + rollup
    "ann_topk",               # brute-force cosine top-k
    "shape_hausdorff",        # integer-exact symmetric Hausdorff halves
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, oracle_con, name):
    from gtfs_conflation_pipeline_ray.pipelines.queries import ORACLE_SQL, QUERIES

    res = QUERIES[name](SF)
    ray_df = res.to_pandas() if hasattr(res, "to_pandas") else res
    if hasattr(ray_df, "to_pandas"):  # pyarrow.Table
        ray_df = ray_df.to_pandas()
    sql_df = oracle_con.execute(ORACLE_SQL[name]).df()
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)}"
    a, b = _canon(ray_df), _canon(sql_df)
    assert sorted(a.columns) == sorted(b.columns)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.allclose(av, bv.astype(np.float64), rtol=0, atol=0), f"{name}.{c}"
        else:
            assert (av == bv).all(), f"{name}.{c}"


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = e.entry().to_pandas()
    assert len(df) >= 0
    assert set(df.columns) == {"tile_id", "sum_qty_c", "n_points"}
    # every oracle key has a matching query
    assert set(e.oracle_sql()) <= set(e.queries())


def test_new_grouped_queries_deterministic(ray_session):
    """Two runs of the order-sensitive round-2 queries produce identical
    canonical content (determinism requirement, SURVEY §7.6-1)."""
    import pandas as pd

    from gtfs_conflation_pipeline_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    for name in ["choose_path_edges", "trip_seg_traffic", "path_linestrings",
                 "choose_annealed"]:
        runs = []
        for _ in range(2):
            df = QUERIES[name](sf).to_pandas()
            df = df[sorted(df.columns)].sort_values(
                list(sorted(df.columns)), kind="mergesort").reset_index(drop=True)
            runs.append(df)
        pd.testing.assert_frame_equal(runs[0], runs[1]), name
