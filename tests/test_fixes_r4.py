"""Round-4 regression tests for the ADVICE items: hash_sample over the full
int64 id domain, cached_state stable keys, and the stage-A resume guard's
atomic lineage marker."""

import glob
import json
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def test_hash_sample_full_int64_domain_matches_sql(ray_session):
    """Negative ids and ids >= 2^32 must produce the exact keep-set the
    masked HUGEINT SQL mirror produces (ADVICE r3: the unmasked form agreed
    only for 0 <= id < 2^32)."""
    from gtfs_conflation_pipeline_ray.stages.relational import hash_sample

    rng = np.random.default_rng(11)
    ids = np.concatenate([
        rng.integers(-(2 ** 62), 2 ** 62, size=2000),
        np.array([-1, 0, 1, 2 ** 32 - 1, 2 ** 32, 2 ** 33 + 7,
                  -(2 ** 40), np.iinfo(np.int64).min, np.iinfo(np.int64).max]),
    ]).astype(np.int64)
    df = pd.DataFrame({"doc_id": ids, "lang": ["en" if i % 3 == 0 else "de"
                                               for i in range(len(ids))]})
    got = (hash_sample(ray.data.from_pandas(df), "doc_id", 700,
                       strata_col="lang", strata_permille={"en": 300})
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute("""
        SELECT doc_id, lang FROM documents
        WHERE (CAST(doc_id & 4294967295 AS HUGEINT) * 2654435761)
              % 4294967296 % 1000
              < CASE WHEN lang = 'en' THEN 300 ELSE 700 END
        ORDER BY doc_id""").df()
    assert len(got) == len(want) > 0
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()


def test_cached_state_builder_lambda_reuses_one_entry(ray_session):
    """A builder lambda recreated per call must hit ONE cache entry (keyed on
    qualname/token), not rebuild + leak per call (ADVICE r3)."""
    from gtfs_conflation_pipeline_ray.stages import util

    ref = ray.put(pa.table({"a": [1, 2, 3]}))
    builds = []
    before = len(util._WORKER_STATE_CACHE)
    for _ in range(5):
        # fresh lambda object each iteration, same token
        util.cached_state(ref, lambda t: builds.append(1) or t.num_rows,
                          token="test_fixes_r4")
    assert builds == [1]
    assert len(util._WORKER_STATE_CACHE) == before + 1


def test_cached_state_lru_bounded(ray_session):
    from gtfs_conflation_pipeline_ray.stages import util

    ref = ray.put(pa.table({"a": [1]}))
    for i in range(util._WORKER_STATE_CAP + 10):
        util.cached_state(ref, lambda t: i, token=f"lru-test-{i}")
    assert len(util._WORKER_STATE_CACHE) <= util._WORKER_STATE_CAP


def test_shape_points_resume_guard_rejects_partial_and_stale(ray_session, tmp_path):
    """A shape_points dir without a matching _LINEAGE.json (partial write, or
    a different feed/extent) must be rebuilt, and a committed one reused
    (ADVICE r3: any *.parquet used to count as complete)."""
    from gtfs_conflation_pipeline_ray.pipelines.gtfs_pipeline import (
        feed_extent, shape_points)

    shapes = pd.DataFrame({
        "shape_id": ["s1"] * 4,
        "shape_pt_sequence": [1, 2, 3, 4],
        "shape_pt_lat": [40.0, 40.1, 40.2, 40.3],
        "shape_pt_lon": [-73.0, -73.1, -73.2, -73.3],
    })
    ds = ray.data.from_pandas(shapes)
    extent = feed_extent(ds)
    pts_dir = str(tmp_path / "shape_points")

    # simulate a killed run: parquet present, no lineage marker
    shape_points(ds, extent, 2).write_parquet(pts_dir)
    assert glob.glob(f"{pts_dir}/*.parquet")
    assert not os.path.exists(f"{pts_dir}/_LINEAGE.json")

    lineage = {"zip": "feed.zip", "extent": extent, "n_partitions": 2}

    def complete(lin):
        try:
            with open(f"{pts_dir}/_LINEAGE.json") as f:
                return json.load(f) == lin
        except (OSError, ValueError):
            return False

    assert not complete(lineage)  # partial dir is NOT accepted
    with open(f"{pts_dir}/_LINEAGE.json", "w") as f:
        json.dump(lineage, f, sort_keys=True)
    assert complete(lineage)  # committed dir reused
    stale = dict(lineage, zip="other.zip")
    assert not complete(stale)  # different inputs force rebuild
    # pyarrow dataset discovery must ignore the underscore-prefixed marker
    assert ray.data.read_parquet(pts_dir).count() == 4
