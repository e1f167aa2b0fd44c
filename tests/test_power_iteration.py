"""Integer power iteration over the embedding Gram matrix."""

import numpy as np
import pyarrow as pa


def _mk_ds(vectors):
    import ray

    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vectors)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vectors],
                              pa.list_(pa.float32())),
    }))


def test_power_iteration_finds_dominant_direction(ray_session):
    from gtfs_conflation_pipeline_ray.stages.ann import power_iteration

    rng = np.random.default_rng(8)
    dim = 16
    # strong planted direction + noise
    u = rng.normal(size=dim)
    u /= np.linalg.norm(u)
    rows = [5.0 * u + 0.2 * rng.normal(size=dim) for _ in range(300)]
    got = power_iteration(_mk_ds(rows), dim=dim, rounds=8).to_pandas()
    x = got.sort_values("d")["xv"].to_numpy(np.float64)
    cos = abs(x @ u) / (np.linalg.norm(x) * 1.0)
    assert cos > 0.99
    # normalization keeps the max magnitude pinned at 8192
    assert np.abs(x).max() == 8192


def test_power_iteration_trunc_division_matches_duckdb():
    """The kernel truncates toward zero, exactly DuckDB's // on negatives."""
    import duckdb

    y = np.array([-70001, -1, 0, 1, 70001], np.int64)
    m = 8192
    eng = np.sign(y) * ((np.abs(y) * 8192) // m)
    sql = duckdb.sql(
        "SELECT (yv * 8192) // 8192 FROM (VALUES (-70001), (-1), (0), (1),"
        " (70001)) t(yv)").fetchnumpy()
    got = list(sql.values())[0].astype(np.int64)
    assert (eng == got).all()


def test_power_iteration_deterministic(ray_session):
    from gtfs_conflation_pipeline_ray.stages.ann import power_iteration

    rng = np.random.default_rng(3)
    rows = [rng.normal(size=8) for _ in range(50)]
    a = power_iteration(_mk_ds(rows), dim=8, rounds=5).to_pandas()
    b = power_iteration(_mk_ds(rows), dim=8, rounds=5).to_pandas()
    assert (a.sort_values("d")["xv"].to_numpy()
            == b.sort_values("d")["xv"].to_numpy()).all()
