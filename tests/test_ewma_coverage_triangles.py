"""EWMA recurrence, raster coverage rollup, triangle counting: brute-force
parity tests."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_ewma_by_key_bruteforce(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.windows import ewma_by_key

    rng = np.random.default_rng(31)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "ts": rng.integers(0, 10_000, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 100_000, n).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(7)
    out = (ewma_by_key(ds, "user_id", ["ts", "event_id"], "v")
           .to_pandas().set_index("user_id").sort_index())

    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        v = g["v"].to_numpy()
        a = int(v[0])
        amax = a
        for x in v[1:]:
            a = (3 * a + int(x)) // 4
            amax = max(amax, a)
        assert out.loc[uid, "n_events"] == len(v)
        assert out.loc[uid, "ewma_final_c"] == a
        assert out.loc[uid, "ewma_max_c"] == amax


def test_tile_coverage_partition_of_area(ray_session):
    """Summed clipped areas over all cells == summed in-world tile areas
    (the grid partitions the world, so coverage must be conserved)."""
    from gtfs_conflation_pipeline_ray.pipelines.queries import (
        q_tile_coverage_grid,
    )
    from gtfs_conflation_pipeline_ray.sources import testdata as td
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out = q_tile_coverage_grid(sf).to_pandas()
    part = pq.read_table(f"{sf}/part.parquet", columns=["p_partkey", "p_size"])
    t = td.tiles_batch(part)
    x0 = np.maximum(t["cx"].to_numpy() - t["hw"].to_numpy(), 0)
    x1 = np.minimum(t["cx"].to_numpy() + t["hw"].to_numpy(), 65536)
    y0 = np.maximum(t["cy"].to_numpy() - t["hh"].to_numpy(), 0)
    y1 = np.minimum(t["cy"].to_numpy() + t["hh"].to_numpy(), 65536)
    keep = (x1 > x0) & (y1 > y0)
    want = ((x1 - x0) * (y1 - y0))[keep].sum()
    assert out["area"].sum() == want
    assert (out["cell_x"].between(0, 31)).all()
    assert (out["n_tiles"] >= 1).all()


def test_triangle_counts_bruteforce(ray_session):
    import itertools

    import ray

    from gtfs_conflation_pipeline_ray.stages.graphrank import triangle_counts

    rng = np.random.default_rng(41)
    nodes = 30
    edges = set()
    while len(edges) < 120:
        a, b = sorted(rng.integers(0, nodes, 2).tolist())
        if a != b:
            edges.add((a, b))
    ea = np.array([e[0] for e in sorted(edges)], np.int64)
    eb = np.array([e[1] for e in sorted(edges)], np.int64)
    ds = ray.data.from_arrow(pa.table({"supp_a": ea, "supp_b": eb}))
    out = (triangle_counts(ds).to_pandas()
           .set_index("supp")["n_triangles"].to_dict())

    # brute force over all node triples
    adj = {n: set() for n in range(nodes)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(range(nodes), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert out == want
    assert sum(want.values()) % 3 == 0 and sum(want.values()) > 0
