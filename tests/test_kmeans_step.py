"""kmeans_assign_step vs a per-vector Python recompute: integer-exact
assignment (incl. tie-break to the smallest centroid id), integer sums and
the dim=-1 count rows, empty-cluster omission."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from gtfs_conflation_pipeline_ray.stages.ann import (kmeans_assign_step,
                                                     quantize_fixed)


def _run(x, cents_q):
    tab = pa.table({
        "vec_id": np.arange(len(x), dtype=np.int64),
        "embedding": pa.array([row.tolist() for row in x],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tab).repartition(3)
    out = kmeans_assign_step(ds, ray.put(cents_q)).to_pandas()
    return out


def _brute(x, cents_q):
    xq = quantize_fixed(np.asarray(x, dtype=np.float64))
    sums = {}
    counts = {}
    for row in xq:
        d2 = ((row[None, :] - cents_q) ** 2).sum(axis=1)
        c = int(np.argmin(d2))  # first occurrence = smallest id
        counts[c] = counts.get(c, 0) + 1
        sums[c] = sums.get(c, np.zeros(len(row), dtype=np.int64)) + row
    return sums, counts


def test_kmeans_step_vs_bruteforce():
    rng = np.random.default_rng(3)
    x = rng.normal(0, 0.5, (200, 8)).astype(np.float32)
    cents_q = quantize_fixed(np.asarray(x[:5], dtype=np.float64))
    out = _run(x, cents_q)
    sums, counts = _brute(x, cents_q)
    got_counts = out[out.dim == -1].set_index("cluster_id")["sum_q"].to_dict()
    assert got_counts == counts
    for c, s in sums.items():
        g = out[(out.cluster_id == c) & (out.dim >= 0)].sort_values("dim")
        assert (g["sum_q"].to_numpy() == s).all()
    assert set(out.cluster_id) == set(counts)  # empty clusters omitted


def test_kmeans_tiebreak_smallest_cid():
    # two identical centroids: every vector must land on cluster 0
    x = np.array([[1.0, 0.0], [0.9, 0.1], [1.1, -0.1]], dtype=np.float32)
    cents_q = quantize_fixed(np.array([[1.0, 0.0], [1.0, 0.0]]))
    out = _run(x, cents_q)
    assert set(out.cluster_id) == {0}
    assert out[out.dim == -1]["sum_q"].iloc[0] == 3
