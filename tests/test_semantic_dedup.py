"""SemDeDup-style cluster-then-verify: planted-duplicate recovery and
brute-force keep-rule parity on a small corpus."""

import numpy as np
import pyarrow as pa


def test_semantic_dedup_planted_and_bruteforce(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.ann import (
        quantize_fixed,
        semantic_dedup,
    )

    rng = np.random.default_rng(17)
    k, dim, n = 4, 16, 120
    cents = rng.normal(size=(k, dim))
    base = np.repeat(cents, n // k, axis=0) + 0.3 * rng.normal(size=(n, dim))
    # plant near-dups: ids 1000+i is a tiny perturbation of vector i (i<10)
    dup = base[:10] * 1.0005
    vecs = np.vstack([base, dup]).astype(np.float32)
    ids = np.r_[np.arange(n), 1000 + np.arange(10)].astype(np.int64)

    ds = ray.data.from_arrow(pa.table({
        "vec_id": ids,
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
    }))
    cref = ray.put(quantize_fixed(cents))
    out = (semantic_dedup(ds, cref, threshold=0.99)
           .to_pandas().set_index("vec_id").sort_index())

    # brute force: same assignment rule (integer L2 argmin), same keep rule
    xq = quantize_fixed(vecs.astype(np.float64))
    cq = quantize_fixed(cents)
    d2 = ((xq[:, None, :] - cq[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    x64 = vecs.astype(np.float64)
    norm = np.linalg.norm(x64, axis=1)
    sims = (x64 @ x64.T) / np.outer(norm, norm)
    order = np.argsort(ids)
    keep_want = {}
    for c in range(k):
        members = order[assign[order] == c]
        for pos, j in enumerate(members):
            smaller = members[:pos]
            keep_want[int(ids[j])] = not (sims[smaller, j] >= 0.99).any()
    assert len(out) == n + 10
    for vid, row in out.iterrows():
        assert row["cluster_id"] == assign[np.flatnonzero(ids == vid)[0]]
        assert bool(row["keep"]) == keep_want[int(vid)], vid
    # every planted dup was dropped, every original of a planted pair kept
    assert (~out.loc[1000:, "keep"]).all()
    assert out.loc[:9, "keep"].all()
