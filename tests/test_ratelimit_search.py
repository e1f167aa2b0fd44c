"""Wave-10 kernels: token-bucket rate limiting + hotspot predicate."""

import numpy as np
import pyarrow as pa


def test_rate_limit_vs_brute(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.windows import rate_limit_by_key

    rng = np.random.default_rng(31)
    keys, ts = [], []
    for u in range(8):
        n = int(rng.integers(1, 40))
        t = np.cumsum(rng.integers(0, 25, size=n))  # bursty arrivals
        keys += [u] * n
        ts += [int(x) for x in t]
    ds = ray.data.from_arrow(pa.table({
        "u": np.array(keys, np.int64),
        "ts": np.array(ts, np.int64),
        "eid": np.arange(len(keys), dtype=np.int64),
    }))
    got = rate_limit_by_key(ds, "u", ["ts", "eid"], "ts", cap=2, period=10)
    got = {r.u: (r.n_events, r.n_admitted, r.tokens_final)
           for r in got.to_pandas().itertuples()}

    import collections
    by_u = collections.defaultdict(list)
    for u, t in zip(keys, ts):
        by_u[u].append(t)
    for u, arr in by_u.items():
        arr.sort()
        tokens, adm, prev = 2, 0, None
        for t in arr:
            if prev is not None:
                tokens = min(2, tokens + (t - prev) // 10)
            if tokens >= 1:
                tokens -= 1
                adm += 1
            prev = t
        assert got[u] == (len(arr), adm, tokens), u


def test_rate_limit_burst_then_idle():
    # behavioral: a burst drains the bucket; a long idle refills to cap
    import ray

    from gtfs_conflation_pipeline_ray.stages.windows import rate_limit_by_key

    ts = np.array([0, 1, 2, 3, 1000], dtype=np.int64)  # 4-burst then idle
    ds = ray.data.from_arrow(pa.table({
        "u": np.zeros(5, np.int64), "ts": ts,
        "eid": np.arange(5, dtype=np.int64)}))
    r = rate_limit_by_key(ds, "u", ["ts", "eid"], "ts",
                          cap=3, period=10).to_pandas().iloc[0]
    # burst: 3 admitted, 4th rejected; idle refills to cap, 5th admitted
    assert (r.n_events, r.n_admitted, r.tokens_final) == (5, 4, 2)
