"""Wave-11 kernels: SCD2 interval build + watermark lateness accounting."""

import numpy as np
import pyarrow as pa


def test_scd2_intervals_vs_brute(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.windows import scd2_intervals

    rng = np.random.default_rng(41)
    keys, us, eid, val = [], [], [], []
    e = 0
    for k in range(7):
        n = int(rng.integers(1, 12))
        t = np.sort(rng.integers(0, 1000, size=n))
        for x in t:
            keys.append(k)
            us.append(int(x))
            eid.append(e)
            val.append(int(rng.integers(-50, 50)))
            e += 1
    ds = ray.data.from_arrow(pa.table({
        "k": np.array(keys, np.int64), "us": np.array(us, np.int64),
        "eid": np.array(eid, np.int64), "v": np.array(val, np.int64)}))
    got = scd2_intervals(ds, "k", ["us", "eid"], "us", "v", sentinel=9999)
    got = got.to_pandas().sort_values(["k", "valid_from_us", "value_c"])
    got = [tuple(r) for r in got.itertuples(index=False)]

    want = []
    import collections
    by_k = collections.defaultdict(list)
    for k, u, e2, v in zip(keys, us, eid, val):
        by_k[k].append((u, e2, v))
    for k, rows in by_k.items():
        rows.sort()
        for i, (u, _e, v) in enumerate(rows):
            last = i == len(rows) - 1
            want.append((k, u, 9999 if last else rows[i + 1][0], v, last))
    want.sort(key=lambda r: (r[0], r[1], r[3]))
    assert sorted(got) == sorted(want)
    # exactly one current row per key, and intervals chain [from, to)
    cur = [w for w in want if w[4]]
    assert len(cur) == len(by_k)


def test_late_arrival_counting_behavior(ray_session):
    # a single user whose third event time-travels behind the watermark
    import pandas as pd

    from gtfs_conflation_pipeline_ray.pipelines.queries import (
        SQL_EVENTS_LATE_ARRIVALS,
    )
    import duckdb

    ev = pd.DataFrame({
        "event_id": [0, 1, 2, 3],
        "user_id": [7, 7, 7, 7],
        # arrival scrambling is deterministic on event_id; mimic unscrambled
        # arrival by choosing ids whose jitter term is 0 (event_id % 7 == 0
        # after the multiply) is fiddly — instead verify the SQL semantics
        # directly: ts regresses at arrival position of event 2
        "ts": pd.to_datetime([10_000_000, 20_000_000, 5_000_000, 30_000_000],
                             unit="us"),
    })
    con = duckdb.connect()
    con.register("events", ev)
    out = con.sql(SQL_EVENTS_LATE_ARRIVALS).df()
    con.close()
    r = out.iloc[0]
    # whatever the scrambled arrival order, the ts=5s event arrives after at
    # least one later-ts event (ids 0..3 scramble within a 3000-wide window,
    # preserving 0 < 2's arrival), so it is late by >= 5s
    assert r.n_events == 4
    assert r.n_late >= 1
    assert r.max_lateness_us >= 5_000_000
