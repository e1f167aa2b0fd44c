"""windows.funnel: pinned ordering semantics (greedy earliest, STRICT after,
out-of-order steps don't count) plus random parity vs a scalar recompute."""

import numpy as np
import pandas as pd
import ray

from gtfs_conflation_pipeline_ray.stages.windows import funnel

STEPS = ["view", "click", "purchase"]


def _brute(rows):
    out = {}
    users = sorted({u for u, _, _ in rows})
    for u in users:
        ev = sorted((t, s) for uu, t, s in rows if uu == u)
        ts, prev = [], None
        for step in STEPS:
            cand = [t for t, s in ev if s == step
                    and (prev is None or t > prev)]
            if not cand:
                break
            prev = min(cand)
            ts.append(prev)
        out[u] = (len(ts), ts + [-1] * (3 - len(ts)))
    return out


def _run(rows):
    ds = ray.data.from_pandas(pd.DataFrame({
        "user_id": np.array([r[0] for r in rows], np.int64),
        "us": np.array([r[1] for r in rows], np.int64),
        "event_type": [r[2] for r in rows],
    }))
    df = funnel(ds, "user_id", "us", "event_type", STEPS).to_pandas()
    return {r.user_id: (r.steps, [r.t1_us, r.t2_us, r.t3_us])
            for r in df.itertuples()}


def test_funnel_pinned_semantics():
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),   # full
        (2, 20, "click"), (2, 10, "view"), (2, 15, "purchase"),   # purchase BEFORE click -> steps 2
        (3, 10, "click"), (3, 20, "purchase"),                    # no view -> 0
        (4, 10, "view"), (4, 10, "click"),                        # tie is NOT strictly after -> 1
        (5, 10, "view"), (5, 5, "view"), (5, 7, "click"),         # earliest view=5, click 7 counts
    ]
    got = _run(rows)
    assert got[1] == (3, [10, 20, 30])
    assert got[2] == (2, [10, 20, -1])
    assert got[3] == (0, [-1, -1, -1])
    assert got[4] == (1, [10, -1, -1])
    assert got[5] == (2, [5, 7, -1])
    assert got == {u: (s, t) for u, (s, t) in _brute(rows).items()}


def test_funnel_random_parity():
    rng = np.random.default_rng(21)
    types = STEPS + ["error", "signup"]
    rows = [(int(rng.integers(0, 30)), int(rng.integers(0, 1000)),
             types[int(rng.integers(0, len(types)))]) for _ in range(600)]
    assert _run(rows) == _brute(rows)
