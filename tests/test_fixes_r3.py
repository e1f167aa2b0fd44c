"""Round-3 regression tests: ADVICE fixes (neardup empty batch, checkpoint
lock/manifest races, fnv skew) and the bucketed ANN top-k merge at high query
cardinality."""

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


def test_cosine_neardup_survives_empty_block(ray_session):
    """An all-empty leading block must neither crash the signature stage nor
    poison the per-worker plane cache with a dim-1 matrix (ADVICE r2)."""
    from gtfs_conflation_pipeline_ray.stages.ann import cosine_neardup_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    vecs = [base + rng.standard_normal(16) * 0.01 for _ in range(2)]
    vecs += [rng.standard_normal(16) for _ in range(6)]
    tab = pa.table({
        "vec_id": np.arange(8, dtype=np.int64),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    empty = tab.slice(0, 0)
    ds = ray.data.from_arrow([empty, tab])  # empty block hits _sig first
    out = cosine_neardup_pairs(ds, threshold=0.95).to_pandas()
    assert {(0, 1)} <= set(zip(out["vec_a"], out["vec_b"]))


def test_merge_topk_high_cardinality(ray_session):
    """50k distinct queries through the global top-k merge in seconds — the
    bucketed pattern, not per-group Python (VERDICT r2 item 5)."""
    from gtfs_conflation_pipeline_ray.stages.ann import _merge_topk

    nq = 50_000
    qid = np.repeat(np.arange(nq, dtype=np.int64), 4)
    vid = np.tile(np.arange(4, dtype=np.int64), nq)
    sim = (vid + 1).astype(np.float64) / 10.0
    local = ray.data.from_arrow(pa.table({"query_id": qid, "vec_id": vid, "sim": sim}))
    t0 = time.time()
    out = _merge_topk(local, k=2).to_pandas()
    wall = time.time() - t0
    assert wall < 60.0, f"merge took {wall:.1f}s"
    assert len(out) == nq * 2
    g = out[out["query_id"] == 123].sort_values("sim_rank")
    assert list(g["vec_id"]) == [3, 2] and list(g["sim_rank"]) == [1, 2]


def test_checkpoint_lock_not_broken_while_owner_alive(tmp_path):
    """A live writer keeps its partition lock regardless of waiter patience;
    a dead owner's lock is stale immediately (ADVICE r2)."""
    from gtfs_conflation_pipeline_ray.state.checkpoint import StageCheckpoint

    ck = StageCheckpoint(str(tmp_path / "out"), "s")
    lock = os.path.join(ck.out_dir, ".lock-p0")
    with open(lock, "w") as f:
        f.write(str(os.getpid()))  # us: alive
    assert not ck._lock_is_stale(lock)
    with open(lock, "w") as f:
        f.write("999999999")  # no such pid
    assert ck._lock_is_stale(lock)
    with open(lock, "w") as f:
        f.write("")  # unreadable owner: age-gated
    assert not ck._lock_is_stale(lock)
    old = time.time() - 10_000
    os.utime(lock, (old, old))
    assert ck._lock_is_stale(lock)
    os.unlink(lock)


def test_checkpoint_manifest_merges_concurrent_committers(tmp_path):
    """Two checkpoint INSTANCES (≙ two processes) committing different
    partitions must both land in the on-disk manifest — the per-process tmp
    name + pre-replace re-merge (ADVICE r2)."""
    from gtfs_conflation_pipeline_ray.state.checkpoint import StageCheckpoint

    out = str(tmp_path / "out")
    ck1 = StageCheckpoint(out, "s")
    ck2 = StageCheckpoint(out, "s")  # loaded before ck1 commits anything

    def _w(n):
        def _fn(tmp_dir):
            with open(os.path.join(tmp_dir, "x"), "w") as f:
                f.write("d")
            return n
        return _fn

    ck1.run_partition("a", _w(1))
    ck2.run_partition("b", _w(2))  # ck2's in-memory manifest lacks "a"
    disk = StageCheckpoint(out, "s")
    assert disk.completed() == {"a", "b"}


def test_fnv_batch_skewed_lengths_identity():
    from gtfs_conflation_pipeline_ray.functions.text import fnv1a64, fnv1a64_batch

    strs = ["", "a", "ab" * 3, "x" * 1024, "y" * 70_000, "word"]
    got = fnv1a64_batch(strs)
    want = np.array([fnv1a64(s) for s in strs], dtype=np.uint64)
    assert (got == want).all()


def test_binned_quantiles_matches_brute_force(ray_session):
    """binned_quantiles == nearest-rank quantile computed brute-force on the
    SAME binned values, for every group and q, on random skewed data."""
    import pandas as pd
    import ray as _ray
    from gtfs_conflation_pipeline_ray.stages.relational import binned_quantiles

    rng = np.random.default_rng(7)
    n, vmax, bins = 20_000, 100_000, 256
    df = pd.DataFrame({
        "g": rng.integers(0, 5, n),
        "v": (rng.pareto(2.0, n) * 5000).astype(np.int64).clip(0, vmax),
    })
    ds = _ray.data.from_pandas(df).repartition(8)
    got = (binned_quantiles(ds, ["g"], "v", vmax=vmax, n_bins=bins)
           .to_pandas().sort_values("g").reset_index(drop=True))

    qs = [("q10", 1, 10), ("q25", 1, 4), ("q50", 1, 2), ("q75", 3, 4), ("q90", 9, 10)]
    for g, sub in df.groupby("g"):
        binned = np.sort(sub["v"].to_numpy() * bins // (vmax + 1))
        m = len(binned)
        row = got[got["g"] == g].iloc[0]
        assert row["n"] == m
        for name, qn, qd in qs:
            target = (m * qn + qd - 1) // qd
            want_edge = int(binned[target - 1]) * (vmax + 1) // bins
            assert row[name] == want_edge, (g, name)


def _brute_asof(pk, pts, rk, rts, rid):
    out_id, out_lag = [], []
    for k, t in zip(pk, pts):
        best = None
        for k2, t2, i2 in zip(rk, rts, rid):
            if k2 == k and t2 <= t and (best is None or (t2, i2) > best):
                best = (t2, i2)
        out_id.append(best[1] if best else -1)
        out_lag.append(t - best[0] if best else -1)
    return out_id, out_lag


def test_asof_join_matches_bruteforce(ray_session):
    """Backward as-of join vs quadratic brute force: tie-break to largest
    ref id, unmatched -> -1, exact microsecond lag — on BOTH the composite
    and the per-key-dict fallback index layouts."""
    from gtfs_conflation_pipeline_ray.stages.windows import _AsofState, asof_join

    rng = np.random.default_rng(3)
    n_ref, n_probe = 200, 400
    rk = rng.integers(0, 12, n_ref)
    rts = rng.integers(0, 10_000, n_ref)
    rts[50:60] = rts[40:50]  # force (key, ts) ties
    rk[50:60] = rk[40:50]
    rid = rng.permutation(n_ref).astype(np.int64)
    pk = rng.integers(0, 15, n_probe)  # keys 12-14 unmatched
    pts = rng.integers(-100, 10_100, n_probe)

    ref = pa.table({"rid": rid, "k": rk,
                    "ts": rts.astype("datetime64[us]")})
    probes = ray.data.from_arrow(pa.table({
        "pid": np.arange(n_probe, dtype=np.int64), "k": pk,
        "ts": pts.astype("datetime64[us]")}))
    out = asof_join(probes, ray.put(ref), "k", "ts", "rid").to_pandas()
    out = out.sort_values("pid")
    want_id, want_lag = _brute_asof(pk, pts, rk, rts, rid)
    assert out["rid"].tolist() == want_id
    assert out["lag_us"].tolist() == want_lag

    # dict fallback: a 2^60-us span forces use_dict; decisions must agree
    wide_rts = rts.astype(np.int64) + (rk.astype(np.int64) << 58)
    wide_pts = pts.astype(np.int64) + (np.clip(pk, 0, 11).astype(np.int64) << 58)
    ref_w = pa.table({"rid": rid, "k": rk, "ts": wide_rts.astype("datetime64[us]")})
    st = _AsofState(ref_w, "k", "ts", "rid")
    assert st.use_dict
    probes_w = ray.data.from_arrow(pa.table({
        "pid": np.arange(n_probe, dtype=np.int64), "k": pk,
        "ts": wide_pts.astype("datetime64[us]")}))
    out_w = asof_join(probes_w, ray.put(ref_w), "k", "ts", "rid").to_pandas()
    out_w = out_w.sort_values("pid")
    want_id_w, want_lag_w = _brute_asof(pk, wide_pts, rk, wide_rts, rid)
    assert out_w["rid"].tolist() == want_id_w
    assert out_w["lag_us"].tolist() == want_lag_w


def test_vocab_topk_matches_bruteforce(ray_session):
    """Global top-k vocabulary vs a driver-side brute count, including the
    deterministic (n desc, token asc) tie-break at the cutoff."""
    import collections
    import re

    from gtfs_conflation_pipeline_ray.stages.textops import vocab_topk

    rng = np.random.default_rng(9)
    words = [f"w{i:02d}" for i in range(30)]
    texts = [" ".join(rng.choice(words, size=rng.integers(3, 40)))
             for _ in range(300)]
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(7)
    got = vocab_topk(ds, k=10).to_pandas()
    cnt = collections.Counter(w for t in texts
                              for w in re.findall(r"\w+", t.lower(), re.ASCII))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["token"], got["n"])) == want
