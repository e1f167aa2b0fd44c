"""STR R-tree bulk-load page assignment; Mann-Whitney U / KS two-sample."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _brute_str_pages(x, y, ids, cap):
    """Naive single-node STR packing: global (x,id) sort -> S slabs of
    cap*S rows -> per-slab (y,id) sort -> pages of cap."""
    import math

    n = len(x)
    S = int(math.ceil(math.sqrt(math.ceil(n / float(cap)))))
    slab_rows = cap * S
    order = np.lexsort((ids, x))
    xs, ys = x[order], y[order]
    idx = np.arange(n)
    slab = idx // slab_rows
    pages = {}
    for s in np.unique(slab):
        m = slab == s
        sx, sy = xs[m], ys[m]
        sid = ids[order][m]
        o2 = np.lexsort((sid, sy))
        sx, sy = sx[o2], sy[o2]
        for p in range(0, len(sx), cap):
            pid = int(s) * 1_000_000 + p // cap
            px, py = sx[p:p + cap], sy[p:p + cap]
            pages[pid] = (len(px), px.min(), py.min(), px.max(), py.max())
    return pages


def test_str_pack_pages_vs_brute(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    rng = np.random.default_rng(11)
    n = 5000
    x = rng.integers(0, 1 << 12, size=n).astype(np.int64)
    y = rng.integers(0, 1 << 12, size=n).astype(np.int64)
    ids = rng.permutation(n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"px": x, "py": y, "point_id": ids}))
    # small x_chunk forces many chunks through the two-phase prefix sum
    got = spatial.str_pack_pages(ds, n_rows=n, cap=64, x_chunk=37,
                                 ).to_pandas().set_index("page_id").sort_index()
    want = _brute_str_pages(x, y, ids, cap=64)
    assert len(got) == len(want)
    for pid, (ne, x0, y0, x1, y1) in want.items():
        r = got.loc[pid]
        assert (r.n_entries, r.x0, r.y0, r.x1, r.y1) == (ne, x0, y0, x1, y1)


def test_str_pack_duplicate_x_ties_break_on_id(ray_session):
    """All-equal x stresses the tie rule: rank must follow (x, id) exactly
    even when every row lands in one chunk."""
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    n = 300
    x = np.zeros(n, dtype=np.int64)
    y = np.arange(n, dtype=np.int64)[::-1].copy()
    ids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"px": x, "py": y, "point_id": ids}))
    got = spatial.str_pack_pages(ds, n_rows=n, cap=16,
                                 ).to_pandas().set_index("page_id").sort_index()
    want = _brute_str_pages(x, y, ids, cap=16)
    assert len(got) == len(want)
    for pid, (ne, x0, y0, x1, y1) in want.items():
        r = got.loc[pid]
        assert (r.n_entries, r.x0, r.y0, r.x1, r.y1) == (ne, x0, y0, x1, y1)


def _mw_brute(a, b):
    gt = sum(1 for u in a for v in b if u > v)
    eq = sum(1 for u in a for v in b if u == v)
    return 2 * gt + eq, eq


def test_mannwhitney_counts_vs_pair_brute():
    """The cum-count identity u2 = sum ca*(2*cumb + cb) equals the literal
    2*#(a>b) + #(a=b) over all cross pairs, ties included."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 20, size=80)
    b = rng.integers(0, 20, size=60)
    vals = np.unique(np.concatenate([a, b]))
    ca = np.array([(a == v).sum() for v in vals], dtype=np.int64)
    cb = np.array([(b == v).sum() for v in vals], dtype=np.int64)
    cumb = np.concatenate([[0], np.cumsum(cb)[:-1]])
    u2 = int((ca * (2 * cumb + cb)).sum())
    ties = int((ca * cb).sum())
    bu2, bties = _mw_brute(a.tolist(), b.tolist())
    assert (u2, ties) == (bu2, bties)
    # AUC recompose: P(a>b) + 0.5 P(a=b) = u2 / (2 na nb)
    auc = u2 / (2.0 * len(a) * len(b))
    assert 0.0 <= auc <= 1.0


def test_ks_gap_vs_scipy_style_brute():
    """d_num/(na*nb) equals the classic max |ECDF_a - ECDF_b|, and the
    reported location is the smallest value attaining the max."""
    rng = np.random.default_rng(9)
    a = np.sort(rng.integers(0, 30, size=70))
    b = np.sort(rng.integers(5, 35, size=50))
    vals = np.unique(np.concatenate([a, b]))
    ca = np.array([(a == v).sum() for v in vals], dtype=np.int64)
    cb = np.array([(b == v).sum() for v in vals], dtype=np.int64)
    na, nb = len(a), len(b)
    gap = np.abs(np.cumsum(ca) * nb - np.cumsum(cb) * na)
    best = int(np.argmax(gap))
    # brute ECDF over every candidate value
    d_brute = max(
        abs((a <= v).sum() / na - (b <= v).sum() / nb) for v in vals)
    assert abs(gap[best] / (na * nb) - d_brute) < 1e-12
    attaining = [v for i, v in enumerate(vals) if gap[i] == gap[best]]
    assert int(vals[best]) == min(attaining)


def test_two_sample_queries_on_tiny_sfdir(ray_session, tmp_path):
    """End-to-end through the events parquet path with a hand-computable
    two-type sample."""
    import pyarrow.parquet as pq

    from gtfs_conflation_pipeline_ray.pipelines import queries

    ev = pa.table({
        "event_type": pa.array(
            ["click", "click", "error", "error", "error",
             "view", "view", "purchase", "other"]),
        "value": pa.array([1.0, 2.0, 1.0, 3.0, 0.5,
                           1.0, 4.0, 2.0, 9.9], pa.float64()),
        "user_id": pa.array([1] * 9, pa.int64()),
        "ts": pa.array([0] * 9, pa.int64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(ev, d / "events.parquet")

    mw = queries.q_events_mannwhitney(str(d)).to_pandas().iloc[0]
    # a = clicks {100,200}, b = errors {100,300,50} in cents
    a, b = [100, 200], [100, 300, 50]
    u2, ties = _mw_brute(a, b)
    assert (mw.n_a, mw.n_b, mw.u2, mw.ties) == (2, 3, u2, ties)

    ks = queries.q_events_ks_stat(str(d)).to_pandas().iloc[0]
    # a = views {100,400}, b = purchases {200}
    assert (ks.n_a, ks.n_b) == (2, 1)
    # ECDF gap: at v=100 |1*1 - 0*2| = 1; at 200 |1 - 2| = 1; at 400 0.
    # max gap 1 first attained at v=100.
    assert (ks.d_num, ks.ks_at) == (1, 100)


def test_runs_test_brute_and_boundary(ray_session, tmp_path):
    """Runs over a hand-built sequence that crosses day-bucket boundaries:
    the block-summary merge must count boundary sign changes exactly once."""
    import pyarrow.parquet as pq

    from gtfs_conflation_pipeline_ray.pipelines import queries

    # one type spread over three days; the sign sequence crosses both
    # bucket boundaries and contains median-ties to drop
    day = 86_400_000_000
    ts = [0, 1, day - 1, day, day + 1, 2 * day, 2 * day + 1]
    vals = [9.0, 8.0, 1.0, 2.0, 1.0, 8.0, 9.0]
    ev = pa.table({
        "event_id": pa.array(range(7), pa.int64()),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([1] * 7, pa.int64()),
        "event_type": pa.array(["x"] * 7),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * 7),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(ev, d / "events.parquet")
    got = queries.q_events_runs_test(str(d)).to_pandas().iloc[0]
    # lower median of sorted cents [100,100,200,800,800,900,900] rank 4
    # -> 800; signs vs 800 (zeros dropped):
    # 9->+, 8->0(drop), 1->-, 2->-, 1->-, 8->0(drop), 9->+
    # sequence: + - - - +  => runs = 3, n_pos = 2, n_neg = 3
    assert (got.n_pos, got.n_neg, got.runs) == (2, 3, 3)
