"""Kernel pins for morphology counts, fixed-round weighted SSSP, and the
Gini diversity query's integer form."""

import numpy as np
import pyarrow as pa

from gtfs_conflation_pipeline_ray.stages.media import morph_counts


def morph_brute(mask: np.ndarray) -> tuple[int, int, int]:
    h, w = mask.shape
    er = 0
    di = 0
    for i in range(h):
        for j in range(w):
            vals = []
            for a in (-1, 0, 1):
                for b in (-1, 0, 1):
                    ii, jj = i + a, j + b
                    vals.append(bool(mask[ii, jj]) if 0 <= ii < h and 0 <= jj < w
                                else False)
            er += all(vals)
            di += any(vals)
    return int(mask.sum()), er, di


def test_morph_matches_bruteforce_random():
    rng = np.random.default_rng(5)
    for _ in range(15):
        h, w = rng.integers(1, 9, size=2)
        mask = rng.random((h, w)) < 0.5
        assert morph_counts(mask) == morph_brute(mask)


def test_morph_solid_block():
    mask = np.ones((5, 7), dtype=bool)
    n, e, d = morph_counts(mask)
    assert n == 35
    assert e == 3 * 5  # interior only survives erosion
    assert d == 35  # dilation can't exceed the image


def test_morph_single_pixel():
    mask = np.zeros((5, 5), dtype=bool)
    mask[2, 2] = True
    assert morph_counts(mask) == (1, 0, 9)


def _bf_rounds(edges, seeds, rounds):
    """min cost over paths with <= rounds edges — the exact semantics of
    sssp_rounds."""
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        new = dict(dist)
        for s, t, w in edges:
            if s in dist:
                c = dist[s] + w
                if c < new.get(t, 1 << 62):
                    new[t] = c
        dist = new
    return dist


def test_sssp_rounds_matches_bruteforce(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.graphrank import sssp_rounds

    rng = np.random.default_rng(3)
    n = 30
    m = 80
    s = rng.integers(0, n, size=m).astype(np.int64)
    t = rng.integers(0, n, size=m).astype(np.int64)
    w = rng.integers(1, 50, size=m).astype(np.int64)
    seeds = np.array([0, 7, 19], dtype=np.int64)
    edges = ray.data.from_arrow(pa.table({"src": s, "dst": t, "w": w}))
    seeds_ds = ray.data.from_arrow(pa.table({"node": seeds}))
    out = sssp_rounds(edges, seeds_ds, rounds=3).to_pandas()
    got = dict(zip(out["node"].astype(int), out["cost"].astype(int)))
    want = _bf_rounds(list(zip(s.tolist(), t.tolist(), w.tolist())),
                      seeds.tolist(), 3)
    assert got == want


def test_gini_integer_form():
    # one type -> 0; two equal types -> 500000; uniform over 4 -> 750000
    def gini(counts):
        n = sum(counts)
        return (n * n - sum(c * c for c in counts)) * 1000000 // (n * n)

    assert gini([7]) == 0
    assert gini([5, 5]) == 500000
    assert gini([3, 3, 3, 3]) == 750000
    assert gini([9, 1]) == (100 - 82) * 1000000 // 100


def test_corridor_band_on_diamond(ray_session):
    # Diamond A→{P,Q}→B with a cheap path (10+10), a near-optimal one
    # (10+12), and an expensive spur R (40+40): the 25% corridor keeps
    # A, B, P, Q and excludes R.
    import ray

    from gtfs_conflation_pipeline_ray.stages.graphrank import sssp_rounds

    A, P, Q, R, B = 0, 1, 2, 3, 4
    s = np.array([A, A, A, P, Q, R], np.int64)
    t = np.array([P, Q, R, B, B, B], np.int64)
    w = np.array([10, 11, 40, 10, 11, 40], np.int64)
    edges = ray.data.from_arrow(pa.table({
        "src": np.concatenate([s, t]), "dst": np.concatenate([t, s]),
        "w": np.concatenate([w, w])}))
    da = sssp_rounds(edges, ray.data.from_arrow(pa.table({"node": [A]})),
                     rounds=3).to_pandas()
    db = sssp_rounds(edges, ray.data.from_arrow(pa.table({"node": [B]})),
                     rounds=3).to_pandas()
    both = da.merge(db, on="node", suffixes=("_a", "_b"))
    tot = (both["cost_a"] + both["cost_b"]).to_numpy()
    best = int(tot.min())
    corridor = set(both["node"].to_numpy()[tot <= best + best // 4])
    assert best == 20
    assert corridor == {A, P, Q, B}  # 22 ≤ 25, the R spur (80) is out


def test_hits_star_graph_separates_hubs_from_authorities():
    # Directed star: spokes all point at the hub -> the center is the
    # unique max AUTHORITY, spokes the max HUBS (mutual reinforcement).
    n = 5
    src = np.array([1, 2, 3, 4], np.int64)
    dst = np.array([0, 0, 0, 0], np.int64)

    def norm(x):
        m = max(int(x.max()), 1)
        return (x * 1024) // m

    h = np.ones(n, np.int64)
    for _ in range(2):
        a = norm(np.bincount(dst, weights=h[src].astype(np.float64),
                             minlength=n).astype(np.int64))
        h = norm(np.bincount(src, weights=a[dst].astype(np.float64),
                             minlength=n).astype(np.int64))
    assert a[0] == 1024 and (a[1:] == 0).all()
    assert (h[1:] == 1024).all() and h[0] == 0


def test_dickey_fuller_sign_separates_walk_from_reversion():
    rng = np.random.default_rng(101)
    # mean-reverting series: x_{t+1} = x_t - x_t//2 + noise -> rho_num < 0
    x = [100]
    for _ in range(60):
        x.append(x[-1] - x[-1] // 2 + int(rng.integers(0, 20)))
    x = np.array(x, np.int64)
    lag, dlt = x[:-1], np.diff(x)
    n = len(lag)
    num = n * int((lag * dlt).sum()) - int(lag.sum()) * int(dlt.sum())
    den = n * int((lag * lag).sum()) - int(lag.sum()) ** 2
    assert den > 0 and num < 0  # strong mean reversion
