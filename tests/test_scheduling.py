"""Optimality + determinism checks for the greedy activity-selection kernel
(stages/windows.greedy_nonoverlap): the registry oracle replays the same
greedy through a list-carrying recursive CTE, so these pin the kernel
against an exponential exact maximum-independent-set brute force."""

import itertools

import numpy as np

from gtfs_conflation_pipeline_ray.stages import windows


RNG = np.random.default_rng(909)


def _brute_max_nonoverlap(iv):
    best = 0
    for r in range(len(iv), 0, -1):
        for combo in itertools.combinations(iv, r):
            c = sorted(combo)
            if all(c[i][1] <= c[i + 1][0] for i in range(len(c) - 1)):
                return r
    return best


def _greedy(iv):
    iv = sorted(iv, key=lambda p: (p[1], p[0]))
    s = np.array([p[0] for p in iv], np.int64)
    e = np.array([p[1] for p in iv], np.int64)
    return windows.greedy_nonoverlap(s, e)


def test_greedy_count_is_optimal():
    for _ in range(40):
        n = int(RNG.integers(1, 9))
        iv = [(int(a), int(a) + int(RNG.integers(1, 30)))
              for a in RNG.integers(0, 60, n)]
        cnt, _ = _greedy(iv)
        assert cnt == _brute_max_nonoverlap(iv)


def test_greedy_touching_intervals_chain():
    # [0,10) [10,20) [20,30): half-open semantics chain all three.
    iv = [(0, 10), (10, 20), (20, 30)]
    cnt, esum = _greedy(iv)
    assert cnt == 3 and esum == 60


def test_greedy_nested_picks_shortest():
    # A long interval covering two short ones loses to the pair.
    iv = [(0, 100), (5, 10), (20, 30)]
    cnt, esum = _greedy(iv)
    assert cnt == 2 and esum == 40


def test_ols2_cramer_pieces_recover_planted_plane():
    # Exact data on a plane y = 3 + 2*x1 - 5*x2: the Cramer rationals
    # must recover the slopes exactly (b = num/den).
    x1 = np.array([1, 2, 3, 4, 5, 6, 2, 7], np.int64)
    x2 = np.array([0, 1, 0, 2, 1, 3, 2, 1], np.int64)
    y = 3 + 2 * x1 - 5 * x2
    n = np.int64(len(x1))
    s1, s2, sy = x1.sum(), x2.sum(), y.sum()
    c11 = n * (x1 * x1).sum() - s1 * s1
    c12 = n * (x1 * x2).sum() - s1 * s2
    c22 = n * (x2 * x2).sum() - s2 * s2
    c1y = n * (x1 * y).sum() - s1 * sy
    c2y = n * (x2 * y).sum() - s2 * sy
    den = c11 * c22 - c12 * c12
    b1_num = c22 * c1y - c12 * c2y
    b2_num = c11 * c2y - c12 * c1y
    assert den != 0
    assert b1_num == 2 * den
    assert b2_num == -5 * den


def test_range_frame_two_pointer_vs_duckdb_with_ties():
    # The two-pointer kernel must reproduce RANGE-frame peer semantics:
    # equal-ts rows share one frame (unlike a ROWS frame).
    import duckdb

    e = np.array([0, 100, 100, 250, 600, 600, 600, 900], np.int64)
    vc = np.array([1, 2, 4, 8, 16, 32, 64, 128], np.int64)
    W = 500
    cs = np.concatenate([[0], np.cumsum(vc)])
    lo = np.searchsorted(e, e - W, side="left")
    hi = np.searchsorted(e, e, side="right")
    got_sum = (cs[hi] - cs[lo]).tolist()
    got_cnt = (hi - lo).tolist()
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ",".join(f"({int(a)},{int(b)},{k})"
                           for k, (a, b) in enumerate(zip(e, vc)))
                + ") v(e, vc, k)")
    ref = con.execute(
        "SELECT SUM(vc) OVER w, COUNT(*) OVER w FROM t "
        "WINDOW w AS (ORDER BY e RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) "
        "ORDER BY e, k").fetchall()
    assert got_sum == [int(r[0]) for r in ref]
    assert got_cnt == [int(r[1]) for r in ref]


def _ffd(sizes, cap=100):
    bins = []
    asg = 0
    for q in sorted(sizes, reverse=True):
        for bi in range(len(bins)):
            if bins[bi] + q <= cap:
                bins[bi] += q
                asg += (bi + 1) * q
                break
        else:
            bins.append(q)
            asg += len(bins) * q
    return bins, asg


def test_ffd_known_hand_case():
    # sorted desc: 70, 60, 50, 33, 33, 22, 15 with cap 100
    # b1=70 -> +22 -> 92; b2=60+33=93; b3=50+33=83+15=98
    bins, _ = _ffd([33, 70, 15, 22, 50, 60, 33])
    assert bins == [92, 93, 98]


def test_ffd_bound_vs_optimal_lower_bound():
    # FFD never uses fewer bins than ceil(total/cap), and for random
    # instances stays within the 11/9*OPT+1 guarantee's trivial corollary
    # n_bins <= 11/9 * ceil(total/cap) + 1.
    rng = np.random.default_rng(11)
    for _ in range(30):
        sizes = rng.integers(1, 101, size=int(rng.integers(1, 40))).tolist()
        bins, _ = _ffd(sizes)
        lb = -(-sum(sizes) // 100)
        assert lb <= len(bins) <= 11 * lb // 9 + 1
        assert all(b <= 100 for b in bins)


def test_ffd_perfect_fit_uses_lower_bound():
    bins, asg = _ffd([50, 50, 50, 50])
    assert bins == [100, 100]
    assert asg == 1 * 50 + 1 * 50 + 2 * 50 + 2 * 50


def _vw_peel(xs, ys, target=8):
    xs, ys = list(xs), list(ys)
    k = chk = 0
    removed = []
    while len(xs) > target:
        best_a, best_p = None, -1
        for p in range(1, len(xs) - 1):
            a2 = abs((xs[p] - xs[p - 1]) * (ys[p + 1] - ys[p - 1])
                     - (xs[p + 1] - xs[p - 1]) * (ys[p] - ys[p - 1]))
            if best_a is None or a2 < best_a:
                best_a, best_p = a2, p
        k += 1
        chk += k * best_a
        removed.append((xs[best_p], ys[best_p]))
        del xs[best_p]
        del ys[best_p]
    return xs, ys, chk, removed


def test_visvalingam_collinear_points_removed_first():
    # Collinear interior points have zero area: they peel before any
    # genuine corner, and the survivors keep the polyline's shape.
    xs = [0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100]
    ys = [0, 0, 0, 0, 0, 100, 0, 0, 0, 0, 0]
    kept_x, kept_y, chk, removed = _vw_peel(xs, ys, target=5)
    assert (50, 100) in list(zip(kept_x, kept_y))  # the spike survives
    assert all(y == 0 for _, y in removed)   # only flat points removed
    assert chk == 0  # all six removals had exactly zero area


def test_visvalingam_endpoints_always_survive():
    rng = np.random.default_rng(5)
    xs = rng.integers(0, 100, 20).tolist()
    ys = rng.integers(0, 100, 20).tolist()
    kept_x, kept_y, _, _ = _vw_peel(xs, ys, target=8)
    assert len(kept_x) == 8
    assert (kept_x[0], kept_y[0]) == (xs[0], ys[0])
    assert (kept_x[-1], kept_y[-1]) == (xs[-1], ys[-1])


def test_peak_overlap_half_open_touching():
    # [0,10) and [10,20) never overlap: ends sort before starts at t=10.
    t = np.array([0, 10, 10, 20], np.int64)
    d = np.array([1, -1, 1, -1], np.int64)
    order = np.lexsort((d, t))
    run = np.cumsum(d[order])
    assert run.max() == 1


def test_peak_overlap_nested_stack():
    # Three nested intervals peak at 3 at the innermost start.
    iv = [(0, 100), (10, 90), (20, 80)]
    t = np.array([s for s, _ in iv] + [e for _, e in iv], np.int64)
    d = np.array([1] * 3 + [-1] * 3, np.int64)
    order = np.lexsort((d, t))
    run = np.cumsum(d[order])
    peak = int(run.max())
    first = int(t[order][int(np.argmax(run == peak))])
    assert peak == 3 and first == 20


def test_edd_minimizes_max_lateness():
    # Jackson's rule: EDD's L_max is <= every permutation's L_max.
    import itertools

    rng = np.random.default_rng(21)
    for _ in range(15):
        n = int(rng.integers(2, 7))
        p = rng.integers(1, 20, n).astype(int)
        due = rng.integers(5, 60, n).astype(int)

        def lmax(order):
            c = 0
            worst = -10**9
            for i in order:
                c += p[i]
                worst = max(worst, c - due[i])
            return worst

        edd = sorted(range(n), key=lambda i: (due[i], i))
        best = min(lmax(perm) for perm in itertools.permutations(range(n)))
        assert lmax(edd) == best


def _knap_dp(ws, vs, cap=100):
    best = np.zeros(cap + 1, np.int64)
    for w, v in zip(ws, vs):
        if w <= cap:
            shifted = np.concatenate([best[:w] * 0, best[:cap + 1 - w] + v])
            shifted[:w] = -1
            best = np.maximum(best, shifted)
    bv = int(best.max())
    return bv, int(np.argmax(best == bv))


def test_knapsack_dp_vs_bruteforce():
    rng = np.random.default_rng(31)
    for _ in range(20):
        n = int(rng.integers(1, 13))
        ws = rng.integers(1, 60, n).tolist()
        vs = rng.integers(1, 500, n).tolist()
        bv, bw = _knap_dp(ws, vs)
        best = 0
        for mask in range(1 << n):
            tw = sum(w for i, w in enumerate(ws) if mask >> i & 1)
            tv = sum(v for i, v in enumerate(vs) if mask >> i & 1)
            if tw <= 100:
                best = max(best, tv)
        assert bv == best
        assert bw <= 100


def test_knapsack_takes_dense_pair_over_heavy_single():
    # One heavy high-value item vs two light ones summing higher.
    bv, bw = _knap_dp([100, 50, 50], [120, 70, 70])
    assert bv == 140 and bw == 100


def _nn_tour(ids, xs, ys):
    order = np.argsort(ids)
    ids, xs, ys = (np.asarray(a, np.int64)[order] for a in (ids, xs, ys))
    n = len(ids)
    alive = np.ones(n, bool)
    cur, tour, chk = 0, 0, int(ids[0])
    alive[0] = False
    seq = [int(ids[0])]
    for k in range(2, n + 1):
        d2 = (xs - xs[cur]) ** 2 + (ys - ys[cur]) ** 2
        key = d2 * 1048576 + ids
        key[~alive] = np.iinfo(np.int64).max
        nxt = int(np.argmin(key))
        tour += int(d2[nxt])
        chk += k * int(ids[nxt])
        seq.append(int(ids[nxt]))
        alive[nxt] = False
        cur = nxt
    return tour, chk, seq


def test_nn_tour_collinear_visits_in_order():
    # Points on a line starting at the left end: NN visits left→right.
    ids = [10, 20, 30, 40]
    xs = [0, 5, 12, 30]
    ys = [0, 0, 0, 0]
    tour, _, seq = _nn_tour(ids, xs, ys)
    assert seq == [10, 20, 30, 40]
    assert tour == 25 + 49 + 324


def test_nn_tour_tie_breaks_to_smallest_id():
    # Two equidistant neighbors: the smaller tile id wins.
    ids = [1, 5, 3]
    xs = [0, 10, -10]
    ys = [0, 0, 0]
    _, _, seq = _nn_tour(ids, xs, ys)
    assert seq == [1, 3, 5]


def test_queue_prefix_trick_equals_sequential_replay():
    # C_i = max(A_i, C_{i-1}) + p_i  ==  P_i + cummax(A_j - P_{j-1})
    rng = np.random.default_rng(77)
    for _ in range(25):
        n = int(rng.integers(1, 30))
        arr = np.sort(rng.integers(0, 1000, n)).astype(np.int64)
        p = rng.integers(1, 50, n).astype(np.int64)
        c = 0
        want = []
        for i in range(n):
            c = max(int(arr[i]), c) + int(p[i])
            want.append(c)
        pp = np.cumsum(p)
        base = arr - np.concatenate([[0], pp[:-1]])
        comp = pp + np.maximum.accumulate(base)
        assert comp.tolist() == want


def test_queue_idle_server_has_zero_wait():
    # Arrivals spaced wider than service: nobody waits.
    arr = np.array([0, 100, 200], np.int64)
    p = np.array([10, 10, 10], np.int64)
    pp = np.cumsum(p)
    base = arr - np.concatenate([[0], pp[:-1]])
    comp = pp + np.maximum.accumulate(base)
    assert ((comp - arr - p) == 0).all()


def test_gini_pieces_extremes():
    # All-equal revenues -> gini_num == 0; one part owns everything ->
    # gini_num == (n-1) * total (the maximal-concentration identity).
    x = np.array([5, 5, 5, 5], np.int64)
    i = np.arange(1, 5, dtype=np.int64)
    assert int(((2 * i - 5) * x).sum()) == 0
    x = np.array([0, 0, 0, 100], np.int64)
    assert int(((2 * i - 5) * x).sum()) == 3 * 100


def _fps(ids, xs, ys, k):
    order = np.argsort(ids)
    ids, xs, ys = (np.asarray(a, np.int64)[order] for a in (ids, xs, ys))
    mind = (xs - xs[0]) ** 2 + (ys - ys[0]) ** 2
    centers = [int(ids[0])]
    radii = [0]
    for _ in range(2, min(k, len(ids)) + 1):
        key = mind * 1048576 + (1048575 - ids)
        nxt = int(np.argmax(key))
        centers.append(int(ids[nxt]))
        radii.append(int(mind[nxt]))
        mind = np.minimum(mind, (xs - xs[nxt]) ** 2 + (ys - ys[nxt]) ** 2)
    return centers, radii


def test_fps_picks_extremes_first():
    # A tight cluster plus one far outlier: step 2 grabs the outlier.
    ids = [1, 2, 3, 4, 9]
    xs = [0, 1, 2, 1, 1000]
    ys = [0, 1, 0, 2, 1000]
    centers, radii = _fps(ids, xs, ys, 3)
    assert centers[0] == 1 and centers[1] == 9
    assert radii[1] == 1000 ** 2 + 1000 ** 2


def test_fps_radii_nonincreasing():
    rng = np.random.default_rng(55)
    ids = np.arange(1, 41)
    xs = rng.integers(0, 1000, 40)
    ys = rng.integers(0, 1000, 40)
    _, radii = _fps(ids, xs, ys, 8)
    # the chosen coverage radius can never grow as centers are added
    assert all(radii[i] >= radii[i + 1] for i in range(1, len(radii) - 1))


def _greedy_domset(adj, ids):
    n = len(ids)
    covered = np.zeros(n, bool)
    picks = []
    while not covered.all():
        gain = np.array([np.count_nonzero(~covered[list(s)]) for s in adj])
        idx = np.flatnonzero(gain == gain.max())
        pick = int(idx[np.argmin(np.asarray(ids)[idx])])
        picks.append((ids[pick], int(gain[pick])))
        covered[list(adj[pick])] = True
    return picks


def test_domset_is_dominating_and_star_takes_one():
    # A star graph: the hub's closed neighborhood is everything.
    ids = [5, 1, 2, 3, 4]  # hub has id 5 at index 0
    adj = [{0, 1, 2, 3, 4}, {0, 1}, {0, 2}, {0, 3}, {0, 4}]
    picks = _greedy_domset(adj, ids)
    assert picks == [(5, 5)]


def test_domset_two_cliques_take_two():
    ids = [1, 2, 3, 10, 11, 12]
    adj = [{0, 1, 2}, {0, 1, 2}, {0, 1, 2}, {3, 4, 5}, {3, 4, 5}, {3, 4, 5}]
    picks = _greedy_domset(adj, ids)
    assert [p for p, _ in picks] == [1, 10]
    assert all(g == 3 for _, g in picks)


def _tdiv(a, b):
    return -((-a) // b) if a < 0 else a // b


def _alpha_beta(zs):
    x, v, innov = int(zs[0]) * 256, 0, 0
    for z in zs[1:]:
        xp = x + v
        r = int(z) * 256 - xp
        x = xp + _tdiv(r, 4)
        v = v + _tdiv(r, 16)
        innov += abs(r)
    return x, v, innov


def test_alpha_beta_locks_onto_constant_velocity():
    # On a perfect ramp the filter converges: late innovations shrink
    # and the velocity estimate approaches 256 * slope.
    zs = [100 + 7 * k for k in range(60)]
    x, v, _ = _alpha_beta(zs)
    assert abs(v - 7 * 256) <= 96  # within 3/8 unit/step of truth
    assert abs(x - zs[-1] * 256) <= 1024  # position locked within 4 units


def test_alpha_beta_static_target_exact():
    zs = [500] * 20
    x, v, innov = _alpha_beta(zs)
    assert x == 500 * 256 and v == 0 and innov == 0


def test_alpha_beta_trunc_division_on_negative_residual():
    # One downward step: r = -256; trunc(-256/4) = -64, trunc(-256/16) = -16
    x, v, innov = _alpha_beta([10, 9])
    assert innov == 256
    assert x == 10 * 256 - 64 and v == -16


def _ss_replay(qs, s=50, S=150):
    inv, reorders, lost = S, 0, 0
    for q in qs:
        if q > inv:
            lost += q - inv
            inv = 0
        else:
            inv -= q
        if inv < s:
            inv = S
            reorders += 1
    return inv, reorders, lost


def test_ss_policy_hand_replay():
    # 150 -> -60=90 -> -50=40 <50 -> reorder 150 -> -200: lost 50, inv 0,
    # reorder -> 150
    inv, reorders, lost = _ss_replay([60, 50, 200])
    assert (inv, reorders, lost) == (150, 2, 50)


def test_ss_policy_never_negative_and_no_demand_no_reorder():
    rng = np.random.default_rng(3)
    for _ in range(20):
        qs = rng.integers(1, 120, int(rng.integers(0, 30))).tolist()
        inv, reorders, lost = _ss_replay(qs)
        assert inv >= 50 or (not qs and inv == 150)
        assert lost >= 0
    assert _ss_replay([]) == (150, 0, 0)


def _peaks(v):
    n = len(v)
    out = []
    for i in range(1, n - 1):
        if not (v[i] > v[i - 1] and v[i] > v[i + 1]):
            continue
        hl = [j for j in range(i) if v[j] > v[i]]
        lo = max(hl) + 1 if hl else 0
        lb = min(v[lo:i])
        hr = [j for j in range(i + 1, n) if v[j] > v[i]]
        hi = min(hr) if hr else n
        rb = min(v[i + 1:hi])
        out.append((i, v[i] - max(lb, rb)))
    return out


def test_prominence_matches_scipy_semantics_hand_case():
    # series: two peaks; the smaller one's prominence is limited by the
    # saddle to its higher neighbor, the global one keys off the minima.
    v = [0, 5, 2, 8, 1]
    got = dict(_peaks(v))
    assert got[3] == 8 - 1   # global peak: bases are series minima sides
    assert got[1] == 5 - 2   # small peak: saddle at 2 before higher 8


def test_prominence_monotone_ramp_has_no_peaks():
    assert _peaks([1, 2, 3, 4, 5]) == []
    assert _peaks([5, 4, 3, 2, 1]) == []


def test_prominence_plateau_not_a_strict_peak():
    assert _peaks([0, 4, 4, 0]) == []


def _ww_dp(d, K=500):
    T = len(d)
    best = [(0, 0)] + [None] * T
    for t in range(1, T + 1):
        cands = []
        for j in range(1, t + 1):
            hold = sum((i - j) * int(d[i - 1]) for i in range(j, t + 1))
            cands.append((best[j - 1][0] + K + hold, best[j - 1][1] + 1, j))
        best[t] = min(cands)[:2]
    return best[T]


def test_wagner_whitin_vs_bitmask_bruteforce():
    rng = np.random.default_rng(61)
    for _ in range(15):
        d = rng.integers(0, 80, 8).tolist()
        cost_dp, orders_dp = _ww_dp(d, K=100)
        best = None
        for mask in range(1, 1 << 8, 2):  # bit0 (month 1) always set
            orders = [j for j in range(8) if mask >> j & 1]
            tot = 100 * len(orders)
            for i in range(8):
                j = max(o for o in orders if o <= i)
                tot += (i - j) * d[i]
            cand = (tot, len(orders))
            best = cand if best is None or cand < best else best
        assert (cost_dp, orders_dp) == best


def test_wagner_whitin_extremes():
    # Huge K -> one order; zero K -> order every month.
    assert _ww_dp([10] * 12, K=10**9)[1] == 1
    assert _ww_dp([10] * 12, K=0)[1] == 12


def test_er_blocking_two_pointer_counts():
    # Sorted balances in one block: window 2000 cents, candidates are
    # the two-pointer pairs; matches need nation+segment agreement.
    bal = np.array([0, 500, 1500, 4000], np.int64)
    nk = np.array([1, 1, 2, 1], np.int64)
    seg = np.array(["A", "A", "A", "A"], object)
    cnt = mt = 0
    for i in range(len(bal)):
        j = i + 1
        while j < len(bal) and bal[j] - bal[i] <= 2000:
            cnt += 1
            if nk[j] == nk[i] and seg[j] == seg[i]:
                mt += 1
            j += 1
    # pairs: (0,500) (0,1500) (500,1500) (1500,4000 is 2500 -> out)
    assert cnt == 3
    assert mt == 1  # only (0,500) shares the nation


def test_did_fold_recovers_planted_effect():
    from fractions import Fraction

    # cells (grp, post) -> (sum, n); planted treatment effect +7 on top
    # of a +3 time trend and a +2 group offset
    base = 10
    cells = {
        (0, 0): (base * 4, 4),
        (0, 1): ((base + 3) * 5, 5),
        (1, 0): ((base + 2) * 3, 3),
        (1, 1): ((base + 2 + 3 + 7) * 6, 6),
    }
    m = {k: Fraction(s, n) for k, (s, n) in cells.items()}
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    assert did == 7


def test_control_chart_cross_multiplied_3sigma():
    # Baseline mean 10, variance pieces; a monitored value at exactly
    # mean + 3*sigma must NOT signal (strict >) while mean + 4*sigma must.
    base = np.array([8, 10, 12, 10, 10], np.int64)  # n=5, S=50, Q=508
    n, s, q = 5, int(base.sum()), int((base * base).sum())
    var_n2 = n * q - s * s  # n^2 * sigma^2 = 40 -> sigma^2 = 1.6
    def sig(x):
        return (x * n - s) ** 2 > 9 * var_n2
    import math

    sigma = math.sqrt(var_n2) / n
    at3 = 10 + 3 * sigma
    assert not sig(int(at3))           # just under/at the limit
    assert sig(int(math.ceil(10 + 4 * sigma)))


def test_price_index_bracket_on_planted_inflation():
    from fractions import Fraction

    # Two parts, uniform 20% price rise, unchanged quantities: both
    # Laspeyres and Paasche equal exactly 6/5.
    r0 = {1: 100, 2: 300}
    q0 = {1: 4, 2: 2}
    r1 = {k: v * 6 // 5 for k, v in r0.items()}
    q1 = dict(q0)
    lasp = Fraction(sum(r1[k] * q0[k] for k in r0),
                    sum(r0[k] * q0[k] for k in r0))
    paas = Fraction(sum(r1[k] * q1[k] for k in r0),
                    sum(r0[k] * q1[k] for k in r0))
    assert lasp == paas == Fraction(6, 5)


def _hampel_flags(xs):
    xs = np.asarray(xs, np.int64)
    out = []
    for i in range(2, len(xs) - 2):
        w5 = np.sort(xs[i - 2:i + 3])
        med = int(w5[2])
        mad = int(np.sort(np.abs(xs[i - 2:i + 3] - med))[2])
        if abs(int(xs[i]) - med) > 3 * mad:
            out.append(i)
    return out


def test_hampel_flags_spike_not_ramp():
    # A single spike in a gently noisy series is flagged; a clean linear
    # ramp never is (its MAD absorbs the slope).
    xs = [10, 12, 11, 13, 500, 12, 11, 13, 12]
    assert _hampel_flags(xs) == [4]
    ramp = list(range(0, 100, 7))
    assert _hampel_flags(ramp) == []


def test_hampel_zero_mad_degenerate_case():
    # >= 3 equal window values give MAD 0: any center deviation flags.
    xs = [5, 5, 6, 5, 5]
    assert _hampel_flags(xs) == [2]
    assert _hampel_flags([5, 5, 5, 5, 5]) == []


def test_kendall_tau_pieces_known_case():
    # perfect concordance, perfect discordance, and an all-tied axis
    q = np.array([1, 2, 3, 4], np.int64)
    p_up = np.array([10, 20, 30, 40], np.int64)
    p_dn = p_up[::-1].copy()

    def pieces(q, p):
        sq = np.sign(q[:, None] - q[None, :])
        sp = np.sign(p[:, None] - p[None, :])
        iu = np.triu_indices(len(q), 1)
        prod = sq[iu] * sp[iu]
        return (int((prod > 0).sum()), int((prod < 0).sum()),
                int((sq[iu] == 0).sum()), int((sp[iu] == 0).sum()))

    assert pieces(q, p_up) == (6, 0, 0, 0)
    assert pieces(q, p_dn) == (0, 6, 0, 0)
    assert pieces(np.array([5, 5, 5], np.int64), np.array([1, 2, 3],
                                                          np.int64)) \
        == (0, 0, 3, 0)


def test_calipers_diameter_vs_bruteforce():
    from gtfs_conflation_pipeline_ray.functions.geom import convex_hull_int

    rng = np.random.default_rng(71)
    for _ in range(20):
        n = int(rng.integers(3, 40))
        xy = rng.integers(0, 1000, size=(n, 2)).astype(np.int64)
        hull = convex_hull_int(xy)
        h = len(hull)
        best = 0
        if h >= 2:
            j = 1
            for i in range(h):
                nxt = (i + 1) % h
                while True:
                    jn = (j + 1) % h
                    ex = int(hull[nxt][0] - hull[i][0])
                    ey = int(hull[nxt][1] - hull[i][1])
                    vx = int(hull[jn][0] - hull[j][0])
                    vy = int(hull[jn][1] - hull[j][1])
                    if ex * vy - ey * vx > 0:
                        j = jn
                    else:
                        break
                for cj in (j, (j + 1) % h):
                    dx = int(hull[i][0] - hull[cj][0])
                    dy = int(hull[i][1] - hull[cj][1])
                    best = max(best, dx * dx + dy * dy)
        brute = 0
        for i in range(n):
            for j2 in range(i + 1, n):
                dx = int(xy[i, 0] - xy[j2, 0])
                dy = int(xy[i, 1] - xy[j2, 1])
                brute = max(brute, dx * dx + dy * dy)
        assert best == brute


def test_chao1_pieces_and_estimator_sanity():
    from fractions import Fraction

    # abundances: 3 singletons, 2 doubletons, 1 triple -> S_obs=6
    counts = [1, 1, 1, 2, 2, 3]
    s_obs = len(counts)
    f1 = sum(1 for c in counts if c == 1)
    f2 = sum(1 for c in counts if c == 2)
    assert (s_obs, f1, f2) == (6, 3, 2)
    chao1 = Fraction(s_obs) + Fraction(f1 * f1, 2 * f2)
    assert chao1 == Fraction(33, 4)  # 6 + 9/4 — estimates unseen species
    # fully-sampled community (no singletons) estimates no unseen mass
    assert sum(1 for c in [5, 4, 3] if c == 1) == 0


def _hw_replay(x, div=lambda a, b: -((-a) // b) if a < 0 else a // b):
    lev, tr = x[0], 0
    s = [x[m] - x[0] for m in range(4)]
    sse = 0
    for m in range(12):
        f = lev + tr + s[m % 4]
        e = x[m] - f
        sse += e * e
        lev, tr, s[m % 4] = (lev + tr + div(e, 4), tr + div(e, 16),
                             s[m % 4] + div(e, 8))
    return lev, tr, sse


def test_holt_winters_locks_onto_pure_seasonal():
    # A perfectly periodic series: the initial seasonals already fit, so
    # every one-step error is zero and the state never moves.
    x = [10, 40, 20, 30] * 3
    lev, tr, sse = _hw_replay(x)
    assert sse == 0 and lev == 10 and tr == 0


def test_holt_winters_tracks_seasonal_plus_trend():
    # Season + linear growth: after 12 steps the trend estimate is
    # positive and the fit error is far below the no-model energy.
    x = [10 + 5 * m + [0, 30, 10, 20][m % 4] for m in range(12)]
    lev, tr, sse = _hw_replay(x)
    assert tr > 0
    assert sse < sum(v * v for v in x) // 10


def test_abc_classing_cut_rule():
    # revenues 50, 30, 15, 5 (total 100): cum shares 50, 80, 95, 100 ->
    # classes A A B C under "after adding the part" cut points.
    rev = np.array([50, 30, 15, 5], np.int64)
    cum = np.cumsum(rev)
    tot = rev.sum()
    cls = np.where(cum * 100 <= 80 * tot, "A",
                   np.where(cum * 100 <= 95 * tot, "B", "C"))
    assert cls.tolist() == ["A", "A", "B", "C"]


def test_sax_symbols_quartile_alphabet():
    # 8 window sums: breakpoints at ranks ceil(k*8/4) = 2, 4, 6 of the
    # sorted list; symbols count breakpoints strictly below.
    s = np.array([10, 20, 30, 40, 50, 60, 70, 80], np.int64)
    n = len(s)
    order = np.argsort(s, kind="mergesort")
    bks = [int(s[order[-(-(k * n) // 4) - 1]]) for k in (1, 2, 3)]
    assert bks == [20, 40, 60]
    sym = sum((s > b).astype(np.int64) for b in bks)
    assert sym.tolist() == [0, 0, 1, 1, 2, 2, 3, 3]


def test_friedman_doubled_midranks():
    # one block with values (5, 5, 9, 1): midranks 2.5, 2.5, 4, 1 ->
    # doubled 5, 5, 8, 2; the doubled ranks always sum to k(k+1).
    vals = np.array([[5, 5, 9, 1]], np.int64)
    less = (vals[:, :, None] > vals[:, None, :]).sum(axis=2)
    equal = (vals[:, :, None] == vals[:, None, :]).sum(axis=2)
    rank2 = 2 * less + equal + 1
    assert rank2.tolist() == [[5, 5, 8, 2]]
    assert rank2.sum() == 4 * 5


def test_croston_ignores_zero_months():
    def tdiv(a, b):
        return -((-a) // b) if a < 0 else a // b

    def croston(x):
        z = p = None
        last, nz = 0, 0
        for m in range(1, len(x) + 1):
            if x[m - 1] == 0:
                continue
            nz += 1
            iv = m - last
            last = m
            if z is None:
                z, p = x[m - 1] * 16, iv * 16
            else:
                z = z + tdiv(x[m - 1] * 16 - z, 4)
                p = p + tdiv(iv * 16 - p, 4)
        return z, p, nz

    # steady every-3-months demand of 12 -> z stays 12*16, p -> 3*16
    z, p, nz = croston([0, 0, 12, 0, 0, 12, 0, 0, 12, 0, 0, 12])
    assert z == 12 * 16 and p == 3 * 16 and nz == 4
    # all-zero part -> sentinel states
    assert croston([0] * 12) == (None, None, 0)


def test_modularity_identity_on_two_cliques():
    # Two 3-cliques, no cross edges, communities = the cliques:
    # Q*(2m)^2 = sum_c (2m*in2_c - deg_c^2) is maximal (Q = 1/2).
    # edges (undirected multiset, both directions): clique edges x2
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    us = [a for a, b in edges] + [b for a, b in edges]
    ud = [b for a, b in edges] + [a for a, b in edges]
    m2 = len(us)
    com = {v: v // 3 for v in range(6)}
    total = 0
    for c in (0, 1):
        in2 = sum(1 for a, b in zip(us, ud)
                  if com[a] == c and com[b] == c)
        deg = sum(1 for a in us if com[a] == c)
        total += m2 * in2 - deg * deg
    from fractions import Fraction

    assert Fraction(total, m2 * m2) == Fraction(1, 2)


def test_clarke_wright_savings_geometry():
    # Two customers adjacent to each other but far from the depot save
    # almost a full round trip; opposite-side customers save nothing.
    def s(a, b, depot=(0, 0)):
        d0a = abs(a[0] - depot[0]) + abs(a[1] - depot[1])
        d0b = abs(b[0] - depot[0]) + abs(b[1] - depot[1])
        dab = abs(a[0] - b[0]) + abs(a[1] - b[1])
        return d0a + d0b - dab

    assert s((100, 0), (101, 0)) == 200      # near-full trip saved
    assert s((100, 0), (-100, 0)) == 0       # opposite sides: nothing
    assert s((50, 50), (50, 50)) == 200      # identical: the whole trip


def test_hhi_fold_extremes():
    from fractions import Fraction

    # monopoly -> HHI = 1; n equal suppliers -> 1/n
    assert Fraction(100 ** 2, 100 ** 2) == 1
    revs = [25, 25, 25, 25]
    hhi = sum(Fraction(r, 100) ** 2 for r in revs)
    assert hhi == Fraction(1, 4)
