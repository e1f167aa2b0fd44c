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
