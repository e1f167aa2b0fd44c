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
