"""Kernel pins for summed-area-table rect sums, autocorrelation pitch, and
the grouped-MAD order-statistics form."""

import numpy as np

from gtfs_conflation_pipeline_ray.stages.media import (
    autocorr_pitch,
    integral_rect_sums,
)


def test_sat_matches_bruteforce_random():
    rng = np.random.default_rng(21)
    for _ in range(10):
        h, w = rng.integers(1, 12, size=2)
        ch = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        rects = []
        for _ in range(4):
            r0, r1 = sorted(rng.integers(0, h + 1, size=2))
            c0, c1 = sorted(rng.integers(0, w + 1, size=2))
            rects.append((int(r0), int(r1), int(c0), int(c1)))
        got = integral_rect_sums(ch, rects)
        want = [int(ch[r0:r1, c0:c1].sum()) for r0, r1, c0, c1 in rects]
        assert got == want


def test_sat_full_and_empty_rect():
    ch = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert integral_rect_sums(ch, [(0, 3, 0, 4)]) == [66]
    assert integral_rect_sums(ch, [(1, 1, 0, 4)]) == [0]


def pitch_brute(s, lo, hi):
    n = len(s)
    best_lag, best = -1, None
    for lag in range(lo, min(hi, n - 1) + 1):
        c = sum(int(s[t]) * int(s[t + lag]) for t in range(n - lag))
        if best is None or c > best:
            best_lag, best = lag, c
    return (best_lag, best) if best is not None else (-1, 0)


def test_pitch_matches_bruteforce_random():
    rng = np.random.default_rng(7)
    for _ in range(8):
        n = int(rng.integers(10, 80))
        s = rng.integers(-30000, 30000, size=n).astype(np.int16)
        assert autocorr_pitch(s, 2, 20) == pitch_brute(s, 2, 20)


def test_pitch_square_wave_finds_full_period():
    # period-2p square wave: perfect correlation at lag 2p, value (n-2p)*amp^2
    for p in (2, 7, 15):
        n, amp = 1200, 5000
        t = np.arange(n)
        s = np.where((t // p) % 2 == 0, amp, -amp).astype(np.int16)
        lag, corr = autocorr_pitch(s, 2, 64)
        assert lag == 2 * p
        assert corr == (n - 2 * p) * amp * amp


def test_pitch_too_short_clip():
    assert autocorr_pitch(np.array([5], dtype=np.int16), 2, 64) == (-1, 0)


def test_mad_order_statistics_form():
    # med2/mad2 doubled form vs numpy median on an odd and an even group
    for vals in ([3, 1, 9, 5, 7], [10, 2, 8, 4]):
        v = np.sort(np.array(vals, dtype=np.int64))
        n = len(v)
        med2 = int(v[(n - 1) // 2] + v[n // 2])
        assert med2 / 2 == np.median(v)
        dev = np.sort(np.abs(2 * v - med2))
        mad2 = int(dev[(n - 1) // 2] + dev[n // 2])
        assert mad2 / 4 == np.median(np.abs(v - np.median(v)))
