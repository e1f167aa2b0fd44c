"""Kernel pins for the Walsh-Hadamard energy split, octant codes, and the
seasonal-index integer form."""

import numpy as np

from gtfs_conflation_pipeline_ray.stages.media import (
    hadamard_matrix,
    wht_energy,
)
from gtfs_conflation_pipeline_ray.stages.spatial import octant_codes


def test_hadamard_orthogonality():
    for n in (2, 4, 8):
        h = hadamard_matrix(n)
        assert set(np.unique(h)) <= {-1, 1}
        assert (h @ h.T == n * np.eye(n, dtype=np.int64)).all()


def test_wht_energy_matches_bruteforce_and_parseval():
    rng = np.random.default_rng(23)
    for n in (4, 8):
        b = rng.integers(0, 256, size=(n, n)).astype(np.uint8)
        h = hadamard_matrix(n)
        coef = h @ b.astype(np.int64) @ h
        pc = np.array([bin(i).count("1") for i in range(n)])
        cls = pc[:, None] + pc[None, :]
        e = coef * coef
        want = (int(e[cls <= 1].sum()), int(e[cls > 1].sum()))
        got = wht_energy(b)
        assert got == want
        # Parseval: total transform energy = n^2 * pixel energy
        assert got[0] + got[1] == n * n * int(
            (b.astype(np.int64) ** 2).sum())


def test_wht_constant_block_is_all_dc():
    b = np.full((8, 8), 17, dtype=np.uint8)
    low, high = wht_energy(b)
    assert high == 0
    assert low == (64 * 17) ** 2  # DC coefficient only


def oct_brute(dx, dy):
    if dx == 0 and dy == 0:
        return 8
    if 2 * abs(dy) <= abs(dx):
        return 0 if dx > 0 else 4
    if 2 * abs(dx) <= abs(dy):
        return 2 if dy > 0 else 6
    if dx > 0 and dy > 0:
        return 1
    if dx < 0 and dy > 0:
        return 3
    if dx < 0 and dy < 0:
        return 5
    return 7


def test_octant_codes_match_scalar_case():
    rng = np.random.default_rng(31)
    dx = rng.integers(-10, 11, size=500).astype(np.int64)
    dy = rng.integers(-10, 11, size=500).astype(np.int64)
    got = octant_codes(dx, dy)
    want = np.array([oct_brute(a, b) for a, b in zip(dx, dy)])
    assert (got == want).all()


def test_octant_cardinals_and_diagonals():
    assert octant_codes(np.array([5]), np.array([0]))[0] == 0   # E
    assert octant_codes(np.array([0]), np.array([5]))[0] == 2   # N
    assert octant_codes(np.array([-5]), np.array([0]))[0] == 4  # W
    assert octant_codes(np.array([0]), np.array([-5]))[0] == 6  # S
    assert octant_codes(np.array([5]), np.array([5]))[0] == 1   # NE
    assert octant_codes(np.array([-5]), np.array([5]))[0] == 3  # NW
    assert octant_codes(np.array([-5]), np.array([-5]))[0] == 5  # SW
    assert octant_codes(np.array([5]), np.array([-5]))[0] == 7  # SE
    assert octant_codes(np.array([0]), np.array([0]))[0] == 8


def test_seasonal_index_neutral_on_uniform_months():
    # identical month averages -> every index exactly 1000
    sums = [300, 300, 600]
    ns = [1, 1, 2]
    total, n_total = sum(sums), sum(ns)
    idx = [s * n_total * 1000 // (total * n) for s, n in zip(sums, ns)]
    assert idx == [1000, 1000, 1000]
