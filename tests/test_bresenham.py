"""Brute-force parity for the vectorized Bresenham raster walk
(stages/spatial.bresenham_batch): the registry oracle replays the same
error-term recurrence in a recursive CTE, so these pin the batch kernel
against a scalar per-segment reference over all octants, plus the
Chebyshev cell-count identity and degenerate segments."""

import numpy as np

from gtfs_conflation_pipeline_ray.stages import spatial


RNG = np.random.default_rng(777)


def _bresenham_scalar(x0, y0, x1, y1):
    dx, dy = abs(x1 - x0), -abs(y1 - y0)
    sx = 1 if x0 < x1 else -1
    sy = 1 if y0 < y1 else -1
    err = dx + dy
    x, y = x0, y0
    cells = [(x, y)]
    while not (x == x1 and y == y1):
        e2 = 2 * err
        if e2 >= dy:
            err += dy
            x += sx
        if e2 <= dx:
            err += dx
            y += sy
        cells.append((x, y))
    return cells


def test_bresenham_batch_random_parity():
    n = 300
    x0 = RNG.integers(-40, 40, n)
    y0 = RNG.integers(-40, 40, n)
    x1 = RNG.integers(-40, 40, n)
    y1 = RNG.integers(-40, 40, n)
    n_cells, cell_sum = spatial.bresenham_batch(x0, y0, x1, y1)
    for i in range(n):
        cells = _bresenham_scalar(int(x0[i]), int(y0[i]), int(x1[i]), int(y1[i]))
        assert n_cells[i] == len(cells)
        assert cell_sum[i] == sum(31 * x + 17 * y for x, y in cells)


def test_bresenham_count_is_chebyshev_plus_one():
    n = 200
    x0 = RNG.integers(0, 100, n)
    y0 = RNG.integers(0, 100, n)
    x1 = RNG.integers(0, 100, n)
    y1 = RNG.integers(0, 100, n)
    n_cells, _ = spatial.bresenham_batch(x0, y0, x1, y1)
    cheb = np.maximum(np.abs(x1 - x0), np.abs(y1 - y0))
    assert np.array_equal(n_cells, cheb + 1)


def test_bresenham_degenerate_and_axis_lines():
    x0 = np.array([5, 0, 3])
    y0 = np.array([7, 0, 9])
    x1 = np.array([5, 6, 3])
    y1 = np.array([7, 0, 2])
    n_cells, cell_sum = spatial.bresenham_batch(x0, y0, x1, y1)
    assert n_cells.tolist() == [1, 7, 8]  # point, horizontal, vertical
    assert cell_sum[0] == 31 * 5 + 17 * 7
    assert cell_sum[1] == sum(31 * x for x in range(7))
    assert cell_sum[2] == 8 * 31 * 3 + 17 * sum(range(2, 10))


def _viewshed_naive(elev, ox, oy, antenna=2):
    """Independent reference: Fraction line-of-sight slopes along scalar
    Bresenham rays (the cross-multiplied engine rule equals a strict
    slope comparison because step indices are positive)."""
    from fractions import Fraction

    h, w = elev.shape
    eo = int(elev[oy, ox]) + antenna
    out = {}
    for ty in range(h):
        for tx in range(w):
            if (tx, ty) == (ox, oy):
                continue
            cells = _bresenham_scalar(ox, oy, tx, ty)
            big_k = len(cells) - 1
            et = int(elev[ty, tx])
            tgt_slope = Fraction(et - eo, big_k)
            vis = all(Fraction(int(elev[y, x]) - eo, k) < tgt_slope
                      for k, (x, y) in enumerate(cells[1:big_k], start=1))
            out[(tx, ty)] = vis
    return out


def test_viewshed_random_parity():
    for _ in range(8):
        elev = RNG.integers(0, 30, size=(9, 9)).astype(np.int64)
        tx, ty, e_t, big_k, vis = spatial.viewshed_visible(elev, 4, 4)
        naive = _viewshed_naive(elev, 4, 4)
        for i in range(len(tx)):
            assert vis[i] == naive[(int(tx[i]), int(ty[i]))], (tx[i], ty[i])
            assert e_t[i] == elev[ty[i], tx[i]]
            assert big_k[i] == max(abs(int(tx[i]) - 4), abs(int(ty[i]) - 4))


def test_viewshed_wall_blocks_behind():
    # A tall ridge at x=6 hides the flat cells behind it along the +x row,
    # while the ridge itself is visible.
    elev = np.zeros((5, 12), np.int64)
    elev[:, 6] = 100
    tx, ty, _, _, vis = spatial.viewshed_visible(elev, 1, 2)
    vismap = {(int(a), int(b)): v for a, b, v in zip(tx, ty, vis)}
    assert vismap[(6, 2)]
    for x in range(7, 12):
        assert not vismap[(x, 2)]
    for x in range(2, 6):
        # flat cells in FRONT of the ridge stay visible (negative target
        # slope −2/K is strictly above every intermediate's −2/k, k < K)
        assert vismap[(x, 2)]


def test_viewshed_flat_world_all_visible():
    # With a positive antenna every flat cell clears every intermediate.
    elev = np.full((7, 7), 5, np.int64)
    _, _, _, _, vis = spatial.viewshed_visible(elev, 3, 3)
    assert vis.all()


def _life_step(alive):
    h, w = alive.shape
    nb = np.zeros((h, w), np.int64)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            sh = np.zeros((h, w), np.int64)
            ys = slice(max(dy, 0), h + min(dy, 0))
            yd = slice(max(-dy, 0), h + min(-dy, 0))
            xs = slice(max(dx, 0), w + min(dx, 0))
            xd = slice(max(-dx, 0), w + min(-dx, 0))
            sh[ys, xs] = alive[yd, xd]
            nb += sh
    return (alive & ((nb == 2) | (nb == 3))) | (~alive & (nb == 3))


def test_life_blinker_oscillates():
    g = np.zeros((5, 5), bool)
    g[2, 1:4] = True  # horizontal blinker
    g1 = _life_step(g)
    assert g1[1:4, 2].all() and g1.sum() == 3  # vertical
    assert np.array_equal(_life_step(g1), g)   # period 2


def test_life_block_is_still_and_lonely_cell_dies():
    g = np.zeros((4, 4), bool)
    g[1:3, 1:3] = True
    assert np.array_equal(_life_step(g), g)
    lone = np.zeros((3, 3), bool)
    lone[1, 1] = True
    assert not _life_step(lone).any()


def _pit_fill(elev, rounds=6):
    h, w = elev.shape
    big = int(elev.max()) + 1
    wl = np.full((h, w), big, np.int64)
    border = np.zeros((h, w), bool)
    border[0, :] = border[-1, :] = border[:, 0] = border[:, -1] = True
    wl[border] = elev[border]
    for _ in range(rounds):
        nmin = np.full((h, w), big, np.int64)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                sh = np.full((h, w), big, np.int64)
                ys = slice(max(dy, 0), h + min(dy, 0))
                yd = slice(max(-dy, 0), h + min(-dy, 0))
                xs = slice(max(dx, 0), w + min(dx, 0))
                xd = slice(max(-dx, 0), w + min(-dx, 0))
                sh[ys, xs] = wl[yd, xd]
                nmin = np.minimum(nmin, sh)
        nw = np.maximum(elev, nmin)
        nw[border] = elev[border]
        wl = nw
    return wl


def test_pit_fill_bowl_fills_to_rim():
    # A closed bowl: interior floor 0, rim 10 — water rises to the rim's
    # lowest spill (10), except the rim itself and outside stay dry.
    elev = np.zeros((7, 7), np.int64)
    elev[1:6, 1:6] = 10
    elev[2:5, 2:5] = 0
    w = _pit_fill(elev)
    assert (w[2:5, 2:5] == 10).all()   # the lake
    assert (w[elev == 10] == 10).all()  # rim dry
    assert (w[0, :] == 0).all()        # border stays at elevation


def test_pit_fill_never_below_elev_and_monotone():
    rng = np.random.default_rng(29)
    elev = rng.integers(0, 20, size=(10, 10)).astype(np.int64)
    w = _pit_fill(elev)
    assert (w >= elev).all()
    # running two more rounds can only lower (drain) water, never raise
    w8 = _pit_fill(elev, rounds=8)
    assert (w8 <= w).all()


def test_pit_fill_spillway_drains_bowl():
    # Same bowl but with a breach in the rim: the lake drains through it.
    elev = np.zeros((7, 7), np.int64)
    elev[1:6, 1:6] = 10
    elev[2:5, 2:5] = 0
    elev[1, 3] = 0  # breach
    w = _pit_fill(elev)
    assert (w[2:5, 2:5] == 0).all()


def test_semivariogram_pieces_random_parity():
    rng = np.random.default_rng(31)
    elev = rng.integers(0, 50, size=(10, 12)).astype(np.int64)
    for dx, dy in ((1, 0), (0, 1), (1, 1), (2, 0)):
        a = elev[0:10 - dy, 0:12 - dx]
        b = elev[dy:10, dx:12]
        want_n, want_s = 0, 0
        for y in range(10 - dy):
            for x in range(12 - dx):
                want_n += 1
                want_s += (int(elev[y, x]) - int(elev[y + dy, x + dx])) ** 2
        assert a.size == want_n
        assert int(((a - b) ** 2).sum()) == want_s


def test_semivariogram_smooth_vs_checker_anisotropy():
    # A vertical-stripe raster: zero variance along columns ((0,1) lag),
    # full contrast across them ((1,0) lag) — the anisotropy screen.
    elev = np.tile(np.array([0, 9] * 6, np.int64), (8, 1))
    gx = ((elev[:, :-1] - elev[:, 1:]) ** 2).sum()
    gy = ((elev[:-1, :] - elev[1:, :]) ** 2).sum()
    assert gy == 0 and gx == 8 * 11 * 81


def test_ripley_pair_counts_csr_vs_clustered():
    # A clustered pattern has more small-r pairs than a regular grid of
    # the same size — the statistic's defining separation.
    def pairs_within(xy, r):
        n = len(xy)
        c = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx = int(xy[i][0] - xy[j][0])
                dy = int(xy[i][1] - xy[j][1])
                if dx * dx + dy * dy <= r * r:
                    c += 1
        return c

    grid = [(100 * i, 100 * j) for i in range(5) for j in range(5)]
    clust = [(i, j) for i in range(5) for j in range(5)]
    assert pairs_within(clust, 50) > pairs_within(grid, 50)
    assert pairs_within(grid, 100) == 2 * 5 * 4  # rook neighbors only


def test_sandpile_topple_conserves_interior_grains():
    # One interior tower of 9: round 1 topples (9-4=5, four 1s); total
    # grains conserved away from the boundary.
    g = np.zeros((7, 7), np.int64)
    g[3, 3] = 9
    t = (g >= 4).astype(np.int64)
    new = g - 4 * t
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        sh = np.zeros_like(g)
        ys = slice(max(dy, 0), 7 + min(dy, 0))
        yd = slice(max(-dy, 0), 7 + min(-dy, 0))
        xs = slice(max(dx, 0), 7 + min(dx, 0))
        xd = slice(max(-dx, 0), 7 + min(-dx, 0))
        sh[ys, xs] = t[yd, xd]
        new += sh
    assert new.sum() == 9
    assert new[3, 3] == 5 and new[2, 3] == new[4, 3] == 1


def test_sandpile_boundary_loses_grains():
    g = np.zeros((3, 3), np.int64)
    g[0, 0] = 4  # corner tower: two of its four grains fall off-world
    t = (g >= 4).astype(np.int64)
    new = g - 4 * t
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        sh = np.zeros_like(g)
        ys = slice(max(dy, 0), 3 + min(dy, 0))
        yd = slice(max(-dy, 0), 3 + min(-dy, 0))
        xs = slice(max(dx, 0), 3 + min(dx, 0))
        xd = slice(max(-dx, 0), 3 + min(-dx, 0))
        sh[ys, xs] = t[yd, xd]
        new += sh
    assert new.sum() == 2
