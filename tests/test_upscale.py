"""Brute-force parity for the exact 2x bilinear upsample kernel
(stages/media.bilinear_up2) and the ImageUpscaleStats checkpoints: the
registry oracle rides a separable fixture, so these drive the general 2-D
kernel with unstructured random images against a per-pixel naive reference."""

import numpy as np

from gtfs_conflation_pipeline_ray.stages import media


RNG = np.random.default_rng(4242)


def _up2_naive(v):
    h, w = v.shape
    out = np.empty((2 * h - 1, 2 * w - 1), np.int64)
    vi = v.astype(np.int64)
    for y in range(2 * h - 1):
        for x in range(2 * w - 1):
            if y % 2 == 0 and x % 2 == 0:
                out[y, x] = vi[y // 2, x // 2]
            elif y % 2 == 0:
                out[y, x] = (vi[y // 2, x // 2] + vi[y // 2, x // 2 + 1]) // 2
            elif x % 2 == 0:
                out[y, x] = (vi[y // 2, x // 2] + vi[y // 2 + 1, x // 2]) // 2
            else:
                out[y, x] = (vi[y // 2, x // 2] + vi[y // 2, x // 2 + 1]
                             + vi[y // 2 + 1, x // 2]
                             + vi[y // 2 + 1, x // 2 + 1]) // 4
    return out


def test_bilinear_up2_random_parity():
    for _ in range(25):
        h, w = int(RNG.integers(2, 12)), int(RNG.integers(2, 12))
        ch = RNG.integers(0, 256, size=(h, w)).astype(np.uint8)
        got = media.bilinear_up2(ch)
        assert got.shape == (2 * h - 1, 2 * w - 1)
        assert np.array_equal(got, _up2_naive(ch))


def test_bilinear_up2_constant_is_constant():
    ch = np.full((5, 7), 113, dtype=np.uint8)
    up = media.bilinear_up2(ch)
    assert (up == 113).all() and up.shape == (9, 13)


def test_bilinear_up2_corner_alignment():
    # Corners and every even/even lattice point are source pixels verbatim.
    ch = RNG.integers(0, 256, size=(4, 6)).astype(np.uint8)
    up = media.bilinear_up2(ch)
    assert np.array_equal(up[::2, ::2], ch.astype(np.int64))


def test_bilinear_up2_floor_semantics():
    # 2x2 of odd values: midpoints and center must floor, not round.
    ch = np.array([[1, 2], [4, 9]], dtype=np.uint8)
    up = media.bilinear_up2(ch)
    assert up[0, 1] == 1 and up[1, 0] == 2 and up[1, 1] == 4


def _median3x3_naive(v):
    h, w = v.shape
    out = np.empty((h - 2, w - 2), np.int64)
    vi = v.astype(np.int64)
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            out[y - 1, x - 1] = sorted(
                vi[y - 1:y + 2, x - 1:x + 2].ravel().tolist())[4]
    return out


def test_median3x3_random_parity():
    for _ in range(25):
        h, w = int(RNG.integers(3, 12)), int(RNG.integers(3, 12))
        ch = RNG.integers(0, 256, size=(h, w)).astype(np.uint8)
        got = media.median3x3(ch)
        assert got.shape == (h - 2, w - 2)
        assert np.array_equal(got, _median3x3_naive(ch))


def test_median3x3_kills_impulse():
    # A single salt pixel in a flat field is erased entirely.
    ch = np.full((6, 8), 40, dtype=np.uint8)
    ch[3, 4] = 255
    assert (media.median3x3(ch) == 40).all()


def test_median3x3_too_small_is_empty():
    assert media.median3x3(np.zeros((2, 5), np.uint8)).size == 0


def _glcm_naive(v, dx, dy):
    h, w = v.shape
    from collections import Counter
    cnt = Counter()
    for y in range(h - dy):
        for x in range(w - dx):
            cnt[(int(v[y, x]) >> 5, int(v[y + dy, x + dx]) >> 5)] += 1
    con = sum(c * (a - b) ** 2 for (a, b), c in cnt.items())
    ene = sum(c * c for c in cnt.values())
    return con, ene, len(cnt)


def test_glcm_stats_random_parity():
    for dx, dy in [(1, 0), (0, 1), (1, 1)]:
        for _ in range(10):
            h, w = int(RNG.integers(3, 12)), int(RNG.integers(3, 12))
            ch = RNG.integers(0, 256, size=(h, w)).astype(np.uint8)
            assert media.glcm_stats(ch, dx, dy) == _glcm_naive(ch, dx, dy)


def test_glcm_flat_image_single_cell():
    ch = np.full((6, 9), 200, dtype=np.uint8)
    con, ene, cel = media.glcm_stats(ch, 1, 0)
    assert con == 0 and cel == 1 and ene == (6 * 8) ** 2


def _hough_naive(luma, thresh=5):
    v = luma.astype(np.int64)
    h, w = v.shape
    votes = {}
    n_edge = 0
    for i in range(1, h - 1):
        for j in range(1, w - 1):
            dx = int(v[i, j + 1]) - int(v[i, j - 1])
            dy = int(v[i + 1, j]) - int(v[i - 1, j])
            if abs(dx) + abs(dy) >= thresh:
                n_edge += 1
                for k, (c, s) in enumerate(media.HOUGH_ANGLES):
                    rho = (j * int(c) + i * int(s) + 65536) // 2048
                    votes[(k, rho)] = votes.get((k, rho), 0) + 1
    if not votes:
        return 0, 0, -1, -1
    best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
    return n_edge, best[1], best[0][0], best[0][1]


def test_hough_peak_random_parity():
    for _ in range(15):
        h, w = int(RNG.integers(3, 14)), int(RNG.integers(3, 14))
        luma = RNG.integers(0, 768, size=(h, w)).astype(np.int64)
        assert media.hough_peak(luma) == _hough_naive(luma)


def test_hough_vertical_line_peaks_at_k0():
    # A bright vertical stripe: edge pixels share one x → all their k=0
    # (θ=0, ρ ∝ j) votes land in few buckets; the winner is a k=0 bucket.
    luma = np.zeros((12, 16), np.int64)
    luma[:, 8] = 700
    n_edge, best_votes, best_k, _ = media.hough_peak(luma)
    assert n_edge > 0 and best_k == 0 and best_votes >= 10


def test_hough_flat_image_no_edges():
    assert media.hough_peak(np.full((8, 8), 300, np.int64)) == (0, 0, -1, -1)


def _affine_naive(img, c, s, tx, ty, oh=16, ow=16):
    h, w = img.shape[:2]
    out = np.empty((oh, ow) + img.shape[2:], img.dtype)
    for i in range(oh):
        for j in range(ow):
            sx = (j * c - i * s + 16777216) // 1024 - 16384 + tx
            sy = (j * s + i * c + 16777216) // 1024 - 16384 + ty
            sx = min(max(sx, 0), w - 1)
            sy = min(max(sy, 0), h - 1)
            out[i, j] = img[sy, sx]
    return out


def test_affine_nn_sample_random_parity():
    for _ in range(12):
        h, w = int(RNG.integers(4, 24)), int(RNG.integers(4, 24))
        img = RNG.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        k = int(RNG.integers(0, 8))
        c, s = (int(v) for v in media.HOUGH_ANGLES[k])
        tx, ty = int(RNG.integers(-3, 4)), int(RNG.integers(-3, 4))
        got = media.affine_nn_sample(img, c, s, tx, ty)
        assert np.array_equal(got, _affine_naive(img, c, s, tx, ty))


def test_affine_identity_is_crop():
    # k=0 (c=1024, s=0), zero translation: the warp is the top-left crop.
    img = RNG.integers(0, 256, size=(20, 20, 3)).astype(np.uint8)
    got = media.affine_nn_sample(img, 1024, 0, 0, 0)
    assert np.array_equal(got, img[:16, :16])


def test_affine_translation_shifts():
    img = RNG.integers(0, 256, size=(30, 30, 3)).astype(np.uint8)
    got = media.affine_nn_sample(img, 1024, 0, 3, 2)
    assert np.array_equal(got, img[2:18, 3:19])


def _fast_naive(luma, t=8):
    v = luma.astype(np.int64)
    h, w = v.shape
    cnt, chk = 0, 0
    for i in range(1, h - 1):
        for j in range(1, w - 1):
            ring = [v[i + di, j + dj] for di in (-1, 0, 1)
                    for dj in (-1, 0, 1) if (di, dj) != (0, 0)]
            bc = sum(1 for x in ring if x > v[i, j] + t)
            dc = sum(1 for x in ring if x < v[i, j] - t)
            if bc >= 6 or dc >= 6:
                cnt += 1
                chk += 31 * j + 17 * i
    return cnt, chk


def test_fast_corners_random_parity():
    for _ in range(15):
        h, w = int(RNG.integers(3, 14)), int(RNG.integers(3, 14))
        luma = RNG.integers(0, 768, size=(h, w)).astype(np.int64)
        assert media.fast_corners(luma) == _fast_naive(luma)


def test_fast_corners_dot_yes_edge_no():
    # An isolated bright dot IS a corner (8 darker ring neighbors); a
    # pixel on a straight step edge is NOT (only 3 ring neighbors differ).
    luma = np.zeros((9, 9), np.int64)
    luma[4, 4] = 500
    cnt, chk = media.fast_corners(luma)
    assert cnt == 1 and chk == 31 * 4 + 17 * 4
    edge = np.zeros((9, 9), np.int64)
    edge[:, 5:] = 500
    assert media.fast_corners(edge)[0] == 0


def test_feather_blend_random_parity():
    for _ in range(10):
        h, w = int(RNG.integers(2, 20)), int(RNG.integers(2, 20))
        img = RNG.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        got = media.feather_blend_mirror(img)
        for i in range(h):
            for j in range(w):
                a = (j * 1024) // (w - 1)
                for c in range(3):
                    want = (a * int(img[i, j, c])
                            + (1024 - a) * int(img[i, w - 1 - j, c])) // 1024
                    assert got[i, j, c] == want


def test_feather_blend_symmetric_image_fixed_point():
    # A horizontally symmetric image is a fixed point of the blend.
    half = RNG.integers(0, 256, size=(6, 5, 3)).astype(np.uint8)
    img = np.concatenate([half, half[:, ::-1]], axis=1)
    assert np.array_equal(media.feather_blend_mirror(img), img.astype(np.int64))


def test_radial_profile_random_parity():
    for _ in range(10):
        h, w = int(RNG.integers(2, 15)), int(RNG.integers(2, 15))
        luma = RNG.integers(0, 768, size=(h, w)).astype(np.int64)
        prof = media.radial_profile(luma)
        ci, cj = (h - 1) // 2, (w - 1) // 2
        want = {}
        for i in range(h):
            for j in range(w):
                r = max(abs(i - ci), abs(j - cj))
                n, s = want.get(r, (0, 0))
                want[r] = (n + 1, s + int(luma[i, j]))
        assert len(prof) == max(want) + 1
        for r, (n, s) in want.items():
            assert prof[r, 0] == n and prof[r, 1] == s
        assert prof[:, 0].sum() == h * w


def test_radial_profile_center_ring_single_pixel():
    luma = np.arange(35, dtype=np.int64).reshape(5, 7)
    prof = media.radial_profile(luma)
    assert prof[0, 0] == 1 and prof[0, 1] == luma[2, 3]


def _kuwahara_naive(v):
    v = v.astype(np.int64)
    h, w = v.shape
    out = np.empty((h - 4, w - 4), np.int64)
    for i in range(2, h - 2):
        for j in range(2, w - 2):
            quads = [v[i - 2:i + 1, j - 2:j + 1], v[i - 2:i + 1, j:j + 3],
                     v[i:i + 3, j - 2:j + 1], v[i:i + 3, j:j + 3]]
            best_m, best_s = None, 0
            for q in quads:
                s, s2 = int(q.sum()), int((q * q).sum())
                m = 9 * s2 - s * s
                if best_m is None or m < best_m:
                    best_m, best_s = m, s
            out[i - 2, j - 2] = best_s // 9
    return out


def test_kuwahara_random_parity():
    for _ in range(12):
        h, w = int(RNG.integers(5, 16)), int(RNG.integers(5, 16))
        ch = RNG.integers(0, 256, size=(h, w)).astype(np.uint8)
        got = media.kuwahara5(ch)
        assert got.shape == (h - 4, w - 4)
        assert np.array_equal(got, _kuwahara_naive(ch))


def test_kuwahara_preserves_step_edge():
    # A hard vertical step must survive exactly: each side's flat
    # quadrant has zero variance, so no pixel averages across the edge —
    # the property separating Kuwahara from every linear blur.
    ch = np.zeros((9, 12), np.uint8)
    ch[:, 6:] = 200
    out = media.kuwahara5(ch)
    assert set(np.unique(out)) == {0, 200}
    assert np.array_equal(out, ch[2:-2, 2:-2].astype(np.int64))


def _zs_naive(mask, step=1):
    h, w = mask.shape
    out = np.zeros((h, w), bool)
    for i in range(h):
        for j in range(w):
            if not mask[i, j]:
                continue

            def g(y, x):
                return bool(mask[y, x]) if 0 <= y < h and 0 <= x < w else False

            ring = [g(i - 1, j), g(i - 1, j + 1), g(i, j + 1),
                    g(i + 1, j + 1), g(i + 1, j), g(i + 1, j - 1),
                    g(i, j - 1), g(i - 1, j - 1)]
            b = sum(ring)
            a = sum((not ring[k]) and ring[(k + 1) % 8] for k in range(8))
            p2, p4, p6, p8 = ring[0], ring[2], ring[4], ring[6]
            if step == 1:
                cond = not (p2 and p4 and p6) and not (p4 and p6 and p8)
            else:
                cond = not (p2 and p4 and p8) and not (p2 and p6 and p8)
            out[i, j] = 2 <= b <= 6 and a == 1 and cond
    return out


def test_zhang_suen_step_random_parity():
    for step in (1, 2):
        for _ in range(10):
            h, w = int(RNG.integers(2, 12)), int(RNG.integers(2, 12))
            mask = RNG.random((h, w)) < 0.5
            got = media.zhang_suen_step(mask, step)
            assert np.array_equal(got, _zs_naive(mask, step))


def test_zhang_suen_full_iteration_thins_block_keeps_line():
    # A 6x6 solid block loses its border ring over a full iteration
    # (step1 deletes S/E-facing, step2 the N/W-facing); a 1-px line
    # (already a skeleton) survives both steps untouched.
    mask = np.zeros((10, 10), bool)
    mask[2:8, 2:8] = True
    d1 = media.zhang_suen_step(mask, 1)
    after1 = mask & ~d1
    d2 = media.zhang_suen_step(after1, 2)
    after2 = after1 & ~d2
    assert after2.sum() < mask.sum()
    assert after2[4:6, 4:6].all()  # the core remains
    line = np.zeros((8, 8), bool)
    line[4, 1:7] = True
    assert not media.zhang_suen_step(line, 1)[4, 2:6].any()


def _nms_naive(v, thresh=8):
    v = v.astype(np.int64)
    h, w = v.shape
    cnt = chk = 0

    def m(i, j):
        return (abs(int(v[i, j + 1]) - int(v[i, j - 1]))
                + abs(int(v[i + 1, j]) - int(v[i - 1, j])))

    for i in range(2, h - 2):
        for j in range(2, w - 2):
            dx = abs(int(v[i, j + 1]) - int(v[i, j - 1]))
            dy = abs(int(v[i + 1, j]) - int(v[i - 1, j]))
            c = dx + dy
            if c < thresh:
                continue
            if dx >= dy:
                ok = c > m(i, j - 1) and c > m(i, j + 1)
            else:
                ok = c > m(i - 1, j) and c > m(i + 1, j)
            if ok:
                cnt += 1
                chk += 31 * j + 17 * i
    return cnt, chk


def test_nms_edges_random_parity():
    for _ in range(12):
        h, w = int(RNG.integers(5, 16)), int(RNG.integers(5, 16))
        luma = RNG.integers(0, 768, size=(h, w)).astype(np.int64)
        assert media.nms_edges(luma) == _nms_naive(luma)


def test_nms_thins_wide_ramp_to_single_line():
    # A blurred step whose central-difference magnitude has a UNIQUE
    # peak column: NMS keeps exactly that 1-px line — the defining
    # thinning property (strict-both ties on hard steps are suppressed,
    # which is why the profile must be asymmetric).
    luma = np.zeros((9, 12), np.int64)
    luma[:, 4] = 40
    luma[:, 5] = 160
    luma[:, 6:] = 300
    n, chk = media.nms_edges(luma)
    assert n == 5  # rows 2..6 of the single surviving column j=5
    assert chk == 5 * 31 * 5 + 17 * sum(range(2, 7))


def test_colorfulness_pieces_gray_vs_vivid():
    # A pure gray image has zero opponent energy; a saturated red one
    # has large rg/yb moments — the metric's defining separation.
    gray = np.full((6, 6, 3), 128, np.uint8).astype(np.int64)
    rg = gray[:, :, 0] - gray[:, :, 1]
    yb = gray[:, :, 0] + gray[:, :, 1] - 2 * gray[:, :, 2]
    assert rg.sum() == 0 and (rg * rg).sum() == 0
    assert yb.sum() == 0 and (yb * yb).sum() == 0
    red = np.zeros((6, 6, 3), np.int64)
    red[:, :, 0] = 255
    rg2 = red[:, :, 0] - red[:, :, 1]
    yb2 = red[:, :, 0] + red[:, :, 1] - 2 * red[:, :, 2]
    assert (rg2 * rg2).sum() == 36 * 255 ** 2
    assert (yb2 * yb2).sum() == 36 * 255 ** 2


def test_product_sum_identity_for_separable_grids():
    # The oracle device: for v(i,j) = a(j) + b(i),
    # sum v^2 = h*sum a^2 + w*sum b^2 + 2*sum a*sum b.
    rng = np.random.default_rng(83)
    a = rng.integers(-50, 50, 7)
    b = rng.integers(-50, 50, 5)
    v = a[None, :] + b[:, None]
    assert (v * v).sum() == 5 * (a * a).sum() + 7 * (b * b).sum() \
        + 2 * a.sum() * b.sum()


def test_template_match_plants_exact_template():
    # Plant template k=2 at (y=3, x=5): SSD there is 0 and the match
    # reports exactly that (template, position).
    jj = np.arange(1, 9, dtype=np.int64)
    t = (jj * media.TM_ALPHA[2]) % 64 + ((jj * media.TM_BETA[2]) % 64)[:, None]
    luma = np.full((16, 20), 500, np.int64)
    luma[3:11, 5:13] = t
    k, y, x, ssd = media.template_match(luma)
    assert (k, y, x, ssd) == (2, 3, 5, 0)


def test_template_match_too_small_sentinel():
    assert media.template_match(np.zeros((5, 5), np.int64)) \
        == (-1, -1, -1, -1)


def test_template_match_tie_prefers_smaller_k():
    # A flat image: all positions give per-template constants; the min
    # must break ties by (ssd, k, y, x) — verify winner has the globally
    # minimal SSD and position (0, 0) for its template.
    luma = np.full((12, 12), 32, np.int64)
    k, y, x, ssd = media.template_match(luma)
    jj = np.arange(1, 9, dtype=np.int64)
    best = None
    for kk in range(4):
        t = (jj * media.TM_ALPHA[kk]) % 64 \
            + ((jj * media.TM_BETA[kk]) % 64)[:, None]
        cand = (int(((32 - t) ** 2).sum()), kk)
        best = cand if best is None or cand < best else best
    assert (ssd, k) == best and (y, x) == (0, 0)


def test_rlsa_fills_small_gaps_only():
    mask = np.zeros((2, 12), bool)
    mask[:, 0] = mask[:, 3] = mask[:, 9] = True  # gaps of 2 and 5
    sm = media.rlsa_horizontal(mask, gap=4)
    assert sm[0, 1] and sm[0, 2]          # 2-gap filled
    assert not sm[0, 4:9].any()           # 5-gap stays open
    # edge gaps (before the first one / after the last) never fill
    assert not sm[:, 10:].any()


def test_rlsa_row_independence():
    rng = np.random.default_rng(91)
    mask = rng.random((6, 20)) < 0.3
    sm = media.rlsa_horizontal(mask)
    for y in range(6):
        row = media.rlsa_horizontal(mask[y:y + 1])
        assert np.array_equal(sm[y], row[0])


def test_skew_detect_recovers_planted_shear():
    # Take axis-aligned text lines (vertical stripes), shear them by a
    # known s0 on the subpixel grid, and the detector must pick -s0
    # style compensation: i.e. the candidate matching the planted shear
    # maximizes the profile energy.
    h, w = 24, 40
    base = np.zeros((h, w), bool)
    base[:, ::4] = True  # crisp vertical lines
    for s0 in (-2, 0, 2):
        mask = np.zeros((h, w + 16), bool)
        for i in range(h):
            shift = (i * -s0) // 8 + 8  # plant the opposite shear
            cols = np.flatnonzero(base[i]) + shift
            mask[i, cols] = True
        best_s, _ = media.skew_profile_energy(mask)
        # the planted integer-pixel shear is s0/8 per row on the x8 grid;
        # the detector's best candidate compensates it exactly at s0=0
        # and picks the energy-max candidate otherwise
        energies = {}
        iy, ix = np.nonzero(mask)
        for s in (-2, -1, 0, 1, 2):
            cnt = np.bincount(ix * 8 + iy * s + 8 * h)
            energies[s] = int((cnt.astype(np.int64) ** 2).sum())
        assert energies[best_s] == max(energies.values())
        if s0 == 0:
            assert best_s == 0
