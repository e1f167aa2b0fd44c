"""Gradient-orientation octant histogram and Bayer ordered dither kernels."""

import math

import numpy as np
import pyarrow as pa


def _octant_naive(dx, dy):
    """Spec: atan2 binning for interior angles; boundary angles (axes and
    diagonals) follow the documented tie rules of the comparison tree —
    E->0, N->1, W->3, S->6; diagonals to the axis-hugging bin of their
    quadrant: (+,+)->0, (-,+)->3, (-,-)->4, (+,-)->7."""
    if dx == 0 and dy == 0:
        return -1
    if dy == 0:
        return 0 if dx > 0 else 3
    if dx == 0:
        return 1 if dy > 0 else 6
    if abs(dx) == abs(dy):
        if dx > 0 and dy > 0:
            return 0
        if dx < 0 and dy > 0:
            return 3
        if dx < 0 and dy < 0:
            return 4
        return 7
    ang = math.atan2(dy, dx) % (2 * math.pi)
    return int(ang // (math.pi / 4)) % 8


def test_grad_octants_vs_atan2_naive():
    from gtfs_conflation_pipeline_ray.stages.media import grad_octant_hist

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(20, 30), dtype=np.int64)
    counts, flat = grad_octant_hist(img)
    want = np.zeros(8, np.int64)
    wflat = 0
    for y in range(1, 19):
        for x in range(1, 29):
            dx = int(img[y, x + 1]) - int(img[y, x - 1])
            dy = int(img[y + 1, x]) - int(img[y - 1, x])
            o = _octant_naive(dx, dy)
            if o < 0:
                wflat += 1
            else:
                want[o] += 1
    assert wflat == flat
    assert (counts == want).all()
    assert counts.sum() + flat == 18 * 28


def test_grad_octants_cardinal_directions():
    from gtfs_conflation_pipeline_ray.stages.media import grad_octant_hist

    # pure horizontal ramp: dx > 0, dy = 0 everywhere -> octant 0
    ramp = np.tile(np.arange(10, dtype=np.int64) * 3, (8, 1))
    counts, flat = grad_octant_hist(ramp)
    assert flat == 0 and counts[0] == 6 * 8 and counts[1:].sum() == 0
    # pure vertical ramp (increasing y): dy > 0, dx = 0 -> octant 1 region?
    vert = np.tile((np.arange(8, dtype=np.int64) * 3)[:, None], (1, 10))
    counts, flat = grad_octant_hist(vert)
    # dx=0, dy>0: tree: dy>=0, dx>=0, |dy|<=|dx| false -> octant 1 (north)
    assert flat == 0 and counts[1] == 6 * 8 and np.delete(counts, 1).sum() == 0
    # constant image -> all flat
    counts, flat = grad_octant_hist(np.full((6, 6), 9, np.int64))
    assert flat == 4 * 4 and counts.sum() == 0


def test_bayer_black_count_vs_naive():
    from gtfs_conflation_pipeline_ray.stages.media import (
        BAYER4, bayer_black_count)

    rng = np.random.default_rng(13)
    ch = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    got = bayer_black_count(ch)
    want = 0
    for y in range(17):
        for x in range(23):
            if (int(ch[y, x]) >> 4) <= BAYER4[y % 4, x % 4]:
                want += 1
    assert got == want
    # extremes: all-0 channel is black everywhere; all-255 only where
    # threshold is 15 (v>>4 == 15 <= t requires t == 15: one cell per tile)
    assert bayer_black_count(np.zeros((8, 8), np.uint8)) == 64
    assert bayer_black_count(np.full((8, 8), 255, np.uint8)) == 4


def test_image_stages_end_to_end(ray_session):
    """Both stages through encode->decode on random images, vs direct
    kernel calls on the same pixels (bmp = lossless path)."""
    import ray

    from gtfs_conflation_pipeline_ray.functions import codecs
    from gtfs_conflation_pipeline_ray.stages import media as mstage
    from gtfs_conflation_pipeline_ray.stages.media import (
        bayer_black_count, grad_octant_hist)

    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
            for _ in range(6)]
    tbl = pa.table({
        "image_id": pa.array(range(6), pa.int64()),
        "bytes": pa.array([codecs.encode(im, "bmp") for im in imgs],
                          pa.binary()),
        "fmt": pa.array(["bmp"] * 6),
    })
    ds = ray.data.from_arrow(tbl)
    go = mstage.image_grad_orientation(ds).to_pandas().set_index("image_id")
    bd = mstage.image_bayer_dither(ds).to_pandas().set_index("image_id")
    for i, im in enumerate(imgs):
        luma = im[:, :, 0].astype(np.int64) + im[:, :, 1] + im[:, :, 2]
        counts, flat = grad_octant_hist(luma)
        assert go.loc[i, "flat_n"] == flat
        assert [go.loc[i, f"oct{k}"] for k in range(8)] == list(counts)
        assert bd.loc[i, "black_r"] == bayer_black_count(im[:, :, 0])
        assert bd.loc[i, "black_g"] == bayer_black_count(im[:, :, 1])
        assert bd.loc[i, "black_b"] == bayer_black_count(im[:, :, 2])


def _seam_brute(luma):
    import numpy as np
    v = luma.astype(np.int64)
    a = np.abs(v[1:-1, 2:] - v[1:-1, :-2])
    b = np.abs(v[2:, 1:-1] - v[:-2, 1:-1])
    e = a + b
    hi, wi = e.shape
    # enumerate all seams by DP over explicit python loops
    m = [int(x) for x in e[0]]
    for i in range(1, hi):
        nm = []
        for j in range(wi):
            best = m[j]
            if j > 0:
                best = min(best, m[j - 1])
            if j < wi - 1:
                best = min(best, m[j + 1])
            nm.append(int(e[i, j]) + best)
        m = nm
    cost = min(m)
    return cost, m.index(cost), int(e.sum())


def test_seam_carve_vs_brute():
    from gtfs_conflation_pipeline_ray.stages.media import seam_carve_cost

    rng = np.random.default_rng(31)
    for _ in range(5):
        h = int(rng.integers(8, 20))
        w = int(rng.integers(8, 30))
        luma = rng.integers(0, 600, size=(h, w)).astype(np.int64)
        assert seam_carve_cost(luma) == _seam_brute(luma)


def test_seam_carve_planted_cheap_column():
    """A zero-energy vertical stripe must be the seam, cost 0, at its
    column."""
    luma = np.full((10, 12), 50, np.int64)
    luma[:, :4] = np.arange(4)[None, :] * 40 + 100  # busy left block
    # columns 4.. are constant 50 -> dx=0 there; dy=0 everywhere
    from gtfs_conflation_pipeline_ray.stages.media import seam_carve_cost
    c, e, t = seam_carve_cost(luma)
    assert c == 0
    # first zero-cost seam end = smallest interior column with 0 path
    assert e >= 3  # interior col index where the flat region starts
    assert t > 0
