"""Kernel brute-force parity for the autocrop / downscale / RLE image ops
(stages/media.py): the registry oracles ride planted or separable fixtures,
so these tests drive the GENERAL 2-D kernels with unstructured random
images against naive reference implementations."""

import itertools

import numpy as np
import pytest

from gtfs_conflation_pipeline_ray.stages import media


RNG = np.random.default_rng(1234)


def _bbox_naive(img):
    bg = img[0, 0, :]
    best = None
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            if not np.array_equal(img[y, x], bg):
                if best is None:
                    best = [x, y, x, y]
                else:
                    best[0] = min(best[0], x)
                    best[1] = min(best[1], y)
                    best[2] = max(best[2], x)
                    best[3] = max(best[3], y)
    return tuple(best) if best else (-1, -1, -1, -1)


def test_content_bbox_random_parity():
    for _ in range(30):
        h, w = int(RNG.integers(2, 12)), int(RNG.integers(2, 12))
        img = RNG.integers(0, 3, size=(h, w, 3)).astype(np.uint8)
        assert media.content_bbox(img) == _bbox_naive(img)


def test_content_bbox_all_background():
    img = np.full((5, 7, 3), 9, dtype=np.uint8)
    assert media.content_bbox(img) == (-1, -1, -1, -1)


def test_content_bbox_single_pixel():
    img = np.zeros((4, 6, 3), dtype=np.uint8)
    img[2, 3, 1] = 1  # one channel differing is enough
    assert media.content_bbox(img) == (3, 2, 3, 2)


def test_box_downscale2_random_parity():
    for _ in range(20):
        h, w = int(RNG.integers(2, 15)), int(RNG.integers(2, 15))
        img = RNG.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        d = media.box_downscale2(img)
        assert d.shape == (h // 2, w // 2, 3)
        for r in range(h // 2):
            for j in range(w // 2):
                for c in range(3):
                    block = img[2 * r:2 * r + 2, 2 * j:2 * j + 2, c].astype(int)
                    assert d[r, j, c] == block.sum() // 4


def test_box_downscale2_odd_trailing_dropped():
    img = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    d = media.box_downscale2(img)
    assert d.shape == (2, 3, 3)


def _runs_naive(channel, axis):
    total = 0
    lines = channel if axis == 1 else channel.T
    for line in lines:
        total += len([k for k, _ in itertools.groupby(line.tolist())])
    return total


@pytest.mark.parametrize("axis", [0, 1])
def test_rle_runs_random_parity(axis):
    for _ in range(25):
        h, w = int(RNG.integers(1, 10)), int(RNG.integers(1, 10))
        ch = RNG.integers(0, 3, size=(h, w)).astype(np.uint8)
        assert media.rle_runs(ch, axis) == _runs_naive(ch, axis)


def test_rle_runs_constant_image():
    ch = np.full((4, 9), 7, dtype=np.uint8)
    assert media.rle_runs(ch, axis=1) == 4   # one token per row
    assert media.rle_runs(ch, axis=0) == 9   # one token per column
