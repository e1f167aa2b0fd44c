"""Kernel pins for the distributed Gram matrix, histogram equalization, and
the cross-modal caption check."""

import numpy as np
import pyarrow as pa

from gtfs_conflation_pipeline_ray.stages.media import equalize_checksum


def equalize_brute(ch: np.ndarray) -> tuple[int, int]:
    v = ch.reshape(-1).astype(int)
    n = len(v)
    cmin = int((v == v.min()).sum())
    if n == cmin:
        return 0, 1
    new = [( int((v <= x).sum()) - cmin) * 255 // (n - cmin) for x in v]
    return sum(new), len(set(new))


def test_equalize_matches_bruteforce_random():
    rng = np.random.default_rng(13)
    for _ in range(12):
        h, w = rng.integers(1, 8, size=2)
        ch = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        assert equalize_checksum(ch) == equalize_brute(ch)


def test_equalize_constant_and_two_level():
    assert equalize_checksum(np.full((3, 3), 9, dtype=np.uint8)) == (0, 1)
    # half 0s half 255s: lows map to 0, highs to 255 -> full-contrast output
    ch = np.array([[0, 0, 255, 255]], dtype=np.uint8)
    s, d = equalize_checksum(ch)
    assert (s, d) == (510, 2)


def test_equalize_ramp_spans_full_range():
    ch = np.arange(16, dtype=np.uint8).reshape(2, 8)
    s, d = equalize_checksum(ch)
    assert d == 16  # a strictly increasing ramp keeps all levels distinct
    # max pixel maps to exactly 255
    assert s == sum((k + 1 - 1) * 255 // 15 for k in range(16))


def test_gram_matrix_matches_numpy(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.ann import (
        gram_matrix,
        quantize_fixed,
    )

    rng = np.random.default_rng(3)
    n, dim = 50, 8
    x = rng.normal(size=(n, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
    })
    out = gram_matrix(ray.data.from_arrow(tbl), dim=dim).to_pandas()
    got = np.zeros((dim, dim), dtype=np.int64)
    got[out["i"].to_numpy(np.int64), out["j"].to_numpy(np.int64)] = (
        out["gram"].to_numpy(np.int64))
    q = quantize_fixed(x.astype(np.float64))
    assert (got == q.T @ q).all()


def test_caption_check_flags_mismatch(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.functions import codecs
    from gtfs_conflation_pipeline_ray.stages.media import image_caption_check

    img = np.zeros((6, 10, 3), dtype=np.uint8)
    blob = codecs.encode(img, "png")
    tbl = pa.table({
        "image_id": pa.array([1, 2, 3], type=pa.int64()),
        "bytes": pa.array([blob] * 3, type=pa.binary()),
        "fmt": pa.array(["png"] * 3, type=pa.string()),
        "caption": pa.array(["a 10x6 photo", "a 11x6 photo", "no claim"],
                            type=pa.string()),
    })
    out = (image_caption_check(ray.data.from_arrow(tbl), batch_size=8)
           .to_pandas().sort_values("image_id"))
    assert out["consistent"].tolist() == [1, 0, 0]
    assert out["w_caption"].tolist() == [10, 11, -1]
    assert out["w_true"].tolist() == [10, 10, 10]
