"""Wave-6 kernels: image round-trip PSNR invariant + quadkey tile pyramid."""

import numpy as np
import pyarrow as pa

from gtfs_conflation_pipeline_ray.functions import codecs
from gtfs_conflation_pipeline_ray.functions.cells import quadkey
from gtfs_conflation_pipeline_ray.stages.media import ImageRoundtripChecker


def _rand_img(rng, w, h):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_roundtrip_checker_matches_direct_numpy():
    rng = np.random.default_rng(7)
    rows = []
    for i, fmt in enumerate(["bmp", "png", "jpeg", "jpeg", "png"]):
        img = _rand_img(rng, 16 + i, 12 + i)
        rows.append((i, codecs.encode(img, fmt), codecs.encode(img, "png"),
                     fmt, f"cap-{i}", img))
    batch = pa.table({
        "image_id": np.array([r[0] for r in rows], np.int64),
        "bytes": pa.array([r[1] for r in rows], type=pa.binary()),
        "ref_bytes": pa.array([r[2] for r in rows], type=pa.binary()),
        "fmt": pa.array([r[3] for r in rows], type=pa.string()),
        "caption": pa.array([r[4] for r in rows], type=pa.string()),
    })
    out = ImageRoundtripChecker(cap_col="caption")(batch).to_pydict()
    for k, (i, blob, _ref, fmt, _cap, img) in enumerate(rows):
        dec = codecs.decode(blob, fmt).astype(np.int64)
        d = dec - img.astype(np.int64)
        assert out["sse"][k] == int((d * d).sum())
        assert out["max_err"][k] == int(np.abs(d).max())
        # the integer 40dB predicate agrees with the float psnr() metric
        want_ok = codecs.psnr(img, dec.astype(np.uint8)) >= 40.0
        assert out["ok_40db"][k] == want_ok
        assert out["cap_ok"][k] is True
    # lossless formats are bit-exact
    assert out["sse"][0] == 0 and out["sse"][1] == 0
    # the stub lossy codec is genuinely lossy but above the bar
    assert out["sse"][2] > 0 and out["ok_40db"][2]


def test_roundtrip_checker_flags_caption_mutation_and_poison():
    img = _rand_img(np.random.default_rng(1), 8, 8)
    batch = pa.table({
        "image_id": np.array([3, 4], np.int64),
        "bytes": pa.array([codecs.encode(img, "png"), b"garbage"],
                          type=pa.binary()),
        "ref_bytes": pa.array([codecs.encode(img, "png")] * 2,
                              type=pa.binary()),
        "fmt": pa.array(["png", "png"], type=pa.string()),
        "caption": pa.array(["WRONG", "cap-4"], type=pa.string()),
    })
    out = ImageRoundtripChecker(cap_col="caption")(batch).to_pydict()
    assert out["cap_ok"] == [False, True]
    assert out["ok_40db"] == [True, False]  # poison row quarantined, not fatal


def test_quadkey_vs_bit_loop():
    rng = np.random.default_rng(11)
    cx = rng.integers(0, 64, size=200)
    cy = rng.integers(0, 64, size=200)
    got = quadkey(cx, cy, 6)
    for x, y, qk in zip(cx, cy, got):
        want = ""
        for level in range(1, 7):
            sh = 6 - level
            want += str(((int(x) >> sh) & 1) + 2 * (((int(y) >> sh) & 1)))
        assert qk == want, (x, y)


def test_quadkey_parent_is_prefix():
    rng = np.random.default_rng(13)
    cx = rng.integers(0, 1 << 8, size=100)
    cy = rng.integers(0, 1 << 8, size=100)
    child = quadkey(cx, cy, 8)
    parent = quadkey(cx >> 1, cy >> 1, 7)
    for c, p in zip(child, parent):
        assert c[:7] == p
