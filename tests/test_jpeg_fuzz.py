"""Property-based tests for the baseline JPEG codec: round-trip holds for
arbitrary images/settings, and the decoder FAILS CLEANLY (ValueError /
IndexError — never a hang or wrong-shape success) on corrupted streams,
which is what the image stages' poison-row quarantine relies on."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from gtfs_conflation_pipeline_ray.functions import jpeg


@st.composite
def _images(draw):
    h = draw(st.integers(1, 40))
    w = draw(st.integers(1, 40))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    kind = draw(st.sampled_from(["noise", "flat", "gradient"]))
    if kind == "noise":
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    elif kind == "flat":
        img = np.full((h, w, 3), int(rng.integers(0, 256)), np.uint8)
    else:
        img = np.tile(np.linspace(0, 255, w, dtype=np.uint8), (h, 1))
        img = np.repeat(img[:, :, None], 3, axis=2)
    return img


@settings(max_examples=40, deadline=None)
@given(img=_images(),
       quality=st.integers(1, 100),
       ss=st.sampled_from(["444", "420"]),
       ri=st.sampled_from([0, 1, 3]))
def test_roundtrip_never_fails_and_preserves_shape(img, quality, ss, ri):
    buf = jpeg.encode(img, quality=quality, subsampling=ss,
                      restart_interval=ri)
    out = jpeg.decode(buf)
    assert out.shape == img.shape
    assert out.dtype == np.uint8
    # decode is deterministic
    assert (jpeg.decode(buf) == out).all()


@settings(max_examples=40, deadline=None)
@given(img=_images(), quality=st.integers(50, 100))
def test_grayscale_roundtrip(img, quality):
    g = img[:, :, 0]
    out = jpeg.decode(jpeg.encode(g, quality=quality))
    assert out.shape == g.shape


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31 - 1),
       cut=st.floats(0.05, 0.95),
       mode=st.sampled_from(["truncate", "flip", "zero_run"]))
def test_corrupt_streams_fail_cleanly_or_decode(seed, cut, mode):
    """Corruption must either still decode to SOME correctly-shaped image
    (bit flips in coefficient data often just change pixels) or raise a
    clean exception — never hang, never return a malformed array."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    buf = bytearray(jpeg.encode(img, quality=85, subsampling="420"))
    pos = max(2, int(len(buf) * cut))
    if mode == "truncate":
        buf = buf[:pos]
    elif mode == "flip":
        buf[pos] ^= 0x55
    else:
        buf[pos:pos + 8] = b"\x00" * min(8, len(buf) - pos)
    try:
        out = jpeg.decode(bytes(buf))
    except (ValueError, IndexError, struct.error):
        return
    assert isinstance(out, np.ndarray)
    assert out.dtype == np.uint8
    assert out.ndim in (2, 3)
