"""Real baseline JPEG codec (functions/jpeg.py, ITU-T T.81) — structure,
huffman tables, fixed-point transforms, round trips, and a checked-in
golden stream + pixel dump guarding cross-version drift."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gtfs_conflation_pipeline_ray.functions import codecs, jpeg

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth(h: int, w: int, seed: int = 0) -> np.ndarray:
    """Band-limited test image (JPEG-friendly, unlike white noise)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 90 * np.sin(xx / 9 + seed) * np.cos(yy / 7)
    g = 128 + 80 * np.cos(xx / 13 - seed) * np.sin(yy / 5 + 1)
    b = 128 + 70 * np.sin((xx + yy) / 11)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# table sanity: the Annex-K AC tables must cover exactly the baseline
# symbol alphabet and form a valid (non-overfull) prefix code
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits,vals", [
    (jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS),
    (jpeg.AC_CHROMA_BITS, jpeg.AC_CHROMA_VALS),
])
def test_ac_tables_cover_baseline_alphabet(bits, vals):
    want = {(r << 4) | s for r in range(16) for s in range(1, 11)}
    want |= {0x00, 0xF0}
    assert len(vals) == 162 and len(set(vals)) == 162
    assert set(vals) == want
    assert sum(bits) == 162
    assert sum(n * 2.0 ** -(i + 1) for i, n in enumerate(bits)) <= 1.0


@pytest.mark.parametrize("bits,vals", [
    (jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS),
    (jpeg.DC_CHROMA_BITS, jpeg.DC_CHROMA_VALS),
])
def test_dc_tables(bits, vals):
    assert vals == list(range(12))
    assert sum(bits) == 12
    assert sum(n * 2.0 ** -(i + 1) for i, n in enumerate(bits)) <= 1.0


def test_canonical_codes_prefix_free():
    codes = jpeg._canonical_codes(jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS)
    seen = set()
    for code, ln in codes.values():
        assert (code, ln) not in seen
        seen.add((code, ln))
        assert code < (1 << ln)
    # no code is a prefix of another
    as_bits = sorted(format(c, f"0{l}b") for c, l in codes.values())
    for a, b in zip(as_bits, as_bits[1:]):
        assert not b.startswith(a)


# ---------------------------------------------------------------------------
# fixed-point transforms
# ---------------------------------------------------------------------------

def test_dct_basis_row_sums_vanish():
    assert int(jpeg.A_FIX[0].sum()) == 11584
    assert (jpeg.A_FIX[1:].sum(axis=1) == 0).all()
    assert jpeg.DC_GAIN_FWD == 11584**2
    assert jpeg.DC_GAIN_INV == 1448**2


def test_fixed_point_dct_matches_float_reference():
    rng = np.random.default_rng(3)
    blocks = rng.integers(-128, 128, (32, 8, 8)).astype(np.int64)
    m = jpeg._dct_matrix()
    ref = np.einsum("ux,nxy,vy->nuv", m, blocks.astype(np.float64), m)
    got = jpeg.fdct_blocks(blocks)
    assert np.abs(got - np.round(ref)).max() <= 1

    coefs = rng.integers(-800, 800, (32, 8, 8)).astype(np.int64)
    ref_inv = np.einsum("ux,nuv,vy->nxy", m, coefs.astype(np.float64), m)
    ref_pix = np.clip(np.round(ref_inv) + 128, 0, 255)
    got_pix = jpeg.idct_blocks(coefs)
    assert np.abs(got_pix.astype(np.int64) - ref_pix).max() <= 1


def test_ycbcr_identity_on_grays():
    v = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img = np.repeat(v[:, :, None], 3, axis=2)
    ycc = jpeg.rgb_to_ycbcr(img)
    assert (ycc[..., 0] == v).all()
    assert (ycc[..., 1] == 128).all() and (ycc[..., 2] == 128).all()
    back = jpeg.ycbcr_to_rgb(ycc[..., 0], ycc[..., 1], ycc[..., 2])
    assert (back == img).all()


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ss", ["444", "420"])
@pytest.mark.parametrize("dims", [(40, 56), (45, 61), (8, 8), (17, 9)])
def test_roundtrip_smooth(ss, dims):
    img = _smooth(*dims, seed=dims[0])
    out = jpeg.decode(jpeg.encode(img, quality=92, subsampling=ss))
    assert out.shape == img.shape
    assert _psnr(out, img) >= (38 if ss == "444" else 32)


def test_roundtrip_grayscale():
    g = _smooth(33, 41)[:, :, 0]
    out = jpeg.decode(jpeg.encode(g, quality=92))
    assert out.shape == g.shape
    assert _psnr(out, g) >= 38


@pytest.mark.parametrize("ri", [1, 2, 7])
def test_restart_intervals(ri):
    img = _smooth(45, 61, seed=ri)
    base = jpeg.decode(jpeg.encode(img, quality=90, subsampling="420"))
    with_rst = jpeg.decode(
        jpeg.encode(img, quality=90, subsampling="420", restart_interval=ri))
    # restart markers change framing only, never pixels
    assert (base == with_rst).all()


def test_entropy_coding_lossless_at_coefficient_level():
    """decode(encode(x)) twice is byte-identical — huffman layer is exact."""
    img = _smooth(24, 40, seed=9)
    buf = jpeg.encode(img, quality=85, subsampling="420", restart_interval=3)
    a, b = jpeg.decode(buf), jpeg.decode(buf)
    assert (a == b).all()
    assert jpeg.encode(img, quality=85, subsampling="420",
                       restart_interval=3) == buf


def test_marker_skipping_and_stuffing():
    """APPn/COM segments are skipped; 0xFF-heavy content destuffs."""
    img = np.full((16, 16, 3), 255, np.uint8)  # drives 0xFF bytes into scan
    buf = jpeg.encode(img, quality=90)
    # splice an APP1 + COM segment after SOI
    extra = (b"\xff\xe1\x00\x08exif00" + b"\xff\xfe\x00\x0bcomment\x00\x01")
    spliced = buf[:2] + extra + buf[2:]
    out = jpeg.decode(spliced)
    assert (out == jpeg.decode(buf)).all()
    assert _psnr(out, img) >= 40


def test_dc_only_closed_form():
    """Constant blocks decode to the documented closed-form integers — the
    identity the image_jfif_* SQL oracles replay."""
    ql, _ = jpeg.quality_tables(90)
    q00 = int(ql[0])
    for c in (0, 5, 77, 128, 200, 255):
        img = np.full((16, 24), c, np.uint8)
        out = jpeg.decode(jpeg.encode(img, quality=90))
        f00 = ((c - 128) * jpeg.DC_GAIN_FWD + (1 << 23)) >> 24
        s = 1 if f00 >= 0 else -1
        dcq = s * ((2 * abs(f00) + q00) // (2 * q00))
        pix = min(255, max(0, ((dcq * q00 * jpeg.DC_GAIN_INV
                                + (1 << 23)) >> 24) + 128))
        assert (out == pix).all(), (c, int(out[0, 0]), pix)


def test_codecs_dispatch_jfif():
    img = _smooth(32, 32)
    buf = codecs.encode(img, "jfif")
    assert buf[:2] == b"\xff\xd8"
    out = codecs.decode(buf, "jfif")
    assert out.shape == img.shape
    # fmt='jpeg' rows holding REAL jfif bytes decode via the sniffer too
    out2 = codecs.decode(buf, "jpeg")
    assert (out == out2).all()
    # legacy QJPG payloads still decode under fmt='jpeg'
    q = codecs.decode(codecs.encode(img, "jpeg"), "jpeg")
    assert q.shape == img.shape
    # grayscale jfif comes back 3-channel through the codecs contract
    g3 = codecs.decode(jpeg.encode(img[:, :, 0], quality=90), "jfif")
    assert g3.shape == (32, 32, 3)


def test_non_baseline_rejected():
    img = _smooth(16, 16)
    buf = bytearray(jpeg.encode(img, quality=90))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg.decode(bytes(buf))


# ---------------------------------------------------------------------------
# golden: checked-in stream + known-good pixel dump
# ---------------------------------------------------------------------------

def test_golden_stream_decodes_to_checked_in_pixels():
    blob = open(os.path.join(GOLDEN, "jfif_golden.jpg"), "rb").read()
    want = np.load(os.path.join(GOLDEN, "jfif_golden_pixels.npy"))
    got = jpeg.decode(blob)
    assert got.shape == want.shape
    assert (got == want).all()


def test_golden_stream_regenerates_bit_exactly():
    """The encoder still produces the exact checked-in stream."""
    img = _smooth(41, 53, seed=4)
    blob = open(os.path.join(GOLDEN, "jfif_golden.jpg"), "rb").read()
    assert jpeg.encode(img, quality=88, subsampling="420",
                       restart_interval=4) == blob


def test_decode_422_stream():
    """The decoder accepts any sampling factors in {1,2}; the encoder only
    emits 4:4:4/4:2:0, so build a 4:2:2 (luma 2x1) DC-only stream by hand
    from the codec's own primitives and check the closed-form decode."""
    import struct

    ql, qc = jpeg.quality_tables(88)
    h, w = 8, 32  # 2 MCUs of 16x8
    out = bytearray(b"\xff\xd8")

    def marker(tag, payload):
        return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload

    out += marker(0xDB, b"\x00" + bytes(ql[jpeg.ZIGZAG].astype(np.uint8)))
    out += marker(0xDB, b"\x01" + bytes(qc[jpeg.ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += struct.pack(">BBB", 1, (2 << 4) | 1, 0)  # luma 2x1 -> 4:2:2
    sof += struct.pack(">BBB", 2, (1 << 4) | 1, 1)
    sof += struct.pack(">BBB", 3, (1 << 4) | 1, 1)
    out += marker(0xC0, sof)
    for cls, tid, bits, vals in [
        (0, 0, jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS),
        (1, 0, jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS),
        (0, 1, jpeg.DC_CHROMA_BITS, jpeg.DC_CHROMA_VALS),
        (1, 1, jpeg.AC_CHROMA_BITS, jpeg.AC_CHROMA_VALS),
    ]:
        out += marker(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                      + bytes(vals))
    out += marker(0xDA, b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11])
                  + b"\x00\x3f\x00")

    # DC-only blocks: luma values per 8x8 block, neutral chroma
    gray_vals = [40, 90, 160, 230]  # 4 luma blocks across 2 MCUs
    dc_l = [0, 0]  # quantized DC per component class: track per comp
    wr = jpeg._BitWriter()
    dcl = jpeg._canonical_codes(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    acl = jpeg._canonical_codes(jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS)
    dcc = jpeg._canonical_codes(jpeg.DC_CHROMA_BITS, jpeg.DC_CHROMA_VALS)
    acc = jpeg._canonical_codes(jpeg.AC_CHROMA_BITS, jpeg.AC_CHROMA_VALS)

    def put_dc_only(wr, dcq_diff, dc_codes, ac_codes):
        size = abs(dcq_diff).bit_length()
        code, ln = dc_codes[size]
        wr.put(code, ln)
        if size:
            wr.put(dcq_diff if dcq_diff >= 0 else dcq_diff + (1 << size) - 1,
                   size)
        code, ln = ac_codes[0x00]  # EOB
        wr.put(code, ln)

    def dcq_of(v, q00):
        f00 = ((v - 128) * jpeg.DC_GAIN_FWD + (1 << 23)) >> 24
        s = 1 if f00 >= 0 else -1
        return s * ((2 * abs(f00) + q00) // (2 * q00))

    preds = {"y": 0, "cb": 0, "cr": 0}
    bi = 0
    for mcu in range(2):
        for _ in range(2):  # two luma blocks per MCU (2x1)
            q = dcq_of(gray_vals[bi], int(ql[0]))
            put_dc_only(wr, q - preds["y"], dcl, acl)
            preds["y"] = q
            bi += 1
        for ch in ("cb", "cr"):
            q = dcq_of(128, int(qc[0]))
            put_dc_only(wr, q - preds[ch], dcc, acc)
            preds[ch] = q
    wr.align()
    out += wr.out + b"\xff\xd9"

    got = jpeg.decode(bytes(out))
    assert got.shape == (8, 32, 3)
    for bi, v in enumerate(gray_vals):
        q = dcq_of(v, int(ql[0]))
        pix = min(255, max(0, ((q * int(ql[0]) * jpeg.DC_GAIN_INV
                                + (1 << 23)) >> 24) + 128))
        block = got[:, bi * 8:(bi + 1) * 8, :]
        assert (block == pix).all(), (bi, v, pix, block[0, 0])
