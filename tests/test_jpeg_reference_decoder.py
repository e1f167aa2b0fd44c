"""Cross-check functions/jpeg.py against an INDEPENDENT, deliberately naive
baseline-JPEG decoder written directly from ITU-T T.81's flowcharts: its own
marker walk, its own bit reader (per-bit, no LUT), per-length canonical
huffman decode (F.2.2.3), scalar EXTEND, and a direct float cosine-sum IDCT.
Self-roundtrip tests cannot catch matched encoder/decoder defects (e.g. a
code assigned to the wrong symbol on both sides); an independent decode of
the same stream can."""

from __future__ import annotations

import numpy as np

from gtfs_conflation_pipeline_ray.functions import jpeg

ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _SlowBits:
    def __init__(self, data: bytes, pos: int):
        self.d, self.i, self.bit = data, pos, 0
        self.hit_marker = None

    def _byte(self) -> int:
        if self.hit_marker is not None:
            return 0xFF  # pad
        b = self.d[self.i]
        if b == 0xFF:
            nxt = self.d[self.i + 1]
            if nxt == 0x00:
                return 0xFF
            self.hit_marker = nxt
            return 0xFF  # pad
        return b

    def next_bit(self) -> int:
        b = self._byte()
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            if self.hit_marker is None:
                self.i += 1 + (1 if self.d[self.i] == 0xFF else 0)
        return v

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.next_bit()
        return v

    def restart(self) -> None:
        # byte-align, expect RSTn
        if self.bit:
            self.bit = 0
            if self.hit_marker is None:
                self.i += 1 + (1 if self.d[self.i] == 0xFF else 0)
        if self.hit_marker is None:
            assert self.d[self.i] == 0xFF
            self.hit_marker = self.d[self.i + 1]
            self.i += 2
        assert 0xD0 <= self.hit_marker <= 0xD7
        self.hit_marker = None


def _slow_huff(bits, table):
    """F.2.2.3 DECODE: walk code lengths 1..16."""
    mincode, maxcode, valptr = table
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | bits.next_bit()
        if maxcode[ln] >= 0 and code <= maxcode[ln]:
            return valptr[ln][code - mincode[ln]]
    raise AssertionError("bad code")


def _mk_table(counts, vals):
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr: dict = {}
    code, k = 0, 0
    for ln in range(1, 17):
        if counts[ln - 1]:
            mincode[ln] = code
            valptr[ln] = vals[k:k + counts[ln - 1]]
            code += counts[ln - 1]
            k += counts[ln - 1]
            maxcode[ln] = code - 1
        code <<= 1
    return mincode, maxcode, valptr


def _extend(v, s):
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def slow_decode(buf: bytes) -> np.ndarray:
    assert buf[:2] == b"\xff\xd8"
    i = 2
    qt, huff, ri, frame = {}, {}, 0, None
    while True:
        assert buf[i] == 0xFF
        tag = buf[i + 1]
        if tag == 0xD9:
            break
        ln = (buf[i + 2] << 8) | buf[i + 3]
        seg = buf[i + 4: i + 2 + ln]
        if tag == 0xDB:
            p = 0
            while p < len(seg):
                tid = seg[p] & 15
                raster = [0] * 64
                for z in range(64):
                    raster[ZZ[z]] = seg[p + 1 + z]
                qt[tid] = raster
                p += 65
        elif tag == 0xC4:
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1: p + 17])
                n = sum(counts)
                huff[(cls, tid)] = _mk_table(counts,
                                            list(seg[p + 17: p + 17 + n]))
                p += 17 + n
        elif tag == 0xC0:
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            comps = []
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * c: 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif tag == 0xDD:
            ri = (seg[0] << 8) | seg[1]
        elif tag == 0xDA:
            ns = seg[0]
            st = {seg[1 + 2 * k]: (seg[2 + 2 * k] >> 4, seg[2 + 2 * k] & 15)
                  for k in range(ns)}
            return _slow_scan(buf, i + 2 + ln, frame, st, qt, huff, ri)
        i += 2 + ln
    raise AssertionError("no scan")


def _slow_scan(buf, pos, frame, st, qt, huff, ri):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mx = -(-fw // (8 * hmax))
    my = -(-fh // (8 * vmax))
    planes = {}
    for cid, hs, vs, tq in comps:
        planes[cid] = np.zeros((my * vs * 8, mx * hs * 8), dtype=np.int64)
    bits = _SlowBits(buf, pos)
    preds = {cid: 0 for cid, *_ in comps}
    # direct float IDCT basis (independent of the fixed-point one)
    def idct_block(coef):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                acc = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        acc += (cu * cv / 4.0 * coef[u][v]
                                * np.cos((2 * x + 1) * u * np.pi / 16)
                                * np.cos((2 * y + 1) * v * np.pi / 16))
                out[x, y] = acc
        return np.clip(np.round(out) + 128, 0, 255)

    for m in range(mx * my):
        if ri and m and m % ri == 0:
            bits.restart()
            preds = {cid: 0 for cid, *_ in comps}
        gy, gx = divmod(m, mx)
        for cid, hs, vs, tq in comps:
            dct, act = st[cid]
            for by in range(vs):
                for bx in range(hs):
                    coef = [[0] * 8 for _ in range(8)]
                    s = _slow_huff(bits, huff[(0, dct)])
                    preds[cid] += _extend(bits.receive(s), s)
                    zz = [0] * 64
                    zz[0] = preds[cid]
                    k = 1
                    while k < 64:
                        sym = _slow_huff(bits, huff[(1, act)])
                        if sym == 0:
                            break
                        run, size = sym >> 4, sym & 15
                        if size == 0:
                            assert run == 15
                            k += 16
                            continue
                        k += run
                        zz[k] = _extend(bits.receive(size), size)
                        k += 1
                    for z in range(64):
                        coef[ZZ[z] // 8][ZZ[z] % 8] = zz[z] * qt[tq][ZZ[z]]
                    blk = idct_block(coef)
                    y0 = (gy * vs + by) * 8
                    x0 = (gx * hs + bx) * 8
                    planes[cid][y0:y0 + 8, x0:x0 + 8] = blk

    out_planes = []
    for cid, hs, vs, tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:fh, :fw])
    if len(out_planes) == 1:
        return out_planes[0].astype(np.uint8)
    y, cb, cr = out_planes
    return jpeg.ycbcr_to_rgb(y.astype(np.uint8), cb.astype(np.uint8),
                             cr.astype(np.uint8))


def _smooth(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 90 * np.sin(xx / 9 + seed) * np.cos(yy / 7)
    g = 128 + 80 * np.cos(xx / 13 - seed) * np.sin(yy / 5 + 1)
    b = 128 + 70 * np.sin((xx + yy) / 11)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def test_product_decoder_matches_independent_reference():
    """Every stream the encoder can produce decodes identically (±1 per
    sample for the IDCT approximation bound) under the independent naive
    decoder — huffman tables, DC prediction, run lengths, restart framing
    and dequantization are all cross-checked."""
    cases = [
        (jpeg.encode(_smooth(24, 33, 1), 85, "444"), "444"),
        (jpeg.encode(_smooth(19, 18, 2), 90, "420", restart_interval=2),
         "420+rst"),
        (jpeg.encode(_smooth(16, 16, 3)[:, :, 0], 88), "gray"),
    ]
    for buf, label in cases:
        fast = jpeg.decode(buf)
        slow = slow_decode(buf)
        if fast.ndim == 3 and slow.ndim == 2:
            slow = np.repeat(slow[:, :, None], 3, axis=2)
        assert fast.shape == slow.shape, label
        # luma path: the two IDCTs round independently -> ±1 per sample;
        # chroma upsample + colour transform can stretch a ±1 luma/chroma
        # difference by the fixed-point gains (<= 2)
        assert np.abs(fast.astype(int) - slow.astype(int)).max() <= 3, label


def test_dc_only_exact_under_reference_decoder():
    """Block-constant streams (the oracle fixtures) must agree EXACTLY —
    both IDCTs are exact on DC-only blocks up to the same rounding."""
    img = np.full((16, 24), 77, np.uint8)
    buf = jpeg.encode(img, quality=88)
    assert (jpeg.decode(buf) == slow_decode(buf)).all()
