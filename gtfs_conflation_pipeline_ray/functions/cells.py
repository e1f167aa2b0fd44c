"""Spatial cell encoding: Morton (z-order) interleave/de-interleave and grid
cell ids.

The reference derives a z-order "geo-proximity key" by interleaving the digit
bits of (lon, lat) into a base-36 string
(``/root/reference/src/utils/getGeoProximityKey.js:8-46``) and sorts every
stage's scan by it so consecutive rows are spatially coherent. Here the same
idea is a vectorized uint64 Morton code; the engine's input table carries
``phash:int64`` whose bits are exactly the Morton interleave of the image's
(x, y) tile-grid coordinate, so ``morton_decode(phash) == (x, y)``.

All functions are numpy-vectorized over whole Arrow columns (zero Python
per-row work) — these run inside ``map_batches`` on the hot path.
"""

from __future__ import annotations

import numpy as np

_U = np.uint64

# Magic-number bit spreading constants (public-domain "Interleave bits by
# Binary Magic Numbers" technique, Stanford bit-twiddling hacks).
_M1 = _U(0x5555555555555555)
_M2 = _U(0x3333333333333333)
_M4 = _U(0x0F0F0F0F0F0F0F0F)
_M8 = _U(0x00FF00FF00FF00FF)
_M16 = _U(0x0000FFFF0000FFFF)
_M32 = _U(0x00000000FFFFFFFF)


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 into the even bit positions."""
    x = x.astype(np.uint64) & _M32
    x = (x | (x << _U(16))) & _M16
    x = (x | (x << _U(8))) & _M8
    x = (x | (x << _U(4))) & _M4
    x = (x | (x << _U(2))) & _M2
    x = (x | (x << _U(1))) & _M1
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_part1by1`: gather even bit positions into low 32."""
    x = x.astype(np.uint64) & _M1
    x = (x | (x >> _U(1))) & _M2
    x = (x | (x >> _U(2))) & _M4
    x = (x | (x >> _U(4))) & _M8
    x = (x | (x >> _U(8))) & _M16
    x = (x | (x >> _U(16))) & _M32
    return x


def morton_encode(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave two uint32 coordinate arrays into one uint64 Morton code.

    Bit layout: x occupies even bits, y odd bits (matches the reference's
    lon-first interleave order in ``getGeoProximityKey.js:8-26``).
    """
    return _part1by1(np.asarray(x)) | (_part1by1(np.asarray(y)) << _U(1))


def morton_decode(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`morton_encode`. Accepts int64 (e.g. the ``phash``
    column) or uint64; returns (x, y) as uint32 arrays."""
    c = np.asarray(code).astype(np.uint64)
    x = _compact1by1(c)
    y = _compact1by1(c >> _U(1))
    return x.astype(np.uint32), y.astype(np.uint32)


def morton_cell(x: np.ndarray, y: np.ndarray, cell_bits: int) -> np.ndarray:
    """Morton code of the cell containing (x, y) at resolution
    ``cell_bits`` (cell side = 2**cell_bits world units). Truncating the low
    2*cell_bits bits of the full Morton code gives the same prefix ordering
    the reference gets from its base-36 key prefix."""
    sh = _U(cell_bits)
    return morton_encode(
        np.asarray(x).astype(np.uint64) >> sh,
        np.asarray(y).astype(np.uint64) >> sh,
    )


def grid_cell(x: np.ndarray, y: np.ndarray, cell_size: int, grid_w: int) -> np.ndarray:
    """Row-major grid cell id ``(y // cell_size) * grid_w + (x // cell_size)``.

    Simpler than Morton and exactly expressible in ANSI SQL — used by the
    driver-checked queries so the DuckDB oracle can reproduce it with integer
    arithmetic; the engine-native pipeline uses :func:`morton_cell`.
    """
    x = np.asarray(x).astype(np.int64)
    y = np.asarray(y).astype(np.int64)
    return (y // cell_size) * np.int64(grid_w) + (x // cell_size)


def hilbert_d(x: np.ndarray, y: np.ndarray, order: int = 16) -> np.ndarray:
    """Hilbert-curve distance of integer grid points — the locality key the
    engine offers next to :func:`morton_encode` for data layout (Hilbert
    preserves locality strictly better than z-order: every step along the
    curve is a unit grid step, where Morton jumps across cell boundaries).

    Standard xy→d bit transform (the public-domain iterative form, e.g.
    Wikipedia "Hilbert curve" / Hacker's Delight): per level, extract the
    quadrant bits (rx, ry), add ``s² · (3·rx XOR ry)``, and rotate/reflect
    the lower bits. Vectorized over whole columns: the loop is over the
    ``order`` LEVELS (16), never over rows. int64 throughout so the DuckDB
    recursive-CTE mirror (same CASE arms, same xor) is bit-exact.
    """
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros(len(x), dtype=np.int64)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate: when ry == 0, (optionally reflect, then) swap x and y
        flip = (ry == 0) & (rx == 1)
        x[flip] = s - 1 - x[flip]
        y[flip] = s - 1 - y[flip]
        swap = ry == 0
        xt = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = xt
        s >>= 1
    return d


def hilbert_xy(d: np.ndarray, order: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`hilbert_d` (d→xy), used by tests to prove the
    transform is a bijection with unit-step adjacency."""
    d = np.asarray(d, dtype=np.int64)
    x = np.zeros(len(d), dtype=np.int64)
    y = np.zeros(len(d), dtype=np.int64)
    t = d.copy()
    s = np.int64(1)
    top = np.int64(1) << order
    while s < top:
        rx = (t // 2) & 1
        ry = (t ^ rx) & 1
        flip = (ry == 0) & (rx == 1)
        x[flip] = s - 1 - x[flip]
        y[flip] = s - 1 - y[flip]
        swap = ry == 0
        xt = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = xt
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def quadkey(cx: np.ndarray, cy: np.ndarray, zoom: int) -> np.ndarray:
    """Bing-maps quadkey strings of integer tile coordinates at ``zoom``
    levels: digit l (1-based, coarsest first) = x-bit + 2*y-bit at position
    ``zoom - l`` — the base-4 sibling of the reference's base-36 z-order
    geo-proximity key (``getGeoProximityKey.js:8-46``), with the property
    that makes tile pyramids trivial: the quadkey of the parent tile at
    zoom z-1 is the length-(z-1) PREFIX of the child's key.

    Fully vectorized: an (n, zoom) uint8 digit matrix is reinterpreted as
    fixed-width bytes, no Python per-row work. Returns numpy unicode array.
    """
    cx = np.asarray(cx).astype(np.int64)
    cy = np.asarray(cy).astype(np.int64)
    n = cx.shape[0]
    digits = np.empty((n, zoom), dtype=np.uint8)
    for level in range(1, zoom + 1):
        sh = zoom - level
        digits[:, level - 1] = (((cx >> sh) & 1) + 2 * ((cy >> sh) & 1) + 48)
    if n == 0:
        return np.empty(0, dtype=f"U{zoom}")
    return np.ascontiguousarray(digits).view(f"S{zoom}").ravel().astype(f"U{zoom}")


_GEOHASH32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype=np.uint8)


def geohash_cell(x: np.ndarray, y: np.ndarray, precision: int = 4,
                 world_bits: int = 16) -> np.ndarray:
    """Geohash-style base32 cell strings over the integer world grid — the
    string-keyed member of the locality-key family (Morton int64 codes,
    Hilbert distances, quadkey base-4 strings): 5·precision bits total,
    split evenly between x (longitude role, the MSB of the stream per the
    public geohash spec) and y, bit-interleaved MSB-first and emitted as
    base32 characters ("0123456789bcdefghjkmnpqrstuvwxyz").

    ``precision`` must be even so both axes carry 5·precision/2 bits (the
    odd-precision lon/lat asymmetry buys nothing on a square integer world).
    Fully vectorized: one Morton spread + an (n, precision) uint8 char
    matrix viewed as fixed-width bytes. Returns a numpy unicode array.
    """
    if precision % 2:
        raise ValueError("precision must be even on the square integer world")
    half_bits = 5 * precision // 2
    sh = _U(world_bits - half_bits)
    xq = np.asarray(x).astype(np.uint64) >> sh
    yq = np.asarray(y).astype(np.uint64) >> sh
    # x in ODD bit positions (MSB of the interleaved stream), y in even
    code = _part1by1(yq) | (_part1by1(xq) << _U(1))
    n = code.shape[0]
    chars = np.empty((n, precision), dtype=np.uint8)
    for j in range(precision):
        chars[:, j] = _GEOHASH32[
            ((code >> _U(5 * (precision - 1 - j))) & _U(31)).astype(np.int64)
        ]
    if n == 0:
        return np.empty(0, dtype=f"U{precision}")
    return np.ascontiguousarray(chars).view(f"S{precision}").ravel().astype(f"U{precision}")
