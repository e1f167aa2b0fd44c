"""Single-process pure-Python oracle for the image conflation pipeline —
independent implementations (bit loops, brute-force scans) of every kernel,
per SURVEY.md §5's conformance plan."""

from __future__ import annotations

import numpy as np


def morton_decode_one(code: int) -> tuple[int, int]:
    """Bit-by-bit de-interleave (independent of the magic-number kernel)."""
    code &= (1 << 64) - 1
    x = y = 0
    for i in range(32):
        x |= ((code >> (2 * i)) & 1) << i
        y |= ((code >> (2 * i + 1)) & 1) << i
    return x, y


def morton_encode_one(x: int, y: int) -> int:
    out = 0
    for i in range(32):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def cell_of(x: int, y: int, cell_bits: int) -> int:
    return morton_encode_one(x >> cell_bits, y >> cell_bits)


def brute_force_matches(images, tiles, cell_bits: int):
    """All (image, tile) containment pairs + best flags, by double loop.

    images: iterable of dicts with image_id, phash; tiles: dicts with
    tile_id, ref_id, cx, cy, hw, hh. Returns list of dicts sorted by
    (image_id, tile_id).
    """
    out = []
    for im in images:
        x, y = morton_decode_one(int(im["phash"]))
        cands = []
        for t in tiles:
            if (
                t["cx"] - t["hw"] <= x <= t["cx"] + t["hw"]
                and t["cy"] - t["hh"] <= y <= t["cy"] + t["hh"]
            ):
                d2 = (x - t["cx"]) ** 2 + (y - t["cy"]) ** 2
                cands.append((d2, t["tile_id"], t["ref_id"]))
        if not cands:
            continue
        best = min(cands)  # (d2, tile_id) lexicographic = the engine's rule
        for d2, tid, rid in sorted(cands, key=lambda c: c[1]):
            out.append(
                {
                    "image_id": im["image_id"],
                    "cell_id": cell_of(x, y, cell_bits),
                    "tile_id": tid,
                    "ref_id": rid,
                    "dist2": d2,
                    "is_best": (d2, tid) == (best[0], best[1]),
                }
            )
    out.sort(key=lambda r: (r["image_id"], r["tile_id"]))
    return out
