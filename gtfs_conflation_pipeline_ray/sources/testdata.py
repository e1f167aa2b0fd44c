"""Deterministic spatial derivations over the driver's TPC-H-ish testdata.

The engine's native input is an image+caption table with phash-derived spatial
keys (see ``sources/fixtures.py``). For the driver's correctness gate the same
spatial operators must run over ``/root/testdata/sf*/`` parquet and be checked
against DuckDB, so this module derives integer (x, y) coordinates and tile
rectangles from the TPC-H columns with pure int64 modular arithmetic — the
exact same expressions are emitted as SQL fragments below, so the numpy path
and the DuckDB oracle cannot drift.

World model (mirrors the reference's lon/lat plane + geopoly tiles,
``/root/reference/src/daos/ConflationMapDAO/createTableFns.js:18-21``):
  - integer world grid [0, 65536) x [0, 65536)
  - "points"  <- lineitem rows (one probe point per line item)
  - "cpoints" <- customer rows (kNN probes)
  - "tiles"   <- part rows (axis-aligned rectangles = the reference's
                 buffered-segment geopoly polygons, simplified to rects so the
                 oracle is exact integer SQL)

All multiplications stay far below 2**63 so numpy int64 and DuckDB BIGINT
agree exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

WORLD = 65536  # 2**16 integer world grid per axis

# --- lineitem -> probe points -------------------------------------------------
# point_id must be UNIQUE per row: the synthetic lineitem can repeat
# (l_orderkey, l_linenumber[, l_partkey, l_suppkey]) tuples, so the id mixes
# in partkey/suppkey/quantity (verified collision-free at sf 0.001/0.01/0.1).
POINTS_SQL = """
SELECT (l_orderkey * 10 + l_linenumber) * 2000003
         + l_partkey * 101 + l_suppkey * 13
         + CAST(FLOOR(l_quantity) AS BIGINT)              AS point_id,
       (l_orderkey * 48271 + l_linenumber * 12347) % 65536 AS px,
       (l_partkey * 69621 + l_suppkey * 30269) % 65536     AS py,
       l_suppkey, l_partkey, l_quantity
FROM lineitem
"""


def points_batch(t: pa.Table) -> pa.Table:
    """Vectorized probe-point derivation from a lineitem Arrow batch."""
    ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ln = t["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
    pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    qty = t["l_quantity"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "point_id": (ok * 10 + ln) * 2000003 + pk * 101 + sk * 13
            + np.floor(qty).astype(np.int64),
            "px": (ok * 48271 + ln * 12347) % WORLD,
            "py": (pk * 69621 + sk * 30269) % WORLD,
            "l_suppkey": sk,
            "l_partkey": pk,
            "l_quantity": t["l_quantity"],
        }
    )


# --- customer -> kNN probe points --------------------------------------------
CPOINTS_SQL = """
SELECT c_custkey,
       (c_custkey * 48271 + 11) % 65536 AS cx,
       (c_custkey * 69621 + 77) % 65536 AS cy
FROM customer
"""


def cpoints_batch(t: pa.Table) -> pa.Table:
    ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "c_custkey": ck,
            "cx": (ck * 48271 + 11) % WORLD,
            "cy": (ck * 69621 + 77) % WORLD,
        }
    )


# --- part -> reference tiles (axis-aligned rectangles) ------------------------
# cx/cy = tile centroid; half-widths vary per tile to exercise uneven tile
# sizes; ref_id plays the role of the reference's `shst_reference` join key.
TILES_SQL = """
SELECT p_partkey                                        AS tile_id,
       'T' || CAST(p_partkey AS VARCHAR)                AS ref_id,
       p_size % 8                                       AS level,
       (p_partkey * 40503 + p_size * 257) % 65536       AS cx,
       (p_partkey * 9973 + p_size * 101) % 65536        AS cy,
       40 + (p_partkey % 31) * 97                       AS hw,
       40 + (p_partkey % 23) * 131                      AS hh
FROM part
"""


def tiles_batch(t: pa.Table) -> pa.Table:
    pk = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sz = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "tile_id": pk,
            "ref_id": np.char.add("T", pk.astype(str)),
            "level": sz % 8,
            "cx": (pk * 40503 + sz * 257) % WORLD,
            "cy": (pk * 9973 + sz * 101) % WORLD,
            "hw": 40 + (pk % 31) * 97,
            "hh": 40 + (pk % 23) * 131,
        }
    )


def tiles_table(sf_dir: str) -> pa.Table:
    """Driver-side (small) tile table: part.parquet -> tile rectangles.

    The tile set is the broadcast small side of the candidate spatial join
    (like the reference's conflation-map SQLite file, loaded once,
    ``ConflationMapDAO/loaders.js:36-140``); at 100 TB scale this is still
    tiny relative to the probe side, so it is `ray.put` once and indexed per
    actor rather than shuffled.
    """
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"])
    return tiles_batch(part)
