"""MVT encoder/decoder: varint/zigzag/command-stream invariants from the
public spec 2.1, round-trips of point/line/polygon geometries and typed
tags, plus the mbtiles sink (SQLite layout, TMS row flip, gzip payloads,
exact tile/feature contents)."""

import gzip
import sqlite3

import numpy as np
import pandas as pd
import ray

from gtfs_conflation_pipeline_ray.functions import mvt
from gtfs_conflation_pipeline_ray.stages import outputs


def test_varint_zigzag():
    assert mvt._varint(0) == b"\x00"
    assert mvt._varint(300) == b"\xac\x02"  # protobuf spec's own example
    for n in (0, 1, -1, 2, -2, 4095, -4096, 2**40, -(2**40)):
        assert mvt._unzigzag(mvt._zigzag(n)) == n


def test_geometry_command_stream_spec_example():
    # spec 2.1 example: point (25, 17) -> [9, 50, 34]
    assert mvt.encode_geometry([[(25, 17)]], mvt.POINT) == [9, 50, 34]
    # spec example: linestring (2,2)-(2,10)-(10,10) ->
    # [MoveTo(2,2), LineTo(0,8),(8,0)] = [9,4,4,18,0,16,16,0]
    assert mvt.encode_geometry([[(2, 2), (2, 10), (10, 10)]],
                               mvt.LINESTRING) == [9, 4, 4, 18, 0, 16, 16, 0]


def test_tile_roundtrip_types_and_tags():
    feats = [
        {"id": 7, "type": mvt.POINT, "geom": [[(100, 200)], [(150, 250)]],
         "tags": {"name": "alpha", "rank": 3}},
        {"id": 8, "type": mvt.LINESTRING,
         "geom": [[(0, 0), (10, 5)], [(20, 20), (30, 40), (25, 45)]],
         "tags": {"name": "beta", "len": -12}},
        {"id": 9, "type": mvt.POLYGON,
         "geom": [[(0, 0), (10, 0), (10, 10), (0, 0)]], "tags": {}},
    ]
    buf = mvt.encode_tile({"roads": feats})
    out = mvt.decode_tile(buf)
    layer = out["roads"]
    assert layer["version"] == 2 and layer["extent"] == 4096
    f0, f1, f2 = layer["features"]
    assert f0["id"] == 7 and f0["type"] == mvt.POINT
    assert f0["geom"] == [[(100, 200)], [(150, 250)]]
    assert f0["tags"] == {"name": "alpha", "rank": 3}
    assert f1["geom"] == [[(0, 0), (10, 5)], [(20, 20), (30, 40), (25, 45)]]
    assert f1["tags"] == {"name": "beta", "len": -12}
    # polygon closes back to its first vertex
    assert f2["geom"] == [[(0, 0), (10, 0), (10, 10), (0, 0)]]
    # key/value tables are deduplicated: "name" appears once in the layer
    assert buf.count(b"name") == 1


def test_export_mbtiles(tmp_path):
    path = str(tmp_path / "qa.mbtiles")
    # world=65536, zoom=2 -> tile span 16384; pick points in known tiles
    ds = ray.data.from_pandas(pd.DataFrame({
        "pid": np.array([1, 2, 3], np.int64),
        "x": np.array([0, 16384, 40000], np.int64),     # tiles 0,1,2
        "y": np.array([0, 0, 50000], np.int64),         # rows  0,0,3
        "kind": ["stop", "stop", "shape"],
    }))
    outputs.export_mbtiles(ds, path, "conflation", "x", "y", "pid",
                           fields=["kind"], zooms=(2,))
    con = sqlite3.connect(path)
    meta = dict(con.execute("SELECT name, value FROM metadata").fetchall())
    assert meta["format"] == "pbf" and meta["minzoom"] == "2"
    rows = con.execute("SELECT zoom_level, tile_column, tile_row, tile_data "
                       "FROM tiles ORDER BY tile_column").fetchall()
    con.close()
    assert [(r[0], r[1], r[2]) for r in rows] == [
        (2, 0, 3),   # ty=0 -> TMS row 2^2-1-0 = 3
        (2, 1, 3),
        (2, 2, 0),   # ty=3 -> TMS row 0
    ]
    # decode the first tile: point 1 at local (0, 0)
    t0 = mvt.decode_tile(gzip.decompress(rows[0][3]))["conflation"]
    assert t0["features"][0]["id"] == 1
    assert t0["features"][0]["geom"] == [[(0, 0)]]
    assert t0["features"][0]["tags"] == {"kind": "stop"}
    # point 3: x=40000 -> gx=40000*4096*4//65536=10000, tile 2, local 1808
    t2 = mvt.decode_tile(gzip.decompress(rows[2][3]))["conflation"]
    g = t2["features"][0]["geom"][0][0]
    assert g == (40000 * 4096 * 4 // 65536 % 4096,
                 50000 * 4096 * 4 // 65536 % 4096)
    # deterministic bytes: re-export produces identical file contents
    path2 = str(tmp_path / "qa2.mbtiles")
    outputs.export_mbtiles(ds, path2, "conflation", "x", "y", "pid",
                           fields=["kind"], zooms=(2,))
    con1, con2 = sqlite3.connect(path), sqlite3.connect(path2)
    b1 = con1.execute("SELECT tile_data FROM tiles ORDER BY tile_column").fetchall()
    b2 = con2.execute("SELECT tile_data FROM tiles ORDER BY tile_column").fetchall()
    con1.close(); con2.close()
    assert b1 == b2
