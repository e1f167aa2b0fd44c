"""Pure-Python ESRI shapefile writer: structural invariants from the public
spec (file code 9994, word-counted lengths, shx offsets), round-trip through
the independent reader, dbf typing, multi-part polylines, and the two sinks
(bounded six-layer export, sharded unbounded export)."""

import glob
import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from gtfs_conflation_pipeline_ray.sources import shapefile as shp
from gtfs_conflation_pipeline_ray.stages import outputs


def test_point_shapefile_structure(tmp_path):
    base = str(tmp_path / "pts")
    x = np.array([1.5, 2.0, -3.25])
    y = np.array([10.0, -20.5, 30.0])
    shp.write_point_shapefile(base, x, y, {
        "seg_id": np.array([7, 8, 9], np.int64),
        "name": np.array(["a", "bb", "ccc"]),
    })
    raw = open(base + ".shp", "rb").read()
    assert struct.unpack(">i", raw[:4])[0] == 9994
    assert struct.unpack(">i", raw[24:28])[0] * 2 == len(raw)  # words
    assert struct.unpack("<ii", raw[28:36]) == (1000, 1)
    # bbox
    assert struct.unpack("<4d", raw[36:68]) == (-3.25, -20.5, 2.0, 30.0)
    # shx: 3 records, offsets consistent with fixed-size point records
    sx = open(base + ".shx", "rb").read()
    assert struct.unpack(">i", sx[24:28])[0] * 2 == len(sx)
    offs = [struct.unpack(">ii", sx[100 + 8 * i:108 + 8 * i]) for i in range(3)]
    assert offs == [(50, 10), (64, 10), (78, 10)]

    st, geoms, fields = shp.read_shapefile(base)
    assert st == 1
    np.testing.assert_allclose(geoms, np.stack([x, y], axis=1))
    assert fields["seg_id"] == [7, 8, 9]
    assert fields["name"] == ["a", "bb", "ccc"]


def test_polyline_multipart_roundtrip(tmp_path):
    base = str(tmp_path / "lines")
    part_a = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]])
    part_b = np.array([[5.0, 5.0], [6.0, 6.0]])
    single = np.array([[-1.0, -1.0], [-2.0, -3.0]])
    shp.write_polyline_shapefile(base, [[part_a, part_b], single],
                                 {"route_id": np.array([42, 43], np.int64)})
    st, geoms, fields = shp.read_shapefile(base)
    assert st == 3
    assert len(geoms) == 2 and len(geoms[0]) == 2 and len(geoms[1]) == 1
    np.testing.assert_allclose(geoms[0][0], part_a)
    np.testing.assert_allclose(geoms[0][1], part_b)
    np.testing.assert_allclose(geoms[1][0], single)
    assert fields["route_id"] == [42, 43]
    raw = open(base + ".shp", "rb").read()
    assert struct.unpack(">i", raw[24:28])[0] * 2 == len(raw)


def test_export_shapefile_layers(tmp_path):
    out = str(tmp_path / "layers")
    ds = ray.data.from_pandas(pd.DataFrame({
        "sid": np.array([2, 1, 1], np.int64),
        "part": np.array([0, 1, 0], np.int64),
        "xs": [[0.0, 1.0], [4.0, 5.0], [2.0, 3.0]],
        "ys": [[0.0, 1.0], [4.0, 5.0], [2.0, 3.0]],
        "px": np.array([7.0, 8.0, 9.0]),
        "py": np.array([1.0, 2.0, 3.0]),
    }))
    outputs.export_shapefile_layers(ds, out, {
        "stops": {"kind": "point", "x": "px", "y": "py",
                  "fields": ["sid"], "sort": ["sid", "px"]},
        "shapes": {"kind": "polyline", "xs": "xs", "ys": "ys",
                   "group": "sid", "order": "part", "fields": ["sid"]},
    })
    st, pts, f = shp.read_shapefile(os.path.join(out, "stops"))
    assert st == 1 and f["sid"] == [1, 1, 2]  # sorted deterministic order
    st, lines, f = shp.read_shapefile(os.path.join(out, "shapes"))
    assert st == 3 and f["sid"] == [1, 2]
    # group 1 has two parts in `part` order: [2,3] then [4,5]
    np.testing.assert_allclose(lines[0][0], [[2.0, 2.0], [3.0, 3.0]])
    np.testing.assert_allclose(lines[0][1], [[4.0, 4.0], [5.0, 5.0]])
    np.testing.assert_allclose(lines[1][0], [[0.0, 0.0], [1.0, 1.0]])


def test_export_shapefile_shards(tmp_path):
    out = str(tmp_path / "shards")
    n = 1000
    ds = ray.data.from_pandas(pd.DataFrame({
        "x": np.arange(n, dtype=np.float64),
        "y": np.arange(n, dtype=np.float64) * 2,
        "pid": np.arange(n, dtype=np.int64),
    })).repartition(4)
    total = outputs.export_shapefile_shards(ds, out, "x", "y", fields=["pid"],
                                            batch_size=256)
    assert total == n
    bases = sorted(p[:-4] for p in glob.glob(out + "/part-*.shp"))
    assert len(bases) >= 2  # actually sharded
    got = []
    for b in bases:
        _, geoms, fields = shp.read_shapefile(b)
        got += list(zip(fields["pid"], geoms[:, 0], geoms[:, 1]))
    got.sort()
    assert got == [(i, float(i), float(2 * i)) for i in range(n)]
