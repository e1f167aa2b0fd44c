"""Pure-Python ESRI shapefile writer (.shp/.shx/.dbf) — no GDAL.

Closes the S6 format gap (``/root/reference/src/daos/OutputDAO/generators.js:384-405``
shells into node-gdal to emit a six-layer ESRI shapefile; this sandbox has no
GDAL, so earlier rounds exported layer SEMANTICS as sorted parquet). The
format itself is a public spec (the ESRI "Shapefile Technical Description"
whitepaper, July 1998) and simple enough to emit directly:

- ``.shp``: 100-byte header (file code 9994 big-endian, file length in
  16-bit words big-endian, version 1000 little-endian, shape type
  little-endian, double-precision bbox), then per record a big-endian
  (record number, content words) header + little-endian shape content.
- ``.shx``: same header; per record the big-endian (offset words,
  content words) of the .shp record.
- ``.dbf``: dBASE III — 0x03 version byte, record count, 32-byte field
  descriptors (names hard-truncated to 10 chars like GDAL does), one
  space-padded ASCII row per record with a leading deletion flag.

Shape types implemented: 1 (Point) and 3 (PolyLine, multi-part — the
reference writes MultiLineStrings). Attributes: 'C' (string; the reference
JSON-stringifies every non-string, generators.js:350-357) and 'N' (int64).

Scale note: a shapefile is an inherently SEQUENTIAL single-file format
(1-based record numbers, running offsets), so the single-file writer is a
driver-side sink for BOUNDED layers (the reference's use: the final
conflation map, tile-table-sized — never the event stream). The sharded
variant in ``stages/outputs.py`` writes one shapefile per block inside
``map_batches`` for unbounded layers.
"""

from __future__ import annotations

import struct

import numpy as np

SHP_POINT = 1
SHP_POLYLINE = 3

_DBF_MAX_NAME = 10
_DBF_C_WIDTH = 64  # node-gdal default-ish string width; values are truncated
_DBF_N_WIDTH = 20  # enough for any int64


def _dbf_fields(fields: dict[str, np.ndarray]) -> list[tuple[str, bytes, int]]:
    """(name, type, width) per field; names truncated to 10 bytes, ints 'N',
    everything else rendered 'C'."""
    out = []
    for name, arr in fields.items():
        if np.issubdtype(np.asarray(arr).dtype, np.integer):
            out.append((name[:_DBF_MAX_NAME], b"N", _DBF_N_WIDTH))
        else:
            out.append((name[:_DBF_MAX_NAME], b"C", _DBF_C_WIDTH))
    return out


def _write_dbf(path: str, n_records: int, fields: dict[str, np.ndarray]) -> None:
    descs = _dbf_fields(fields)
    rec_size = 1 + sum(w for _, _, w in descs)
    hdr_size = 32 + 32 * len(descs) + 1
    with open(path, "wb") as f:
        # version 3, a fixed date (deterministic output — no wall clock),
        # record count, header/record sizes, 20 reserved bytes
        f.write(struct.pack("<B3BIHH20x", 0x03, 99, 1, 1, n_records,
                            hdr_size, rec_size))
        for name, typ, width in descs:
            f.write(struct.pack("<11s c 4x B B 14x",
                                name.encode("ascii", "replace"), typ, width, 0))
        f.write(b"\x0d")
        cols = []
        for (name, typ, width), arr in zip(descs, fields.values()):
            a = np.asarray(arr)
            if typ == b"N":
                vals = [str(int(v)).rjust(width)[:width] for v in a]
            else:
                vals = [("" if v is None else str(v)).ljust(width)[:width]
                        for v in a]
            cols.append(vals)
        for i in range(n_records):
            f.write(b" " + "".join(c[i] for c in cols).encode("ascii", "replace"))
        f.write(b"\x1a")


def _shp_header(shape_type: int, file_words: int, bbox) -> bytes:
    return struct.pack(">i5i", 9994, 0, 0, 0, 0, 0) + struct.pack(
        ">i", file_words) + struct.pack("<ii", 1000, shape_type) + struct.pack(
        "<4d", *bbox) + struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)


def write_point_shapefile(base: str, x: np.ndarray, y: np.ndarray,
                          fields: dict[str, np.ndarray] | None = None) -> None:
    """Write ``base``.shp/.shx/.dbf with one Point record per (x, y)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    bbox = ((float(x.min()), float(y.min()), float(x.max()), float(y.max()))
            if n else (0.0, 0.0, 0.0, 0.0))
    content_words = 10  # int32 type + 2 doubles = 20 bytes
    shp_words = 50 + n * (4 + content_words)
    shx_words = 50 + n * 4
    shp = bytearray(_shp_header(SHP_POINT, shp_words, bbox))
    shx = bytearray(_shp_header(SHP_POINT, shx_words, bbox))
    offset = 50
    for i in range(n):
        shx += struct.pack(">ii", offset, content_words)
        shp += struct.pack(">ii", i + 1, content_words)
        shp += struct.pack("<idd", SHP_POINT, x[i], y[i])
        offset += 4 + content_words
    with open(base + ".shp", "wb") as f:
        f.write(shp)
    with open(base + ".shx", "wb") as f:
        f.write(shx)
    _write_dbf(base + ".dbf", n,
               fields if fields else {"FID": np.arange(n, dtype=np.int64)})


def write_polyline_shapefile(base: str, lines: list, fields:
                             dict[str, np.ndarray] | None = None) -> None:
    """Write ``base``.shp/.shx/.dbf with one PolyLine record per entry of
    ``lines``. Each entry is one PART (an (n, 2) float array) or a LIST of
    parts (≙ the reference's per-feature gdal.MultiLineString,
    generators.js:360-378)."""
    norm: list[list[np.ndarray]] = []
    for entry in lines:
        parts = entry if isinstance(entry, (list, tuple)) else [entry]
        norm.append([np.asarray(p, dtype=np.float64).reshape(-1, 2)
                     for p in parts])
    n = len(norm)
    allpts = (np.concatenate([p for ps in norm for p in ps])
              if n else np.zeros((0, 2)))
    bbox = ((float(allpts[:, 0].min()), float(allpts[:, 1].min()),
             float(allpts[:, 0].max()), float(allpts[:, 1].max()))
            if len(allpts) else (0.0, 0.0, 0.0, 0.0))

    recs = []
    for ps in norm:
        npts = sum(len(p) for p in ps)
        pts = np.concatenate(ps) if ps else np.zeros((0, 2))
        part_starts = np.cumsum([0] + [len(p) for p in ps[:-1]]).astype("<i4")
        body = struct.pack("<i", SHP_POLYLINE)
        body += struct.pack("<4d", float(pts[:, 0].min()), float(pts[:, 1].min()),
                            float(pts[:, 0].max()), float(pts[:, 1].max()))
        body += struct.pack("<ii", len(ps), npts)
        body += part_starts.tobytes()
        body += pts.astype("<f8").tobytes()
        recs.append(body)

    shp_words = 50 + sum(4 + len(r) // 2 for r in recs)
    shx_words = 50 + n * 4
    shp = bytearray(_shp_header(SHP_POLYLINE, shp_words, bbox))
    shx = bytearray(_shp_header(SHP_POLYLINE, shx_words, bbox))
    offset = 50
    for i, r in enumerate(recs):
        words = len(r) // 2
        shx += struct.pack(">ii", offset, words)
        shp += struct.pack(">ii", i + 1, words) + r
        offset += 4 + words
    with open(base + ".shp", "wb") as f:
        f.write(shp)
    with open(base + ".shx", "wb") as f:
        f.write(shx)
    _write_dbf(base + ".dbf", n,
               fields if fields else {"FID": np.arange(n, dtype=np.int64)})


# ---------------------------------------------------------------------------
# minimal reader — used by tests to round-trip and by QA tooling; reads only
# what the writer emits (types 1 and 3, 'C'/'N' dbf fields)
# ---------------------------------------------------------------------------

def read_shapefile(base: str):
    """Return (shape_type, geoms, fields). Points → (n,2) array; polylines →
    list of lists of (k,2) arrays. Fields → dict name → list of parsed
    values ('N' → int, 'C' → stripped str)."""
    with open(base + ".shp", "rb") as f:
        raw = f.read()
    (code,) = struct.unpack(">i", raw[:4])
    assert code == 9994, "not a shapefile"
    (file_words,) = struct.unpack(">i", raw[24:28])
    assert file_words * 2 == len(raw), "file length mismatch"
    version, shape_type = struct.unpack("<ii", raw[28:36])
    assert version == 1000
    pos, geoms = 100, []
    while pos < len(raw):
        _recno, words = struct.unpack(">ii", raw[pos:pos + 8])
        body = raw[pos + 8:pos + 8 + words * 2]
        pos += 8 + words * 2
        (st,) = struct.unpack("<i", body[:4])
        assert st == shape_type
        if st == SHP_POINT:
            geoms.append(struct.unpack("<dd", body[4:20]))
        else:
            n_parts, n_pts = struct.unpack("<ii", body[36:44])
            starts = np.frombuffer(body[44:44 + 4 * n_parts], dtype="<i4")
            pts = np.frombuffer(body[44 + 4 * n_parts:], dtype="<f8").reshape(-1, 2)
            assert len(pts) == n_pts
            bounds = np.append(starts, n_pts)
            geoms.append([pts[bounds[j]:bounds[j + 1]] for j in range(n_parts)])
    if shape_type == SHP_POINT:
        geoms = np.array(geoms, dtype=np.float64).reshape(-1, 2)

    with open(base + ".dbf", "rb") as f:
        draw = f.read()
    n_rec, hdr_size, rec_size = struct.unpack("<IHH", draw[4:12])
    descs = []
    p = 32
    while draw[p] != 0x0D:
        name = draw[p:p + 11].split(b"\x00")[0].decode()
        typ = chr(draw[p + 11])
        width = draw[p + 16]
        descs.append((name, typ, width))
        p += 32
    fields: dict[str, list] = {name: [] for name, _, _ in descs}
    for i in range(n_rec):
        row = draw[hdr_size + i * rec_size:hdr_size + (i + 1) * rec_size]
        q = 1  # skip deletion flag
        for name, typ, width in descs:
            cell = row[q:q + width].decode("ascii", "replace")
            fields[name].append(int(cell) if typ == "N" else cell.rstrip())
            q += width
    return shape_type, geoms, fields
