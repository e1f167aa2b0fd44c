"""Mapbox Vector Tile (MVT) encoder/decoder — hand-rolled protobuf wire
format, no protobuf library.

Closes the S7 format gap: the reference dumps NDGeoJSON and shells into
tippecanoe to build an mbtiles of protobuf vector tiles
(``/root/reference/tasks/conflation_map_into_mapbox/bin/dumpConflationMapDatabaseToNDGeoJSON:1-46``
+ the tippecanoe step in the same task). The sandbox has no tippecanoe, but
both formats are public specs — MVT 2.1 (github.com/mapbox/vector-tile-spec)
is a small protobuf schema and mbtiles is a documented SQLite layout — so
this module emits REAL spec-compliant tiles.

Wire format essentials used here (protobuf encoding spec):
- varint: 7 bits per byte, little-endian groups, MSB = continuation
- zigzag for signed: (n << 1) ^ (n >> 63)
- key byte = (field_number << 3) | wire_type; types: 0 varint, 2 length-delim

MVT schema (spec 2.1):
  Tile:    layers = 3 (message)
  Layer:   version = 15 (varint, must be 2), name = 1 (string),
           features = 2 (message), keys = 3 (string), values = 4 (message),
           extent = 5 (varint, 4096 here)
  Feature: id = 1 (varint), tags = 2 (packed varint),
           type = 3 (varint: 1 POINT, 2 LINESTRING, 3 POLYGON),
           geometry = 4 (packed varint command stream)
  Value:   string_value = 1, double_value = 3, sint64_value = 6 (zigzag)
  Geometry command integer: (cmd_id & 0x7) | (count << 3);
  MoveTo = 1, LineTo = 2, ClosePath = 7; params are zigzag DELTAS.
"""

from __future__ import annotations

EXTENT = 4096

POINT, LINESTRING, POLYGON = 1, 2, 3


def _varint(n: int) -> bytes:
    assert n >= 0
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    """length-delimited field"""
    return _tag(field, 2) + _varint(len(payload)) + payload


def encode_geometry(parts: list[list[tuple[int, int]]], geom_type: int) -> list[int]:
    """Command stream for a (multi-)geometry in integer tile coordinates.
    ``parts``: one list of (x, y) per part. Points: each part is one point
    (encoded as a single MoveTo with count = n). Linestrings: MoveTo first
    vertex + LineTo rest, per part. Coordinates are cumulative deltas across
    the WHOLE stream (spec: the cursor persists across commands)."""
    cmds: list[int] = []
    cx = cy = 0
    if geom_type == POINT:
        pts = [p for part in parts for p in part]
        cmds.append((1 & 0x7) | (len(pts) << 3))
        for x, y in pts:
            cmds += [_zigzag(x - cx), _zigzag(y - cy)]
            cx, cy = x, y
        return cmds
    for part in parts:
        cmds.append((1 & 0x7) | (1 << 3))  # MoveTo 1
        x, y = part[0]
        cmds += [_zigzag(x - cx), _zigzag(y - cy)]
        cx, cy = x, y
        rest = part[1:]
        if geom_type == POLYGON:
            rest = rest[:-1] if rest and tuple(rest[-1]) == tuple(part[0]) else rest
        cmds.append((2 & 0x7) | (len(rest) << 3))  # LineTo n
        for x, y in rest:
            cmds += [_zigzag(x - cx), _zigzag(y - cy)]
            cx, cy = x, y
        if geom_type == POLYGON:
            cmds.append((7 & 0x7) | (1 << 3))  # ClosePath
    return cmds


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _tag(6, 0) + _varint(_zigzag(v))
    if isinstance(v, float):
        import struct
        return _tag(3, 1) + struct.pack("<d", v)
    return _ld(1, str(v).encode("utf-8"))


def encode_layer(name: str, features: list[dict], extent: int = EXTENT) -> bytes:
    """``features``: dicts with ``geom`` (list of parts of (x, y) int tuples),
    ``type`` (POINT/LINESTRING/POLYGON), optional ``id`` (int) and ``tags``
    (dict). Keys/values are deduplicated into the layer tables in first-seen
    order (deterministic given feature order)."""
    keys: dict[str, int] = {}
    values: dict = {}
    feats = bytearray()
    for f in features:
        tag_idx: list[int] = []
        for k, v in (f.get("tags") or {}).items():
            if k not in keys:
                keys[k] = len(keys)
            vk = (type(v).__name__, v)
            if vk not in values:
                values[vk] = len(values)
            tag_idx += [keys[k], values[vk]]
        body = bytearray()
        if "id" in f:
            body += _tag(1, 0) + _varint(int(f["id"]))
        if tag_idx:
            payload = b"".join(_varint(t) for t in tag_idx)
            body += _ld(2, payload)
        body += _tag(3, 0) + _varint(f["type"])
        geom = encode_geometry(f["geom"], f["type"])
        body += _ld(4, b"".join(_varint(g) for g in geom))
        feats += _ld(2, bytes(body))
    out = bytearray()
    out += _ld(1, name.encode("utf-8"))
    out += feats
    for k in keys:
        out += _ld(3, k.encode("utf-8"))
    for (_t, v) in values:
        out += _ld(4, _encode_value(v))
    out += _tag(5, 0) + _varint(extent)
    out += _tag(15, 0) + _varint(2)  # version, REQUIRED by spec 2.x
    return bytes(out)


def encode_tile(layers: dict[str, list[dict]], extent: int = EXTENT) -> bytes:
    return b"".join(_ld(3, encode_layer(n, f, extent))
                    for n, f in layers.items())


# ---------------------------------------------------------------------------
# decoder — independent consumer for tests/QA (full wire parse, not a mirror
# of the encoder's buffers)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 1:
            val = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def decode_geometry(cmds: list[int], geom_type: int):
    parts, cur = [], []
    cx = cy = 0
    i = 0
    while i < len(cmds):
        cmd_id, count = cmds[i] & 0x7, cmds[i] >> 3
        i += 1
        if cmd_id == 1:  # MoveTo
            for _ in range(count):
                cx += _unzigzag(cmds[i]); cy += _unzigzag(cmds[i + 1]); i += 2
                if geom_type == POINT:
                    parts.append([(cx, cy)])
                else:
                    if cur:
                        parts.append(cur)
                    cur = [(cx, cy)]
        elif cmd_id == 2:  # LineTo
            for _ in range(count):
                cx += _unzigzag(cmds[i]); cy += _unzigzag(cmds[i + 1]); i += 2
                cur.append((cx, cy))
        elif cmd_id == 7:  # ClosePath
            cur.append(cur[0])
        else:
            raise ValueError(f"bad command {cmd_id}")
    if cur:
        parts.append(cur)
    return parts


def decode_tile(buf: bytes) -> dict:
    """Return {layer_name: {"extent", "version", "features": [...]}} with
    features carrying decoded geometry parts and materialized tag dicts."""
    import struct as _st
    out = {}
    for field, _w, val in _fields(buf):
        if field != 3:
            continue
        name, extent, version = "", EXTENT, None
        keys, values, raw_feats = [], [], []
        for f2, w2, v2 in _fields(val):
            if f2 == 1:
                name = v2.decode("utf-8")
            elif f2 == 2:
                raw_feats.append(v2)
            elif f2 == 3:
                keys.append(v2.decode("utf-8"))
            elif f2 == 4:
                for f3, w3, v3 in _fields(v2):
                    if f3 == 1:
                        values.append(v3.decode("utf-8"))
                    elif f3 == 3:
                        values.append(_st.unpack("<d", v3)[0])
                    elif f3 == 6:
                        values.append(_unzigzag(v3))
                    elif f3 == 7:
                        values.append(bool(v3))
            elif f2 == 5:
                extent = v2
            elif f2 == 15:
                version = v2
        feats = []
        for rf in raw_feats:
            fid, gtype, tags, cmds = None, None, [], []
            for f3, w3, v3 in _fields(rf):
                if f3 == 1:
                    fid = v3
                elif f3 == 2:
                    p = 0
                    while p < len(v3):
                        t, p = _read_varint(v3, p)
                        tags.append(t)
                elif f3 == 3:
                    gtype = v3
                elif f3 == 4:
                    p = 0
                    while p < len(v3):
                        c, p = _read_varint(v3, p)
                        cmds.append(c)
            feats.append({
                "id": fid, "type": gtype,
                "geom": decode_geometry(cmds, gtype),
                "tags": {keys[tags[j]]: values[tags[j + 1]]
                         for j in range(0, len(tags), 2)},
            })
        out[name] = {"extent": extent, "version": version, "features": feats}
    return out
