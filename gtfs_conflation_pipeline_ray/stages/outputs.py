"""Output sinks: deterministic sorted exports and QA dumps.

≙ the reference's output stage + mapbox QA task (SURVEY.md §2.1 S6/S7).
Two parity surfaces per sink:
- NATIVE formats, no GDAL/tippecanoe: real ESRI shapefiles via the
  pure-Python public-spec writer (``sources/shapefile.py``;
  ``export_shapefile_layers`` bounded / ``export_shapefile_shards``
  unbounded — ≙ ``OutputDAO/generators.js:384-405``) and real mbtiles of
  hand-encoded MVT protobuf tiles (``functions/mvt.py`` +
  ``export_mbtiles`` — ≙ the tippecanoe step of
  ``tasks/conflation_map_into_mapbox/bin/*``).
- Layer SEMANTICS for pipeline-to-pipeline exchange: sorted partitioned
  parquet per layer + manifest (``export_layers``), NDJSON ``write_json``
  (``bin/dumpConflationMapDatabaseToNDGeoJSON:1-46``).
Deterministic output ordering ≙ O6 ``ORDER BY id``
(``ConflationMapDAO/loaders.js:66-73``).
"""

from __future__ import annotations

import os


def export_sorted_parquet(ds, out_dir: str, sort_keys: list[str]):
    """Globally sorted, deterministic parquet export (the final sort is the
    one sanctioned full shuffle of an output stage)."""
    ds.sort(sort_keys).write_parquet(out_dir)
    return out_dir


def export_ndjson(ds, out_dir: str):
    """Newline-delimited JSON QA dump (one file per block)."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)
    return out_dir


def export_layers(ds, out_dir: str, layers: dict):
    """Multi-layer sink — ≙ S6's six-layer ESRI shapefile export
    (``/root/reference/src/daos/OutputDAO/generators.js:24-405``): each layer
    is a named projection of the same source Dataset, written as its own
    sorted parquet directory ``<out_dir>/layer=<name>/`` plus a manifest
    recording per-layer row counts (the sidecar-metadata parity, S8).

    ``layers`` maps layer name -> (columns, sort_keys) or
    (columns, sort_keys, filter_expr). The source is shared (lazy); each
    layer projects/filters/sorts independently, so a layer's sort shuffle
    moves only that layer's pruned columns."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    manifest = {}
    for name, spec in layers.items():
        cols, sort_keys = spec[0], spec[1]
        layer = ds
        if len(spec) > 2 and spec[2]:
            layer = layer.filter(expr=spec[2])
        layer = layer.select_columns(cols)
        layer_dir = os.path.join(out_dir, f"layer={name}")
        layer.sort(sort_keys).write_parquet(layer_dir)
        import pyarrow.dataset as pads

        manifest[name] = {
            "columns": cols,
            "sort_keys": sort_keys,
            "rows": int(pads.dataset(layer_dir).count_rows()),
        }
    with open(os.path.join(out_dir, "_layers.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return out_dir


def export_shapefile_layers(ds, out_dir: str, layers: dict, batch_size: int = 8192):
    """True ESRI shapefile multi-layer export — the reference's six-layer
    ``outputShapefile`` (``OutputDAO/generators.js:384-405``) without GDAL:
    each layer becomes ``<out_dir>/<name>.shp/.shx/.dbf`` via the
    pure-Python writer (``sources/shapefile.py``).

    ``layers`` maps name -> spec dict:
      - ``kind``: "point" | "polyline"
      - point: ``x``/``y`` column names
      - polyline: ``xs``/``ys`` list<double> columns (one part per row) or a
        ``group`` column to assemble multi-part records (rows of one group
        become parts of one MultiLineString record, in ``order`` column
        order — ≙ generators.js:360-378)
      - ``fields``: attribute column names (ints stay 'N'; everything else
        is stringified — the reference JSON-stringifies non-strings too,
        generators.js:350-357)
      - ``sort``: deterministic record order (O6)

    A shapefile is a sequential single-file format, so this sink
    MATERIALIZES each layer on the driver — sanctioned only for BOUNDED
    layers (the reference's use: the final conflation map). Unbounded
    layers use :func:`export_shapefile_shards`."""
    import numpy as np

    from ..sources import shapefile as shp

    os.makedirs(out_dir, exist_ok=True)
    for name, spec in layers.items():
        cols = list(spec.get("fields", []))
        if spec["kind"] == "point":
            need = [spec["x"], spec["y"]] + cols
        else:
            need = ([spec["xs"], spec["ys"]] + cols
                    + ([spec["group"], spec.get("order", spec["group"])]
                       if "group" in spec else []))
        df = ds.select_columns(list(dict.fromkeys(need))).to_pandas()
        if spec.get("sort"):
            df = df.sort_values(spec["sort"], kind="mergesort")
        base = os.path.join(out_dir, name)
        if spec["kind"] == "point":
            fields = {c: df[c].to_numpy() for c in cols}
            shp.write_point_shapefile(
                base, df[spec["x"]].to_numpy(np.float64),
                df[spec["y"]].to_numpy(np.float64), fields or None)
        else:
            if "group" in spec:
                order_col = spec.get("order", spec["group"])
                df = df.sort_values([spec["group"], order_col], kind="mergesort")
                lines, fields_rows = [], []
                for _, g in df.groupby(spec["group"], sort=True):
                    lines.append([np.stack([np.asarray(xs, np.float64),
                                            np.asarray(ys, np.float64)], axis=1)
                                  for xs, ys in zip(g[spec["xs"]], g[spec["ys"]])])
                    fields_rows.append(g.iloc[0])
                fields = {c: np.array([r[c] for r in fields_rows])
                          for c in cols}
            else:
                lines = [np.stack([np.asarray(xs, np.float64),
                                   np.asarray(ys, np.float64)], axis=1)
                         for xs, ys in zip(df[spec["xs"]], df[spec["ys"]])]
                fields = {c: df[c].to_numpy() for c in cols}
            shp.write_polyline_shapefile(base, lines, fields or None)
    return out_dir


def export_shapefile_shards(ds, out_dir: str, x_col: str, y_col: str,
                            fields: list[str] | None = None,
                            batch_size: int = 65536):
    """Sharded point-shapefile sink for UNBOUNDED layers: every batch writes
    its own ``part-<block>-<seq>.shp/.shx/.dbf`` trio inside ``map_batches``
    (embarrassingly parallel, nothing materializes on the driver; ≙ the
    resumable partitioned-parquet layout, but in the exchange format).
    Returns the number of records written."""
    import numpy as np
    import pyarrow as pa

    from ..sources import shapefile as shp

    os.makedirs(out_dir, exist_ok=True)
    fields = fields or []

    def _write(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
            y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
            fl = {c: batch[c].to_numpy(zero_copy_only=False) for c in fields}
            # deterministic shard name from content, not task ids: stable
            # across retries and resumable (same block -> same file)
            import hashlib
            h = hashlib.sha1(x.tobytes() + y.tobytes()).hexdigest()[:16]
            shp.write_point_shapefile(os.path.join(out_dir, f"part-{h}"),
                                      x, y, fl or None)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    parts = ds.map_batches(_write, batch_format="pyarrow", batch_size=batch_size)
    return int(parts.sum("n") or 0)


def export_mbtiles(ds, path: str, layer_name: str, x_col: str, y_col: str,
                   id_col: str, fields: list[str] | None = None,
                   zooms=(2,), world: int = 65536):
    """Spec-compliant **mbtiles** sink (S7 without tippecanoe): slice the
    integer-grid point set into XYZ tiles, encode each tile as a REAL
    Mapbox Vector Tile protobuf (``functions/mvt.py``), gzip it, and write
    the documented mbtiles SQLite layout (``metadata`` + ``tiles`` with
    TMS-flipped rows). ≙ the reference's NDGeoJSON → tippecanoe → mbtiles QA
    task (``tasks/conflation_map_into_mapbox/bin/*``).

    Distributed shape: the per-point tile assignment + local-coordinate math
    is a map-side batch transform (ints only — tile BYTES are created after
    the shuffle, inside the per-tile group stage, so payloads never transit
    the exchange); tiles groupby-assemble via the bucketed combine; the
    final SQLite write is driver-side over the tile table, which is bounded
    by sum(4^z) rows, never by the input. Deterministic: features sort by
    id inside a tile, gzip mtime pinned to 0.

    Grid→tile mapping: grid y grows DOWN the tile pyramid's row axis (XYZ
    row 0 at top); mbtiles stores TMS rows, so ``tile_row = 2^z - 1 - ty``.
    """
    import gzip
    import sqlite3

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..functions import mvt
    from .relational import bucketed_groups

    fields = fields or []
    ext = mvt.EXTENT
    zooms = sorted(set(int(z) for z in zooms))

    def _assign(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols: dict[str, np.ndarray] = {c: [] for c in
                                       ("z", "tx", "ty", "lx", "ly", id_col)}
        extra = {c: [] for c in fields}
        for z in zooms:
            gx = x * (ext << z) // world
            gy = y * (ext << z) // world
            cols["z"].append(np.full(len(x), z, dtype=np.int64))
            cols["tx"].append(gx // ext)
            cols["ty"].append(gy // ext)
            cols["lx"].append(gx % ext)
            cols["ly"].append(gy % ext)
            cols[id_col].append(ids)
            for c in fields:
                extra[c].append(batch[c].to_numpy(zero_copy_only=False))
        out = {k: np.concatenate(v) for k, v in cols.items()}
        out.update({c: np.concatenate(v) for c, v in extra.items()})
        return pa.table(out)

    assigned = ds.map_batches(_assign, batch_format="pyarrow", batch_size=65536)

    def _tiles(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (z, tx, ty), grp in g.groupby(["z", "tx", "ty"], sort=True):
            grp = grp.sort_values(id_col, kind="mergesort")
            feats = []
            for _, r in grp.iterrows():
                tags = {}
                for c in fields:
                    v = r[c]
                    tags[c] = int(v) if isinstance(v, (int, np.integer)) else str(v)
                feats.append({"id": int(r[id_col]), "type": mvt.POINT,
                              "geom": [[(int(r["lx"]), int(r["ly"]))]],
                              "tags": tags})
            data = gzip.compress(mvt.encode_tile({layer_name: feats}),
                                 compresslevel=9, mtime=0)
            rows.append({"z": int(z), "tx": int(tx), "ty": int(ty),
                         "tile_data": data})
        return pd.DataFrame(rows, columns=["z", "tx", "ty", "tile_data"])

    tile_rows = bucketed_groups(assigned, ["z", "tx", "ty"], _tiles)
    # bounded: at most sum(4^z) tiles regardless of input size
    tdf = tile_rows.to_pandas()

    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("CREATE TABLE metadata (name text, value text)")
        con.execute("CREATE TABLE tiles (zoom_level integer, "
                    "tile_column integer, tile_row integer, tile_data blob)")
        con.execute("CREATE UNIQUE INDEX tile_index ON tiles "
                    "(zoom_level, tile_column, tile_row)")
        meta = {
            "name": layer_name, "format": "pbf",
            "minzoom": str(min(zooms)), "maxzoom": str(max(zooms)),
            "json": ('{"vector_layers":[{"id":"%s","fields":{%s}}]}'
                     % (layer_name,
                        ",".join(f'"{c}":"String"' for c in fields))),
        }
        con.executemany("INSERT INTO metadata VALUES (?, ?)",
                        sorted(meta.items()))
        for _, r in tdf.sort_values(["z", "tx", "ty"]).iterrows():
            tms_row = (1 << int(r["z"])) - 1 - int(r["ty"])
            con.execute("INSERT INTO tiles VALUES (?, ?, ?, ?)",
                        (int(r["z"]), int(r["tx"]), tms_row,
                         sqlite3.Binary(r["tile_data"])))
        con.commit()
    finally:
        con.close()
    return path
