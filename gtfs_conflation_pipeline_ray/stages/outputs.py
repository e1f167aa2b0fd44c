"""Output sinks: deterministic sorted exports and QA dumps.

≙ the reference's output stage + mapbox QA task (SURVEY.md §2.1 S6/S7):
ESRI-shapefile layers become sorted partitioned parquet
(``/root/reference/src/daos/OutputDAO/generators.js:384-405``), the
NDJSON→tippecanoe QA dump becomes ``write_json``
(``tasks/conflation_map_into_mapbox/bin/dumpConflationMapDatabaseToNDGeoJSON:1-46``).
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
