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
