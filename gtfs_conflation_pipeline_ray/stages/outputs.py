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
