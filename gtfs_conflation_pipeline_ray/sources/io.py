"""Multi-format table IO — the engine's source/sink surface (SURVEY.md §2.1).

≙ the reference's sources: zipped CSV GTFS ingest (S1/S2,
``/root/reference/src/pipeline_transforms/raw_gtfs_into_sqlite/index.js:14-60``),
external SQLite reader (S4), NDJSON QA dump (S7). Formats here: parquet
(default), csv, json(lines), and lance when the package is available (the
production format named by BASELINE.json; this sandbox ships without it, so
the shim falls back to parquet and says so).

Reads go through ``ray.data`` with column pruning where the format supports
it; fixed schemas are passed explicitly (the reference disables header
inference beyond the file-name mapping, ``RawGtfsDAO/loaders.js:18-29``).
"""

from __future__ import annotations

import ray


def have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(path: str, fmt: str = "parquet", columns: list[str] | None = None,
               **kwargs):
    """Read a table as a Dataset. ``fmt``: parquet | csv | json | lance."""
    if fmt == "lance":
        if have_lance():
            return ray.data.read_lance(path, columns=columns, **kwargs)
        raise ImportError(
            "lance is not installed in this environment; materialize the "
            "table as parquet (see sources/fixtures.py) or install `lance`."
        )
    if fmt == "parquet":
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    if fmt == "csv":
        ds = ray.data.read_csv(path, **kwargs)
    elif fmt == "json":
        ds = ray.data.read_json(path, **kwargs)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_table(ds, path: str, fmt: str = "parquet", **kwargs):
    """Write a Dataset to a directory of files in the given format."""
    if fmt == "parquet":
        ds.write_parquet(path, **kwargs)
    elif fmt == "csv":
        ds.write_csv(path, **kwargs)
    elif fmt == "json":
        ds.write_json(path, **kwargs)
    elif fmt == "lance":
        if not have_lance():
            raise ImportError("lance is not installed in this environment")
        ds.write_lance(path, **kwargs)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return path
