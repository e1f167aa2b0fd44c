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

import os
import tempfile
import zipfile

import ray

# the reference's closed table list (S1,
# ``/root/reference/src/daos/RawGtfsDAO/SUPPORTED_TABLES.js:1-15``)
GTFS_TABLES = frozenset(
    "agency stops routes trips stop_times calendar calendar_dates "
    "fare_attributes fare_rules shapes frequencies transfers feed_info".split()
)


def read_gtfs_zip(zip_path: str, tables: list[str] | None = None,
                  extract_dir: str | None = None) -> dict:
    """GTFS zip ingest — ≙ S1/S2 (``raw_gtfs_into_sqlite/index.js:14-60``):
    unzip the feed, map each ``<table>.txt`` member to its table by file
    name (closed list, unknown members skipped — the reference's
    ``loaders.js:18-29`` mapping), and return {table: Dataset} of
    header-parsed CSV reads. Members are extracted once to ``extract_dir``
    (a temp dir by default) so the CSV reads stream from plain files; at
    cluster scale the extraction happens once on shared storage and every
    node reads column-pruned."""
    if tables is not None:
        wanted = set(tables)
        unknown = wanted - GTFS_TABLES
        if unknown:
            raise ValueError(f"unknown GTFS tables: {sorted(unknown)}")
    else:
        wanted = GTFS_TABLES
    out_dir = extract_dir or tempfile.mkdtemp(prefix="gtfs_zip_")
    os.makedirs(out_dir, exist_ok=True)
    out: dict = {}
    with zipfile.ZipFile(zip_path) as zf:
        for member in zf.namelist():
            base = os.path.basename(member)
            if not base.endswith(".txt"):
                continue
            table = base[:-4]
            if table not in wanted:
                continue  # skip-but-continue, like the reference's loader
            target = os.path.join(out_dir, base)
            with zf.open(member) as src, open(target, "wb") as dst:
                dst.write(src.read())
            out[table] = ray.data.read_csv(target)
    return out


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
