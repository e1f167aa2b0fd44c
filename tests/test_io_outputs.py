"""Round-trip tests for the multi-format IO shim and output sinks."""

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

from gtfs_conflation_pipeline_ray.sources import io as gio
from gtfs_conflation_pipeline_ray.stages import outputs

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["csv", "json", "parquet"])
def test_roundtrip(ray_session, tmp_path, fmt):
    ds = gio.read_table(f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"])
    out = str(tmp_path / fmt)
    gio.write_table(ds, out, fmt=fmt)
    back = gio.read_table(out, fmt=fmt)
    a = ds.to_pandas().sort_values("n_nationkey").reset_index(drop=True)
    b = back.to_pandas().sort_values("n_nationkey").reset_index(drop=True)
    assert a["n_name"].tolist() == b["n_name"].tolist()


def test_lance_shim_reports_missing(ray_session):
    if gio.have_lance():
        pytest.skip("lance installed; shim not exercised")
    with pytest.raises(ImportError):
        gio.read_table(f"{SF}/nation.parquet", fmt="lance")


def test_export_sorted_parquet(ray_session, tmp_path):
    ds = gio.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_acctbal"])
    out = outputs.export_sorted_parquet(ds, str(tmp_path / "sorted"), ["c_custkey"])
    files = sorted(glob.glob(f"{out}/*.parquet"))
    vals = []
    for f in files:
        vals.extend(pq.read_table(f, columns=["c_custkey"])["c_custkey"].to_pylist())
    assert vals == sorted(vals) and len(vals) == 150


def test_export_ndjson(ray_session, tmp_path):
    import json

    ds = gio.read_table(f"{SF}/region.parquet")
    out = outputs.export_ndjson(ds, str(tmp_path / "nd"))
    rows = []
    for f in glob.glob(f"{out}/*.json"):
        rows.extend(json.loads(line) for line in open(f) if line.strip())
    assert len(rows) == 5 and {r["r_name"] for r in rows} == {
        v["r_name"] for v in pq.read_table(f"{SF}/region.parquet").to_pylist()
    }

def test_read_gtfs_zip(ray_session, tmp_path):
    import zipfile

    zp = str(tmp_path / "feed.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("stops.txt", "stop_id,stop_name,stop_lat,stop_lon\n"
                                 "s1,Alpha,40.1,-73.9\ns2,Beta,40.2,-74.0\n")
        zf.writestr("trips.txt", "route_id,service_id,trip_id\nr1,wk,t1\nr1,wk,t2\n")
        zf.writestr("notes.txt", "not,a,gtfs,table\n")   # unknown -> skipped
        zf.writestr("README.md", "ignored")
    tables = gio.read_gtfs_zip(zp, extract_dir=str(tmp_path / "x"))
    assert set(tables) == {"stops", "trips"}
    stops = tables["stops"].to_pandas().sort_values("stop_id")
    assert stops["stop_name"].tolist() == ["Alpha", "Beta"]
    assert tables["trips"].count() == 2
    with pytest.raises(ValueError):
        gio.read_gtfs_zip(zp, tables=["nope"])


def test_export_layers(ray_session, tmp_path):
    import json

    ds = gio.read_table(f"{SF}/customer.parquet")
    out = outputs.export_layers(
        ds, str(tmp_path / "layers"),
        {
            "keys": (["c_custkey"], ["c_custkey"]),
            "building": (["c_custkey", "c_acctbal"], ["c_custkey"],
                         "c_mktsegment == 'BUILDING'"),
        },
    )
    man = json.load(open(f"{out}/_layers.json"))
    assert man["keys"]["rows"] == 150
    n_building = pq.read_table(f"{SF}/customer.parquet").to_pandas().query(
        "c_mktsegment == 'BUILDING'").shape[0]
    assert man["building"]["rows"] == n_building
    vals = []
    for f in sorted(glob.glob(f"{out}/layer=keys/*.parquet")):
        vals.extend(pq.read_table(f)["c_custkey"].to_pylist())
    assert vals == sorted(vals) and len(vals) == 150


def test_run_cli_list():
    import subprocess
    import sys

    out = subprocess.run([sys.executable, "/root/repo/run.py", "list"],
                         capture_output=True, text=True, check=True,
                         cwd="/root/repo").stdout
    assert "spatial_tile_stats" in out and "oracle" in out
