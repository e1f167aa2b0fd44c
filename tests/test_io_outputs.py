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