"""End-to-end GTFS pipeline: zip → match → choose → paths → stop fit →
layered outputs, with resume and a brute-force stop-fit check."""

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

from gtfs_conflation_pipeline_ray.pipelines import gtfs_pipeline as gp
from gtfs_conflation_pipeline_ray.sources import fixtures as fx


@pytest.fixture(scope="module")
def feed(tmp_path_factory):
    d = tmp_path_factory.mktemp("gtfs")
    zp = fx.gtfs_feed_zip(str(d / "feed.zip"), n_shapes=12, pts_per_shape=40,
                          trips_per_shape=2, stops_per_shape=6)
    tiles = str(d / "ref_tiles.parquet")
    pq.write_table(fx.ref_tiles_table(300), tiles)
    return str(d), zp, tiles


def _read_dir(d):
    files = sorted(f for f in glob.glob(f"{d}/*.parquet")
                   if pq.ParquetFile(f).metadata.num_rows > 0)
    import pyarrow as pa

    return pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()


def test_gtfs_pipeline_end_to_end(ray_session, feed, tmp_path):
    d, zp, tiles = feed
    out = str(tmp_path / "out")
    m = gp.run_pipeline(zp, tiles, out, n_partitions=3)
    # every shape point gets a chosen row (tile or -1)
    assert m["match_rows"] == 12 * 40
    # every (trip, stop) fits exactly once
    assert m["stop_fit_rows"] == 12 * 2 * 6
    assert m["path_edges"] > 0 and m["tiles_matched"] > 0

    fit = _read_dir(f"{out}/stop_fit")
    # monotonic no-backtracking: snap_gi non-decreasing within each trip
    for _, tg in fit.groupby("trip_id"):
        snaps = tg.sort_values("stop_sequence")["snap_gi"].to_numpy()
        assert (np.diff(snaps) >= 0).all()

    paths = _read_dir(f"{out}/paths")
    # edges within a path are contiguous, seq ranges ordered
    for (_, _), pg in paths.groupby(["shape_key", "path_index"]):
        pg = pg.sort_values("edge_index")
        assert (pg["edge_index"].to_numpy() == np.arange(len(pg))).all()
        assert (pg["seq_start"].to_numpy() <= pg["seq_end"].to_numpy()).all()
        assert (np.diff(pg["seq_start"].to_numpy()) > 0).all()


def test_gtfs_pipeline_resume_skips(ray_session, feed, tmp_path):
    d, zp, tiles = feed
    out = str(tmp_path / "out")
    m1 = gp.run_pipeline(zp, tiles, out, n_partitions=3)
    m2 = gp.run_pipeline(zp, tiles, out, n_partitions=3)
    assert sum(1 for _, _, sk in m2["partitions"] if sk) == 3
    assert m2["match_rows"] == m1["match_rows"]
    assert m2["path_edges"] == m1["path_edges"]


def test_stop_fit_greedy_vs_bruteforce(ray_session):
    """fit_trip_stops equals a direct greedy evaluation on a hand-built
    shape/trip, including the at-or-after constraint and first-min ties."""
    import pandas as pd
    import pyarrow as pa

    ray = ray_session
    rng = np.random.default_rng(21)
    n = 25
    xy = rng.integers(0, 1000, (n, 2)).astype(np.int64)
    shape_rows = pa.table({
        "shape_key": np.full(n, 7, dtype=np.int64),
        "gi": np.arange(1, n + 1, dtype=np.int64),
        "x": xy[:, 0], "y": xy[:, 1],
    })
    sx = xy[::4][:5, 0] + 3
    sy = xy[::4][:5, 1] - 2
    stop_rows = pa.table({
        "shape_key": np.full(5, 7, dtype=np.int64),
        "trip_id": ["t1"] * 5,
        "gi": np.arange(1, 6, dtype=np.int64),
        "x": sx, "y": sy,
    })
    got = gp.fit_trip_stops(ray.data.from_arrow(shape_rows),
                            ray.data.from_arrow(stop_rows)).to_pandas()
    got = got.sort_values("stop_sequence").reset_index(drop=True)
    prev = 0
    for i in range(5):
        d2 = (xy[prev:, 0] - sx[i]) ** 2 + (xy[prev:, 1] - sy[i]) ** 2
        v = prev + int(np.argmin(d2))
        assert got.loc[i, "snap_gi"] == v + 1
        assert got.loc[i, "dev_sq"] == d2[v - prev]
        prev = v


def test_gtfs_pipeline_deterministic(ray_session, feed, tmp_path):
    d, zp, tiles = feed
    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        gp.run_pipeline(zp, tiles, out, n_partitions=2)
        paths = _read_dir(f"{out}/paths").sort_values(
            ["shape_key", "path_index", "edge_index"]).reset_index(drop=True)
        outs.append(paths)
    assert outs[0].equals(outs[1])


def test_stop_fit_dp_beats_or_ties_greedy(ray_session):
    """The DP fit is the monotone global optimum over segment projections,
    so its total squared deviation never exceeds the greedy vertex snap's;
    alongs stay monotone per trip."""
    import pyarrow as pa

    ray = ray_session
    rng = np.random.default_rng(33)
    n = 30
    xy = rng.integers(0, 2000, (n, 2)).astype(np.int64)
    shape_rows = pa.table({
        "shape_key": np.full(n, 3, dtype=np.int64),
        "gi": np.arange(1, n + 1, dtype=np.int64),
        "x": xy[:, 0], "y": xy[:, 1],
    })
    m = 6
    stop_rows = pa.table({
        "shape_key": np.full(m, 3, dtype=np.int64),
        "trip_id": ["t"] * m,
        "gi": np.arange(1, m + 1, dtype=np.int64),
        "x": xy[::5][:m, 0] + 7, "y": xy[::5][:m, 1] - 4,
    })
    res = {}
    for method in ("greedy", "dp"):
        got = gp.fit_trip_stops(ray.data.from_arrow(shape_rows),
                                ray.data.from_arrow(stop_rows),
                                method=method).to_pandas()
        got = got.sort_values("stop_sequence")
        assert (np.diff(got["along_c"].to_numpy()) >= 0).all(), method
        res[method] = got["dev_sq"].sum()
    assert res["dp"] <= res["greedy"]


def test_gtfs_pipeline_hmm_choose_method(ray_session, feed, tmp_path):
    """The HMM matcher option runs end-to-end and is pinned in the
    checkpoint lineage (a resume with a different matcher must rebuild)."""
    import json

    d, zp, tiles = feed
    out = str(tmp_path / "out_hmm")
    m = gp.run_pipeline(zp, tiles, out, n_partitions=2, choose_method="hmm")
    assert m["match_rows"] == 12 * 40
    with open(f"{out}/matches/_manifest.json") as f:
        assert json.load(f)["lineage"]["choose_method"] == "hmm"
