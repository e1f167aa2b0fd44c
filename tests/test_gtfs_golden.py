"""End-to-end GTFS golden regression: the full feed pipeline (zip → match →
choose → paths → stop fit → tile stats) over the deterministic fixture must
reproduce the checked-in outputs EXACTLY — the feed-level analog of the
query registry's value-hash oracles (VERDICT r3 item 9)."""

import glob
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gtfs_conflation_pipeline_ray.pipelines import gtfs_pipeline as gp
from gtfs_conflation_pipeline_ray.sources import fixtures as fx

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "gtfs")


def _read_stage(out: str, sub: str) -> pd.DataFrame:
    files = sorted(glob.glob(f"{out}/{sub}/**/*.parquet", recursive=True))
    t = pa.concat_tables([pq.read_table(f) for f in files
                          if pq.ParquetFile(f).metadata.num_rows > 0])
    return t.to_pandas().sort_values(t.schema.names,
                                     kind="mergesort").reset_index(drop=True)


def test_gtfs_pipeline_matches_goldens(ray_session, tmp_path):
    d = str(tmp_path)
    zp = fx.gtfs_feed_zip(f"{d}/feed.zip", n_shapes=6, pts_per_shape=25,
                          trips_per_shape=2, stops_per_shape=5)
    tiles = f"{d}/tiles.parquet"
    pq.write_table(fx.ref_tiles_table(150), tiles)
    m = gp.run_pipeline(zp, tiles, f"{d}/out", n_partitions=2)

    want_meta = json.load(open(f"{GOLDEN}/metrics.json"))
    assert m["match_rows"] == want_meta["match_rows"]
    assert m["path_edges"] == want_meta["path_edges"]
    assert m["stop_fit_rows"] == want_meta["stop_fit_rows"]
    assert m["tiles_matched"] == want_meta["tiles_matched"]
    # extent is min/max over the same float inputs -> bit-reproducible
    for k, v in want_meta["extent"].items():
        assert m["extent"][k] == pytest.approx(v, abs=0, rel=0)

    for sub in ["matches", "paths", "stop_fit", "tile_stats"]:
        got = _read_stage(f"{d}/out", sub)
        want = pd.read_csv(f"{GOLDEN}/{sub}.csv")
        assert list(got.columns) == list(want.columns), sub
        assert len(got) == len(want), sub
        for c in got.columns:
            gv, wv = got[c].to_numpy(), want[c].to_numpy()
            if gv.dtype.kind in "OU" or wv.dtype.kind in "OU":
                assert (gv.astype(str) == wv.astype(str)).all(), (sub, c)
            else:
                assert (gv == wv).all(), (sub, c)
