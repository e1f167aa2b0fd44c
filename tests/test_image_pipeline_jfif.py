"""The image-conflation pipeline over a corpus containing REAL baseline-JPEG
payloads (fmt='jfif', ITU-T T.81 streams): the BASELINE.json north star runs
over real image bytes, so the end-to-end path — fixture bytes → shard-local
decode/validation → spatial join → tile stats — must work when the lossy
rows are genuine JFIF, not the QJPG stand-in."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from gtfs_conflation_pipeline_ray.functions import codecs, jpeg
from gtfs_conflation_pipeline_ray.pipelines import image_conflation as ic
from gtfs_conflation_pipeline_ray.sources import fixtures


@pytest.fixture(scope="module")
def jfif_fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgfix_jfif")
    fixtures.write_fixture(str(d), n_images=240, n_tiles=30,
                           rows_per_file=80, jfif_every=4)
    return str(d)


def test_fixture_carries_real_jfif_rows(jfif_fixture_dir):
    t = pq.read_table(f"{jfif_fixture_dir}/images")
    fmts = t["fmt"].to_pylist()
    n_jfif = sum(f == "jfif" for f in fmts)
    assert n_jfif >= 240 // 4 - 2  # edge rows may opt out
    # jfif rows hold genuine SOI-marked streams that the T.81 decoder reads
    for i in range(t.num_rows):
        if fmts[i] == "jfif":
            blob = t["bytes"][i].as_py()
            assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
            img = jpeg.decode(blob)
            assert img.shape == (t["h"][i].as_py(), t["w"][i].as_py(), 3)


def test_jfif_rows_meet_lossy_invariant(jfif_fixture_dir):
    """PSNR >= 40 dB vs the deterministic original pixels (BASELINE.json's
    per-row invariant for lossy formats) — real JPEG at quality 100 clears
    it on this content (~50 dB)."""
    t = pq.read_table(f"{jfif_fixture_dir}/images")
    checked = 0
    for i in range(t.num_rows):
        if t["fmt"][i].as_py() != "jfif":
            continue
        rng = np.random.default_rng(fixtures.SEED + 1000 + i)
        ref = fixtures._synth_image(rng, t["w"][i].as_py(), t["h"][i].as_py())
        dec = codecs.decode(t["bytes"][i].as_py(), "jfif")
        assert codecs.psnr(dec, ref) >= 40.0
        checked += 1
    assert checked >= 50


def test_validator_accepts_jfif_rows(ray_session, jfif_fixture_dir):
    res = ic.validate_images(f"{jfif_fixture_dir}/images").to_pandas()
    assert len(res) == 240
    assert res["ok"].all(), res[~res["ok"]].head()


def test_pipeline_end_to_end_with_jfif(ray_session, jfif_fixture_dir,
                                       tmp_path):
    out = str(tmp_path / "out")
    res = ic.run_pipeline(f"{jfif_fixture_dir}/images",
                          f"{jfif_fixture_dir}/ref_tiles.parquet", out,
                          n_partitions=4, validate=True)
    assert res["match_rows"] >= 0
    assert res.get("validated_rows", res.get("n_images", 240)) >= 0
