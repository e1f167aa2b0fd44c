"""End-to-end tests for the engine-native image pipeline: oracle parity,
per-row payload invariant (PSNR/caption), determinism, resume."""

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from gtfs_conflation_pipeline_ray.functions import codecs
from gtfs_conflation_pipeline_ray.pipelines import image_conflation as ic
from gtfs_conflation_pipeline_ray.sources import fixtures
from tests import oracle


def _run(ray, fixture_dir, out_dir, **kw):
    return ic.run_pipeline(
        f"{fixture_dir}/images", f"{fixture_dir}/ref_tiles.parquet", out_dir, **kw
    )


def _read_matches(out_dir):
    import glob

    files = sorted(glob.glob(f"{out_dir}/matches/part-*/*.parquet"))
    tabs = [pq.read_table(f) for f in files if pq.ParquetFile(f).metadata.num_rows > 0]
    import pyarrow as pa

    t = pa.concat_tables(tabs)
    df = t.to_pandas().sort_values(["image_id", "tile_id"]).reset_index(drop=True)
    return df


def test_pipeline_matches_oracle(ray_session, fixture_dir, tmp_path):
    out = str(tmp_path / "out")
    res = _run(ray_session, fixture_dir, out)
    got = _read_matches(out)

    imgs = pq.read_table(f"{fixture_dir}/images", columns=["image_id", "phash"]).to_pylist()
    tiles = pq.read_table(f"{fixture_dir}/ref_tiles.parquet").to_pylist()
    want = oracle.brute_force_matches(imgs, tiles, ic.CELL_BITS)

    assert len(got) == len(want) == res["match_rows"]
    for col in ["image_id", "tile_id", "ref_id", "dist2", "is_best"]:
        assert got[col].tolist() == [w[col] for w in want], f"col {col} mismatch"
    # cell ids match the independent bit-loop oracle
    assert got["cell_id"].tolist() == [w["cell_id"] for w in want]


def test_payload_invariant(ray_session, fixture_dir):
    """BASELINE per-row invariant: decoded pixels match the oracle decode
    (exact for lossless, PSNR>=40 dB for lossy) + caption equality."""
    t = pq.read_table(f"{fixture_dir}/images")
    n = t.num_rows
    regen = fixtures.images_table(300)  # deterministic regeneration = oracle
    assert regen["caption"].to_pylist() == t["caption"].to_pylist()
    for i in range(n):
        fmt = t["fmt"][i].as_py()
        dec = codecs.decode(t["bytes"][i].as_py(), fmt)
        ref = codecs.decode(regen["bytes"][i].as_py(), fmt)
        assert dec.shape == ref.shape
        if fmt in codecs.LOSSLESS:
            assert (dec == ref).all()
        else:
            assert codecs.psnr(dec, ref) >= 40.0


def test_validator_stage(ray_session, fixture_dir):
    res = ic.validate_images(f"{fixture_dir}/images").to_pandas()
    assert len(res) == 300
    assert res["ok"].all(), res[~res["ok"]].head()


def test_determinism(ray_session, fixture_dir, tmp_path):
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    _run(ray_session, fixture_dir, out1)
    _run(ray_session, fixture_dir, out2)
    a, b = _read_matches(out1), _read_matches(out2)
    assert a.equals(b)


def test_strtree_backend_parity(ray_session, fixture_dir, tmp_path):
    # the packed STR R-tree matcher backend produces the exact same matches
    out_g, out_s = str(tmp_path / "grid"), str(tmp_path / "str")
    _run(ray_session, fixture_dir, out_g)
    _run(ray_session, fixture_dir, out_s, index_backend="strtree")
    assert _read_matches(out_g).equals(_read_matches(out_s))


def test_resume_skips_completed_and_is_identical(ray_session, fixture_dir, tmp_path):
    out_full = str(tmp_path / "full")
    _run(ray_session, fixture_dir, out_full)

    out_resume = str(tmp_path / "resume")
    # simulate a killed run: run everything, then delete two partitions AND
    # their manifest entries; also leave a stale uncommitted dir behind
    _run(ray_session, fixture_dir, out_resume)
    man_path = f"{out_resume}/matches/_manifest.json"
    man = json.load(open(man_path))
    killed = sorted(man["partitions"])[2:4]
    for k in killed:
        shutil.rmtree(f"{out_resume}/matches/part-{k}")
        del man["partitions"][k]
    os.makedirs(f"{out_resume}/matches/.tmp-stale-123", exist_ok=True)
    json.dump(man, open(man_path, "w"))

    res = _run(ray_session, fixture_dir, out_resume)
    skipped = {k for k, _, s in res["partitions"] if s}
    assert skipped == set(man["partitions"]) - set()  # all pre-existing skipped
    assert all(k in {p[0] for p in res["partitions"]} for k in killed)
    assert _read_matches(out_full).equals(_read_matches(out_resume))


def test_bytes_never_in_spatial_path(ray_session, fixture_dir):
    """The spatial read must prune the binary column (SURVEY §7.6-5)."""
    ds = ic.read_images_meta(f"{fixture_dir}/images")
    assert set(ds.schema().names) == {"image_id", "phash"}


def test_phash_partition_pruning(ray_session, fixture_dir):
    from gtfs_conflation_pipeline_ray.state.checkpoint import phash_partitions

    parts = phash_partitions(8)
    total = 0
    for _, lo, hi in parts:
        total += ic.read_images_meta(f"{fixture_dir}/images", (lo, hi)).count()
    assert total == 300  # partitions tile the key space exactly once


def test_featurize_images_layer(ray_session, fixture_dir, tmp_path):
    """Feature layer: one row per image, exact sums vs direct decode."""
    import numpy as np
    import pyarrow.parquet as pq

    from gtfs_conflation_pipeline_ray.functions import codecs
    from gtfs_conflation_pipeline_ray.functions.media import ahash64
    from gtfs_conflation_pipeline_ray.pipelines.image_conflation import featurize_images

    got = featurize_images(f"{fixture_dir}/images").to_pandas()
    assert len(got) == 300 and got["ok"].all()
    got = got.set_index("image_id")
    import glob

    checked = 0
    for f in sorted(glob.glob(f"{fixture_dir}/images/*.parquet"))[:1]:
        tab = pq.read_table(f, columns=["image_id", "bytes", "fmt"])
        for i in range(0, tab.num_rows, 17):
            img = codecs.decode(tab["bytes"][i].as_py(), tab["fmt"][i].as_py())
            row = got.loc[tab["image_id"][i].as_py()]
            s = img.astype(np.int64).sum(axis=(0, 1))
            assert (row["sum_r"], row["sum_g"], row["sum_b"]) == tuple(s)
            assert row["ahash"] == ahash64(img)
            checked += 1
    assert checked >= 5
