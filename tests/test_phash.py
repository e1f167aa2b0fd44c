"""phash Hamming near-dup: popcount bit-identity, pigeonhole-exact recall of
the banded operator vs a brute-force all-pairs scan, planted-pair retrieval."""

import numpy as np
import pandas as pd
import ray

from gtfs_conflation_pipeline_ray.stages.dedup import phash_neardup_pairs, popcount64


def test_popcount64_matches_python():
    rng = np.random.default_rng(11)
    x = rng.integers(0, 2**63, 10_000, dtype=np.int64).view(np.uint64)
    x[:4] = [0, 1, 2**64 - 1, 2**63]
    got = popcount64(x)
    exp = np.fromiter((bin(int(v)).count("1") for v in x), np.int64, len(x))
    assert (got == exp).all()


def _brute_pairs(ids: np.ndarray, ph: np.ndarray, max_h: int) -> set:
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = bin(int(ph[i]) ^ int(ph[j])).count("1")
            if h <= max_h:
                a, b = sorted((int(ids[i]), int(ids[j])))
                out.add((a, b, h))
    return out


def test_phash_neardup_pigeonhole_exact(ray_session):
    """max_hamming=3 with 4 x 16-bit bands: <=3 flipped bits can't touch all
    4 bands, so the banded operator's pair set must EQUAL brute force."""
    rng = np.random.default_rng(5)
    n = 400
    ph = rng.integers(0, 2**63, n, dtype=np.int64).view(np.uint64)
    # plant near-dups: copies of the first 40 hashes with <=3 bits flipped
    for k in range(40):
        nbits = k % 4  # 0..3 flips
        m = np.uint64(0)
        for t in range(nbits):
            m |= np.uint64(1) << np.uint64((k * 13 + t * 17) % 64)
        ph[n - 40 + k] = ph[k] ^ m
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids, "phash": ph.view(np.int64)})
    ds = ray.data.from_pandas(df).repartition(8)
    out = phash_neardup_pairs(ds, phash_col="phash", id_col="doc_id",
                              max_hamming=3).to_pandas()
    got = set(zip(out.doc_a.astype(int), out.doc_b.astype(int),
                  out.hamming.astype(int)))
    exp = _brute_pairs(ids, ph, 3)
    assert got == exp
    assert len(exp) >= 30  # the planted copies are actually in the answer


def test_neardup_images_matches_brute_force(ray_session, fixture_dir, tmp_path):
    """Pipeline wrapper over the image fixture (string image_id, real phash
    column, column-pruned read): band-candidate + verify == brute force.
    The raw fixture has no pairs within hamming 3 (Morton codes of random
    coords), so plant bit-flipped copies of the first rows first."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from gtfs_conflation_pipeline_ray.pipelines.image_conflation import neardup_images

    images = str(tmp_path / "images")
    shutil.copytree(f"{fixture_dir}/images", images)
    base = pq.read_table(images).slice(0, 12)
    ph = base["phash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    flips = np.array([(np.uint64(1) << np.uint64((3 * k) % 32))
                      | (np.uint64(1) << np.uint64((5 * k + 7) % 32))
                      for k in range(12)], dtype=np.uint64)
    planted = base.set_column(
        base.schema.get_field_index("phash"), "phash",
        pa.array((ph ^ flips).view(np.int64)))
    planted = planted.set_column(
        base.schema.get_field_index("image_id"), "image_id",
        pa.array([f"dup-{i:04d}" for i in range(12)]))
    pq.write_table(planted, f"{images}/part-dups.parquet")

    t = pq.read_table(images, columns=["image_id", "phash"])
    ids = np.asarray(t["image_id"].to_pylist())
    ph = t["phash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    x = ph[:, None] ^ ph[None, :]
    ham = popcount64(x.ravel()).reshape(x.shape)
    ii, jj = np.triu_indices(len(ids), k=1)
    ok = ham[ii, jj] <= 3
    exp = set()
    for i, j, h in zip(ii[ok], jj[ok], ham[ii[ok], jj[ok]]):
        a, b = sorted((ids[i], ids[j]))
        exp.add((a, b, int(h)))
    assert len(exp) >= 12  # the planted copies qualify

    out = neardup_images(images).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"], out["hamming"].astype(int)))
    assert got == exp


def test_pipeline_neardup_stage(ray_session, fixture_dir, tmp_path):
    """run_pipeline(neardup=True) writes the pair report + metric."""
    import glob

    from gtfs_conflation_pipeline_ray.pipelines import image_conflation as ic

    out = str(tmp_path / "out")
    m = ic.run_pipeline(f"{fixture_dir}/images", f"{fixture_dir}/ref_tiles.parquet",
                        out, n_partitions=2, neardup=True)
    assert m["neardup_pairs"] == 0  # raw fixture has no pairs within h<=3
    # a 0-pair report writes no files; the metric still records the stage ran
    assert glob.glob(f"{out}/matches/part-*")
