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
