"""Kernel unit tests against independent pure-Python oracles."""

import numpy as np
import pytest

from gtfs_conflation_pipeline_ray.functions import cells, codecs
from gtfs_conflation_pipeline_ray.functions import text as tx
from gtfs_conflation_pipeline_ray.functions.numeric import cents
from gtfs_conflation_pipeline_ray.state.grid_index import GridIndex, _gather_ranges
from tests import oracle


def test_morton_roundtrip_vs_oracle():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 32, size=500, dtype=np.uint64).astype(np.uint32)
    y = rng.integers(0, 1 << 32, size=500, dtype=np.uint64).astype(np.uint32)
    code = cells.morton_encode(x, y)
    for i in range(50):
        assert int(code[i]) == oracle.morton_encode_one(int(x[i]), int(y[i]))
    dx, dy = cells.morton_decode(code.view(np.int64))
    assert (dx == x).all() and (dy == y).all()


def test_morton_edge_values():
    for v in [0, 1, (1 << 64) - 1, 0x5555555555555555, 0xAAAAAAAAAAAAAAAA]:
        x, y = cells.morton_decode(np.array([v], dtype=np.uint64))
        ox, oy = oracle.morton_decode_one(v)
        assert (int(x[0]), int(y[0])) == (ox, oy)


def test_grid_cell_sql_equivalence():
    x = np.array([0, 1023, 1024, 65535])
    y = np.array([0, 1024, 2048, 65535])
    got = cells.grid_cell(x, y, 1024, 64)
    assert got.tolist() == [(yy // 1024) * 64 + (xx // 1024) for xx, yy in zip(x, y)]


def test_cents_matches_sql_floor():
    x = np.array([1.005, -1.005, 0.0, 2.675, 1e6 + 0.004])
    # floor(x*100+0.5) semantics, NOT banker's rounding
    assert cents(x).tolist() == [int(np.floor(v * 100 + 0.5)) for v in x]


def test_gather_ranges_with_empties():
    starts = np.array([5, 0, 9, 3], dtype=np.int64)
    counts = np.array([2, 0, 3, 1], dtype=np.int64)
    assert _gather_ranges(starts, counts).tolist() == [5, 6, 9, 10, 11, 3]
    assert _gather_ranges(np.array([1]), np.array([0])).tolist() == []


def test_grid_index_matches_bruteforce():
    rng = np.random.default_rng(3)
    n = 60
    cx = rng.integers(0, 65536, n)
    cy = rng.integers(0, 65536, n)
    hw = rng.integers(50, 3000, n)
    hh = rng.integers(50, 3000, n)
    idx = GridIndex(np.arange(n), cx - hw, cy - hh, cx + hw, cy + hh)
    px = rng.integers(0, 65536, 500)
    py = rng.integers(0, 65536, 500)
    pi, ti = idx.query_points(px, py)
    got = set(zip(pi.tolist(), ti.tolist()))
    want = {
        (i, j)
        for i in range(500)
        for j in range(n)
        if cx[j] - hw[j] <= px[i] <= cx[j] + hw[j] and cy[j] - hh[j] <= py[i] <= cy[j] + hh[j]
    }
    assert got == want


def test_grid_index_knn_exact():
    rng = np.random.default_rng(4)
    n = 40
    cx = rng.integers(0, 65536, n)
    cy = rng.integers(0, 65536, n)
    idx = GridIndex(np.arange(n), cx, cy, cx, cy)
    qx = rng.integers(0, 65536, 30)
    qy = rng.integers(0, 65536, 30)
    qi, ti, d2 = idx.knn_centroids(qx, qy, 3)
    for q in range(30):
        mine = [(int(d2[j]), int(idx.tile_id[ti[j]])) for j in range(len(qi)) if qi[j] == q]
        want = sorted(((int((qx[q] - cx[j]) ** 2 + (qy[q] - cy[j]) ** 2), j) for j in range(n)))
        assert mine == want[:3]


def test_rect_overlap_pairs():
    # two overlapping, one disjoint
    x0 = np.array([0, 5, 100])
    y0 = np.array([0, 5, 100])
    x1 = np.array([10, 15, 110])
    y1 = np.array([10, 15, 110])
    idx = GridIndex(np.arange(3), x0, y0, x1, y1, world=200, bucket_size=16)
    qi, ti = idx.query_rects(x0, y0, x1, y1)
    pairs = {(int(a), int(b)) for a, b in zip(qi, ti) if a < b}
    assert pairs == {(0, 1)}


@pytest.mark.parametrize("fmt", ["bmp", "png", "jpeg"])
@pytest.mark.parametrize("wh", [(1, 1), (5, 3), (32, 48), (33, 7)])
def test_codec_roundtrip(fmt, wh):
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(wh[1], wh[0], 3), dtype=np.uint8)
    buf = codecs.encode(img, fmt)
    out = codecs.decode(buf, fmt)
    assert out.shape == img.shape
    if fmt in codecs.LOSSLESS:
        assert (out == img).all()
    else:
        assert codecs.psnr(img, out) >= 40.0


def test_codec_determinism():
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    for fmt in ["bmp", "png", "jpeg"]:
        assert codecs.encode(img, fmt) == codecs.encode(img, fmt)


def test_minhash_jaccard_estimate():
    a, b = tx.minhash_params(128)
    s1 = tx.shingle_hashes("the quick brown fox jumps over the lazy dog " * 5)
    s2 = tx.shingle_hashes("the quick brown fox jumps over the lazy cat " * 5)
    sig1 = tx.minhash_signature(s1, a, b)
    sig2 = tx.minhash_signature(s2, a, b)
    est = (sig1 == sig2).mean()
    u = np.union1d(s1, s2)
    true_j = len(np.intersect1d(s1, s2)) / len(u)
    assert abs(est - true_j) < 0.2
    # identical text -> identical signature
    assert (tx.minhash_signature(s1, a, b) == sig1).all()


def test_simhash_similar_texts_close():
    h1 = tx.simhash64(tx.word_hashes("ray data streaming execution engine for arrow batches"))
    h2 = tx.simhash64(tx.word_hashes("ray data streaming execution engine for arrow tables"))
    h3 = tx.simhash64(tx.word_hashes("completely different words about cooking pasta tonight"))
    d12 = bin(int(h1) ^ int(h2)).count("1")
    d13 = bin(int(h1) ^ int(h3)).count("1")
    assert d12 < d13


def test_lang_id_basics():
    preds = tx.lang_id([
        "the cat and the dog are in the house",
        "der Hund und die Katze sind in dem Haus",
        "le chat est dans la maison avec le chien",
        "el perro y el gato en la casa para todos",
        "这是一个中文句子关于引擎",
        "",
    ])
    assert list(preds[:5]) == ["en", "de", "fr", "es", "zh"]
    assert preds[5] == "und"


def test_sharded_candidate_join_matches_unsharded(ray_session):
    """The sharded reference-side join (worker-memory-bounded regime) must
    produce exactly the unsharded join's rows."""
    import numpy as np
    import pandas as pd
    import ray

    from gtfs_conflation_pipeline_ray.pipelines import conflation
    from gtfs_conflation_pipeline_ray.sources import testdata as td
    from gtfs_conflation_pipeline_ray.stages import spatial

    sf = "/root/testdata/sf0.001"
    tiles = td.tiles_table(sf)
    pts = conflation.read_points(sf)
    base = spatial.candidate_join(pts, ray.put(tiles), "px", "py", ["point_id"])
    shards = [(lo, hi, ray.put(t)) for lo, hi, t in spatial.shard_tiles(tiles, 4)]
    shard = spatial.sharded_candidate_join(
        conflation.read_points(sf), shards, "px", "py", ["point_id"])

    def canon(ds):
        df = ds.to_pandas()[["point_id", "tile_id", "ref_id", "level"]]
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(base), canon(shard))
    # boundary tiles are replicated, so shard tile counts exceed the total
    assert sum(t.num_rows for _, _, t in spatial.shard_tiles(tiles, 4)) >= tiles.num_rows


def test_point_in_polygon_vs_bruteforce(ray_session):
    """Hexagon crossing-parity probe vs a per-pair brute-force evaluation of
    the same integer predicate over ALL (point, tile) pairs (no index)."""
    import pyarrow as pa

    from gtfs_conflation_pipeline_ray.stages import spatial as sp

    ray = ray_session
    rng = np.random.default_rng(11)
    n_t, n_p = 40, 400
    cx = rng.integers(500, 6000, n_t)
    cy = rng.integers(500, 6000, n_t)
    hw = rng.integers(40, 900, n_t)
    hh = rng.integers(40, 900, n_t)
    tiles = pa.table({
        "tile_id": np.arange(n_t, dtype=np.int64),
        "ref_id": [f"T{i}" for i in range(n_t)],
        "level": np.zeros(n_t, dtype=np.int64),
        "cx": cx.astype(np.int64), "cy": cy.astype(np.int64),
        "hw": hw.astype(np.int64), "hh": hh.astype(np.int64),
    })
    px = rng.integers(0, 7000, n_p).astype(np.int64)
    py = rng.integers(0, 7000, n_p).astype(np.int64)
    # plant exact-boundary probes: hexagon vertices and edge midpoints
    px[:n_t] = (cx + hw).astype(np.int64); py[:n_t] = cy.astype(np.int64)
    px[n_t:2*n_t] = (cx + hw // 2).astype(np.int64); py[n_t:2*n_t] = (cy + hh).astype(np.int64)
    pts = pa.table({"point_id": np.arange(n_p, dtype=np.int64), "px": px, "py": py})

    got = sp.point_in_polygon_join(
        ray.data.from_arrow(pts), ray.put(tiles), "px", "py", ["point_id"]
    ).to_pandas()
    got_pairs = set(zip(got["point_id"], got["tile_id"]))

    h2 = hw // 2
    vx = np.stack([cx + hw, cx + h2, cx - h2, cx - hw, cx - h2, cx + h2]).astype(np.int64)
    vy = np.stack([cy, cy + hh, cy + hh, cy, cy - hh, cy - hh]).astype(np.int64)
    expect = set()
    for p in range(n_p):
        for t in range(n_t):
            k = 0
            for e in range(6):
                x1, y1 = int(vx[e][t]), int(vy[e][t])
                x2, y2 = int(vx[(e + 1) % 6][t]), int(vy[(e + 1) % 6][t])
                if (y1 > py[p]) != (y2 > py[p]):
                    tt = (int(px[p]) - x1) * (y2 - y1) - (int(py[p]) - y1) * (x2 - x1)
                    if (y2 > y1 and tt < 0) or (y2 < y1 and tt > 0):
                        k += 1
            if k % 2 == 1:
                expect.add((p, t))
    assert got_pairs == expect
    assert len(expect) > 50  # sanity: the fixture genuinely overlaps


def test_repetition_stats_vs_bruteforce(ray_session):
    """textops.repetition_stats (whole-batch pandas groupby counting) must
    equal a per-doc Counter brute force, including the empty / one-word /
    all-same-word / punctuation-only edge cases."""
    import re
    from collections import Counter

    import numpy as np
    import ray

    from gtfs_conflation_pipeline_ray.stages import textops

    docs = [
        "",                              # no words at all
        "solo",                          # single word, no bigrams
        "a a a a a",                     # one word repeated
        "a b a b a b",                   # repeated bigram
        "The quick brown fox: THE fox!", # case folding + punctuation
        "... !!! ???",                   # punctuation only
        "x1 y_2 x1 y_2 x1",              # \w covers digits/underscore
    ]
    ds = ray.data.from_items([{"doc_id": i, "text": t} for i, t in enumerate(docs)])
    got = textops.repetition_stats(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)

    word_re = re.compile(r"\w+", re.ASCII)
    for i, t in enumerate(docs):
        ws = word_re.findall(t.lower())
        bigs = list(zip(ws[:-1], ws[1:]))
        wc, bc = Counter(ws), Counter(bigs)
        row = got.iloc[i]
        assert row["n_words"] == len(ws)
        assert row["n_distinct_words"] == len(wc)
        assert row["top_word_n"] == (max(wc.values()) if wc else 0)
        assert row["top_bigram_n"] == (max(bc.values()) if bc else 0)
        assert row["dup_word_ratio"] == (len(ws) - len(wc)) / max(len(ws), 1)
        assert row["top_bigram_ratio"] == (max(bc.values()) if bc else 0) / max(len(bigs), 1)
    assert got["n_words"].dtype == np.int64 and got["top_bigram_n"].dtype == np.int64
