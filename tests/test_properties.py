"""Hypothesis property tests for the pure integer kernels — random-input
invariants that complement the fixed-fixture brute-force oracles (SURVEY §5:
the reference's invariant-assertion test style, generalized)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gtfs_conflation_pipeline_ray.functions import media
from gtfs_conflation_pipeline_ray.functions.cells import morton_decode, morton_encode
from gtfs_conflation_pipeline_ray.functions.text import fnv1a64_batch
from gtfs_conflation_pipeline_ray.stages.segments import rdp_keep_int, seg_len_c

coords = st.lists(st.integers(0, 65535), min_size=1, max_size=64)


@given(coords, coords)
@settings(max_examples=200, deadline=None)
def test_morton_roundtrip_property(xs, ys):
    n = min(len(xs), len(ys))
    x = np.asarray(xs[:n], dtype=np.uint64)
    y = np.asarray(ys[:n], dtype=np.uint64)
    code = morton_encode(x, y)
    rx, ry = morton_decode(code)
    assert np.array_equal(rx.astype(np.uint64), x)
    assert np.array_equal(ry.astype(np.uint64), y)
    # locality: equal high bits of code => nearby cells share prefixes
    assert code.dtype == np.uint64


@given(st.lists(st.text(max_size=40), min_size=1, max_size=32))
@settings(max_examples=100, deadline=None)
def test_fnv_batch_matches_scalar_definition(strs):
    got = fnv1a64_batch(strs)
    for s, h in zip(strs, got):
        ref = np.uint64(0xCBF29CE484222325)
        for b in s.encode("utf-8"):
            ref = np.uint64((int(ref) ^ b) * 0x100000001B3 % (1 << 64))
        assert np.uint64(h) == ref


@given(st.lists(st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
                min_size=2, max_size=40),
       st.integers(0, 100))
@settings(max_examples=100, deadline=None)
def test_rdp_keeps_endpoints_and_is_idempotent(pts, tol):
    xyi = np.asarray(pts, dtype=np.int64)
    keep = rdp_keep_int(xyi, tol * tol)
    assert keep[0] and keep[-1]
    # simplifying an already-simplified line changes nothing
    simp = xyi[keep]
    keep2 = rdp_keep_int(simp, tol * tol)
    assert keep2.all()


@given(st.lists(st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
                min_size=2, max_size=40))
@settings(max_examples=100, deadline=None)
def test_seg_len_reverse_and_translate_invariant(pts):
    xyi = np.asarray(pts, dtype=np.int64)
    lens = seg_len_c(xyi)
    assert np.array_equal(lens[::-1], seg_len_c(xyi[::-1]))
    assert np.array_equal(lens, seg_len_c(xyi + np.array([7, -3])))
    assert (lens >= 0).all()


@given(st.integers(1, 4000), st.integers(0, 2**15 - 1), st.integers(2, 15),
       st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_and_qaud_snr_property(n, amp, period, sr):
    t = np.arange(n, dtype=np.int64)
    s = np.where((t // period) % 2 == 0, amp, -amp).astype(np.int16)
    out, sr2 = media.decode_wav(media.encode_wav(s, sr))
    assert sr2 == sr and np.array_equal(out, s)
    if amp >= 820:  # the stub codec's documented guarantee domain (~2% FS)
        q, _ = media.decode_qaud(media.encode_qaud(s, sr))
        assert media.snr_db(s, q) >= 40.0


@given(st.integers(1, 30), st.integers(8, 32), st.integers(8, 24),
       st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_video_seek_decode_property(n_frames, w, h, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n_frames, h, w, 3)).astype(np.uint8)
    buf = media.encode_video(frames)
    assert media.video_info(buf) == (w, h, n_frames, 24)
    k = int(rng.integers(0, n_frames))
    assert np.array_equal(media.decode_frame(buf, k), frames[k])


@given(st.integers(8, 64), st.integers(8, 64), st.integers(0, 2**32 - 1))
@settings(max_examples=50, deadline=None)
def test_ahash_brightness_shift_invariant(w, h, seed):
    """aHash is mean-relative: adding a constant (no clipping) to every pixel
    must not change the hash."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 200, (h, w, 3)).astype(np.uint8)
    assert media.ahash64(img) == media.ahash64(img + np.uint8(40))


# ---- STRtree: random-shape parity with brute force ------------------------
_rects = st.integers(2, 300).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(st.integers(0, 4000), min_size=2 * n, max_size=2 * n),
        st.lists(st.integers(0, 200), min_size=2 * n, max_size=2 * n),
        st.integers(2, 23),  # node_cap, incl. tiny fan-outs
    )
)


@given(_rects, st.lists(st.integers(0, 4200), min_size=8, max_size=8),
       st.integers(1, 9))
@settings(max_examples=60, deadline=None)
def test_strtree_probes_match_bruteforce_property(spec, probes, k):
    from gtfs_conflation_pipeline_ray.state.strtree import STRtree

    n, centers, halves, cap = spec
    cx = np.asarray(centers[:n], dtype=np.int64)
    cy = np.asarray(centers[n:], dtype=np.int64)
    hw = np.asarray(halves[:n], dtype=np.int64)
    hh = np.asarray(halves[n:], dtype=np.int64)
    x0, x1 = cx - hw, cx + hw
    y0, y1 = cy - hh, cy + hh
    tid = np.arange(n, dtype=np.int64)[::-1].copy()  # ids != positions
    tree = STRtree(tid, x0, y0, x1, y1, node_cap=cap)
    px = np.asarray(probes[:4], dtype=np.int64)
    py = np.asarray(probes[4:], dtype=np.int64)
    qi, ti = tree.query_points(px, py)
    m = (px[:, None] >= x0) & (px[:, None] <= x1) & \
        (py[:, None] >= y0) & (py[:, None] <= y1)
    bq, bt = np.nonzero(m)
    assert set(zip(qi.tolist(), tid[ti].tolist())) == \
        set(zip(bq.tolist(), tid[bt].tolist()))
    # exact kNN with (d2, tile_id) total order
    kq, kt, kd = tree.knn_centroids(px, py, k)
    kk = min(k, n)
    for q in range(len(px)):
        d2 = (int(px[q]) - cx) ** 2 + (int(py[q]) - cy) ** 2
        order = np.lexsort((tid, d2))[:kk]
        sl = slice(q * kk, (q + 1) * kk)
        assert np.array_equal(kd[sl], d2[order])
        assert np.array_equal(tid[kt[sl]], tid[order])
    # tiny candidate budget forces span-scale rounds into pending slices
    # (the bounded-memory path) — results must not change
    cq, ct, cd = tree.knn_centroids(px, py, k, cand_cap=2)
    assert np.array_equal(cd, kd) and np.array_equal(tid[ct], tid[kt])


# ---- GridIndex pruned kNN: random-shape parity with brute force ------------
@given(_rects, st.lists(st.integers(0, 4200), min_size=8, max_size=8),
       st.integers(1, 9), st.sampled_from([128, 512, 2048]))
@settings(max_examples=60, deadline=None)
def test_grid_knn_pruned_matches_bruteforce_property(spec, probes, k, bs):
    """The box-doubling knn_centroids_pruned (called directly, bypassing the
    small-n brute routing) must equal the exact (d2, tile_id) order for any
    rect/probe/bucket-size shape — incl. clamped out-of-grid centroids and
    duplicate distances."""
    from gtfs_conflation_pipeline_ray.state.grid_index import GridIndex

    n, centers, halves, _cap = spec
    cx = np.asarray(centers[:n], dtype=np.int64)
    cy = np.asarray(centers[n:], dtype=np.int64)
    hw = np.asarray(halves[:n], dtype=np.int64)
    hh = np.asarray(halves[n:], dtype=np.int64)
    tid = np.arange(n, dtype=np.int64)[::-1].copy()  # ids != positions
    idx = GridIndex(tid, cx - hw, cy - hh, cx + hw, cy + hh,
                    world=65536, bucket_size=bs)
    px = np.asarray(probes[:4], dtype=np.int64)
    py = np.asarray(probes[4:], dtype=np.int64)
    kq, kt, kd = idx.knn_centroids_pruned(px, py, k)
    bq, bt, bd = idx._knn_brute(px, py, k)
    assert np.array_equal(kq, bq)
    assert np.array_equal(kt, bt)
    assert np.array_equal(kd, bd)
    # tiny cell budget forces the per-round pending slicing (the bounded-
    # memory path for the sparse/far-probe regime) — results must not change
    cq, ct, cd = idx.knn_centroids_pruned(px, py, k, cell_cap=2)
    assert np.array_equal(ct, bt) and np.array_equal(cd, bd)
