"""Multimodal audio/video layer: codecs (functions/media.py), actor-pool
stages (stages/media.py), and fixtures — brute-force cross-checks throughout.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gtfs_conflation_pipeline_ray.functions import media as M
from gtfs_conflation_pipeline_ray.sources import fixtures as fx


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------

def test_wav_roundtrip_exact():
    rng = np.random.default_rng(1)
    for n in (1, 17, 5000):
        s = rng.integers(-32768, 32768, n).astype(np.int16)
        out, sr = M.decode_wav(M.encode_wav(s, 22050))
        assert sr == 22050
        assert np.array_equal(out, s)


def test_wav_rejects_non_wav_and_variants():
    with pytest.raises(ValueError):
        M.decode_wav(b"RIFFxxxxJUNK")
    with pytest.raises(ValueError):
        M.decode_wav(b"not a wav at all")


def test_qaud_stub_is_lossy_but_above_40db():
    rng = np.random.default_rng(2)
    s = rng.integers(-30000, 30000, 8000).astype(np.int16)
    out, sr = M.decode_qaud(M.encode_qaud(s, 16000))
    assert sr == 16000 and len(out) == len(s)
    assert not np.array_equal(out, s)  # honest lossiness
    assert M.snr_db(s, out) >= 40.0


def test_unknown_audio_fmt_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        M.encode_audio(np.zeros(4, np.int16), 8000, "mp3")
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"xxxx", "opus")


def test_video_container_seek_equals_full_decode():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (11, 18, 26, 3)).astype(np.uint8)
    buf = M.encode_video(frames, fps=30)
    assert M.video_info(buf) == (26, 18, 11, 30)
    full = M.decode_video(buf)
    assert np.array_equal(full, frames)
    for k in (0, 5, 10):
        assert np.array_equal(M.decode_frame(buf, k), frames[k])
    with pytest.raises(IndexError):
        M.decode_frame(buf, 11)


def _ahash_naive(img: np.ndarray) -> int:
    """Reference aHash: float block means, same strict-> predicate."""
    h, w, _ = img.shape
    gray = img.astype(np.float64).sum(axis=2)
    mean = gray.mean()
    bits = 0
    for r in range(8):
        for c in range(8):
            r0, r1 = r * h // 8, (r + 1) * h // 8
            c0, c1 = c * w // 8, (c + 1) * w // 8
            cell = gray[r0:r1, c0:c1].mean()
            bits = (bits << 1) | int(cell > mean)
    return bits if bits < 1 << 63 else bits - (1 << 64)


def test_ahash_matches_naive_reference():
    rng = np.random.default_rng(4)
    for h, w in [(8, 8), (18, 26), (33, 64), (12, 16)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        assert M.ahash64(img) == _ahash_naive(img)


def test_ahash_robust_to_stub_lossy_reencode():
    from gtfs_conflation_pipeline_ray.functions import codecs

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    rt = codecs.decode(codecs.encode(img, "jpeg"), "jpeg")
    a, b = np.uint64(M.ahash64(img)), np.uint64(M.ahash64(rt))
    assert bin(int(a ^ b)).count("1") <= 3  # near-dup under Hamming


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def test_audio_features_stage_vs_bruteforce(ray_session):
    from gtfs_conflation_pipeline_ray.stages import media as ms

    ray = ray_session
    tab = fx.audio_table(60)
    ds = ray.data.from_arrow(tab)
    got = ms.audio_features(ds, batch_size=16).to_pandas().sort_values(
        "audio_id").reset_index(drop=True)
    assert got["ok"].all()
    for i in range(len(tab)):
        s, sr = M.decode_audio(tab["bytes"][i].as_py(), tab["fmt"][i].as_py())
        row = got.iloc[i]
        assert row["sr"] == sr and row["n_samples"] == len(s)
        s64 = s.astype(np.int64)
        assert row["peak"] == np.max(np.abs(s64))
        assert row["sum_sq"] == np.sum(s64 * s64)
        assert row["n_zero_cross"] == np.count_nonzero(s64[1:] * s64[:-1] < 0)


def test_audio_features_quarantines_poison_rows(ray_session):
    from gtfs_conflation_pipeline_ray.stages import media as ms

    ray = ray_session
    tab = pa.table(
        {
            "audio_id": pa.array([0, 1], type=pa.int64()),
            "bytes": pa.array([M.encode_wav(np.zeros(8, np.int16), 8000),
                               b"corrupt"], type=pa.binary()),
            "fmt": pa.array(["wav", "wav"], type=pa.string()),
        }
    )
    got = ms.audio_features(ray.data.from_arrow(tab)).to_pandas().sort_values(
        "audio_id")
    assert got["ok"].tolist() == [True, False]
    assert "ValueError" in got["err"].iloc[1]


def test_resample_audio_shards(ray_session, tmp_path):
    from gtfs_conflation_pipeline_ray.stages import media as ms

    tab = fx.audio_table(30)
    src = tmp_path / "audio"
    src.mkdir()
    pq.write_table(tab.slice(0, 15), f"{src}/part-0.parquet", row_group_size=8)
    pq.write_table(tab.slice(15, 15), f"{src}/part-1.parquet", row_group_size=8)
    out = tmp_path / "resampled"
    receipts = ms.resample_audio_shards(
        sorted(str(p) for p in src.glob("*.parquet")), 16000, str(out)
    ).to_pandas()
    assert receipts["rows"].sum() == 30
    got = pq.read_table(str(out)).to_pandas().sort_values("audio_id")
    assert len(got) == 30 and (got["fmt"] == "wav").all()
    for _, row in got.iterrows():
        s, sr = M.decode_wav(row["bytes"])
        assert sr == 16000 and len(s) == row["n_samples_out"]
        # length follows the integer resample-grid formula
        orig_sr = int(tab["sr"][int(row["audio_id"])].as_py())
        orig_n = int(tab["n_samples"][int(row["audio_id"])].as_py())
        assert len(s) == max(1, (orig_n * 16000) // orig_sr)


def test_sample_frames_stage_vs_bruteforce(ray_session):
    from gtfs_conflation_pipeline_ray.stages import media as ms

    ray = ray_session
    tab = fx.videos_table(25)
    got = ms.sample_frames(ray.data.from_arrow(tab), every_n=4,
                           batch_size=8).to_pandas()
    got = got.sort_values(["video_id", "frame_idx"]).reset_index(drop=True)
    expect_rows = []
    for i in range(len(tab)):
        buf = tab["bytes"][i].as_py()
        _w, _h, n, _fps = M.video_info(buf)
        for k in range(0, n, 4):
            f = M.decode_frame(buf, k).astype(np.int64)
            expect_rows.append(
                (i, k, f[:, :, 0].sum(), f[:, :, 1].sum(), f[:, :, 2].sum(),
                 M.ahash64(M.decode_frame(buf, k)))
            )
    assert len(got) == len(expect_rows)
    for row, exp in zip(got.itertuples(index=False), expect_rows):
        assert (row.video_id, row.frame_idx, row.sum_r, row.sum_g, row.sum_b,
                row.ahash) == exp


def test_sample_frames_empty_batch_typed():
    """The batch fn must return a TYPED empty table for an empty batch (the
    schema-union guard for streamed executions whose blocks can be empty) —
    at dataset level Ray may skip invoking the UDF on empty blocks entirely."""
    from gtfs_conflation_pipeline_ray.stages.media import FrameSampler

    empty = pa.table(
        {"video_id": pa.array([], type=pa.int64()),
         "bytes": pa.array([], type=pa.binary())}
    )
    out = FrameSampler(every_n=2)(empty)
    assert out.num_rows == 0
    assert set(out.schema.names) == {"video_id", "frame_idx", "w", "h",
                                     "sum_r", "sum_g", "sum_b", "ahash"}
    assert out.schema.field("ahash").type == pa.int64()


def test_video_keyframe_neardup_finds_planted_pair(ray_session):
    from gtfs_conflation_pipeline_ray.stages import media as ms

    ray = ray_session
    rng = np.random.default_rng(6)
    # two videos sharing an identical frame 0; a third with distinct frames
    shared = rng.integers(0, 256, (10, 16, 3)).astype(np.uint8)
    vids = []
    for v in range(3):
        frames = rng.integers(0, 256, (4, 10, 16, 3)).astype(np.uint8)
        if v < 2:
            frames[0] = shared
        vids.append(M.encode_video(frames))
    tab = pa.table(
        {"video_id": pa.array([0, 1, 2], type=pa.int64()),
         "bytes": pa.array(vids, type=pa.binary())}
    )
    pairs = ms.video_keyframe_neardup(ray.data.from_arrow(tab), every_n=1,
                                      max_hamming=0).to_pandas()
    k0, k1 = 0 << 20 | 0, 1 << 20 | 0
    assert ((pairs.iloc[:, 0] == min(k0, k1)) & (pairs.iloc[:, 1] == max(k0, k1))).any()


def test_fixture_tables_deterministic():
    a1, a2 = fx.audio_table(12), fx.audio_table(12)
    assert a1.equals(a2)
    v1, v2 = fx.videos_table(9), fx.videos_table(9)
    assert v1.equals(v2)
    # schema is the documented multimodal shape
    assert a1.schema.names == ["audio_id", "bytes", "sr", "n_samples", "fmt",
                               "transcript"]
    assert v1.schema.names == ["video_id", "bytes", "n_frames", "w", "h",
                               "fps", "fmt", "caption"]


def test_image_features_vs_bruteforce(ray_session):
    from gtfs_conflation_pipeline_ray.stages import media as ms

    ray = ray_session
    tab = fx.images_table(45)  # cycles bmp/png/jpeg
    got = ms.image_features(
        ray.data.from_arrow(tab.select(["image_id", "bytes", "fmt"])),
        batch_size=16).to_pandas().sort_values("image_id").reset_index(drop=True)
    assert got["ok"].all()
    from gtfs_conflation_pipeline_ray.functions import codecs

    for i in range(len(tab)):
        img = codecs.decode(tab["bytes"][i].as_py(), tab["fmt"][i].as_py())
        row = got.iloc[i]
        assert (row["h"], row["w"]) == img.shape[:2]
        s = img.astype(np.int64).sum(axis=(0, 1))
        assert (row["sum_r"], row["sum_g"], row["sum_b"]) == tuple(s)
        assert row["ahash"] == M.ahash64(img)


def test_area_resize_exact_means():
    from gtfs_conflation_pipeline_ray.stages.media import _area_resize

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (24, 36, 3)).astype(np.uint8)
    out = _area_resize(img, 12, 8)
    assert out.shape == (8, 12, 3)
    # each output pixel is the rounded mean of its exact source box
    for r in (0, 3, 7):
        for c in (0, 5, 11):
            r0, r1 = r * 24 // 8, (r + 1) * 24 // 8
            c0, c1 = c * 36 // 12, (c + 1) * 36 // 12
            for ch in range(3):
                box = img[r0:r1, c0:c1, ch].astype(np.int64)
                exp = (box.sum() + box.size // 2) // box.size
                assert out[r, c, ch] == exp
    # identity resize is exact
    assert np.array_equal(_area_resize(img, 36, 24), img)


def test_resize_images_shards(ray_session, tmp_path):
    from gtfs_conflation_pipeline_ray.functions import codecs
    from gtfs_conflation_pipeline_ray.stages import media as ms

    tab = fx.images_table(20)
    src = tmp_path / "imgs"
    src.mkdir()
    pq.write_table(tab, f"{src}/part-0.parquet", row_group_size=8)
    out = tmp_path / "resized"
    receipts = ms.resize_images_shards(
        [f"{src}/part-0.parquet"], 16, 12, str(out)).to_pandas()
    assert receipts["rows"].sum() == 20
    res = pq.read_table(str(out)).to_pandas()
    assert (res["fmt"] == "png").all() and (res["w"] == 16).all()
    for _, row in res.iterrows():
        img = codecs.decode(row["bytes"], "png")
        assert img.shape == (12, 16, 3)
