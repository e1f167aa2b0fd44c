"""Deterministic fixture generator for the engine's NATIVE input shape
(BASELINE.json input_hint): a table of image + caption pairs

    (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
     caption:string, phash:int64)

plus the reference-side ``ref_tiles`` table for the candidate spatial join
(≙ the reference's conflation map, FIXTURES.md F1/F2). All generation is
seeded (seed=42) and scale-parameterized; no external data.

The ``phash`` column is the Morton bit-interleave of the image's synthetic
(x, y) tile-grid coordinate — the exact inverse of the reference's
geo-proximity key interleave (``/root/reference/src/utils/getGeoProximityKey.js:8-26``)
— so ``cells.morton_decode(phash) == (x, y)`` exactly.

Skew/edge cases (FIXTURES.md F1): 1% of rows share one hot cell region to
exercise salting; ~0.5% carry edge cases (1x1 images, empty caption), plus
phash=0 and all-high-bit phash rows.

Written as parquet via a format shim (Lance is the production format; the
sandbox lacks the `lance` package).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions import codecs
from ..functions.cells import morton_encode

WORLD = 65536  # 2^16 x 2^16 tile-grid coordinate space
SEED = 42
_FMTS = ["png", "jpeg", "bmp"]
_WS = [32, 64, 128]
_HS = [32, 48, 64]
_NOISE_WORDS = ["alpha", "bravo", "delta", "echo", "fox", "golf", "hotel", "india"]


def _synth_image(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Deterministic gradient + seeded noise, uint8 RGB."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int16)
    noise = rng.integers(-16, 17, size=(h, w, 3), dtype=np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def image_coords(n: int, seed: int = SEED) -> tuple[np.ndarray, np.ndarray]:
    """Synthetic (x, y) tile-grid coordinates, with a ~1% hot cell region."""
    rng = np.random.default_rng(seed)
    x = rng.integers(0, WORLD, size=n, dtype=np.int64)
    y = rng.integers(0, WORLD, size=n, dtype=np.int64)
    hot = rng.random(n) < 0.01
    idx = np.arange(n, dtype=np.int64)
    x[hot] = 12345 + (idx[hot] % 7)
    y[hot] = 54321 + (idx[hot] % 5)
    return x, y


def _edge_step(n_total: int) -> int:
    return max(n_total // max(int(n_total * 0.005), 1), 1) if n_total >= 200 else n_total + 1


def images_table_range(lo: int, hi: int, n_total: int, seed: int = SEED,
                       with_bytes: bool = True,
                       jfif_every: int | None = None) -> pa.Table:
    """Rows [lo, hi) of the fixture — shard-stable: every per-row value
    (coords, sizes, caption, pixels) depends only on the row index and seed,
    so any sharding produces identical content (deterministic ids, SURVEY
    §7.6-1). ``jfif_every``: every that-many-th row carries a REAL baseline
    JPEG payload (fmt='jfif', quality 100 — PSNR ~50 dB on this content, so
    the >=40 dB lossy invariant holds) instead of the fmt cycle; None keeps
    the historical bmp/png/QJPG mix (bench continuity)."""
    x, y = image_coords(n_total, seed)
    x, y = x[lo:hi], y[lo:hi]
    ph = morton_encode(x.astype(np.uint64), y.astype(np.uint64)).view(np.int64).copy()
    ids = np.array([f"img{i:08d}" for i in range(lo, hi)], dtype=object)
    ws = np.array([_WS[i % 3] for i in range(lo, hi)], dtype=np.int32)
    hs = np.array([_HS[i % 3] for i in range(lo, hi)], dtype=np.int32)
    fmts = np.array([_FMTS[i % 3] for i in range(lo, hi)], dtype=object)
    caps = np.array(
        [f"synthetic caption {i} {_NOISE_WORDS[(i * 7 + seed) % len(_NOISE_WORDS)]}"
         for i in range(lo, hi)],
        dtype=object,
    )
    step = _edge_step(n_total)
    blobs = [] if with_bytes else None
    for j, i in enumerate(range(lo, hi)):
        if n_total > 10 and i == 7:
            ph[j] = 0
        elif n_total > 10 and i == 9:
            ph[j] = np.int64(-1)
        if i % step == 0:
            ws[j], hs[j] = 1, 1
            caps[j] = ""
        if jfif_every and i % jfif_every == 0 and ws[j] > 1:
            fmts[j] = "jfif"
        if with_bytes:
            rng = np.random.default_rng(seed + 1000 + i)  # per-row seed => shard-stable
            img = _synth_image(rng, int(ws[j]), int(hs[j]))
            if fmts[j] == "jfif":
                blobs.append(codecs.encode_jfif(img, quality=100))
            else:
                blobs.append(codecs.encode(img, str(fmts[j])))
    return pa.table(
        {
            "image_id": pa.array(ids, type=pa.string()),
            "bytes": pa.array(blobs, type=pa.binary()) if with_bytes else pa.nulls(hi - lo, pa.binary()),
            "w": pa.array(ws, type=pa.int32()),
            "h": pa.array(hs, type=pa.int32()),
            "fmt": pa.array(fmts, type=pa.string()),
            "caption": pa.array(caps, type=pa.string()),
            "phash": pa.array(ph, type=pa.int64()),
        }
    )


def images_table(n: int, seed: int = SEED, with_bytes: bool = True,
                 jfif_every: int | None = None) -> pa.Table:
    return images_table_range(0, n, n, seed, with_bytes, jfif_every)


def ref_tiles_table(n_tiles: int, seed: int = SEED) -> pa.Table:
    """Reference-side tile rectangles (FIXTURES.md F2)."""
    rng = np.random.default_rng(seed + 2)
    tid = np.arange(n_tiles, dtype=np.int64)
    cx = rng.integers(0, WORLD, size=n_tiles, dtype=np.int64)
    cy = rng.integers(0, WORLD, size=n_tiles, dtype=np.int64)
    hw = rng.integers(500, 4000, size=n_tiles, dtype=np.int64)
    hh = rng.integers(500, 4000, size=n_tiles, dtype=np.int64)
    return pa.table(
        {
            "tile_id": tid,
            "ref_id": pa.array([f"R{t}" for t in tid], type=pa.string()),
            "level": tid % 8,
            "cx": cx,
            "cy": cy,
            "hw": hw,
            "hh": hh,
            "length_km": (hw + hh).astype(np.float64) / 1000.0,
        }
    )


# ---------------------------------------------------------------------------
# multimodal fixtures: audio + video tables (deterministic, per-row seeded)
# ---------------------------------------------------------------------------

_AUDIO_FMTS = ["wav", "wav", "qaud"]  # mostly-real WAV, 1/3 stub-compressed
_AUDIO_SRS = [8000, 16000, 44100]


def audio_table(n: int, seed: int = SEED) -> pa.Table:
    """(audio_id:int64, bytes:binary, sr:int32, n_samples:int32, fmt:string,
    transcript:string) — square-wave clips; every per-row value depends only
    on (row index, seed) so sharded generation is order-independent."""
    from ..functions import media

    ids = np.arange(n, dtype=np.int64)
    srs = np.array([_AUDIO_SRS[i % 3] for i in range(n)], dtype=np.int32)
    lens = (2000 + (ids * 101) % 6000).astype(np.int32)
    fmts = np.array([_AUDIO_FMTS[i % 3] for i in range(n)], dtype=object)
    blobs = []
    for i in range(n):
        amp = 1000 + (i * 37) % 20000
        period = 2 + i % 14
        t = np.arange(int(lens[i]), dtype=np.int64)
        s = np.where((t // period) % 2 == 0, amp, -amp).astype(np.int16)
        blobs.append(media.encode_audio(s, int(srs[i]), str(fmts[i])))
    return pa.table(
        {
            "audio_id": ids,
            "bytes": pa.array(blobs, type=pa.binary()),
            "sr": srs,
            "n_samples": lens,
            "fmt": pa.array(fmts, type=pa.string()),
            "transcript": pa.array(
                [f"synthetic transcript {i} {_NOISE_WORDS[i % len(_NOISE_WORDS)]}"
                 for i in range(n)],
                type=pa.string(),
            ),
        }
    )


def videos_table(n: int, seed: int = SEED) -> pa.Table:
    """(video_id:int64, bytes:binary, n_frames:int32, w:int32, h:int32,
    fps:int32, fmt:string, caption:string) — QVID clips whose frame ``f`` is
    a solid color + per-row gradient, both closed-form in (video_id, f)."""
    from ..functions import media

    ids = np.arange(n, dtype=np.int64)
    nf = (4 + ids % 28).astype(np.int32)
    ws = (16 + (ids % 4) * 8).astype(np.int32)
    hs = (12 + (ids % 3) * 6).astype(np.int32)
    blobs = []
    for i in range(n):
        frames = np.empty((int(nf[i]), int(hs[i]), int(ws[i]), 3), dtype=np.uint8)
        for f in range(int(nf[i])):
            base = np.array(
                [(i * 7 + f * 13) % 200, (i * 11 + f * 5) % 200, (i * 3 + f * 17) % 200],
                dtype=np.uint8,
            )
            frames[f] = base[None, None, :]
            # horizontal gradient on the red channel (keeps aHash nontrivial)
            frames[f, :, :, 0] += (
                (np.arange(int(ws[i]), dtype=np.int64) * 55 // max(int(ws[i]) - 1, 1))
                .astype(np.uint8)[None, :]
            )
            # per-frame seeded texture: aHash is mean-relative, so without
            # this every solid+gradient frame hashes identically and any
            # near-dup report degenerates to all-pairs
            rng = np.random.default_rng(seed + i * 1009 + f)
            frames[f] += rng.integers(0, 40, frames[f].shape, dtype=np.int64).astype(np.uint8)
        blobs.append(media.encode_video(frames, fps=24))
    return pa.table(
        {
            "video_id": ids,
            "bytes": pa.array(blobs, type=pa.binary()),
            "n_frames": nf,
            "w": ws,
            "h": hs,
            "fps": pa.array(np.full(n, 24, dtype=np.int32)),
            "fmt": pa.array(["qvid"] * n, type=pa.string()),
            "caption": pa.array(
                [f"synthetic clip {i} {_NOISE_WORDS[(i * 5) % len(_NOISE_WORDS)]}"
                 for i in range(n)],
                type=pa.string(),
            ),
        }
    )


def gtfs_feed_zip(path: str, n_shapes: int = 40, pts_per_shape: int = 60,
                  trips_per_shape: int = 2, stops_per_shape: int = 8,
                  seed: int = SEED) -> str:
    """Deterministic synthetic GTFS feed zip (the reference's S1 input shape:
    ``agency routes shapes stops trips stop_times`` members) — seeded
    random-walk shape polylines in a lat/lon box, per-shape stop sequences
    sampled along the shape with jitter, fixed-interval stop_times."""
    import io as _io
    import zipfile

    rng = np.random.default_rng(seed + 7)
    shapes_rows = ["shape_id,shape_pt_lat,shape_pt_lon,shape_pt_sequence"]
    stops_rows = ["stop_id,stop_name,stop_lat,stop_lon"]
    trips_rows = ["route_id,service_id,trip_id,shape_id"]
    st_rows = ["trip_id,arrival_time,departure_time,stop_id,stop_sequence"]
    for s in range(n_shapes):
        lat = 40.0 + rng.random() * 0.9
        lon = -74.5 + rng.random() * 0.9
        pts = []
        for q in range(pts_per_shape):
            lat += (rng.random() - 0.5) * 0.01
            lon += (rng.random() - 0.5) * 0.01
            pts.append((lat, lon))
            shapes_rows.append(f"shp{s},{lat:.6f},{lon:.6f},{q + 1}")
        k = max(1, pts_per_shape // stops_per_shape)
        stop_ids = []
        for j, q in enumerate(range(0, pts_per_shape, k)[:stops_per_shape]):
            sl = pts[q][0] + (rng.random() - 0.5) * 0.002
            so = pts[q][1] + (rng.random() - 0.5) * 0.002
            sid = f"stp{s}_{j}"
            stop_ids.append(sid)
            stops_rows.append(f"{sid},Stop {s}-{j},{sl:.6f},{so:.6f}")
        for t in range(trips_per_shape):
            tid = f"trip{s}_{t}"
            trips_rows.append(f"r{s % 7},svc1,{tid},shp{s}")
            for j, sid in enumerate(stop_ids):
                hh, mm = 6 + t, (j * 7) % 60
                st_rows.append(f"{tid},{hh:02d}:{mm:02d}:00,{hh:02d}:{mm:02d}:30,{sid},{j + 1}")
    members = {
        "agency.txt": "agency_id,agency_name,agency_url,agency_timezone\n"
                      "a1,Synthetic Transit,https://example.invalid,UTC",
        "routes.txt": "route_id,agency_id,route_short_name,route_type\n"
                      + "\n".join(f"r{i},a1,R{i},3" for i in range(7)),
        "shapes.txt": "\n".join(shapes_rows),
        "stops.txt": "\n".join(stops_rows),
        "trips.txt": "\n".join(trips_rows),
        "stop_times.txt": "\n".join(st_rows),
    }
    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, body in members.items():
            zf.writestr(name, body + "\n")
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    return path


def _write_shard(args) -> str:
    import pyarrow.parquet as pq

    out_dir, s, lo, hi, n_images, seed, jfif_every = args
    path = f"{out_dir}/images/part-{s:05d}.parquet"
    # small row groups: row-group-granular work units for shard-local stages
    # and effective min/max pruning for phash-range partition reads
    pq.write_table(images_table_range(lo, hi, n_images, seed,
                                      jfif_every=jfif_every), path,
                   row_group_size=4096)
    return path


def write_fixture(out_dir: str, n_images: int, n_tiles: int, seed: int = SEED,
                  rows_per_file: int = 25000, parallel: bool = True,
                  jfif_every: int | None = None) -> None:
    """Materialize the fixture as a multi-file parquet dataset (one file per
    row-range shard, so reads parallelize like a real multi-shard table).
    Shards generate in parallel processes — per-row seeding makes every shard
    independent of generation order."""
    import pyarrow.parquet as pq

    os.makedirs(f"{out_dir}/images", exist_ok=True)
    jobs = [
        (out_dir, s, lo, min(lo + rows_per_file, n_images), n_images, seed,
         jfif_every)
        for s, lo in enumerate(range(0, n_images, rows_per_file))
    ]
    if parallel and len(jobs) > 1:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=min(len(jobs), os.cpu_count() or 4)) as ex:
            list(ex.map(_write_shard, jobs))
    else:
        for j in jobs:
            _write_shard(j)
    pq.write_table(ref_tiles_table(n_tiles, seed), f"{out_dir}/ref_tiles.parquet")
