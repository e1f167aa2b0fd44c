"""Heat diffusion stencil, image palette profile, weighted sampling."""

import numpy as np
import pyarrow as pa

from gtfs_conflation_pipeline_ray.functions import codecs


def test_grid_heat_diffusion_vs_dense(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    rng = np.random.default_rng(7)
    n = 2500
    x = rng.integers(0, 1 << 13, size=n).astype(np.int64)
    y = rng.integers(0, 1 << 13, size=n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"px": x, "py": y}))
    got = spatial.grid_heat_diffusion(ds, "px", "py", cell=1024,
                                      rounds=2).to_pandas()
    got = got.set_index(["cx", "cy"]).sort_index()["v"]

    # dense replay: counts on an offset grid with a 2-ring halo
    size = (1 << 13) // 1024
    halo = 2
    dense = np.zeros((size + 2 * halo, size + 2 * halo), dtype=np.int64)
    np.add.at(dense, (x // 1024 + halo, y // 1024 + halo), 1)
    for _ in range(2):
        nxt = 4 * dense.copy()
        nxt[1:, :] += dense[:-1, :]
        nxt[:-1, :] += dense[1:, :]
        nxt[:, 1:] += dense[:, :-1]
        nxt[:, :-1] += dense[:, 1:]
        dense = nxt // 8
    nz = np.argwhere(dense > 0)
    assert len(got) == len(nz)
    for cx, cy in nz:
        assert got.loc[(cx - halo, cy - halo)] == dense[cx, cy]


def test_image_palette_vs_pixel_multiset(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages import media

    rng = np.random.default_rng(11)
    rows = []
    imgs = []
    for i in range(6):
        h, w = 8 + i, 10 + i
        # few distinct colors so modal color is interesting
        img = (rng.integers(0, 3, size=(h, w, 3)) * 40).astype(np.uint8)
        fmt = ["bmp", "png"][i % 2]
        rows.append((i, codecs.encode(img, fmt), fmt))
        imgs.append(img)
    batch = pa.table({
        "image_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "bytes": pa.array([r[1] for r in rows], type=pa.binary()),
        "fmt": pa.array([r[2] for r in rows], type=pa.string()),
    })
    out = media.image_palette(ray.data.from_arrow(batch)).to_pandas()
    out = out.set_index("image_id").sort_index()
    for i, img in enumerate(imgs):
        packed = (img[:, :, 0].astype(np.int64) * 65536
                  + img[:, :, 1].astype(np.int64) * 256
                  + img[:, :, 2].astype(np.int64)).ravel()
        vals, counts = np.unique(packed, return_counts=True)
        best = np.lexsort((vals, -counts))[0]
        r = out.loc[i]
        assert r.n_colors == len(vals)
        assert r.top_color == vals[best]
        assert r.top_count == counts[best]


def test_part_weighted_sample_deterministic_and_topk(ray_session):
    from gtfs_conflation_pipeline_ray.pipelines import queries

    a = queries.q_part_weighted_sample("/root/testdata/sf0.001").to_pandas()
    b = queries.q_part_weighted_sample("/root/testdata/sf0.001").to_pandas()
    assert a.equals(b)
    assert len(a) == 100
    # priorities are the global k smallest; heavier parts shrink priority
    assert a["priority"].is_monotonic_increasing
    ids = a["p_partkey"].to_numpy(np.int64)
    w = a["p_size"].to_numpy(np.int64)
    h = ((ids & 0xFFFFFFFF).astype(np.uint64)
         * np.uint64(2654435761) % np.uint64(1 << 32)).astype(np.int64)
    assert (a["priority"].to_numpy(np.int64) == h // w).all()
