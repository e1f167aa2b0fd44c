"""ImageEdgeEnergy: decode-path edge sums vs a brute-force recompute over the
pre-encode pixels, through all three codecs."""

import numpy as np
import pyarrow as pa


def test_image_edge_energy_bruteforce(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.functions import codecs
    from gtfs_conflation_pipeline_ray.stages.media import image_edge_energy

    rng = np.random.default_rng(23)
    blobs, fmts, want = [], [], []
    for i, fmt in enumerate(["bmp", "png", "jpeg"] * 4):
        h, w = int(rng.integers(4, 20)), int(rng.integers(4, 24))
        img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        blobs.append(codecs.encode(img, fmt))
        fmts.append(fmt)
        dec = codecs.decode(blobs[-1], fmt).astype(np.int64)
        dh = np.abs(np.diff(dec, axis=1)).sum(axis=(0, 1))
        dv = np.abs(np.diff(dec, axis=0)).sum(axis=(0, 1))
        want.append((int(dh[0]), int(dv[1]), int(dh.sum() + dv.sum())))

    ds = ray.data.from_arrow(pa.table({
        "image_id": np.arange(len(blobs), dtype=np.int64),
        "bytes": pa.array(blobs, type=pa.binary()),
        "fmt": pa.array(fmts, type=pa.string()),
    }))
    out = image_edge_energy(ds).to_pandas().set_index("image_id").sort_index()
    for i, (eh_r, ev_g, tot) in enumerate(want):
        assert out.loc[i, "eh_r"] == eh_r
        assert out.loc[i, "ev_g"] == ev_g
        assert out.loc[i, "edge_total"] == tot
    # jpeg is lossy: the decode-path totals must reflect the DEQUANTIZED
    # pixels, not the originals, for at least one jpeg image
    assert any(f == "jpeg" for f in fmts)
