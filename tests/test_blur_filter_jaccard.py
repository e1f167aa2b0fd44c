"""Wave-8 kernels: 3x3 raster blur, image quality filter, link prediction."""

import numpy as np
import pyarrow as pa

from gtfs_conflation_pipeline_ray.functions import codecs
from gtfs_conflation_pipeline_ray.stages.media import ImageFilterFlags


def test_grid_box_blur_vs_dense(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages import spatial

    rng = np.random.default_rng(3)
    n = 3000
    x = rng.integers(0, 1 << 13, size=n).astype(np.int64)
    y = rng.integers(0, 1 << 13, size=n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"px": x, "py": y}))
    got = spatial.grid_box_blur(ds, "px", "py", cell=1024).to_pandas()
    got = got.set_index(["cx", "cy"]).sort_index()

    cells = {}
    for xi, yi in zip(x // 1024, y // 1024):
        cells[(int(xi), int(yi))] = cells.get((int(xi), int(yi)), 0) + 1
    assert len(got) == len(cells)
    for (cx, cy), v in cells.items():
        nbrs = [cells.get((cx + dx, cy + dy))
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        nbrs = [w for w in nbrs if w is not None]
        r = got.loc[(cx, cy)]
        assert (r.v, r.blur_sum, r.n_nbrs) == (v, sum(nbrs), len(nbrs))


def test_image_filter_flags_rules_and_poison():
    def enc(w, h):
        img = np.zeros((h, w, 3), dtype=np.uint8)
        return codecs.encode(img, "bmp")

    batch = pa.table({
        "image_id": np.arange(5, dtype=np.int64),
        "bytes": pa.array([enc(30, 10),     # area 300 ok, aspect 30>20 fail
                           enc(20, 10),     # area 200 fail, aspect ok
                           enc(20, 15),     # all ok (cap long)
                           b"garbage",      # poison: every pixel rule fails
                           enc(20, 15)],    # cap too short
                          type=pa.binary()),
        "fmt": pa.array(["bmp"] * 5, type=pa.string()),
        "caption": pa.array(["a caption!", "a caption!", "a caption!",
                             "a caption!", "short"], type=pa.string()),
    })
    out = ImageFilterFlags(min_area=300, min_cap_len=8)(batch).to_pydict()
    assert out["area_ok"] == [True, False, True, False, True]
    assert out["aspect_ok"] == [False, True, True, False, True]
    assert out["cap_ok"] == [True, True, True, True, False]
    assert out["keep"] == [False, False, True, False, False]


def test_link_jaccard_wedge_counts_vs_brute(ray_session):
    # the distributed wedge pipeline (bucketed pair fan-out + pair combine)
    # must match an all-pairs intersection count over the adjacency lists
    import pandas as pd
    import ray

    from gtfs_conflation_pipeline_ray.stages import relational as rel

    rng = np.random.default_rng(17)
    srcs, tgts = [], []
    adj = {}
    for s in range(12):
        nb = rng.choice(40, size=3, replace=False)
        adj[s] = set(int(t) for t in nb)
        srcs += [s] * 3
        tgts += [int(t) for t in nb]
    ds = ray.data.from_arrow(pa.table({
        "src": np.array(srcs, np.int64), "tgt": np.array(tgts, np.int64)}))

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        mm = df.merge(df, on="tgt", suffixes=("_a", "_b"))
        mm = mm[mm["src_a"] < mm["src_b"]]
        return (mm.groupby(["src_a", "src_b"], sort=True).size()
                  .reset_index(name="n_common"))

    pairs = rel.bucketed_groups(ds, ["tgt"], _pairs)
    pairs = rel.partial_groupby_sum(pairs, ["src_a", "src_b"], ["n_common"])
    got = {(r.src_a, r.src_b): r.n_common
           for r in pairs.to_pandas().itertuples()}

    want = {}
    for a in adj:
        for b in adj:
            if a < b and adj[a] & adj[b]:
                want[(a, b)] = len(adj[a] & adj[b])
    assert got == want
