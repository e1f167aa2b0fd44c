"""Round-4 wave C: rect_union_area vs dense rasterization, blob labeling vs
brute-force BFS, hard-negative mining label exclusion."""

from collections import deque

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from gtfs_conflation_pipeline_ray.stages.ann import hard_negative_topk
from gtfs_conflation_pipeline_ray.stages.media import label_components
from gtfs_conflation_pipeline_ray.stages.spatial import rect_union_area


def _brute_label(mask):
    h, w = mask.shape
    seen = np.zeros_like(mask, bool)
    n, big = 0, 0
    for r in range(h):
        for c in range(w):
            if mask[r, c] and not seen[r, c]:
                n += 1
                q = deque([(r, c)])
                seen[r, c] = True
                area = 0
                while q:
                    y, x = q.popleft()
                    area += 1
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        yy, xx = y + dy, x + dx
                        if (0 <= yy < h and 0 <= xx < w and mask[yy, xx]
                                and not seen[yy, xx]):
                            seen[yy, xx] = True
                            q.append((yy, xx))
                big = max(big, area)
    return n, big


def test_label_components_fuzz_vs_bfs():
    rng = np.random.default_rng(17)
    for _ in range(200):
        h, w = rng.integers(1, 16, 2)
        mask = rng.random((h, w)) < rng.uniform(0.15, 0.85)
        assert label_components(mask) == _brute_label(mask)
    assert label_components(np.zeros((4, 4), bool)) == (0, 0)
    assert label_components(np.ones((3, 5), bool)) == (1, 15)


def test_rect_union_area_fuzz_vs_raster():
    rng = np.random.default_rng(4)
    for _ in range(5):
        n = int(rng.integers(2, 50))
        x0 = rng.integers(0, 220, n)
        x1 = x0 + rng.integers(1, 90, n)
        y0 = rng.integers(0, 220, n)
        y1 = y0 + rng.integers(1, 90, n)
        df = pd.DataFrame({"x0": x0, "x1": x1, "y0": y0, "y1": y1})
        got = (rect_union_area(ray.data.from_pandas(df), cell=64)
               .to_pandas()["covered_area"].sum())
        grid = np.zeros((320, 320), bool)
        for a, b, c, d in zip(x0, x1, y0, y1):
            grid[a:b, c:d] = True
        assert got == int(grid.sum())


def test_hard_negatives_exclude_same_label():
    rng = np.random.default_rng(8)
    n, dim = 200, 8
    emb = rng.normal(size=(n, dim)).astype(np.float32)
    labels = rng.integers(0, 3, n).astype(np.int32)
    tab = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        "label": pa.array(labels),
    })
    q = tab.slice(0, 4).rename_columns(["query_id", "embedding", "label"])
    got = (hard_negative_topk(ray.data.from_arrow(tab), ray.put(q), k=5)
           .to_pandas())
    lab = {i: int(l) for i, l in zip(range(n), labels)}
    for _, r in got.iterrows():
        assert lab[int(r.query_id)] != lab[int(r.vec_id)]
    # exact: matches a numpy brute force with the same tie-break
    for qi in range(4):
        sims = (emb.astype(np.float64) @ emb[qi].astype(np.float64)) / (
            np.linalg.norm(emb.astype(np.float64), axis=1)
            * np.linalg.norm(emb[qi].astype(np.float64)))
        sims[labels == labels[qi]] = -np.inf
        order = np.lexsort((np.arange(n), -sims))[:5]
        sub = got[got.query_id == qi].sort_values("sim_rank")
        assert list(sub.vec_id) == [int(v) for v in order]
