"""Round-4 wave B: marching_squares case codes vs a dense-raster scalar
replay, and group_median2 vs numpy's median on random groups."""

import numpy as np
import pandas as pd
import ray

from gtfs_conflation_pipeline_ray.stages.relational import group_median2
from gtfs_conflation_pipeline_ray.stages.spatial import marching_squares


def test_marching_squares_vs_dense_replay():
    rng = np.random.default_rng(9)
    # clustered points so the ceil-mean threshold splits hot/cold cells
    n = 3000
    hot_x = rng.integers(0, 4096, n // 2)
    hot_y = rng.integers(0, 4096, n // 2)
    cold_x = rng.integers(0, 65536, n - n // 2)
    cold_y = rng.integers(0, 65536, n - n // 2)
    pts = pd.DataFrame({"px": np.r_[hot_x, cold_x].astype(np.int64),
                        "py": np.r_[hot_y, cold_y].astype(np.int64)})
    got = (marching_squares(ray.data.from_pandas(pts), "px", "py", cell=1024)
           .to_pandas().sort_values(["wx", "wy"]).reset_index(drop=True))

    # dense scalar replay
    cells = pts.assign(cx=pts.px // 1024, cy=pts.py // 1024) \
               .groupby(["cx", "cy"]).size()
    thr = -(-int(cells.sum()) // len(cells))  # ceil mean
    hot = {k for k, v in cells.items() if v >= thr}
    codes = {}
    for (cx, cy) in hot:
        for (wx, wy, b) in [(cx, cy, 1), (cx - 1, cy, 2),
                            (cx, cy - 1, 4), (cx - 1, cy - 1, 8)]:
            codes[(wx, wy)] = codes.get((wx, wy), 0) | b
    exp = (pd.DataFrame([(x, y, c) for (x, y), c in codes.items() if c < 15],
                        columns=["wx", "wy", "case_code"])
           .sort_values(["wx", "wy"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))
    assert (got.case_code.between(1, 14)).all()


def test_group_median2_vs_numpy():
    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "g": rng.integers(0, 7, 2000),
        "h": rng.integers(0, 2, 2000),
        "v": rng.integers(-10_000, 10_000, 2000),
    })
    got = (group_median2(ray.data.from_pandas(df), ["g", "h"], "v")
           .to_pandas().set_index(["g", "h"]).sort_index())
    for (g, h), sub in df.groupby(["g", "h"]):
        v = np.sort(sub.v.to_numpy())
        n = len(v)
        med2 = int(v[(n - 1) // 2]) + int(v[n // 2])
        assert got.loc[(g, h), "med2"] == med2
        assert got.loc[(g, h), "n_rows"] == n
        # doubled median halves back to the textbook median
        assert med2 / 2 == np.median(v)
