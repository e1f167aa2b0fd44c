"""Kernel pins for integer Otsu thresholding, pointer-doubling chain
rollup, and the OLS trend moments' integer form."""

from fractions import Fraction

import numpy as np
import pyarrow as pa

from gtfs_conflation_pipeline_ray.stages.media import otsu_threshold


def otsu_brute(channel: np.ndarray) -> tuple[int, int, int]:
    """Argmax over t of the exact fraction (sumB*nF - sumF*nB)^2 / (nB*nF),
    quantized to floor only for the REPORTED score — distinguishing the
    kernel's floor-quantized argmax from a true-fraction argmax would need a
    tie in the quantized score, which the smallest-t rule then resolves
    identically, so both argmax rules agree wherever the quantized scores
    differ; this brute force replicates the kernel's own definition."""
    v = channel.reshape(-1).astype(int)
    n = len(v)
    best = None
    for t in range(255):
        nb = int((v <= t).sum())
        nf = n - nb
        if nb == 0 or nf == 0:
            continue
        sb = int(v[v <= t].sum())
        sf_ = int(v.sum()) - sb
        score = (sb * nf - sf_ * nb) ** 2 // (nb * nf)
        if best is None or score > best[1]:
            best = (t, score, nb)
    if best is None:
        return -1, 0, 0
    return best


def test_otsu_matches_bruteforce_random():
    rng = np.random.default_rng(11)
    for _ in range(12):
        h, w = rng.integers(1, 7, size=2)
        ch = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        assert otsu_threshold(ch) == otsu_brute(ch)


def test_otsu_bimodal_separates_modes():
    # two clear modes at 10 and 200 -> threshold lies between them
    ch = np.array([[10] * 6 + [200] * 6], dtype=np.uint8)
    t, score, n_bg = otsu_threshold(ch)
    assert 10 <= t < 200
    assert n_bg == 6
    # exact score for the balanced split: (sumB*nF - sumF*nB)^2 // (nB*nF)
    assert score == (60 * 6 - 1200 * 6) ** 2 // 36


def test_otsu_constant_image_has_no_split():
    ch = np.full((4, 4), 77, dtype=np.uint8)
    assert otsu_threshold(ch) == (-1, 0, 0)


def test_otsu_quantized_argmax_is_fraction_argmax_on_smooth_ramp():
    # sanity: on a ramp the quantized argmax equals the true-fraction argmax
    ch = np.arange(48, dtype=np.uint8).reshape(4, 12)
    v = ch.reshape(-1).astype(int)
    n = len(v)
    fr_best = max(
        range(255),
        key=lambda t: (
            Fraction((int(v[v <= t].sum()) * (n - int((v <= t).sum()))
                      - (int(v.sum()) - int(v[v <= t].sum())) * int((v <= t).sum())) ** 2,
                     max(1, int((v <= t).sum()) * (n - int((v <= t).sum()))))
            if 0 < int((v <= t).sum()) < n else Fraction(-1), -t),
    )
    assert otsu_threshold(ch)[0] == fr_best


def _chain_brute(parents, vals):
    out = {}
    for node in parents:
        cur, s, d = node, vals[node], 0
        while parents[cur] >= 0:
            cur = parents[cur]
            s += vals[cur]
            d += 1
        out[node] = (d, s)
    return out


def test_pointer_double_chain_matches_walk(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.graphrank import (
        pointer_double_chain,
    )

    rng = np.random.default_rng(4)
    n = 40
    # random forest: parent strictly smaller, roots where parent < 0
    parent = np.array(
        [-1 if i == 0 or rng.random() < 0.1 else int(rng.integers(0, i))
         for i in range(n)], dtype=np.int64)
    val = rng.integers(1, 100, size=n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "node": np.arange(n, dtype=np.int64), "parent": parent, "val": val}))
    out = pointer_double_chain(ds, rounds=6).to_pandas()
    got = {int(r.node): (int(r.depth), int(r.chain_sum))
           for r in out.itertuples()}
    want = _chain_brute(dict(enumerate(parent.tolist())),
                        dict(enumerate(val.tolist())))
    assert got == want


def test_trend_moment_identity():
    # the integer cross-moment form reproduces the float OLS slope/intercept
    rng = np.random.default_rng(9)
    x = rng.integers(0, 1000, size=50).astype(np.int64)
    y = rng.integers(0, 50, size=50).astype(np.int64)
    n = len(x)
    num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    den = n * int((x * x).sum()) - int(x.sum()) ** 2
    icept = int(y.sum()) * int((x * x).sum()) - int(x.sum()) * int((x * y).sum())
    slope_f, icept_f = np.polyfit(x.astype(float), y.astype(float), 1)
    assert abs(num / den - slope_f) < 1e-9
    assert abs(icept / den - icept_f) < 1e-9
