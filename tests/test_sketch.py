"""approx_distinct (HLL register sketch): register/rank exactness vs a
per-value Python recompute, and estimator accuracy (with the standard
alpha + linear-counting corrections applied consumer-side) vs true
cardinality across regimes."""

import numpy as np
import pandas as pd
import ray

from gtfs_conflation_pipeline_ray.functions.text import splitmix64
from gtfs_conflation_pipeline_ray.stages.relational import (_bitlen_u64,
                                                            approx_distinct)


def test_bitlen_u64_exact():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2**63, 5000, dtype=np.int64).view(np.uint64)
    x[:5] = [0, 1, 2, 2**53, 2**63]
    got = _bitlen_u64(x)
    exp = np.fromiter((int(v).bit_length() for v in x), np.int64, len(x))
    assert (got == exp).all()


def _hll_truth(values: np.ndarray, p: int = 10):
    """Reference registers + raw estimate, scalar Python."""
    m = 1 << p
    regs = {}
    h = splitmix64(values.astype(np.uint64))
    for hv in h:
        hv = int(hv)
        reg = hv & (m - 1)
        w = hv >> p
        rank = (64 - p) - w.bit_length() + 1
        regs[reg] = max(regs.get(reg, 0), rank)
    S = (m - len(regs)) << 64
    for r in regs.values():
        S += 1 << (64 - r)
    return len(regs), (m * m * 1000 << 64) // S


def _corrected(n_regs: int, est_x1000: int, p: int = 10) -> float:
    """Standard HLL corrections a consumer applies: alpha scaling + linear
    counting when the raw estimate is in the small-range regime."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * est_x1000 / 1000.0
    if est <= 2.5 * m and n_regs < m:
        return m * np.log(m / (m - n_regs))
    return est


def test_approx_distinct_matches_reference_and_is_accurate(ray_session):
    rng = np.random.default_rng(9)
    for true_n, dup in [(300, 40), (5000, 5), (60000, 2)]:
        vals = rng.choice(np.int64(2) ** 62, size=true_n, replace=False)
        data = np.repeat(vals, dup)
        rng.shuffle(data)
        df = pd.DataFrame({"k": np.zeros(len(data), dtype=np.int64),
                           "v": data})
        ds = ray.data.from_pandas(df).repartition(16)
        out = approx_distinct(ds, ["k"], "v", p=10).to_pandas()
        assert len(out) == 1
        n_regs, est = int(out.n_regs[0]), int(out.est_x1000[0])
        # exact: distributed sketch == scalar reference on the same values
        exp_regs, exp_est = _hll_truth(vals)
        assert (n_regs, est) == (exp_regs, exp_est)
        # accurate: corrected estimate within 8% of the truth
        c = _corrected(n_regs, est)
        assert abs(c - true_n) / true_n < 0.08, (true_n, c)
