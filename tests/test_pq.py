"""PQ encode / ADC top-k: codes vs a scalar per-subspace argmin recompute,
pack/unpack round-trip, and ADC ranking vs brute-force table lookups."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from gtfs_conflation_pipeline_ray.stages.ann import (pq_adc_topk, pq_encode,
                                                     quantize_fixed)

M, DIM, K = 8, 64, 16


def _mk(n, seed=5):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 0.4, (n, DIM)).astype(np.float32)
    tab = pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": pa.array([r.tolist() for r in x], pa.list_(pa.float32())),
    })
    return x, tab


def _brute_codes(x, cents):
    xq = quantize_fixed(np.asarray(x, np.float64))
    sub = DIM // M
    out = np.empty((len(xq), M), dtype=np.int64)
    for i, row in enumerate(xq):
        for j in range(M):
            d2 = ((row[j * sub:(j + 1) * sub] - cents[:, j * sub:(j + 1) * sub])
                  ** 2).sum(axis=1)
            out[i, j] = int(np.argmin(d2))
    return out


def test_pq_codes_vs_bruteforce():
    x, tab = _mk(120)
    cents = quantize_fixed(np.asarray(x[:K], np.float64))
    ds = ray.data.from_arrow(tab).repartition(3)
    got = pq_encode(ds, ray.put(cents)).to_pandas().sort_values("vec_id")
    exp_codes = _brute_codes(x, cents)
    exp_packed = (exp_codes << (4 * np.arange(M))).sum(axis=1)
    assert (got["pq_code"].to_numpy() == exp_packed).all()
    # unpack round-trip
    unpacked = (got["pq_code"].to_numpy()[:, None]
                >> (4 * np.arange(M))) & 0xF
    assert (unpacked == exp_codes).all()


def test_pq_adc_vs_bruteforce():
    x, tab = _mk(150, seed=9)
    cents = quantize_fixed(np.asarray(x[:K], np.float64))
    qtab = tab.slice(0, 3)
    ds = ray.data.from_arrow(tab).repartition(3)
    got = pq_adc_topk(ds, ray.put(cents), ray.put(qtab), k=5).to_pandas()
    codes = _brute_codes(x, cents)
    xq = quantize_fixed(np.asarray(x, np.float64))
    sub = DIM // M
    for qi in range(3):
        luts = np.empty((M, K), dtype=np.int64)
        for j in range(M):
            luts[j] = ((xq[qi, j * sub:(j + 1) * sub]
                        - cents[:, j * sub:(j + 1) * sub]) ** 2).sum(axis=1)
        adc = luts[np.arange(M), codes].sum(axis=1)
        order = [v for v in np.lexsort((np.arange(len(adc)), adc))
                 if v != qi][:5]
        g = got[got.query_id == qi].sort_values("adc_rank")
        assert list(g.vec_id) == order
        assert list(g.adc) == [int(adc[v]) for v in order]
