"""Brute-force parity for the ColBERT-style MaxSim late-interaction scorer
(stages/ann.maxsim_topk): the registry oracle mirrors via slice dot
products, so these pin the einsum kernel + the self-mask + the global
merge against a per-pair triple loop through a real Ray dataset."""

import numpy as np
import pyarrow as pa

from gtfs_conflation_pipeline_ray.stages import ann


def _maxsim_naive(q, d, n_sub):
    sub = q.shape[0] // n_sub
    total = 0
    for t in range(n_sub):
        qs = q[t * sub:(t + 1) * sub]
        best = None
        for u in range(n_sub):
            ds = d[u * sub:(u + 1) * sub]
            dot = int((qs * ds).sum())
            best = dot if best is None else max(best, dot)
        total += best
    return total


def test_maxsim_topk_vs_bruteforce(ray_session):
    import ray

    rng = np.random.default_rng(99)
    n, dim, n_sub = 30, 16, 4
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    tab = pa.table({"vec_id": ids,
                    "embedding": pa.array(list(vecs),
                                          type=pa.list_(pa.float32()))})
    qtab = tab.slice(0, 2)
    out = ann.maxsim_topk(ray.data.from_arrow(tab), ray.put(qtab),
                          k=3, n_sub=n_sub).to_pandas()
    xq = ann.quantize_fixed(vecs.astype(np.float64))
    for qid in (0, 1):
        scores = [(_maxsim_naive(xq[qid], xq[i], n_sub), -i)
                  for i in range(n) if i != qid]
        scores.sort(reverse=True)
        want = [(-i, s) for s, i in scores[:3]]
        got = out[out["query_id"] == qid].sort_values("ms_rank")
        assert list(zip(got["vec_id"], got["maxsim"])) == want


def test_maxsim_exceeds_plain_dot_on_permuted_subvectors():
    # A doc whose sub-vectors are a permutation of the query's scores the
    # SAME maxsim as the query against itself — alignment-invariance the
    # flat dot product does not have.
    rng = np.random.default_rng(7)
    q = ann.quantize_fixed(rng.normal(size=16))
    perm = np.concatenate([q[8:12], q[12:16], q[0:4], q[4:8]])
    assert _maxsim_naive(q, perm, 4) == _maxsim_naive(q, q, 4)
    assert int((q * perm).sum()) < int((q * q).sum())


def test_mmr_prefers_diverse_over_redundant():
    # Candidates: two near-duplicates of the query direction and one
    # orthogonal-but-relevant vector. Plain top-2 takes both duplicates;
    # MMR (lambda=1/2, score2 = 2*rel - maxsim) takes one duplicate then
    # the diverse one.
    q = np.array([1000, 0, 0, 0], np.int64)
    cands = {
        10: np.array([1000, 1000, 0, 0], np.int64),  # picked first
        11: np.array([900, 1100, 0, 0], np.int64),   # redundant with 10
        20: np.array([800, -500, 0, 0], np.int64),   # diverse
    }
    rel = {k: int(v @ q) for k, v in cands.items()}
    # step 1: argmax 2*rel -> 10
    first = max(cands, key=lambda k: (2 * rel[k], -k))
    assert first == 10
    # step 2: score2 = 2*rel - sim(.., 10)
    s2 = {k: 2 * rel[k] - int(cands[k] @ cands[first])
          for k in cands if k != first}
    second = max(s2, key=lambda k: (s2[k], -k))
    assert second == 20  # the diverse vector beats near-duplicate 11
    # plain top-2 by relevance would instead pick 11
    assert sorted(rel, key=lambda k: (-rel[k], k))[:2] == [10, 11]


def test_rrf_floor_score_properties():
    # Integer RRF: 720720 = lcm(1..16) keeps the first ranks' floor
    # divides exact; a doc ranked 1st by one ranker and last by the
    # other can still beat a doc ranked mid by both — fusion, not min.
    def rrf(r1, r2):
        return 720720 // (60 + r1) + 720720 // (60 + r2)

    assert rrf(1, 1) > rrf(1, 2) > rrf(2, 2)
    # a strong single-ranker hit outranks a doc mediocre in both
    assert rrf(1, 100) > rrf(40, 40)
    # monotone: improving either rank never lowers the fused score
    for r in range(1, 100):
        assert rrf(r, 50) >= rrf(r + 1, 50)


def _pav(ys):
    ns, ss = [], []
    for y in ys:
        ns.append(1)
        ss.append(int(y))
        while len(ns) >= 2 and ss[-2] * ns[-1] >= ss[-1] * ns[-2]:
            ns[-2] += ns[-1]
            ss[-2] += ss[-1]
            ns.pop()
            ss.pop()
    return ns, ss


def test_pav_fit_is_monotone_and_mass_preserving():
    from fractions import Fraction

    rng = np.random.default_rng(41)
    for _ in range(30):
        ys = rng.integers(0, 10, int(rng.integers(1, 40))).tolist()
        ns, ss = _pav(ys)
        assert sum(ns) == len(ys) and sum(ss) == sum(ys)
        means = [Fraction(s, n) for s, n in zip(ss, ns)]
        assert all(means[i] < means[i + 1] for i in range(len(means) - 1))


def test_pav_matches_exact_l2_isotonic_on_small_inputs():
    # PAV provably minimizes L2 to any nondecreasing fit; check against
    # brute force over all monotone integer-block partitions via DP.
    from fractions import Fraction

    def sse_of_partition(ys, cuts):
        tot = Fraction(0)
        prev = 0
        means = []
        for c in cuts + [len(ys)]:
            blk = ys[prev:c]
            m = Fraction(sum(blk), len(blk))
            means.append(m)
            tot += sum((Fraction(y) - m) ** 2 for y in blk)
            prev = c
        if any(means[i] > means[i + 1] for i in range(len(means) - 1)):
            return None
        return tot

    import itertools

    rng = np.random.default_rng(43)
    for _ in range(10):
        ys = rng.integers(0, 6, 7).tolist()
        ns, ss = _pav(ys)
        got = sse_of_partition(ys, list(np.cumsum(ns[:-1])))
        assert got is not None
        best = min(v for r in range(len(ys)) for cuts in
                   itertools.combinations(range(1, len(ys)), r)
                   if (v := sse_of_partition(ys, list(cuts))) is not None)
        assert got == best


def test_triplet_violation_rule():
    # d2_pos + margin > d2_neg flags; a clearly-separated triple passes.
    margin = 10_000_000_000
    assert int(5_000_000_000 + margin > 20_000_000_000) == 0
    assert int(5_000_000_000 + margin > 12_000_000_000) == 1


def test_bollinger_trailing_window_excludes_self():
    # A huge spike: the trailing stats come from BEFORE it, so it
    # signals; include-self windows would dilute sigma and can miss it.
    x = np.array([10, 11, 10, 9, 10, 11, 500], np.int64)
    i = 6
    w = x[max(0, i - 15):i]
    n, s, q = len(w), int(w.sum()), int((w * w).sum())
    assert (int(x[i]) * n - s) ** 2 > 4 * (n * q - s * s)
