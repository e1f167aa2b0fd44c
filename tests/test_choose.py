"""Tests for the Viterbi chunked path chooser against hand-computed and
brute-force oracles."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gtfs_conflation_pipeline_ray.stages.choose import _viterbi


def brute_force_chain(cand_t, cand_c, penalty):
    best, best_cost = None, np.inf
    for combo in itertools.product(*[range(len(t)) for t in cand_t]):
        cost = sum(cand_c[k][j] for k, j in enumerate(combo))
        for k in range(1, len(combo)):
            if cand_t[k][combo[k]] != cand_t[k - 1][combo[k - 1]]:
                cost += penalty
        if cost < best_cost:
            best_cost = cost
            best = [int(cand_t[k][j]) for k, j in enumerate(combo)]
    return best, best_cost


def test_viterbi_prefers_continuity():
    # tile 1 slightly worse per step but continuous; tile of the day changes
    cand_t = [np.array([1, 2]), np.array([1, 3]), np.array([1, 4])]
    cand_c = [np.array([2.0, 1.0])] * 3
    out = _viterbi(cand_t, cand_c, switch_penalty=10.0)
    assert out.tolist() == [1, 1, 1]
    # with no penalty, picks local best each step
    out = _viterbi(cand_t, cand_c, switch_penalty=0.0)
    assert out.tolist() == [2, 3, 4]


def test_viterbi_matches_bruteforce():
    rng = np.random.default_rng(11)
    for _ in range(25):
        n = rng.integers(1, 6)
        cand_t = [rng.choice(10, size=rng.integers(1, 4), replace=False).astype(np.int64)
                  for _ in range(n)]
        cand_c = [rng.uniform(0, 5, size=len(t)) for t in cand_t]
        out = _viterbi(cand_t, cand_c, switch_penalty=3.0)
        want, want_cost = brute_force_chain(cand_t, cand_c, 3.0)
        # cost of the viterbi chain must equal the brute-force optimum
        got_cost = sum(
            cand_c[k][list(cand_t[k]).index(out[k])] for k in range(n)
        ) + 3.0 * sum(out[k] != out[k - 1] for k in range(1, n))
        assert got_cost == pytest.approx(want_cost)


def test_viterbi_choose_stage(ray_session):
    """End-to-end over a tiny dataset: two shapes, one gap segment."""
    import ray

    from gtfs_conflation_pipeline_ray.stages.choose import viterbi_choose

    tiles = pa.table(
        {
            "tile_id": np.array([0, 1], dtype=np.int64),
            "ref_id": ["R0", "R1"],
            "level": np.array([0, 0], dtype=np.int64),
            "cx": np.array([100, 500], dtype=np.int64),
            "cy": np.array([100, 500], dtype=np.int64),
            "hw": np.array([80, 80], dtype=np.int64),
            "hh": np.array([80, 80], dtype=np.int64),
        }
    )
    segs = pd.DataFrame(
        {
            "shape": ["a", "a", "a", "b"],
            "seq": [0, 1, 2, 0],
            "x": [90, 10000, 110, 510],  # middle point hits no tile
            "y": [90, 10000, 110, 510],
        }
    )
    ds = ray.data.from_pandas(segs)
    out = (
        viterbi_choose(ds, ray.put(tiles), "shape", "seq", "x", "y")
        .to_pandas()
        .sort_values(["shape", "seq"])
        .reset_index(drop=True)
    )
    assert out["tile_id"].tolist() == [0, -1, 0, 1]
    assert out["n_candidates"].tolist() == [1, 0, 1, 1]


def test_anneal_axiomatic_fixpoint():
    import numpy as np

    from gtfs_conflation_pipeline_ray.stages.choose import anneal_axiomatic

    t = lambda *v: np.array(v, dtype=np.int64)
    c = lambda *v: np.array(v, dtype=np.float64)
    # step 0: unique candidate under strict -> axiom at level 0
    # step 1: two candidates (7 cheap, 9 cheap) -> ambiguous, but fixed
    #         neighbor 7 propagates (continuity constraint)
    # step 2: candidate only under the relaxed threshold -> later level
    # step 3: no candidates -> stays -1
    cand_t = [t(7), t(7, 9), t(5), t()]
    cand_c = [c(1.0), c(1.0, 1.0), c(50.0), c()]
    chosen, lvl = anneal_axiomatic(cand_t, cand_c, strict=2.0, relaxed=100.0)
    assert chosen.tolist() == [7, 7, 5, -1]
    assert lvl[0] == 0 and lvl[1] == 0
    assert lvl[2] > 0          # only decidable after relaxation
    assert lvl[3] == -1

    # ambiguity with no neighbor help is left to the DP (undecided)
    chosen2, _ = anneal_axiomatic([t(1, 2)], [c(1.0, 1.0)], 2.0, 100.0)
    assert chosen2.tolist() == [-1]


def test_viterbi_topk_vs_bruteforce():
    """_viterbi_topk must equal exhaustive enumeration ranked by
    (total cost, lexicographic candidate-index chain)."""
    import itertools

    import numpy as np

    from gtfs_conflation_pipeline_ray.stages.choose import _viterbi_topk

    rng = np.random.RandomState(7)
    for trial in range(30):
        n = rng.randint(2, 6)
        pen = 1000
        cand_t, cand_c = [], []
        for _ in range(n):
            c = rng.randint(1, 4)
            cand_t.append(rng.randint(0, 4, size=c).astype(np.int64))
            # small cost range forces plenty of exact ties
            cand_c.append(rng.randint(0, 3, size=c).astype(np.int64))
        k = int(rng.randint(1, 5))
        got = _viterbi_topk(cand_t, cand_c, pen, k)

        brute = []
        for combo in itertools.product(*[range(len(t)) for t in cand_t]):
            cost = int(sum(cand_c[i][j] for i, j in enumerate(combo)))
            for i in range(1, n):
                if cand_t[i - 1][combo[i - 1]] != cand_t[i][combo[i]]:
                    cost += pen
            brute.append((cost, combo))
        brute.sort()
        want = brute[:k]
        assert len(got) == min(k, len(brute))
        for (gc, gchain), (wc, wcombo) in zip(got, want):
            assert gc == wc
            assert gchain.tolist() == [int(cand_t[i][j]) for i, j in enumerate(wcombo)]


def test_viterbi_topk_rank1_matches_viterbi_cost():
    import numpy as np

    from gtfs_conflation_pipeline_ray.stages.choose import _viterbi, _viterbi_topk

    rng = np.random.RandomState(11)
    for _ in range(20):
        n = rng.randint(2, 8)
        cand_t = [rng.randint(0, 5, size=rng.randint(1, 5)).astype(np.int64)
                  for _ in range(n)]
        cand_c = [rng.randint(0, 100, size=len(t)).astype(np.int64) for t in cand_t]
        pen = 50
        top = _viterbi_topk(cand_t, cand_c, pen, 1)[0]
        chain = _viterbi(cand_t, [c.astype(np.float64) for c in cand_c], float(pen))
        assert len(chain) == n
        # chosen-tile chains can't be costed back unambiguously (a tile may
        # appear twice in one step's candidate list), so compare the top-1
        # COST against the brute-force optimum:
        import itertools
        best = min(
            int(sum(cand_c[i][j] for i, j in enumerate(combo)))
            + sum(pen for i in range(1, n)
                  if cand_t[i - 1][combo[i - 1]] != cand_t[i][combo[i]])
            for combo in itertools.product(*[range(len(t)) for t in cand_t])
        )
        assert top[0] == best


def test_viterbi_hmm_matches_bruteforce():
    """The HMM gap-feasibility DP must equal exhaustive chain enumeration
    (cost AND first-min tie-break) over random candidate sets."""
    from gtfs_conflation_pipeline_ray.stages.choose import _viterbi_hmm

    rng = np.random.default_rng(23)
    W = 7
    for _ in range(40):
        n = int(rng.integers(1, 6))
        obs_x = rng.integers(0, 100, size=n).astype(np.int64)
        obs_y = rng.integers(0, 100, size=n).astype(np.int64)
        cand_t, cand_c, cand_x, cand_y = [], [], [], []
        for _k in range(n):
            c = int(rng.integers(1, 4))
            cand_t.append(rng.choice(10, size=c, replace=False).astype(np.int64))
            cand_c.append(rng.integers(0, 50, size=c).astype(np.int64))
            cand_x.append(rng.integers(0, 100, size=c).astype(np.int64))
            cand_y.append(rng.integers(0, 100, size=c).astype(np.int64))

        def cost_of(combo):
            cost = sum(int(cand_c[k][j]) for k, j in enumerate(combo))
            for k in range(1, n):
                i, j = combo[k - 1], combo[k]
                l1 = abs(int(cand_x[k - 1][i]) - int(cand_x[k][j])) + \
                     abs(int(cand_y[k - 1][i]) - int(cand_y[k][j]))
                gap = abs(int(obs_x[k]) - int(obs_x[k - 1])) + \
                      abs(int(obs_y[k]) - int(obs_y[k - 1]))
                cost += W * abs(l1 - gap)
            return cost

        combos = sorted(itertools.product(*[range(len(t)) for t in cand_t]))
        want_cost = min(cost_of(c) for c in combos)
        # first-min tie-break: lexicographically-smallest optimal index chain
        want = next(c for c in combos if cost_of(c) == want_cost)
        out = _viterbi_hmm(cand_t, cand_c, cand_x, cand_y, obs_x, obs_y, W)
        got_cost = cost_of(tuple(
            list(cand_t[k]).index(out[k]) for k in range(n)))
        assert got_cost == want_cost
        assert out.tolist() == [int(cand_t[k][j]) for k, j in enumerate(want)]


def test_hmm_prefers_feasible_jump_over_nearest():
    """A distant candidate whose displacement MATCHES the observed jump must
    beat a nearer candidate whose displacement contradicts it — the exact
    behavior the flat switch penalty cannot express."""
    from gtfs_conflation_pipeline_ray.stages.choose import _viterbi_hmm

    # obs jumps +100 in x; tile 5 sits still (emission 0), tile 9 moves +100
    # with slightly worse emission
    cand_t = [np.array([5, 9]), np.array([5, 9])]
    cand_c = [np.array([0, 4], dtype=np.int64), np.array([0, 4], dtype=np.int64)]
    cand_x = [np.array([0, 0], dtype=np.int64), np.array([0, 100], dtype=np.int64)]
    cand_y = [np.array([0, 0], dtype=np.int64)] * 2
    obs_x = np.array([0, 100], dtype=np.int64)
    obs_y = np.array([0, 0], dtype=np.int64)
    out = _viterbi_hmm(cand_t, cand_c, cand_x, cand_y, obs_x, obs_y, gap_weight=1)
    # optimum is [5, 9]: free emission at step 1, then the +100 centroid
    # displacement matches the observed jump exactly (transition 0), total 4;
    # staying on the stationary tile 5 would pay 1*|0-100| = 100
    assert out.tolist() == [5, 9]
