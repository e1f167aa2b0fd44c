"""Round-4 wave: gap_fill_locf (LOCF dense-grid repair), kmv_distinct
(K-Minimum-Values sketch) and edit_distance_pairs (Myers bit-parallel
Levenshtein verify) — each pinned against an independent scalar reference."""

import numpy as np
import pandas as pd
import ray

from gtfs_conflation_pipeline_ray.functions.text import splitmix64
from gtfs_conflation_pipeline_ray.stages.dedup import (_myers_levenshtein,
                                                       edit_distance_pairs)
from gtfs_conflation_pipeline_ray.stages.relational import kmv_distinct
from gtfs_conflation_pipeline_ray.stages.windows import gap_fill_locf


# --- Myers bit-parallel Levenshtein vs the classic O(nm) DP ------------------

def _dp_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_myers_vs_dp_random():
    rng = np.random.default_rng(7)
    alpha = "abcde"
    for _ in range(300):
        la, lb = rng.integers(0, 25, 2)
        a = "".join(alpha[i] for i in rng.integers(0, len(alpha), la))
        b = "".join(alpha[i] for i in rng.integers(0, len(alpha), lb))
        assert _myers_levenshtein(a, b) == _dp_levenshtein(a, b)


def test_myers_edges():
    assert _myers_levenshtein("", "") == 0
    assert _myers_levenshtein("", "abc") == 3
    assert _myers_levenshtein("abc", "") == 3
    assert _myers_levenshtein("abc", "abc") == 0
    assert _myers_levenshtein("kitten", "sitting") == 3
    # pattern longer than 64 chars (multi-word big-int path)
    a = "x" * 150 + "abc" + "y" * 20
    b = "x" * 150 + "azc" + "y" * 20
    assert _myers_levenshtein(a, b) == 1


# --- gap_fill_locf vs a scalar per-user replay -------------------------------

def test_gap_fill_locf_vs_replay():
    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 9, n),
        "day": rng.integers(0, 25, n),
        "us": rng.integers(0, 10**9, n),
        "event_id": np.arange(n, dtype=np.int64),
        "v": rng.integers(-500, 500, n),
    })
    got = (gap_fill_locf(ray.data.from_pandas(df.copy()), "user_id", "day",
                         ["us", "event_id"], "v")
           .to_pandas().sort_values(["user_id", "day"]).reset_index(drop=True))

    rows = []
    for u, g in df.groupby("user_id"):
        last = (g.sort_values(["day", "us", "event_id"])
                 .groupby("day").last()["v"].to_dict())
        cur = None
        for day in range(min(last), max(last) + 1):
            filled = day not in last
            cur = cur if filled else last[day]
            rows.append((u, day, cur, int(filled)))
    exp = pd.DataFrame(rows, columns=["user_id", "day", "v_c", "is_filled"])
    exp = exp.sort_values(["user_id", "day"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(np.int64), exp.astype(np.int64))


# --- kmv_distinct: unsigned rank-order + estimator accuracy ------------------

def test_kmv_matches_scalar_reference_and_is_accurate():
    rng = np.random.default_rng(5)
    k = 64
    frames = []
    truth = {}
    for grp, card in [("a", 20), ("b", 500), ("c", 5000)]:
        vals = rng.choice(np.arange(card * 3, dtype=np.int64), card,
                          replace=False)
        draws = vals[rng.integers(0, card, card * 4)]
        frames.append(pd.DataFrame({"g": grp, "v": draws}))
        truth[grp] = len(np.unique(draws))
    df = pd.concat(frames, ignore_index=True)

    got = (kmv_distinct(ray.data.from_pandas(df), ["g"], "v", k=k)
           .to_pandas().set_index("g").sort_index())

    for grp, sub in df.groupby("g"):
        h = np.sort(np.unique(splitmix64(
            sub["v"].to_numpy().astype(np.int64).view(np.uint64))))
        nd = truth[grp]
        if nd >= k:
            exp = ((k - 1) << 64) // int(h[k - 1])
            # KMV relative error ~ 1/sqrt(k-1) ≈ 12.6%; allow 4 sigma
            assert abs(exp - nd) / nd < 0.5
        else:
            exp = nd
        assert got.loc[grp, "kmv_est"] == exp
        assert got.loc[grp, "n_min_hashes"] == min(nd, k)


# --- edit_distance_pairs end-to-end on planted near-duplicates ---------------

def test_edit_distance_pairs_finds_planted_edits():
    base = ("the quick brown fox jumps over the lazy dog while "
            "seventeen astronauts deploy forty two weather balloons")
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            base,
            base.replace("jumps", "jumped"),          # dist 2, past the prefix
            base + " at dawn!!",                      # dist 9
            "The QUICK brown fox; " + base[20:],      # punct/case edits
            "completely different words entirely foo bar baz qux quux corge"
            " grault garply waldo fred plugh xyzzy thud end of doc",
            base.replace("brown", "crimson colored"), # bigger edit
        ],
    })
    got = (edit_distance_pairs(ray.data.from_pandas(docs), max_dist=16)
           .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    # every emitted pair's distance is the true DP distance and <= 16
    for _, r in got.iterrows():
        a = docs.loc[docs.doc_id == r.doc_a, "text"].iloc[0]
        b = docs.loc[docs.doc_id == r.doc_b, "text"].iloc[0]
        assert _dp_levenshtein(a, b) == r.edit_dist <= 16
    pairs = set(zip(got.doc_a, got.doc_b))
    assert (0, 1) in pairs and (0, 2) in pairs
    assert not any(4 in p for p in pairs)
