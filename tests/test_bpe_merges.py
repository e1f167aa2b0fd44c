"""End-to-end + kernel checks for the BPE trainer loop
(stages/textops.bpe_merge_rounds): greedy left-to-right merge semantics,
deterministic argmax ties, and a planted corpus whose three merge rounds
are known by hand."""

import pyarrow as pa

from gtfs_conflation_pipeline_ray.stages import textops


def _merge_seq(lst, a, b):
    res, i, m = [], 0, 0
    while i < len(lst):
        if i < len(lst) - 1 and lst[i] == a and lst[i + 1] == b:
            res.append(f"{a}_{b}")
            m += 1
            i += 2
        else:
            res.append(lst[i])
            i += 1
    return res, m


def test_greedy_merge_never_overlaps():
    got, m = _merge_seq(["a", "a", "a"], "a", "a")
    assert got == ["a_a", "a"] and m == 1
    got, m = _merge_seq(["a", "a", "a", "a"], "a", "a")
    assert got == ["a_a", "a_a"] and m == 2


def test_bpe_merge_rounds_planted_corpus(ray_session):
    import ray

    # "x y" dominates round 1 (4 occurrences); after merging, "x_y z"
    # dominates round 2; then "w x_y_z" ties with nothing and wins round 3.
    texts = ["x y z w", "x y z w", "x y z", "x y", "q r"]
    docs = ray.data.from_arrow(pa.table({"text": texts}))
    out = textops.bpe_merge_rounds(docs, rounds=3).to_pandas()
    assert out["round"].tolist() == [1, 2, 3]
    assert out["pair"].tolist() == ["x y", "x_y z", "x_y_z w"]
    assert out["n_merged"].tolist() == [4, 3, 2]


def _lz78(ws):
    seen, cur, cnt = set(), "", 0
    for w in ws:
        cand = w if not cur else cur + " " + w
        if cand in seen:
            cur = cand
        else:
            seen.add(cand)
            cnt += 1
            cur = ""
    return cnt + (1 if cur else 0)


def test_lz78_known_sequences():
    # Repetitive stream parses into few phrases; all-distinct into n.
    assert _lz78(["a"] * 1) == 1
    # a|a a|a a a -> 3 phrases for 6 tokens
    assert _lz78(["a"] * 6) == 3
    assert _lz78(["a", "b", "c", "d"]) == 4
    assert _lz78([]) == 0


def test_lz78_trailing_partial_counts_once():
    # "a b a" : phrases a, b; trailing "a" matches dict -> +1 partial.
    assert _lz78(["a", "b", "a"]) == 3


def test_lz78_repetitive_below_diverse():
    rep = ["spam", "ham"] * 30
    div = [f"w{i}" for i in range(60)]
    assert _lz78(rep) < _lz78(div) == 60


def _min_period(ws):
    import numpy as np

    n = len(ws)
    arr = np.array(ws, dtype=object)
    for p in range(1, n):
        if (arr[:n - p] == arr[p:]).all():
            return p
    return n


def test_min_period_known_cases():
    assert _min_period(["a", "b", "a", "b", "a", "b"]) == 2
    assert _min_period(["a", "b", "a", "b", "a"]) == 2  # non-divisor tail
    assert _min_period(["x", "y", "z"]) == 3
    assert _min_period(["a", "a", "a"]) == 1
    # Fibonacci-word style: period need not divide n.
    assert _min_period(["a", "b", "a", "a", "b", "a", "b", "a"]) == 5


def test_drawdown_identity():
    import numpy as np

    dv = np.array([5, -2, -4, 3, -7, 10], np.int64)
    bal = np.cumsum(dv)
    dd = np.maximum.accumulate(bal) - bal
    # peak 5 at t0; trough at balance -5 (t4) -> drawdown 10
    assert int(dd.max()) == 10 and int(np.argmax(dd == dd.max())) == 4


def _cdc(text, min_len=16, max_len=64):
    import numpy as np

    b = np.frombuffer(text.encode("ascii", "replace"),
                      dtype=np.uint8).astype(np.int64)
    n = len(b)
    if n >= 4:
        h = b[3:] + 31 * b[2:-1] + 961 * b[1:-2] + 29791 * b[:-3]
        cand = np.flatnonzero(h % 64 == 0) + 4
    else:
        cand = np.array([], np.int64)
    cur, cuts = 0, []
    while cur < n:
        end = min(cur + max_len, n)
        nxt = cand[(cand >= cur + min_len) & (cand <= end)]
        cut = int(nxt[0]) if len(nxt) else end
        cuts.append(cut)
        cur = cut
    return cuts


def test_cdc_chunks_respect_bounds_and_cover():
    import numpy as np

    rng = np.random.default_rng(13)
    for _ in range(20):
        text = "".join(chr(int(c)) for c in rng.integers(97, 123, 300))
        cuts = _cdc(text)
        prev = 0
        for c in cuts[:-1]:
            assert 16 <= c - prev <= 64
            prev = c
        assert cuts[-1] == len(text)  # full coverage


def test_cdc_shift_locality():
    # Inserting a prefix changes only cuts near the start: content-defined
    # cut points realign, which fixed-width chunking cannot do.
    import numpy as np

    rng = np.random.default_rng(17)
    text = "".join(chr(int(c)) for c in rng.integers(97, 123, 400))
    base = _cdc(text)
    shifted = _cdc("zzzz" + text)
    # compare cut positions relative to the original text's coordinates
    base_set = set(base)
    shifted_rel = {c - 4 for c in shifted}
    # the tail half of the cuts realign exactly
    tail = [c for c in base if c > 200]
    assert tail and all(c in shifted_rel for c in tail)


def test_rake_scoring_prefers_cohesive_multiword_phrase():
    # Classic RAKE behavior: words that always co-occur in one phrase
    # carry degree == phrase length * freq, so the multiword phrase
    # outranks a frequent lone word under the ratio-of-sums score.
    runs = [["deep", "learning"], ["deep", "learning"], ["data"],
            ["data"], ["data"]]
    deg, freq = {}, {}
    for r in runs:
        for w in r:
            deg[w] = deg.get(w, 0) + len(r)
            freq[w] = freq.get(w, 0) + 1
    def score(phrase):
        sd = sum(deg[w] for w in phrase)
        sf = sum(freq[w] for w in phrase)
        return sd * 1000000 // sf
    assert score(["deep", "learning"]) == 2 * 1000000  # deg/freq = 2
    assert score(["data"]) == 1 * 1000000
    assert score(["deep", "learning"]) > score(["data"])


def test_porter_step1a_rules():
    def stem(w):
        if w.endswith("sses"):
            return w[:-2]
        if w.endswith("ies"):
            return w[:-2]
        if w.endswith("ss"):
            return w
        if w.endswith("s") and len(w) > 1:
            return w[:-1]
        return w

    assert stem("caresses") == "caress"
    assert stem("ponies") == "poni"
    assert stem("caress") == "caress"
    assert stem("cats") == "cat"
    assert stem("s") == "s"  # single letter untouched


def test_eoq_adjacent_test_matches_continuous_optimum():
    import math

    import numpy as np

    K, h = 500, 2
    for d in (10, 100, 1000, 12345):
        q = np.arange(1, 4001, dtype=np.int64)
        lhs = (2 * K * d + h * (q + 1) ** 2) * q
        rhs = (2 * K * d + h * q * q) * (q + 1)
        ok = lhs >= rhs
        q_star = int(q[np.argmax(ok)]) if ok.any() else 4000
        # the discrete argmin brackets the continuous EOQ = sqrt(2KD/h)
        cont = math.sqrt(2 * K * d / h)
        assert math.floor(cont) <= q_star <= math.ceil(cont)
        # and truly minimizes the exact rational cost among neighbors
        from fractions import Fraction

        def f(qv):
            return Fraction(2 * K * d + h * qv * qv, 2 * qv)

        assert f(q_star) <= f(q_star + 1)
        if q_star > 1:
            assert f(q_star) < f(q_star - 1)
    # out-of-range demand clamps to the documented 4000 cap
    d = 400000
    q = np.arange(1, 4001, dtype=np.int64)
    ok = (2 * K * d + h * (q + 1) ** 2) * q         >= (2 * K * d + h * q * q) * (q + 1)
    assert not ok.any()


def test_burstiness_topical_beats_function_word():
    # "zebra" appears 9 times in 3 docs (bursty), "the" 12 times in 12
    # docs (flat): cf/df separates them exactly.
    assert 9 * 1000000 // 3 > 12 * 1000000 // 12


def test_km_table_identities():
    import numpy as np

    life = np.array([0, 0, 2, 3, 3, 5], np.int64)
    rows = [(m, int((life >= m).sum()), int((life == m).sum()))
            for m in range(6)]
    # at-risk is non-increasing and equals the reverse-cumsum of events
    for (m1, n1, d1), (m2, n2, _) in zip(rows, rows[1:]):
        assert n2 == n1 - d1
    # survival fold: S(m) = prod(1 - d/n) hits 0 exactly at the max life
    from fractions import Fraction

    s = Fraction(1)
    for _, n, d in rows:
        s *= 1 - Fraction(d, n)
    assert s == 0


def test_texttiling_valley_marks_topic_shift():
    # Two topics with distinct vocabularies: the gap between them has
    # zero overlap while within-topic gaps overlap heavily -> exactly
    # one valley at the topic boundary.
    B = 15
    topic_a = ["alpha", "beta", "gamma", "delta", "eps"] * 3  # 15 tokens
    topic_b = ["zeta", "eta", "theta", "iota", "kappa"] * 3
    ws = topic_a + topic_a + topic_b + topic_b
    nb = len(ws) // B
    blocks = [set(ws[k * B:(k + 1) * B]) for k in range(nb)]
    sims = [len(blocks[k] & blocks[k + 1]) for k in range(nb - 1)]
    assert sims == [5, 0, 5]
    valleys = [k for k in range(1, len(sims) - 1)
               if sims[k] < sims[k - 1] and sims[k] < sims[k + 1]]
    assert valleys == [1]  # exactly the topic boundary
