"""Misra-Gries sketch+verify heavy hitters and bigram-LM scoring: brute-force
parity + the MG superset guarantee on an adversarial batch split."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _bigrams(t: str) -> list[str]:
    import re

    ws = re.compile(r"\w+", re.ASCII).findall(t.lower())
    return [a + " " + b for a, b in zip(ws, ws[1:])]


def test_heavy_hitters_exact_vs_bruteforce(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.textops import heavy_hitters

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(400):
        # skewed: w0/w1 dominate, so some bigrams are genuinely heavy
        ws = rng.choice(vocab, size=20, p=np.r_[0.3, 0.2, np.full(28, 0.5 / 28)])
        texts.append(" ".join(ws))
    k = 50
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(8)
    out = heavy_hitters(ds, k=k).to_pandas().sort_values("bigram")

    allb = [b for t in texts for b in _bigrams(t)]
    c = pd.Series(allb).value_counts()
    want = c[c * (k + 1) > len(allb)].sort_index()
    assert out["bigram"].tolist() == want.index.tolist()
    assert out["n"].tolist() == want.to_numpy().tolist()
    assert len(out) > 0  # the skew actually produced heavy hitters


def test_mg_superset_guarantee_adversarial_split():
    """A bigram just above the global threshold must survive per-batch MG
    compression in at least one batch, even when its occurrences are spread
    as thin as possible (the pigeonhole argument the stage relies on)."""
    k = 5
    # 6 batches; 'hot hot' appears twice per batch; filler is all-distinct so
    # the (k+1)-th largest batch count is 1 -> hot survives compression
    batches = []
    f = 0
    for _ in range(6):
        toks = ["hot", "hot", "hot", "hot"]  # two 'hot hot' bigrams... build text
        text = "hot hot . hot hot"
        fillers = " ".join(f"f{f+i} f{f+i}x" for i in range(8))
        f += 8
        batches.append(text + " " + fillers)
    survived = False
    for t in batches:
        c = pd.Series(_bigrams(t)).value_counts()
        thr = c.iloc[k] if len(c) > k else 0
        if "hot hot" in c[c > thr].index:
            survived = True
    assert survived


def test_bigram_lm_score_bruteforce(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.stages.textops import bigram_lm_score

    rng = np.random.default_rng(5)
    vocab = [f"t{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 15)))
             for _ in range(200)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(200, dtype=np.int64), "text": texts})).repartition(6)
    out = bigram_lm_score(ds).to_pandas().set_index("doc_id").sort_index()

    allb = pd.Series([b for t in texts for b in _bigrams(t)]).value_counts()
    for i, t in enumerate(texts):
        bs = _bigrams(t)
        if not bs:
            assert i not in out.index
            continue
        cnts = allb[bs].to_numpy()
        assert out.loc[i, "n_bigrams"] == len(bs)
        assert out.loc[i, "sum_bigram_n"] == cnts.sum()
        assert out.loc[i, "min_bigram_n"] == cnts.min()
