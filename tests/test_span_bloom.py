"""span_dedup_stats vs a brute-force Python recompute (global first-occurrence
semantics incl. within-doc repeats and wordless docs), and bloom_semi_join
exactness vs np.isin over adversarial key values (negatives, int64 extremes,
near-collisions)."""

import numpy as np
import pandas as pd
import ray

from gtfs_conflation_pipeline_ray.functions.text import _WORD_ASCII_RE
from gtfs_conflation_pipeline_ray.stages.dedup import span_dedup_stats
from gtfs_conflation_pipeline_ray.stages.relational import bloom_semi_join


def _brute_span_stats(texts, W=8):
    seen = {}
    spans = []
    for did in sorted(texts):
        ws = [w.lower() for w in _WORD_ASCII_RE.findall(texts[did])]
        for i in range(0, len(ws), W):
            spans.append((did, i // W, " ".join(ws[i:i + W])))
    stats = {did: [0, 0] for did in texts}
    for did, idx, chunk in sorted(spans):
        stats[did][0] += 1
        if chunk in seen:
            stats[did][1] += 1
        else:
            seen[chunk] = (did, idx)
    return stats


def test_span_dedup_vs_bruteforce():
    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = {}
    for did in range(40):
        n = int(rng.integers(0, 30))
        texts[did] = " ".join(rng.choice(vocab, n))
    texts[40] = ""                      # wordless doc -> (0, 0)
    texts[41] = texts[0]                # full duplicate of doc 0
    texts[42] = ("one two three four five six seven eight " * 2).strip()
    # doc 42: two identical 8-word spans -> within-doc dup counts too
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.array(sorted(texts), np.int64),
        "text": [texts[d] for d in sorted(texts)],
    }))
    out = span_dedup_stats(ds).to_pandas().set_index("doc_id").sort_index()
    exp = _brute_span_stats(texts)
    for did, (n_spans, n_dup) in exp.items():
        assert out.loc[did, "n_spans"] == n_spans, did
        assert out.loc[did, "n_dup"] == n_dup, did
    assert out.loc[40].tolist() == [0, 0]
    assert out.loc[42, "n_dup"] == 1


def test_bloom_semi_join_exact():
    rng = np.random.default_rng(9)
    keys = np.unique(rng.integers(-2**62, 2**62, 500, dtype=np.int64))
    keys = np.concatenate([keys, [0, -1, 2**63 - 1, -2**63]])
    facts_v = np.concatenate([
        rng.integers(-2**62, 2**62, 4000, dtype=np.int64),
        keys[::3],                 # guaranteed hits
        keys[1::7] + 1,            # near-misses
    ])
    rng.shuffle(facts_v)
    ds = ray.data.from_pandas(pd.DataFrame({
        "k": facts_v, "payload": np.arange(len(facts_v), dtype=np.int64)}))
    out = bloom_semi_join(ds, ray.put(keys), "k").to_pandas()
    exp_mask = np.isin(facts_v, keys)
    assert len(out) == int(exp_mask.sum())
    got = out.sort_values("payload")
    exp = pd.DataFrame({"k": facts_v, "payload": np.arange(len(facts_v))})[exp_mask]
    assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (got["payload"].to_numpy() == exp["payload"].to_numpy()).all()
