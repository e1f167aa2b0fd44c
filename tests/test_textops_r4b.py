"""Round-4b text-pipeline additions: ASCII normalization dedup key, PII token
predicates — brute-force / planted-copy parity."""

import numpy as np

from gtfs_conflation_pipeline_ray.functions.text import (
    ascii_normalize,
    pii_token_counts,
)


def test_ascii_normalize_semantics():
    # case-fold is ASCII-only; punctuation/whitespace runs collapse; trims
    assert ascii_normalize("  Hello,   WORLD!! ") == "hello world"
    # '_' and '-' are not [a-z0-9], so they split
    assert ascii_normalize("a-b_c") == "a b c"
    # non-ASCII letters are treated as separators, never case-mapped
    assert ascii_normalize("Héllo") == "h llo"
    assert ascii_normalize("...") == ""
    # normalization-equal variants (the planted-copy rule)
    base = "The quick brown fox! 42"
    assert ascii_normalize("  " + base + "  !!??  ") == ascii_normalize(base)


def test_pii_token_counts():
    c = pii_token_counts([
        "write to a.b@mail.example.org today",      # 1 email
        "call 5551234567 or 555123456",             # 1 seven-digit run (2nd has 9... wait)
        "@nodot after@at.only x@y",                 # '@' without '.' after → only after@at.only counts
        "clean text with nothing",
        "combo bob@x.co 1234567",                   # both
    ])
    assert c["n_emails"].tolist() == [1, 0, 1, 0, 1]
    # '555123456' is 9 chars: contains a 7-digit run too
    assert c["n_digit_tokens"].tolist() == [0, 2, 0, 0, 1]


def test_normalized_dedup_groups_planted(ray_session):
    import pyarrow as pa
    import ray

    from gtfs_conflation_pipeline_ray.stages.dedup import normalized_dedup_groups

    texts = ["alpha beta", "ALPHA   beta!!", "gamma", "gamma.", "delta"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(5, dtype=np.int64), "text": texts}))
    out = normalized_dedup_groups(ds).to_pandas().sort_values("keep_doc_id")
    # {0,1} collapse (case+punct), {2,3} collapse (punct), 4 unique
    assert out["keep_doc_id"].tolist() == [0, 2]
    assert out["n_dups"].tolist() == [2, 2]
    assert out["n_norm_chars"].tolist() == [len("alpha beta"), len("gamma")]
