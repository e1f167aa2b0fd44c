"""Wave-7 kernels: overlapping RAG chunking + integer 3-sigma anomaly rule."""

import numpy as np
import pyarrow as pa


def test_chunk_documents_vs_brute(ray_session):
    import ray

    from gtfs_conflation_pipeline_ray.functions.text import _WORD_ASCII_RE
    from gtfs_conflation_pipeline_ray.stages.textops import chunk_documents

    rng = np.random.default_rng(5)
    texts = []
    for i in range(60):
        n = int(rng.integers(0, 90))
        texts.append(" ".join(
            "w" * int(rng.integers(1, 9)) for _ in range(n)))
    texts[0] = ""  # zero-token doc emits nothing
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(60, dtype=np.int64),
        "text": pa.array(texts, type=pa.string()),
    }))
    got = chunk_documents(ds, window=7, stride=4).to_pandas()
    got = got.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)

    rows = []
    for did, t in enumerate(texts):
        toks = _WORD_ASCII_RE.findall(t.lower())
        n = len(toks)
        if n == 0:
            continue
        c = 0
        while True:
            start = c * 4
            chunk = toks[start:start + 7]
            rows.append((did, c, start, len(chunk), sum(map(len, chunk))))
            if start + 7 >= n:
                break
            c += 1
    assert len(got) == len(rows)
    for r, (_, g) in zip(rows, got.iterrows()):
        assert r == (g.doc_id, g.chunk_id, g.start_tok, g.n_toks,
                     g.sum_tok_len)
    # every token of every non-empty doc is covered by >= 1 chunk
    for did, t in enumerate(texts):
        n = len(_WORD_ASCII_RE.findall(t.lower()))
        if n:
            sub = got[got.doc_id == did]
            covered = set()
            for _, g in sub.iterrows():
                covered.update(range(g.start_tok, g.start_tok + g.n_toks))
            assert covered == set(range(n)), did


def test_integer_three_sigma_matches_float():
    # the cross-multiplied predicate (n*v - S)^2 > 9*(n*Q - S^2) must agree
    # with the float rule |v - mean| > 3*sigma (population) except exactly
    # at the boundary, which integers resolve deterministically
    rng = np.random.default_rng(9)
    for _ in range(200):
        v = rng.integers(0, 50000, size=int(rng.integers(2, 40))).astype(np.int64)
        n, s, q = len(v), v.sum(), (v * v).sum()
        lhs = (n * v - s) ** 2
        rhs = 9 * (n * q - s * s)
        got = lhs > rhs
        mean, var = v.mean(), v.var()
        want = (v - mean) ** 2 > 9 * var + 1e-6
        boundary = np.abs((v - mean) ** 2 - 9 * var) < 1e-6
        assert (got == want)[~boundary].all()
