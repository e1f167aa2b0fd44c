"""Text-analysis stages over the `documents` table: token stats, quality
ratios, language ID, fingerprints. All are stateless-per-row batch transforms;
the language-ID profile set is compiled once per actor (stateful stage).

These are the large-scale-training-data operators the BASELINE grades as
first-class alongside the reference parity set.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import text as tx
from .util import pool_size


def token_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_tokens, n_chars) — vectorized per batch."""

    def _stats(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": tx.token_counts(texts),
                "n_chars": np.fromiter((len(t) for t in texts), np.int64, len(texts)),
            }
        )

    return ds.map_batches(_stats, batch_format="pyarrow", batch_size=8192)


def quality_scores(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_chars, alpha_ratio, digit_ratio) — ratios are exact int/int
    double divisions (bit-identical to the SQL oracle)."""

    def _q(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        c = tx.quality_counts(texts)
        nc = np.maximum(c["n_chars"], 1).astype(np.float64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_chars": c["n_chars"],
                "alpha_ratio": c["n_alpha"] / nc,
                "digit_ratio": c["n_digit"] / nc,
            }
        )

    return ds.map_batches(_q, batch_format="pyarrow", batch_size=8192)


def lang_id(ds, text_col: str = "text", id_col: str = "doc_id", concurrency: int | None = None):
    """(doc_id, lang_pred) — stateless tasks; the language profiles are
    module-level constants (compiled at import, once per worker process)."""

    def _lang(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.table(
            {
                id_col: batch[id_col],
                "lang_pred": pa.array(list(tx.lang_id(texts)), type=pa.string()),
            }
        )

    return ds.map_batches(_lang, batch_format="pyarrow", batch_size=4096)


def content_hash(ds, text_col: str = "text", out_col: str = "text_hash"):
    """MD5 hex digest of the utf-8 text — matches DuckDB ``md5(text)``."""

    def _h(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[text_col].to_pylist()]
        return batch.append_column(out_col, pa.array(hs, type=pa.string()))

    return ds.map_batches(_h, batch_format="pyarrow", batch_size=8192)


def fingerprints(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, fp) winnowing document fingerprint (int64 view of uint64)."""

    def _fp(batch: pa.Table) -> pa.Table:
        fps = np.array(
            [tx.winnow_fingerprint(t) for t in batch[text_col].to_pylist()], dtype=np.uint64
        ).view(np.int64)
        return pa.table({id_col: batch[id_col], "fp": fps})

    return ds.map_batches(_fp, batch_format="pyarrow", batch_size=4096)


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition metrics — the Gopher-style training-data
    quality filters (duplicate-word fraction, most-repeated word and word
    bigram): (doc_id, n_words, n_distinct_words, dup_word_ratio,
    top_word_n, top_bigram_n, top_bigram_ratio).

    The Python loop only splits; all counting is ONE whole-batch pandas
    groupby over (doc, word) / (doc, w1, w2) pairs. Counts are exact
    integers and both ratios are int/int double divisions, so the DuckDB
    oracle is bit-identical.
    """

    def _rep(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = len(texts)
        n_words = np.zeros(n, np.int64)
        d_idx: list[int] = []
        words: list[str] = []
        b_d: list[int] = []
        b1: list[str] = []
        b2: list[str] = []
        for j, t in enumerate(texts):
            ws = tx._WORD_ASCII_RE.findall(t.lower())
            n_words[j] = len(ws)
            d_idx.extend([j] * len(ws))
            words.extend(ws)
            if len(ws) >= 2:
                b_d.extend([j] * (len(ws) - 1))
                b1.extend(ws[:-1])
                b2.extend(ws[1:])
        n_distinct = np.zeros(n, np.int64)
        top_word = np.zeros(n, np.int64)
        if words:
            wc = pd.DataFrame(
                {"d": np.asarray(d_idx, np.int64), "w": np.asarray(words, dtype=object)}
            ).groupby(["d", "w"], sort=False).size()
            agg = wc.groupby(level=0).agg(["size", "max"])
            rows = agg.index.to_numpy()
            n_distinct[rows] = agg["size"].to_numpy()
            top_word[rows] = agg["max"].to_numpy()
        top_big = np.zeros(n, np.int64)
        if b1:
            bc = pd.DataFrame(
                {
                    "d": np.asarray(b_d, np.int64),
                    "w1": np.asarray(b1, dtype=object),
                    "w2": np.asarray(b2, dtype=object),
                }
            ).groupby(["d", "w1", "w2"], sort=False).size()
            m = bc.groupby(level=0).max()
            top_big[m.index.to_numpy()] = m.to_numpy()
        n_big = np.maximum(n_words - 1, 0)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": n_words,
                "n_distinct_words": n_distinct,
                "dup_word_ratio": (n_words - n_distinct) / np.maximum(n_words, 1),
                "top_word_n": top_word,
                "top_bigram_n": top_big,
                "top_bigram_ratio": top_big / np.maximum(n_big, 1),
            }
        )

    return ds.map_batches(_rep, batch_format="pyarrow", batch_size=4096)


def readability(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_words, n_sentences, n_long, lix_q) — integer LIX-style
    readability scoring, the document-quality filter that complements the
    Gopher repetition metrics: words are ASCII ``\\w+`` tokens of the
    lowered text, sentences are maximal ``[.!?]+`` runs, long words have
    ≥ 7 chars, and the score is the classic LIX form kept integer-exact:
    ``lix_q = words·1000 // max(sentences,1) + long·100000 // max(words,1)``
    (avg sentence length ×1000 plus long-word percentage ×1000). Map-only;
    text never shuffles."""
    import re

    sent_re = re.compile(r"[.!?]+")

    def _lix(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = len(texts)
        n_words = np.zeros(n, np.int64)
        n_sent = np.zeros(n, np.int64)
        n_long = np.zeros(n, np.int64)
        for j, t in enumerate(texts):
            t = t or ""
            ws = tx._WORD_ASCII_RE.findall(t.lower())
            n_words[j] = len(ws)
            n_sent[j] = len(sent_re.findall(t))
            n_long[j] = sum(1 for w in ws if len(w) >= 7)
        lix = (n_words * 1000 // np.maximum(n_sent, 1)
               + n_long * 100000 // np.maximum(n_words, 1))
        return pa.table({
            id_col: batch[id_col],
            "n_words": n_words, "n_sentences": n_sent, "n_long": n_long,
            "lix_q": lix,
        })

    return ds.map_batches(_lix, batch_format="pyarrow", batch_size=8192)


def vocab_topk(ds, k: int = 50, text_col: str = "text",
               est_rows: int | None = None):
    """Global top-k token vocabulary (vocabulary-building pass of a training
    corpus): per-batch partial token counts (one pandas value_counts per
    batch — the shuffle moves (token, n) partials, never raw text), bucketed
    combine by token hash (complete per-token totals land in one bucket), a
    per-bucket top-k, and a final k·B-row merge. Deterministic tie-break
    (n desc, token asc) end-to-end. Returns a pa.Table (token, n)."""
    from ..functions.text import _WORD_ASCII_RE
    from .relational import bucketed_groups

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in df[text_col]:
            toks.extend(_WORD_ASCII_RE.findall(t.lower()))
        vc = pd.Series(toks, dtype=object).value_counts()
        return pd.DataFrame({"token": vc.index.astype(object),
                             "n": vc.to_numpy().astype(np.int64)})

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("token", as_index=False, sort=False)["n"].sum()
        tot = tot.sort_values(["n", "token"], ascending=[False, True],
                              kind="mergesort")
        return tot.head(k)

    parts = bucketed_groups(ds.select_columns([text_col]), ["token"], _final,
                            pre_fn=_pre, est_rows=est_rows)
    # k rows per bucket: the global merge is k x n_buckets rows — bounded by
    # construction, safe to finalize locally
    merged = parts.to_pandas().sort_values(["n", "token"],
                                           ascending=[False, True],
                                           kind="mergesort").head(k)
    return pa.table({"token": merged["token"].astype(str).to_numpy(),
                     "n": merged["n"].to_numpy().astype(np.int64)})


def distinctive_terms(ds, k: int = 5, text_col: str = "text",
                      id_col: str = "doc_id", est_rows: int | None = None):
    """Per-document distinctive terms — the tf-idf-style ranking pass of a
    training corpus, made INTEGER-EXACT: rank each doc's tokens by
    (tf DESC, df ASC, token ASC) — most frequent in the doc, rarest in the
    corpus — and keep the top ``k`` with ranks.

    Two bounded shuffles, no join operator:
      1. per-batch (doc, token, tf) partials shuffle by TOKEN-hash bucket —
         every doc owning a token lands in that token's bucket, so the bucket
         computes the token's COMPLETE document frequency and attaches it;
      2. the (doc, token, tf, df) rows shuffle by DOC-hash bucket for the
         per-group top-k (``relational.group_topk``, the high-cardinality-
         safe pattern).
    The shuffles move one row per (doc, distinct-token), never raw text."""
    from ..functions.text import _WORD_ASCII_RE
    from .relational import bucketed_groups, group_topk

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks, counts = [], np.zeros(len(df), dtype=np.int64)
        for j, t in enumerate(df[text_col]):
            words = _WORD_ASCII_RE.findall(t.lower())
            counts[j] = len(words)
            toks.extend(words)
        # gather ids by row index so the id column keeps its INPUT dtype
        # (string ids work; empty batches keep the schema stable)
        idx = np.repeat(np.arange(len(df)), counts)
        out = pd.DataFrame({id_col: df[id_col].to_numpy()[idx],
                            "token": np.asarray(toks, dtype=object)})
        return out.groupby([id_col, "token"], as_index=False, sort=False).agg(
            tf=("token", "size"))

    def _attach_df(g: pd.DataFrame) -> pd.DataFrame:
        # one row per (doc, token) globally -> df = rows per token
        g = g.copy()
        g["df"] = g.groupby("token", sort=False)["token"].transform("size").astype(np.int64)
        return g

    pairs = bucketed_groups(ds.select_columns([id_col, text_col]), ["token"],
                            _attach_df, pre_fn=_pairs, est_rows=est_rows)
    out = group_topk(pairs, [id_col],
                     [("tf", False), ("df", True), ("token", True)],
                     k, rank_col="rk", est_rows=est_rows)
    return out.select_columns([id_col, "token", "tf", "df", "rk"])


def pii_scan(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_emails, n_digit_tokens, has_pii) — the PII-detection
    filter pass of a training-data pipeline: per document, counts of
    email-shaped tokens ('@' with a '.' after it) and phone-shaped tokens
    (a run of ≥ 7 digits). String predicates only (see
    ``text.pii_token_counts``), so the DuckDB mirror is exact — no
    regex-engine capture semantics to reconcile."""

    def _scan(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        c = tx.pii_token_counts(texts)
        return pa.table({
            id_col: batch[id_col],
            "n_emails": c["n_emails"],
            "n_digit_tokens": c["n_digit_tokens"],
            "has_pii": (c["n_emails"] + c["n_digit_tokens"]) > 0,
        })

    return ds.map_batches(_scan, batch_format="pyarrow", batch_size=4096)


def _batch_bigrams(texts: list[str]) -> tuple[list[int], list[str]]:
    """(doc_index, 'w1 w2') pairs for a batch — the only per-row Python is
    the split; counting downstream is vectorized pandas."""
    d_idx: list[int] = []
    bgs: list[str] = []
    for j, t in enumerate(texts):
        ws = tx._WORD_ASCII_RE.findall(t.lower())
        if len(ws) < 2:
            continue
        d_idx.extend([j] * (len(ws) - 1))
        bgs.extend(a + " " + b for a, b in zip(ws, ws[1:]))
    return d_idx, bgs


def heavy_hitters(ds, k: int = 1200, text_col: str = "text"):
    """Frequent word-bigrams by Misra-Gries sketch + EXACT verify — the
    sketch-then-verify heavy-hitter pattern at corpus scale: no token's
    exact count ever shuffles globally in pass 1.

    Pass 1 per batch: exact batch counts (vectorized value_counts), then
    MG-compressed by subtracting the (k+1)-th largest count — the classic
    mergeable-summaries compression. Pigeonhole guarantees the UNION of
    per-batch survivors is a superset of every bigram with global count
    > N/(k+1): if count_b ≤ N_b/(k+1) in every batch, summing bounds the
    global count by N/(k+1). Candidate union is ≤ k×batches and tiny in
    practice (≤ the bigram vocabulary).

    Pass 2: exact counts of ONLY the candidates (broadcast set) + the exact
    total N, bucketed-combined; survivors satisfy n·(k+1) > N exactly —
    identical to the plain SQL HAVING, despite the sketch. Returns
    (bigram, n)."""
    import ray

    from .relational import partial_groupby_sum

    def _mg(batch: pa.Table) -> pa.Table:
        d_idx, bgs = _batch_bigrams(batch[text_col].to_pylist())
        if not bgs:
            return pa.table({"bigram": pa.array([], type=pa.string())})
        counts = pd.Series(bgs).value_counts()
        if len(counts) > k:
            thr = counts.iloc[k]  # (k+1)-th largest
            counts = counts[counts > thr]
        return pa.table({"bigram": pa.array(counts.index.to_numpy(),
                                            type=pa.string())})

    cand = ds.map_batches(_mg, batch_format="pyarrow", batch_size=4096)
    # candidate union: bounded by min(k x batches, bigram vocab) — a
    # documented small-side materialization, broadcast once
    parts = [b["bigram"].to_pandas()
             for b in cand.iter_batches(batch_format="pyarrow")]
    cand_set = set(pd.concat(parts, ignore_index=True)) if parts else set()
    cand_ref = ray.put(sorted(cand_set))

    def _exact(batch: pa.Table) -> pa.Table:
        from .util import cached_state

        cands: set = cached_state(cand_ref, lambda c: set(c), token="hh_cands")
        d_idx, bgs = _batch_bigrams(batch[text_col].to_pylist())
        s = pd.Series(bgs)
        counts = s[s.isin(cands)].value_counts()
        return pa.table({
            "bigram": pa.array(
                np.append(counts.index.to_numpy(), [""]).astype(object),
                type=pa.string()),
            "n": np.append(counts.to_numpy().astype(np.int64),
                           [np.int64(len(bgs))]),
        })

    partials = ds.map_batches(_exact, batch_format="pyarrow", batch_size=4096)
    combined = partial_groupby_sum(partials, ["bigram"], ["n"]).to_pandas()
    total = int(combined.loc[combined["bigram"] == "", "n"].sum())
    out = combined[(combined["bigram"] != "")
                   & (combined["n"] * (k + 1) > total)]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def bigram_lm_score(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus-LM scoring (the perplexity-filter shape of a training-data
    pipeline, integer form): pass 1 trains global bigram counts (shuffle
    bounded by the bigram vocabulary — partial counts per batch); pass 2
    broadcasts the count table and scores every document map-side:
    (doc_id, n_bigrams, sum_bigram_n, min_bigram_n) where sum/min are over
    the GLOBAL counts of the doc's bigrams. High min/avg = formulaic text,
    low = novel text. No second shuffle; exact integers throughout."""
    import ray

    from .relational import partial_groupby_sum
    from .util import cached_state

    def _counts(batch: pa.Table) -> pa.Table:
        d_idx, bgs = _batch_bigrams(batch[text_col].to_pylist())
        if not bgs:
            return pa.table({"b": pa.array([], type=pa.string()),
                             "n": np.array([], np.int64)})
        c = pd.Series(bgs).value_counts()
        return pa.table({"b": pa.array(c.index.to_numpy(), type=pa.string()),
                         "n": c.to_numpy().astype(np.int64)})

    partials = ds.map_batches(_counts, batch_format="pyarrow", batch_size=4096)
    model = partial_groupby_sum(partials, ["b"], ["n"]).to_pandas()
    model_ref = ray.put((model["b"].to_numpy(), model["n"].to_numpy()))

    def _score(batch: pa.Table) -> pa.Table:
        bs, ns = cached_state(
            model_ref,
            lambda m: (np.sort(m[0]), m[1][np.argsort(m[0], kind="stable")]),
            token="bigram_lm_model")
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d_idx, bgs = _batch_bigrams(batch[text_col].to_pylist())
        if not bgs:
            return pa.table({id_col: np.array([], np.int64),
                             "n_bigrams": np.array([], np.int64),
                             "sum_bigram_n": np.array([], np.int64),
                             "min_bigram_n": np.array([], np.int64)})
        pos = np.searchsorted(bs, np.asarray(bgs, dtype=object))
        cnt = ns[pos]  # every doc bigram exists in the trained model
        di = np.asarray(d_idx, np.int64)
        order = np.argsort(di, kind="stable")
        di, cnt = di[order], cnt[order]
        starts = np.flatnonzero(np.r_[True, di[1:] != di[:-1]])
        return pa.table({
            id_col: ids[di[starts]],
            "n_bigrams": np.diff(np.r_[starts, len(di)]).astype(np.int64),
            "sum_bigram_n": np.add.reduceat(cnt, starts),
            "min_bigram_n": np.minimum.reduceat(cnt, starts),
        })

    return ds.map_batches(_score, batch_format="pyarrow", batch_size=4096)


def pack_sequences(ds, seq_len: int = 512, id_col: str = "doc_id",
                   text_col: str = "text", chunk: int = 4096,
                   est_rows: int | None = None):
    """Greedy sequential SEQUENCE PACKING — the concat-and-chunk step every
    LLM training pipeline runs last: documents, in ``id_col`` order, are
    laid end-to-end on a global token axis and cut into fixed-length
    training sequences of ``seq_len`` tokens; a document spanning a cut is
    SPLIT across the neighboring sequences. Emits one row per
    (document x sequence) overlap: (doc_id, seq_id, tok_start, n_toks)
    where tok_start is the document's offset INSIDE the sequence — exactly
    the index a sequence builder needs to copy token runs and reset
    attention masks at document boundaries.

    The global exclusive prefix sum over per-doc token counts is computed
    in two phases so nothing big ever sits on the driver: (1) per-chunk
    token totals (chunk = ``id_col // chunk``) via the map-side combiner,
    cumsum'd on the driver over n_docs/chunk rows (bounded, documented
    assumption) and broadcast via ``ray.put``; (2) ONE bucketed shuffle of
    (doc_id, n_tokens) pairs — never the text — with a vectorized
    within-chunk cumsum + ragged np.repeat expansion per bucket. Token
    counts are whitespace-token counts (``tx.token_counts``), matching the
    ``doc_token_stats`` convention."""
    import ray

    from .relational import bucketed_groups, partial_groupby_sum
    from .util import cached_state

    def _counts(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = tx.token_counts(batch[text_col].to_pylist())
        return pa.table({"_chunk": ids // chunk, id_col: ids,
                         "n_tokens": n})

    toks = ds.map_batches(_counts, batch_format="pyarrow", batch_size=4096)

    sums = partial_groupby_sum(toks, ["_chunk"], ["n_tokens"]).to_pandas()
    sums = sums.sort_values("_chunk")
    chunk_ids = sums["_chunk"].to_numpy().astype(np.int64)
    tot = sums["n_tokens"].to_numpy().astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(tot)[:-1]])
    off_ref = ray.put((chunk_ids, offs))

    def _expand(df: pd.DataFrame) -> pd.DataFrame:
        cids, coffs = cached_state(off_ref, lambda m: m,
                                   token="pack_seq_offsets")
        df = df.sort_values(id_col, kind="mergesort")
        ids = df[id_col].to_numpy()
        n = df["n_tokens"].to_numpy().astype(np.int64)
        ck = df["_chunk"].to_numpy().astype(np.int64)
        # within-chunk exclusive cumsum (rows of a chunk are contiguous
        # after the id sort) + the chunk's broadcast global offset
        cs = np.cumsum(n) - n
        first = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        base = np.repeat(cs[first], np.diff(np.r_[first, len(ck)]))
        s = coffs[np.searchsorted(cids, ck)] + (cs - base)
        keep = n > 0
        ids, n, s = ids[keep], n[keep], s[keep]
        first_seq = s // seq_len
        last_seq = (s + n - 1) // seq_len
        reps = (last_seq - first_seq + 1).astype(np.int64)
        ri = np.repeat(np.arange(len(ids)), reps)
        intra = np.arange(len(ri)) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)[:-1]]), reps)
        seq = first_seq[ri] + intra
        lo = np.maximum(s[ri], seq * seq_len)
        hi = np.minimum(s[ri] + n[ri], (seq + 1) * seq_len)
        return pd.DataFrame({
            id_col: ids[ri], "seq_id": seq.astype(np.int64),
            "tok_start": (lo - seq * seq_len).astype(np.int64),
            "n_toks": (hi - lo).astype(np.int64)})

    return bucketed_groups(toks, ["_chunk"], _expand, est_rows=est_rows)


def _word_ngrams(text: str, n: int) -> list[str]:
    t = text.split()
    return [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]


def decontaminate(docs, bench, n: int = 5, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Benchmark DECONTAMINATION counts — the eval-leakage check every
    training corpus runs before a model sees it: for each training doc,
    how many of its word ``n``-grams appear anywhere in the benchmark
    set. Emits (doc_id, n_ngrams, n_contaminated) for every doc with at
    least one n-gram; the filter/drop decision is a downstream predicate
    on the ratio.

    Matching is on the n-gram STRINGS, not hashes — engine and oracle are
    exact over all inputs with no collision caveat. Scale shape: the
    benchmark side is collected to a distinct-string set and broadcast
    once (``ray.put`` + per-worker ``cached_state``) — benchmark suites
    are small by nature (the fixture's doc_id%97 subset is a stand-in);
    the training side streams map-only, NO shuffle at all."""
    import ray

    from .util import cached_state

    def _extract(batch: pa.Table) -> pa.Table:
        out: set[str] = set()
        for t in batch[text_col].to_pylist():
            out.update(_word_ngrams(t, n))
        return pa.table({"g": pa.array(sorted(out), type=pa.string())})

    parts = bench.map_batches(_extract, batch_format="pyarrow",
                              batch_size=1024)
    bench_set: set[str] = set()
    for b in parts.iter_batches(batch_format="pyarrow"):
        bench_set.update(b["g"].to_pylist())
    bench_ref = ray.put(frozenset(bench_set))

    def _probe(batch: pa.Table) -> pa.Table:
        bs = cached_state(bench_ref, lambda s: s, token="decontam_bench")
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        o_id, o_n, o_c = [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            gs = _word_ngrams(t, n)
            if not gs:
                continue
            o_id.append(ids[i])
            o_n.append(len(gs))
            o_c.append(sum(1 for g in gs if g in bs))
        return pa.table({id_col: np.array(o_id, dtype=np.int64),
                         "n_ngrams": np.array(o_n, dtype=np.int64),
                         "n_contaminated": np.array(o_c, dtype=np.int64)})

    return docs.map_batches(_probe, batch_format="pyarrow", batch_size=1024)


def chunk_documents(ds, window: int = 32, stride: int = 24,
                    text_col: str = "text", id_col: str = "doc_id"):
    """RAG-style OVERLAPPING chunking: each document's token stream split
    into windows of ``window`` tokens advancing by ``stride`` (< window →
    consecutive chunks overlap by window-stride tokens, the standard
    retrieval-index layout). Emits one row per chunk with exact integer
    bookkeeping: (doc_id, chunk_id, start_tok, n_toks, sum_tok_len).

    Chunk count = 1 + max(0, ceil((n - window) / stride)) — the final chunk
    is the (possibly short) tail, and every token lands in >=1 chunk.
    MAP-ONLY: text never shuffles; the per-chunk sums come from one cumsum
    of token lengths per document, so cost is O(tokens), not O(tokens x
    chunks)."""
    from ..functions.text import _WORD_ASCII_RE

    def _chunks(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[text_col].to_pylist()
        o_id, o_ck, o_st, o_nt, o_sl = [], [], [], [], []
        for did, t in zip(ids, texts):
            toks = _WORD_ASCII_RE.findall((t or "").lower())
            n = len(toks)
            if n == 0:
                continue
            lens = np.fromiter((len(w) for w in toks), dtype=np.int64, count=n)
            cum = np.concatenate([[0], np.cumsum(lens)])
            n_chunks = 1 + max(0, (n - window + stride - 1) // stride)
            starts = np.arange(n_chunks, dtype=np.int64) * stride
            ends = np.minimum(starts + window, n)
            o_id.append(np.full(n_chunks, did, dtype=np.int64))
            o_ck.append(np.arange(n_chunks, dtype=np.int64))
            o_st.append(starts)
            o_nt.append(ends - starts)
            o_sl.append(cum[ends] - cum[starts])
        if not o_id:
            z = np.array([], dtype=np.int64)
            return pa.table({id_col: z, "chunk_id": z, "start_tok": z,
                             "n_toks": z, "sum_tok_len": z})
        return pa.table({
            id_col: np.concatenate(o_id),
            "chunk_id": np.concatenate(o_ck),
            "start_tok": np.concatenate(o_st),
            "n_toks": np.concatenate(o_nt),
            "sum_tok_len": np.concatenate(o_sl),
        })

    return ds.map_batches(_chunks, batch_format="pyarrow", batch_size=1024)


def bpe_pair_topk(ds, k: int = 50, text_col: str = "text",
                  est_rows: int | None = None):
    """ONE BPE MERGE ROUND over the corpus: count adjacent word-token pairs
    and return the top-k merge candidates — the inner loop of tokenizer
    training (at word granularity; byte granularity is the same pipeline
    with a different pre_fn). Same distributed shape as :func:`vocab_topk`:
    per-batch partial pair counts (text never shuffles, only (pair, n)
    partials), bucketed combine by pair, per-bucket top-k, k·B-bounded
    final merge. Deterministic (n desc, pair asc) ties end-to-end."""
    from ..functions.text import _WORD_ASCII_RE
    from .relational import bucketed_groups

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        pairs: list[str] = []
        for t in df[text_col]:
            ws = _WORD_ASCII_RE.findall((t or "").lower())
            pairs.extend(f"{a} {b}" for a, b in zip(ws, ws[1:]))
        vc = pd.Series(pairs, dtype=object).value_counts()
        return pd.DataFrame({"pair": vc.index.astype(object),
                             "n": vc.to_numpy().astype(np.int64)})

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("pair", as_index=False, sort=False)["n"].sum()
        tot = tot.sort_values(["n", "pair"], ascending=[False, True],
                              kind="mergesort")
        return tot.head(k)

    parts = bucketed_groups(ds.select_columns([text_col]), ["pair"], _final,
                            pre_fn=_pre, est_rows=est_rows)
    merged = parts.to_pandas().sort_values(["n", "pair"],
                                           ascending=[False, True],
                                           kind="mergesort").head(k)
    return pa.table({"pair": merged["pair"].astype(str).to_numpy(),
                     "n": merged["n"].to_numpy().astype(np.int64)})


def collocation_pmi(ds, min_count: int = 5, text_col: str = "text",
                    est_rows: int | None = None):
    """PMI COLLOCATION MINING — rank adjacent word pairs by pointwise
    mutual information, the phrase-discovery pass ("new york", "machine
    learning") of corpus curation, in exact integer form:

        pmi_q = c_xy · N² · 100 // (c_x · c_y · M)

    (the argument of log-PMI, floor-quantized to centi-units — monotone in
    PMI, so ranking and thresholds agree with the float form). Distributed
    shape: text never shuffles — per-batch (word, n) and (w1, w2, n)
    partials ride two bucketed combines; the unigram table is
    VOCAB-BOUNDED and is broadcast (ray.put) into the bigram finisher,
    same contract as ``doc_lm_score``'s corpus model. Emits every bigram
    with c_xy >= min_count. int64-exact while max(c_xy)·N²·100 < 2^63
    (N ≲ 2·10⁶ at typical burstiness; past that report num/den columns)."""
    import ray

    from ..functions.text import _WORD_ASCII_RE
    from .relational import bucketed_groups
    from .util import cached_state

    def _pre_uni(df: pd.DataFrame) -> pd.DataFrame:
        words: list[str] = []
        for t in df[text_col]:
            words.extend(_WORD_ASCII_RE.findall((t or "").lower()))
        vc = pd.Series(words, dtype=object).value_counts()
        return pd.DataFrame({"word": vc.index.astype(object),
                             "n": vc.to_numpy().astype(np.int64)})

    def _sum_counts(g: pd.DataFrame, key: list[str]) -> pd.DataFrame:
        return g.groupby(key, as_index=False, sort=False)["n"].sum()

    txt = ds.select_columns([text_col])
    uni = bucketed_groups(txt, ["word"], lambda g: _sum_counts(g, ["word"]),
                          pre_fn=_pre_uni, est_rows=est_rows).to_pandas()
    # vocab-bounded driver materialization (documented contract above)
    n_total = int(uni["n"].sum())
    uni_ref = ray.put(dict(zip(uni["word"], uni["n"].astype(int))))

    def _pre_bi(df: pd.DataFrame) -> pd.DataFrame:
        pairs: list[tuple[str, str]] = []
        for t in df[text_col]:
            ws = _WORD_ASCII_RE.findall((t or "").lower())
            pairs.extend(zip(ws, ws[1:]))
        vc = pd.Series(pairs, dtype=object).value_counts()
        idx = vc.index
        return pd.DataFrame({"w1": [a for a, _ in idx],
                             "w2": [b for _, b in idx],
                             "n": vc.to_numpy().astype(np.int64)})

    big = bucketed_groups(txt, ["w1", "w2"],
                          lambda g: _sum_counts(g, ["w1", "w2"]),
                          pre_fn=_pre_bi, est_rows=est_rows).materialize()
    m_total = int(big.sum("n"))

    def _pmi(df: pd.DataFrame) -> pd.DataFrame:
        u = cached_state(uni_ref, lambda m: m, token="collocation_unigrams")
        df = df[df["n"] >= min_count]
        cxy = df["n"].to_numpy(np.int64)
        cx = np.array([u[w] for w in df["w1"]], dtype=np.int64)
        cy = np.array([u[w] for w in df["w2"]], dtype=np.int64)
        pmi = cxy * n_total * n_total * 100 // (cx * cy * m_total)
        return pd.DataFrame({"w1": df["w1"].to_numpy(object),
                             "w2": df["w2"].to_numpy(object),
                             "c_xy": cxy, "pmi_q": pmi})

    return big.map_batches(_pmi, batch_format="pandas", batch_size=65536)


def bpe_merge_rounds(ds, rounds: int = 3, text_col: str = "text",
                     est_rows: int | None = None):
    """The full BPE TRAINER LOOP (word granularity): per round, count
    adjacent token pairs across the corpus, pick the single best merge
    (count desc, pair asc — the deterministic argmax), then RE-TOKENIZE
    every document by greedy left-to-right application of the merge
    ("a a a" + (a,a) → [a_a, a], never overlapping) — the part
    `bpe_pair_topk` stops short of, and what makes BPE an iterative
    trainer rather than a one-shot count. Returns one row per round:
    (round, pair, n_merged).

    Scale shape: text tokenizes ONCE; per round one (pair, n) combiner
    shuffle + a per-block top-1 (driver sees ≤ #blocks candidate rows),
    then one map pass applies the broadcast merge and the token corpus
    re-materializes (the standard iterative-trainer checkpoint). Token
    lists never shuffle."""
    from ..functions.text import _WORD_ASCII_RE
    from .relational import partial_groupby_sum

    def _tok(batch: pa.Table) -> pa.Table:
        toks = [_WORD_ASCII_RE.findall((t or "").lower())
                for t in batch[text_col].to_pylist()]
        return pa.table({"toks": pa.array(toks, type=pa.list_(pa.string()))})

    cur = ds.select_columns([text_col]).map_batches(
        _tok, batch_format="pyarrow", batch_size=2048).materialize()

    out_round, out_pair, out_n = [], [], []
    for r in range(1, rounds + 1):
        def _pairs(batch: pa.Table) -> pa.Table:
            res: list[str] = []
            for lst in batch["toks"].to_pylist():
                res.extend(f"{a} {b}" for a, b in zip(lst, lst[1:]))
            return pa.table({"pair": pa.array(res, type=pa.string())})

        cnt = partial_groupby_sum(cur.map_batches(
            _pairs, batch_format="pyarrow", batch_size=2048),
            ["pair"], [], count_as="n", est_rows=est_rows)

        def _top1(df: pd.DataFrame) -> pd.DataFrame:
            d = df.sort_values(["n", "pair"], ascending=[False, True],
                               kind="mergesort")
            return d.head(1)

        cand = cnt.map_batches(_top1, batch_format="pandas",
                               batch_size=1 << 20).to_pandas()
        cand = cand.sort_values(["n", "pair"], ascending=[False, True],
                                kind="mergesort")
        if not len(cand):
            break
        best = str(cand.iloc[0]["pair"])
        a, b = best.split(" ")
        merged_tok = f"{a}_{b}"

        def _merge(batch: pa.Table) -> pa.Table:
            new: list[list[str]] = []
            mct = np.zeros(batch.num_rows, np.int64)
            for row, lst in enumerate(batch["toks"].to_pylist()):
                res: list[str] = []
                i, n = 0, len(lst)
                while i < n:
                    if i < n - 1 and lst[i] == a and lst[i + 1] == b:
                        res.append(merged_tok)
                        mct[row] += 1
                        i += 2
                    else:
                        res.append(lst[i])
                        i += 1
                new.append(res)
            return pa.table({
                "toks": pa.array(new, type=pa.list_(pa.string())),
                "m": mct})

        cur = cur.map_batches(_merge, batch_format="pyarrow",
                              batch_size=2048).materialize()
        n_merged = int(cur.sum("m"))
        cur = cur.select_columns(["toks"])
        out_round.append(r)
        out_pair.append(best)
        out_n.append(n_merged)
    return pa.table({"round": pa.array(out_round, type=pa.int64()),
                     "pair": pa.array(out_pair, type=pa.string()),
                     "n_merged": pa.array(out_n, type=pa.int64())})
