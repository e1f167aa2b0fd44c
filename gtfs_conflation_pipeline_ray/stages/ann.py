"""Similarity search over an embedding column (list<float>): brute-force
cosine top-k as the exact baseline, with the partial-top-k pattern that scales
(per-batch local top-k → small grouped global top-k; the query matrix is
broadcast once, never re-shipped per batch).

The scale path (documented, same skeleton): LSH/IVF-bucket the vectors by a
coarse quantizer inside ``map_batches``, route queries to their nearest
buckets, and run this exact kernel per bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .util import pool_size


def _batch_matrix(batch: pa.Table, col: str, dim: int | None = None) -> np.ndarray:
    """(rows, dim) float64 matrix from a list<float> column. Offset-aware
    (``combine_chunks().flatten()`` honors slice offsets, unlike reading the
    chunk's raw values buffer) and safe on empty batches."""
    arr = batch[col].combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros((0, dim or 0), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, len(flat) // n)


def quantize_fixed(x: np.ndarray) -> np.ndarray:
    """floor(x * 1e6 + 0.5) as int64 — the fixed-point embedding used for
    EXACT (SQL-replicable) bucket decisions. Each element is one correctly
    rounded double op, so numpy and DuckDB agree bit-for-bit; all downstream
    bucket math is integer."""
    return np.floor(x * 1e6 + 0.5).astype(np.int64)


def int_planes(dim: int, n_planes: int) -> np.ndarray:
    """(dim, n_planes) integer hyperplane matrix in [-1000, 1000], from a
    closed-form index mix (no RNG) so a SQL oracle regenerates it exactly.
    Integer dots stay < 2^53: |dot| <= dim * |x_q| * 1000."""
    d = np.arange(dim, dtype=np.int64)[:, None]
    j = np.arange(n_planes, dtype=np.int64)[None, :]
    t = (d * 73856093 + j * 19349663 + 7) % 1000003
    return t * 2654435761 % 2001 - 1000


def sign_planes(n_rows: int, dim: int, salt: int = 3) -> np.ndarray:
    """(n_rows, dim) ±1 matrix from a closed-form index mix — every row has
    identical L2 norm (sqrt(dim)), so nearest-row by cosine == argmax of the
    raw integer dot (no per-row norm divide, fully exact)."""
    j = np.arange(n_rows, dtype=np.int64)[:, None]
    d = np.arange(dim, dtype=np.int64)[None, :]
    t = (j * 83492791 + d * 52916611 + salt) % 1000003
    h = t * 2654435761 % 4294967296
    return np.where((h >> 15) % 2 == 1, np.int64(1), np.int64(-1))


class _QueryState:
    """Per-worker ANN state: broadcast query matrix + its L2 norms. The raw
    (un-normalized) matrix is kept so similarity is computed as
    dot / (|q| * |x|) — the same expression order as DuckDB's
    ``list_cosine_similarity`` oracle (exactness across engines)."""

    def __init__(self, q: pa.Table, vec_col: str):
        self.qid = q["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.qm = _batch_matrix(q, vec_col)
        self.qnorm = np.linalg.norm(self.qm, axis=1)

    def sims_against(self, x: np.ndarray) -> np.ndarray:
        xnorm = np.maximum(np.linalg.norm(x, axis=1), 1e-300)
        return (self.qm @ x.T) / (self.qnorm[:, None] * xnorm[None, :])


def cosine_topk(vectors, queries_ref, k: int, id_col: str = "vec_id",
                vec_col: str = "embedding", concurrency: int | None = None):
    """Exact global cosine top-k per query: per-batch local top-k (the big
    compute, matmul per Arrow batch; query matrix broadcast once and cached
    per worker) then a tiny grouped global top-k with a deterministic
    (sim desc, vec_id asc) order. Returns (query_id, vec_id, sim_rank, sim).

    The query side is a broadcast ``ray.put`` handle — right for bounded
    query sets; for corpus-vs-corpus joins where BOTH sides are unbounded
    use :func:`sharded_cosine_join` (no broadcast, one keyed exchange)."""
    from .util import cached_state

    def _local(batch: pa.Table) -> pa.Table:
        st: _QueryState = cached_state(queries_ref, lambda q: _QueryState(q, vec_col),
                                       token=f"_QueryState:{vec_col}")
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _batch_matrix(batch, vec_col, dim=st.qm.shape[1])
        if len(ids) == 0:
            return pa.table({"query_id": np.array([], dtype=np.int64),
                             "vec_id": np.array([], dtype=np.int64),
                             "sim": np.array([], dtype=np.float64)})
        sims = st.sims_against(x)  # (Q, B), oracle expression order
        # mask self-matches so a query never returns itself
        sims = np.where(st.qid[:, None] == ids[None, :], -np.inf, sims)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        ps = np.take_along_axis(sims, part, axis=1)
        keep = np.isfinite(ps.reshape(-1))  # drop masked self-matches here
        return pa.table(
            {
                "query_id": np.repeat(st.qid, kk)[keep],
                "vec_id": ids[part].reshape(-1)[keep],
                "sim": ps.reshape(-1)[keep],
            }
        )

    local = vectors.map_batches(_local, batch_format="pyarrow", batch_size=4096)
    return _merge_topk(local, k)


def _merge_topk(local, k: int):
    """Global top-k merge of per-batch partials via the bucketed-combine
    pattern (``relational.group_topk``): the shuffle moves at most k rows per
    (query, batch) into ~CPU-count buckets, and each bucket finishes with ONE
    vectorized sort — no per-group Python, so 1M distinct queries cost the
    same per row as 10 (Ray-native ``groupby().map_groups`` runs Python per
    group and collapses at high key cardinality; see relational.py:9-22)."""
    from .relational import group_topk

    return group_topk(local, ["query_id"], [("sim", False), ("vec_id", True)],
                      k, rank_col="sim_rank")


def lsh_candidate_indices(qsig: np.ndarray, xsig: np.ndarray, n_planes: int):
    """Per query: indices of vectors whose signature is within Hamming
    distance 1 (multiprobe radius 1). Bucket-routed — vectors are grouped by
    signature once (sort + searchsorted) and each query probes its own
    signature plus the ``n_planes`` single-bit flips, so work is
    O(Q * (n_planes+1) * bucket_size), NOT O(Q * N). Factored out so tests
    can assert the candidate count is sub-linear."""
    order = np.argsort(xsig, kind="stable")
    xs = xsig[order]
    out = []
    for qs in qsig:
        probes = np.concatenate(([qs], qs ^ (np.int64(1) << np.arange(n_planes))))
        lo = np.searchsorted(xs, probes, side="left")
        hi = np.searchsorted(xs, probes, side="right")
        cand = np.concatenate([order[a:b] for a, b in zip(lo, hi)]) if len(probes) else order[:0]
        out.append(np.sort(cand))
    return out


def lsh_topk(vectors, queries_ref, k: int, id_col: str = "vec_id",
             vec_col: str = "embedding", n_planes: int = 10, seed: int = 42):
    """Approximate cosine top-k via random-hyperplane LSH — the scale path:
    each vector lands in a sign-pattern bucket; a query scores ONLY the
    candidates gathered from its own bucket and buckets within Hamming
    distance 1 (multiprobe). The dot products are computed on the gathered
    candidate columns alone (no full Q x N matmul), so compute is
    proportional to the candidate count; a final grouped top-k merges the
    per-batch partials. Recall < 1 by design (approximate); deterministic
    given the seed."""
    from .util import cached_state

    def _build(q: pa.Table):
        st = _QueryState(q, vec_col)
        dim = st.qm.shape[1]
        planes = int_planes(dim, n_planes)  # closed-form: SQL-replicable
        qsig = ((quantize_fixed(st.qm) @ planes) > 0) @ (1 << np.arange(n_planes))
        return st, planes, qsig.astype(np.int64)

    def _local(batch: pa.Table) -> pa.Table:
        st, planes, qsig = cached_state(
            queries_ref, _build, token=f"lsh:{vec_col}:{n_planes}:{seed}")
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _batch_matrix(batch, vec_col, dim=planes.shape[0])
        if len(ids) == 0:
            return pa.table({"query_id": np.array([], dtype=np.int64),
                             "vec_id": np.array([], dtype=np.int64),
                             "sim": np.array([], dtype=np.float64)})
        xsig = (((quantize_fixed(x) @ planes) > 0)
                @ (1 << np.arange(n_planes))).astype(np.int64)
        xnorm = np.maximum(np.linalg.norm(x, axis=1), 1e-300)
        qids, vids, sims = [], [], []
        for qi, cand in enumerate(lsh_candidate_indices(qsig, xsig, n_planes)):
            cand = cand[ids[cand] != st.qid[qi]]  # never return self
            if len(cand) == 0:
                continue
            s = (x[cand] @ st.qm[qi]) / (st.qnorm[qi] * xnorm[cand])
            kk = min(k, len(cand))
            top = np.argpartition(-s, kk - 1)[:kk]
            qids.append(np.full(kk, st.qid[qi], dtype=np.int64))
            vids.append(ids[cand[top]])
            sims.append(s[top])
        cat = lambda a, dt: np.concatenate(a) if a else np.array([], dtype=dt)
        return pa.table({"query_id": cat(qids, np.int64),
                         "vec_id": cat(vids, np.int64),
                         "sim": cat(sims, np.float64)})

    local = vectors.map_batches(_local, batch_format="pyarrow", batch_size=4096)
    return _merge_topk(local, k)


def ivf_candidate_lists(assign: np.ndarray, q_probe: np.ndarray):
    """Per query: indices of vectors whose centroid assignment is in the
    query's probe set. Bucket-routed (sort + searchsorted), so work is
    proportional to the probed lists' sizes — the IVF inverted-file gather.
    Factored out so tests can assert sub-linear candidate counts."""
    order = np.argsort(assign, kind="stable")
    sa = assign[order]
    out = []
    for probes in q_probe:
        lo = np.searchsorted(sa, probes, side="left")
        hi = np.searchsorted(sa, probes, side="right")
        cand = np.concatenate([order[a:b] for a, b in zip(lo, hi)]) if len(probes) else order[:0]
        out.append(np.sort(cand))
    return out


def ivf_topk(vectors, queries_ref, k: int, id_col: str = "vec_id",
             vec_col: str = "embedding", n_centroids: int = 64, nprobe: int = 8,
             seed: int = 42):
    """Approximate cosine top-k via an IVF coarse quantizer — the second
    scale path next to LSH: a deterministic centroid codebook (seeded random
    directions on the unit sphere — trainable k-means slots in the same
    skeleton) assigns every vector to its nearest centroid inside
    ``map_batches``; each query probes only its ``nprobe`` nearest centroid
    lists and scores the gathered candidates (no full Q x N matmul). Final
    grouped top-k merges per-batch partials. Recall < 1 by design;
    deterministic given the seed."""
    from .util import cached_state

    def _build(q: pa.Table):
        st = _QueryState(q, vec_col)
        # ±1 codebook rows share one norm, so argmax of the integer dot IS
        # the nearest centroid by cosine — exact and SQL-replicable
        cents = sign_planes(n_centroids, st.qm.shape[1])
        qdots = quantize_fixed(st.qm) @ cents.T
        q_probe = np.argsort(-qdots, axis=1, kind="stable")[:, :nprobe]
        return st, cents, np.sort(q_probe, axis=1)

    def _local(batch: pa.Table) -> pa.Table:
        st, cents, q_probe = cached_state(
            queries_ref, _build,
            token=f"ivf:{vec_col}:{n_centroids}:{nprobe}:{seed}")
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _batch_matrix(batch, vec_col, dim=cents.shape[1])
        if len(ids) == 0:
            return pa.table({"query_id": np.array([], dtype=np.int64),
                             "vec_id": np.array([], dtype=np.int64),
                             "sim": np.array([], dtype=np.float64)})
        xnorm = np.maximum(np.linalg.norm(x, axis=1), 1e-300)
        assign = np.argmax(quantize_fixed(x) @ cents.T, axis=1)
        qids, vids, sims = [], [], []
        for qi, cand in enumerate(ivf_candidate_lists(assign, q_probe)):
            cand = cand[ids[cand] != st.qid[qi]]  # never return self
            if len(cand) == 0:
                continue
            s = (x[cand] @ st.qm[qi]) / (st.qnorm[qi] * xnorm[cand])
            kk = min(k, len(cand))
            top = np.argpartition(-s, kk - 1)[:kk]
            qids.append(np.full(kk, st.qid[qi], dtype=np.int64))
            vids.append(ids[cand[top]])
            sims.append(s[top])
        cat = lambda a, dt: np.concatenate(a) if a else np.array([], dtype=dt)
        return pa.table({"query_id": cat(qids, np.int64),
                         "vec_id": cat(vids, np.int64),
                         "sim": cat(sims, np.float64)})

    local = vectors.map_batches(_local, batch_format="pyarrow", batch_size=4096)
    return _merge_topk(local, k)


def cosine_neardup_pairs(vectors, threshold: float = 0.95, id_col: str = "vec_id",
                         vec_col: str = "embedding", n_planes: int = 12,
                         seed: int = 42, bucket_cap: int = 512):
    """Embedding-cosine near-duplicate pairs — the dedup-family member over
    the vector column: hyperplane-sign LSH buckets the vectors (cosine-similar
    vectors collide with high probability), each bucket verifies its members
    with EXACT pairwise cosine, and pairs >= ``threshold`` survive. The only
    shuffle moves (signature, id, vector) rows into buckets; no O(N^2)
    global pass. Approximate recall (bucket boundaries), exact precision
    (every emitted pair is verified). Returns (vec_a, vec_b, sim_q4), each
    unordered pair once; degenerate buckets capped with a logged drop."""
    import logging

    from .relational import bucketed_groups
    from ..functions.numeric import cents

    class _Planes:
        def __init__(self):
            self.planes: np.ndarray | None = None

    state = _Planes()

    def _sig(batch: pa.Table) -> pa.Table:
        x = _batch_matrix(batch, vec_col)
        if x.shape[0] == 0:
            # typed empty output; never seed planes from an empty batch (a
            # dim-1 plane matrix cached here would poison every later batch
            # on this worker)
            return pa.table({"bucket": np.array([], dtype=np.int64),
                             id_col: batch[id_col],
                             vec_col: batch[vec_col]})
        if state.planes is None:
            state.planes = int_planes(x.shape[1], n_planes)  # SQL-replicable
        xsig = (((quantize_fixed(x) @ state.planes) > 0)
                @ (1 << np.arange(n_planes))).astype(np.int64)
        return pa.table({
            "bucket": xsig,
            id_col: batch[id_col],
            vec_col: batch[vec_col],
        })

    sigs = vectors.map_batches(_sig, batch_format="pyarrow", batch_size=4096)

    def _verify(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out, s_out = [], [], []
        n_dropped = 0
        for _, grp in g.groupby("bucket", sort=False):
            grp = grp.drop_duplicates(id_col).sort_values(id_col)
            if len(grp) < 2:
                continue
            if len(grp) > bucket_cap:
                n_dropped += len(grp) - bucket_cap
                grp = grp.head(bucket_cap)
            ids = grp[id_col].to_numpy().astype(np.int64)
            x = np.stack(grp[vec_col].to_numpy())
            norm = np.maximum(np.linalg.norm(x, axis=1), 1e-300)
            sims = (x @ x.T) / (norm[:, None] * norm[None, :])
            ii, jj = np.triu_indices(len(ids), k=1)
            ok = sims[ii, jj] >= threshold
            a_out.append(ids[ii[ok]])
            b_out.append(ids[jj[ok]])
            s_out.append(sims[ii, jj][ok])
        if n_dropped:
            logging.getLogger(__name__).warning(
                "cosine_neardup_pairs: capped %d members beyond %d per bucket",
                n_dropped, bucket_cap,
            )
        if not a_out:
            return pd.DataFrame({"vec_a": np.array([], np.int64),
                                 "vec_b": np.array([], np.int64),
                                 "sim_q4": np.array([], np.int64)})
        return pd.DataFrame({"vec_a": np.concatenate(a_out),
                             "vec_b": np.concatenate(b_out),
                             "sim_q4": cents(np.concatenate(s_out), 10000)})

    return bucketed_groups(sigs, ["bucket"], _verify)


def l2_norms(vectors, id_col: str = "vec_id", vec_col: str = "embedding"):
    """(id, l2_norm) per vector — vectorized per batch."""

    def _n(batch: pa.Table) -> pa.Table:
        x = _batch_matrix(batch, vec_col)
        return pa.table(
            {id_col: batch[id_col], "l2_norm": np.sqrt(np.einsum("ij,ij->i", x, x))}
        )

    return vectors.map_batches(_n, batch_format="pyarrow", batch_size=8192)


def kmeans_assign_step(vectors, centroids_ref, id_col: str = "vec_id",
                       vec_col: str = "embedding", batch_size: int = 4096):
    """One EXACT Lloyd iteration over fixed-point embeddings — the IVF
    codebook-training step ``ivf_topk``'s docstring promises slots into the
    same skeleton ("trainable k-means"). Assignment: nearest centroid by
    integer L2 distance² over ``quantize_fixed`` components (every term
    < 2^48 at dim 64, so int64 matmul is exact; ties break to the smallest
    centroid id via argmin-first-occurrence). Update: per-(cluster, dim)
    component SUMS plus a per-cluster count row at dim = −1, kept integer so
    the new-centroid numerators/denominators compare exactly against the
    SQL mirror — the float division happens consumer-side, outside the
    compared surface.

    Combiner-first: each batch emits at most k×(dim+1) partial rows (never
    the assignments), so the shuffle is codebook-sized regardless of input.
    Empty clusters emit nothing (matching the SQL GROUP BY omission).

    ``centroids_ref``: ``ray.put`` of the quantized int64 (k, dim) codebook.
    Returns rows (cluster_id, dim, sum_q); dim = −1 carries the count."""
    from .relational import partial_groupby_sum
    from .util import cached_state

    def _step(batch: pa.Table) -> pa.Table:
        cents: np.ndarray = cached_state(
            centroids_ref, lambda c: np.asarray(c, dtype=np.int64),
            token="kmeans_cents")
        x = _batch_matrix(batch, vec_col, dim=cents.shape[1])
        if len(x) == 0:
            return pa.table({"cluster_id": np.array([], np.int64),
                             "dim": np.array([], np.int64),
                             "sum_q": np.array([], np.int64)})
        xq = quantize_fixed(x)
        dots = xq @ cents.T
        x2 = np.einsum("ij,ij->i", xq, xq)
        c2 = np.einsum("ij,ij->i", cents, cents)
        d2 = x2[:, None] + c2[None, :] - 2 * dots
        assign = np.argmin(d2, axis=1)  # first occurrence = smallest cid
        k, dim = cents.shape
        sums = np.zeros((k, dim), dtype=np.int64)
        np.add.at(sums, assign, xq)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        nz = np.flatnonzero(counts)
        cluster_id = np.concatenate([np.repeat(nz, dim), nz])
        dims = np.concatenate([np.tile(np.arange(dim, dtype=np.int64), len(nz)),
                               np.full(len(nz), -1, dtype=np.int64)])
        vals = np.concatenate([sums[nz].reshape(-1), counts[nz]])
        return pa.table({"cluster_id": cluster_id, "dim": dims, "sum_q": vals})

    partials = vectors.map_batches(_step, batch_format="pyarrow",
                                   batch_size=batch_size)
    return partial_groupby_sum(partials, ["cluster_id", "dim"], ["sum_q"])


def _pq_codes_matrix(xq: np.ndarray, cents: np.ndarray, m: int) -> np.ndarray:
    """(n, m) subspace codes: per subspace, argmin integer L2 distance² to
    the codebook rows (first occurrence = smallest code — the deterministic
    tie rule shared with ``kmeans_assign_step``)."""
    n, dim = xq.shape
    sub = dim // m
    codes = np.empty((n, m), dtype=np.int64)
    for j in range(m):
        xs = xq[:, j * sub:(j + 1) * sub]
        cs = cents[:, j * sub:(j + 1) * sub]
        d2 = (np.einsum("ij,ij->i", xs, xs)[:, None]
              + np.einsum("ij,ij->i", cs, cs)[None, :] - 2 * (xs @ cs.T))
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def pq_encode(vectors, cents_ref, id_col: str = "vec_id",
              vec_col: str = "embedding", m: int = 8,
              batch_size: int = 4096):
    """Product-Quantization encoding — the PQ half of IVF-PQ (`ivf_topk` is
    the IVF half; `kmeans_assign_step` trains the codebooks): each vector
    splits into ``m`` subvectors, each encoded as the id of its nearest
    per-subspace codebook row (integer L2 over ``quantize_fixed``
    components, exact). Codes pack into ONE int64 (4 bits/subspace, K=16) —
    the 16-byte-per-vector memory layout that makes billion-scale vector
    search feasible. ``cents_ref``: ray.put of the quantized (16, dim)
    codebook matrix (row id = code). Returns (id, pq_code)."""
    from .util import cached_state

    def _enc(batch: pa.Table) -> pa.Table:
        cents: np.ndarray = cached_state(
            cents_ref, lambda c: np.asarray(c, dtype=np.int64),
            token="pq_cents")
        x = _batch_matrix(batch, vec_col, dim=cents.shape[1])
        if len(x) == 0:
            return pa.table({id_col: np.array([], np.int64),
                             "pq_code": np.array([], np.int64)})
        codes = _pq_codes_matrix(quantize_fixed(x), cents, m)
        packed = (codes << (4 * np.arange(m, dtype=np.int64))).sum(axis=1)
        return pa.table({id_col: batch[id_col], "pq_code": packed})

    return vectors.map_batches(_enc, batch_format="pyarrow",
                               batch_size=batch_size)


def pq_adc_topk(vectors, cents_ref, queries_ref, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                m: int = 8, batch_size: int = 4096):
    """Asymmetric-Distance (ADC) top-k over PQ codes: per worker, each query
    precomputes an (m, K) lookup table of integer subspace distances to the
    codebook; scoring a vector is then m table lookups + a sum — never a
    full-dimension distance. Exact int64 end-to-end, so the SQL mirror
    reproduces the ranking bit-for-bit (ties → smallest vec_id). Returns
    (query_id, vec_id, adc, adc_rank) for the k nearest BY ADC (PQ's
    quantization error is part of the definition, not noise)."""
    from .relational import group_topk
    from .util import cached_state

    def _build(q_tab):
        import ray as _ray
        cents = np.asarray(_ray.get(cents_ref), dtype=np.int64)
        qm = quantize_fixed(_batch_matrix(q_tab, vec_col))
        qid = q_tab[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        K, dim = cents.shape
        sub = dim // m
        luts = np.empty((len(qid), m, K), dtype=np.int64)
        for j in range(m):
            qs = qm[:, j * sub:(j + 1) * sub]
            cs = cents[:, j * sub:(j + 1) * sub]
            luts[:, j, :] = (np.einsum("ij,ij->i", qs, qs)[:, None]
                             + np.einsum("ij,ij->i", cs, cs)[None, :]
                             - 2 * (qs @ cs.T))
        return cents, qid, luts

    def _local(batch: pa.Table) -> pa.Table:
        cents, qid, luts = cached_state(queries_ref, _build, token="pq_adc")
        x = _batch_matrix(batch, vec_col, dim=cents.shape[1])
        if len(x) == 0:
            return pa.table({"query_id": np.array([], np.int64),
                             "vec_id": np.array([], np.int64),
                             "adc": np.array([], np.int64)})
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = _pq_codes_matrix(quantize_fixed(x), cents, m)
        qids, vids, adcs = [], [], []
        ar = np.arange(m)
        for qi in range(len(qid)):
            adc = luts[qi, ar, codes].sum(axis=1)
            mask = ids != qid[qi]  # never return self
            vv, aa = ids[mask], adc[mask]
            kk = min(k, len(vv))
            if kk == 0:
                continue
            top = np.lexsort((vv, aa))[:kk]  # (adc asc, vec_id asc)
            qids.append(np.full(kk, qid[qi], dtype=np.int64))
            vids.append(vv[top])
            adcs.append(aa[top])
        cat = lambda a: np.concatenate(a) if a else np.array([], np.int64)
        return pa.table({"query_id": cat(qids), "vec_id": cat(vids),
                         "adc": cat(adcs)})

    local = vectors.map_batches(_local, batch_format="pyarrow",
                                batch_size=batch_size)
    return group_topk(local, ["query_id"], [("adc", True), ("vec_id", True)],
                      k, rank_col="adc_rank")


def ivfpq_topk(vectors, pq_cents_ref, queries_ref, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding",
               n_centroids: int = 64, nprobe: int = 8, m: int = 8,
               batch_size: int = 4096):
    """IVF-PQ — the composed billion-scale search index: the sign-plane
    coarse quantizer routes each query to its ``nprobe`` nearest inverted
    lists (exact integer argmax, as ``ivf_topk``), and ONLY the routed
    candidates are scored, by ADC over their PQ codes (as ``pq_adc_topk``)
    — m table lookups per candidate, never a full-dimension distance, and
    16 bytes of per-vector state. Every decision is integer, so the SQL
    mirror reproduces routing, codes and ranking bit-for-bit. Returns
    (query_id, vec_id, adc, adc_rank)."""
    from .relational import group_topk
    from .util import cached_state

    def _build(q_tab):
        import ray as _ray
        cents_pq = np.asarray(_ray.get(pq_cents_ref), dtype=np.int64)
        qm = quantize_fixed(_batch_matrix(q_tab, vec_col))
        qid = q_tab[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dim = cents_pq.shape[1]
        coarse = sign_planes(n_centroids, dim)
        qdots = qm @ coarse.T
        # top-nprobe lists, ties to the smallest j (stable argsort on -dot)
        q_probe = np.argsort(-qdots, axis=1, kind="stable")[:, :nprobe]
        q_probe = np.sort(q_probe, axis=1)
        K = cents_pq.shape[0]
        sub = dim // m
        luts = np.empty((len(qid), m, K), dtype=np.int64)
        for j in range(m):
            qs = qm[:, j * sub:(j + 1) * sub]
            cs = cents_pq[:, j * sub:(j + 1) * sub]
            luts[:, j, :] = (np.einsum("ij,ij->i", qs, qs)[:, None]
                             + np.einsum("ij,ij->i", cs, cs)[None, :]
                             - 2 * (qs @ cs.T))
        return cents_pq, coarse, qid, q_probe, luts

    def _local(batch: pa.Table) -> pa.Table:
        cents_pq, coarse, qid, q_probe, luts = cached_state(
            queries_ref, _build, token=f"ivfpq:{n_centroids}:{nprobe}:{m}")
        x = _batch_matrix(batch, vec_col, dim=cents_pq.shape[1])
        if len(x) == 0:
            return pa.table({"query_id": np.array([], np.int64),
                             "vec_id": np.array([], np.int64),
                             "adc": np.array([], np.int64)})
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        xq = quantize_fixed(x)
        assign = np.argmax(xq @ coarse.T, axis=1)  # ties -> smallest j
        codes = _pq_codes_matrix(xq, cents_pq, m)
        ar = np.arange(m)
        qids, vids, adcs = [], [], []
        for qi, cand in enumerate(ivf_candidate_lists(assign, q_probe)):
            cand = cand[ids[cand] != qid[qi]]  # never return self
            if len(cand) == 0:
                continue
            adc = luts[qi, ar, codes[cand]].sum(axis=1)
            kk = min(k, len(cand))
            top = np.lexsort((ids[cand], adc))[:kk]
            qids.append(np.full(kk, qid[qi], dtype=np.int64))
            vids.append(ids[cand][top])
            adcs.append(adc[top])
        cat = lambda a: np.concatenate(a) if a else np.array([], np.int64)
        return pa.table({"query_id": cat(qids), "vec_id": cat(vids),
                         "adc": cat(adcs)})

    local = vectors.map_batches(_local, batch_format="pyarrow",
                                batch_size=batch_size)
    return group_topk(local, ["query_id"], [("adc", True), ("vec_id", True)],
                      k, rank_col="adc_rank")


def semantic_dedup(vectors, centroids_ref, threshold: float = 0.9,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   batch_size: int = 4096):
    """SemDeDup-style semantic deduplication (cluster-then-verify, the
    embedding sibling of MinHash dedup at corpus scale): every vector is
    assigned to its nearest codebook centroid (EXACT integer L2 over
    ``quantize_fixed`` components, ties → smallest centroid id — the same
    assignment rule as ``kmeans_assign_step``), then near-duplicate pairs
    are verified with exact pairwise cosine ONLY inside a cluster, and each
    vector keeps iff it has no ≥-threshold pair with a smaller id in its
    cluster. Returns (id, cluster_id, keep) for every vector.

    Scale shape: the only shuffle routes vectors into cluster-keyed buckets;
    the quadratic verify is per-cluster (n/k expected members — the
    codebook size is the knob that bounds it), never global. Like SemDeDup,
    cross-cluster near-duplicates are out of scope by construction — that
    recall tradeoff is the documented point of the method."""
    from .relational import bucketed_groups
    from .util import cached_state

    def _assign(batch: pa.Table) -> pa.Table:
        cents: np.ndarray = cached_state(
            centroids_ref, lambda c: np.asarray(c, dtype=np.int64),
            token="semdedup_cents")
        x = _batch_matrix(batch, vec_col, dim=cents.shape[1])
        if len(x) == 0:
            return pa.table({id_col: batch[id_col],
                             "cluster_id": np.array([], np.int64),
                             vec_col: batch[vec_col]})
        xq = quantize_fixed(x)
        d2 = (np.einsum("ij,ij->i", xq, xq)[:, None]
              + np.einsum("ij,ij->i", cents, cents)[None, :]
              - 2 * (xq @ cents.T))
        return pa.table({id_col: batch[id_col],
                         "cluster_id": np.argmin(d2, axis=1).astype(np.int64),
                         vec_col: batch[vec_col]})

    assigned = vectors.map_batches(_assign, batch_format="pyarrow",
                                   batch_size=batch_size)

    def _verify(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cid, grp in g.groupby("cluster_id", sort=False):
            grp = grp.sort_values(id_col)
            ids = grp[id_col].to_numpy().astype(np.int64)
            if len(ids) == 1:
                out.append(pd.DataFrame({id_col: ids, "cluster_id": cid,
                                         "keep": [True]}))
                continue
            x = np.stack(grp[vec_col].to_numpy()).astype(np.float64)
            norm = np.maximum(np.linalg.norm(x, axis=1), 1e-300)
            sims = (x @ x.T) / (norm[:, None] * norm[None, :])
            # ids are sorted: a strict upper-triangle >=threshold hit in
            # column j means j has a smaller-id near-dup -> drop j
            dup = (np.triu(sims >= threshold, k=1)).any(axis=0)
            out.append(pd.DataFrame({id_col: ids, "cluster_id": cid,
                                     "keep": ~dup}))
        if not out:
            return pd.DataFrame({id_col: np.array([], np.int64),
                                 "cluster_id": np.array([], np.int64),
                                 "keep": np.array([], bool)})
        return pd.concat(out, ignore_index=True)

    return bucketed_groups(assigned, ["cluster_id"], _verify)


class _SQ8QueryState:
    """Per-worker SQ8 query state: fixed-point query matrix (asymmetric
    distance — queries stay full-precision, the database side is the int8
    reconstruction, exactly FAISS's SQ8 search contract)."""

    def __init__(self, q: pa.Table, vec_col: str):
        self.qid = q["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.qm = quantize_fixed(_batch_matrix(q, vec_col))


def sq8_topk(vectors, queries_ref, mn: np.ndarray, span: np.ndarray, k: int,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """Asymmetric top-k over INT8-scalar-quantized vectors (FAISS SQ8): each
    batch encodes to 8-bit codes with the broadcast per-dim (mn, span)
    calibration, dequantizes to the integer grid, and ranks by EXACT integer
    L2² against the full-precision fixed-point queries — every arithmetic
    step int64, so the DuckDB mirror is bit-exact. Per-batch local top-k,
    then the k×B-bounded grouped global merge (same skeleton as
    ``cosine_topk``/``pq_adc_topk``); ties break on vec_id. At scale the
    codes are 4× smaller than float32 — the batch never holds the float
    matrix and the shuffle moves at most k rows per (query, batch)."""
    from .relational import group_topk
    from .util import cached_state

    mn = mn.astype(np.int64)
    span = span.astype(np.int64)

    def _local(batch: pa.Table) -> pa.Table:
        st: _SQ8QueryState = cached_state(
            queries_ref, lambda q: _SQ8QueryState(q, vec_col),
            token=f"_SQ8QueryState:{vec_col}")
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table({"query_id": np.array([], dtype=np.int64),
                             "vec_id": np.array([], dtype=np.int64),
                             "d2": np.array([], dtype=np.int64)})
        m = quantize_fixed(_batch_matrix(batch, vec_col, dim=st.qm.shape[1]))
        code = ((m - mn[None, :]) * 255) // span[None, :]
        dqv = mn[None, :] + (code * span[None, :]) // 255
        # (Q, B) exact integer L2^2 via the expansion (all terms < 2^60)
        d2 = ((st.qm * st.qm).sum(axis=1)[:, None]
              + (dqv * dqv).sum(axis=1)[None, :]
              - 2 * (st.qm @ dqv.T))
        self_mask = st.qid[:, None] == ids[None, :]
        kk = min(k, d2.shape[1])
        d2m = np.where(self_mask, np.iinfo(np.int64).max, d2)
        part = np.argpartition(d2m, kk - 1, axis=1)[:, :kk]
        ps = np.take_along_axis(d2m, part, axis=1)
        keep = (ps != np.iinfo(np.int64).max).reshape(-1)
        return pa.table({
            "query_id": np.repeat(st.qid, kk)[keep],
            "vec_id": ids[part].reshape(-1)[keep],
            "d2": ps.reshape(-1)[keep],
        })

    local = vectors.map_batches(_local, batch_format="pyarrow", batch_size=4096)
    return group_topk(local, ["query_id"], [("d2", True), ("vec_id", True)],
                      k, rank_col="d2_rank")


def hard_negative_topk(vectors, queries_ref, k: int, id_col: str = "vec_id",
                       vec_col: str = "embedding", label_col: str = "label"):
    """HARD-NEGATIVE MINING for contrastive training (the retrieval-training
    data op next to ``cosine_topk``): per query, the k most cosine-similar
    vectors whose LABEL DIFFERS from the query's — the near-miss negatives a
    contrastive loss learns most from (same-label neighbors are positives
    and are masked out, which also masks self). Same execution shape as
    ``cosine_topk``: broadcast query matrix + labels, per-batch matmul and
    local top-k, then the k-per-(query, batch)-bounded global merge."""
    from .util import cached_state

    def _state(q: pa.Table):
        st = _QueryState(q, vec_col)
        st.qlabel = q[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return st

    def _local(batch: pa.Table) -> pa.Table:
        st = cached_state(queries_ref, _state,
                          token=f"_HardNegState:{vec_col}:{label_col}")
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table({"query_id": np.array([], dtype=np.int64),
                             "vec_id": np.array([], dtype=np.int64),
                             "sim": np.array([], dtype=np.float64)})
        labels = batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _batch_matrix(batch, vec_col, dim=st.qm.shape[1])
        sims = st.sims_against(x)  # (Q, B)
        sims = np.where(st.qlabel[:, None] == labels[None, :], -np.inf, sims)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        ps = np.take_along_axis(sims, part, axis=1)
        keep = np.isfinite(ps.reshape(-1))
        return pa.table({
            "query_id": np.repeat(st.qid, kk)[keep],
            "vec_id": ids[part].reshape(-1)[keep],
            "sim": ps.reshape(-1)[keep],
        })

    local = vectors.map_batches(_local, batch_format="pyarrow", batch_size=4096)
    return _merge_topk(local, k)


def gram_matrix(ds, vec_col: str = "embedding", dim: int = 64):
    """Distributed GRAM MATRIX (X^T X) of a fixed-point-quantized embedding
    column — the covariance/PCA precursor and the simplest distributed
    dense linear algebra: each batch contributes one exact int64
    ``V.T @ V`` partial (a dim×dim matmul, the ideal combiner — shuffle
    volume is dim² rows PER BATCH regardless of row count), then one
    dim²-keyed grouped sum. Quantization is :func:`quantize_fixed` so the
    SQL mirror is bit-exact. Exact while rows·maxq² < 2^63
    (maxq ≈ 1.1e6 → ~7.6e6 rows per coefficient at unit-norm inputs; scale
    past that by chunked accumulation in int128/object or a coarser scale).
    Returns (i, j, gram) for all dim² coefficients."""
    from .relational import partial_groupby_sum

    ii, jj = np.meshgrid(np.arange(dim, dtype=np.int64),
                         np.arange(dim, dtype=np.int64), indexing="ij")
    ii, jj = ii.reshape(-1), jj.reshape(-1)

    def _partial(batch: pa.Table) -> pa.Table:
        v = _batch_matrix(batch, vec_col, dim)
        q = quantize_fixed(v)
        g = q.T @ q
        return pa.table({"i": ii, "j": jj, "gram": g.reshape(-1)})

    parts = ds.map_batches(_partial, batch_format="pyarrow", batch_size=8192)
    return partial_groupby_sum(parts, ["i", "j"], ["gram"])


def power_iteration(ds, vec_col: str = "embedding", dim: int = 64,
                    rounds: int = 6, scale: int = 1000):
    """Dominant-eigenvector POWER ITERATION over the embedding Gram matrix
    — the PCA-direction / spectral-centrality primitive, exact-integer
    end to end: the distributed part is the Gram combiner (same shape as
    :func:`gram_matrix`, at fixed-point ``scale`` so the iteration stays
    inside int64), the iteration itself runs on the dim²-bounded result:

        y = G @ x;  x <- trunc(y * 8192 / max|y|)

    with TRUNCATING division (toward zero — matching SQL integer
    division), x_0 = all-ones. Deterministic, no floats, no convergence
    tolerance: exactly ``rounds`` steps. Returns (d, xv) — the scaled
    eigenvector estimate. Overflow bound: 64 · max|gram| · 8192 < 2^63,
    i.e. max|gram| < 1.7e13 (at scale 1e3 that is ~1.4e7 unit-norm rows;
    scale down or chunk-accumulate past that, same caveat as
    gram_matrix)."""
    from .relational import partial_groupby_sum

    ii, jj = np.meshgrid(np.arange(dim, dtype=np.int64),
                         np.arange(dim, dtype=np.int64), indexing="ij")
    ii, jj = ii.reshape(-1), jj.reshape(-1)

    def _partial(batch: pa.Table) -> pa.Table:
        v = _batch_matrix(batch, vec_col, dim)
        q = np.floor(v * scale + 0.5).astype(np.int64)
        g = q.T @ q
        return pa.table({"i": ii, "j": jj, "gram": g.reshape(-1)})

    parts = ds.map_batches(_partial, batch_format="pyarrow", batch_size=8192)
    gdf = partial_groupby_sum(parts, ["i", "j"], ["gram"]).to_pandas()
    G = np.zeros((dim, dim), np.int64)
    G[gdf["i"].to_numpy(np.int64), gdf["j"].to_numpy(np.int64)] = \
        gdf["gram"].to_numpy(np.int64)
    x = np.ones(dim, np.int64)
    for _ in range(rounds):
        y = G @ x
        m = max(int(np.abs(y).max()), 1)
        # truncating division toward zero (SQL // semantics)
        x = (np.sign(y) * ((np.abs(y) * 8192) // m)).astype(np.int64)
    return pa.table({"d": pa.array(np.arange(dim, dtype=np.int64)),
                     "xv": pa.array(x)})


def maxsim_topk(vectors, queries_ref, k: int = 3, n_sub: int = 8,
                id_col: str = "vec_id", vec_col: str = "embedding"):
    """ColBERT-style LATE-INTERACTION MaxSim top-k, exact in fixed-point
    integers: each 64-dim vector splits into ``n_sub`` contiguous
    sub-vectors ("token embeddings");
    maxsim(q, d) = Σ_{qt} max_{dt} ⟨q_sub[qt], d_sub[dt]⟩ over
    ``quantize_fixed`` components — the retrieval scorer between a
    single-vector dot product and full cross-attention, and the modern
    multi-vector companion of `cosine_topk`. Per-batch: one
    (Q·n_sub, B·n_sub) integer matmul reshaped to a (Q, B) max/sum
    reduction; query matrix broadcast once per worker; global k via the
    same k×B-bounded `group_topk` merge. Returns
    (query_id, vec_id, ms_rank, maxsim)."""
    from .util import cached_state

    class _MsState:
        def __init__(self, q: pa.Table):
            self.qid = q[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            qm = quantize_fixed(_batch_matrix(q, vec_col))
            nq, dim = qm.shape
            self.sub = dim // n_sub
            self.qsub = qm.reshape(nq, n_sub, self.sub)

    def _local(batch: pa.Table) -> pa.Table:
        st: _MsState = cached_state(queries_ref, _MsState,
                                    token="maxsim._MsState")
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table({"query_id": np.array([], dtype=np.int64),
                             "vec_id": np.array([], dtype=np.int64),
                             "maxsim": np.array([], dtype=np.int64)})
        x = quantize_fixed(_batch_matrix(batch, vec_col))
        xsub = x.reshape(len(ids), n_sub, st.sub)
        # (Q, qt, B, dt) sub-dot tensor -> max over dt -> sum over qt
        dots = np.einsum("qts,bus->qtbu", st.qsub, xsub, optimize=True)
        score = dots.max(axis=3).sum(axis=1)  # (Q, B)
        # sentinel must stay negatable in int64 (|min| overflows on -score)
        sent = np.iinfo(np.int64).min // 2
        score = np.where(st.qid[:, None] == ids[None, :], sent, score)
        kk = min(k, score.shape[1])
        part = np.argpartition(-score, kk - 1, axis=1)[:, :kk]
        ps = np.take_along_axis(score, part, axis=1)
        keep = ps.reshape(-1) != sent
        return pa.table({
            "query_id": np.repeat(st.qid, kk)[keep],
            "vec_id": ids[part].reshape(-1)[keep],
            "maxsim": ps.reshape(-1)[keep],
        })

    local = vectors.map_batches(_local, batch_format="pyarrow",
                                batch_size=4096)
    from .relational import group_topk

    return group_topk(local, ["query_id"],
                      [("maxsim", False), ("vec_id", True)],
                      k, rank_col="ms_rank")


# ---------------------------------------------------------------------------
# two-sided distributed vector join (no broadcast side)
# ---------------------------------------------------------------------------

def sharded_cosine_join(queries, corpus, k: int = 5, id_col: str = "vec_id",
                        vec_col: str = "embedding", n_centroids: int = 64,
                        nprobe: int = 8, list_shards: int = 1,
                        exclude_self: bool = True):
    """TWO-SIDED distributed cosine top-k join — query-sharded x
    IVF-list-sharded, NEITHER side broadcast (the shape ``cosine_topk`` and
    friends cannot take: their query side rides a ``ray.put`` handle, fine
    for bounded query sets, wrong for corpus-vs-corpus joins at 10^12 rows).

    Routing is the deterministic ±1 codebook of ``ivf_topk`` (equal-norm
    rows, argmax integer dot == nearest by cosine, SQL-replicable): corpus
    rows go to their ONE assigned list, query rows replicate to their
    ``nprobe`` best lists. ONE all-to-all exchange keyed by
    ``list * list_shards + shard`` then a per-group vectorized matmul;
    global per-query top-k merges through the bucketed combiner
    (``_merge_topk``), never a driver collect.

    Scale notes (the partitioning contract the 100 TB plan relies on):

    - shuffle volume: each corpus vector moves ONCE; each query vector moves
      ``nprobe * list_shards`` times. With both sides unbounded that is the
      optimal exchange up to the probe factor — no N x Q pair ever
      materializes, and group size is |list| + |probing queries|.
    - skew: hot lists are salted into ``list_shards`` sub-shards (corpus row
      -> one sub-shard by a Knuth id hash, query row -> ALL sub-shards), so
      a single reducer holds at most ~|list|/list_shards corpus rows. The
      result is invariant to ``list_shards`` because scoring is per
      (query, corpus-row) pair.
    - exactness: corpus lists PARTITION the candidate set, so per-list
      top-k with the global (sim desc, id asc) tie rule composes into the
      exact top-k over all probed lists; with ``nprobe == n_centroids`` the
      join is exhaustive and equals brute-force cosine top-k.
    - to shuffle CODES instead of raw vectors (LAION-scale bytes), compose
      with ``pq_encode`` and score groups via ADC as in ``ivfpq_topk`` —
      the routing/salting skeleton here is unchanged.
    """
    import pandas as pd

    def _tag_corpus(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _batch_matrix(batch, vec_col)
        if len(ids) == 0:
            return pa.table({"list_key": np.array([], dtype=np.int64),
                             "rid": np.array([], dtype=np.int64),
                             "side": np.array([], dtype=np.int64),
                             vec_col: batch[vec_col]})
        cents = sign_planes(n_centroids, x.shape[1])
        assign = np.argmax(quantize_fixed(x) @ cents.T, axis=1)
        if list_shards > 1:
            shard = (ids * 2654435761 % 4294967296) % list_shards
        else:
            shard = np.zeros_like(ids)
        return pa.table({"list_key": assign * list_shards + shard,
                         "rid": ids,
                         "side": np.zeros(len(ids), dtype=np.int64),
                         vec_col: batch[vec_col]})

    def _tag_queries(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _batch_matrix(batch, vec_col)
        if len(ids) == 0:
            return pa.table({"list_key": np.array([], dtype=np.int64),
                             "rid": np.array([], dtype=np.int64),
                             "side": np.array([], dtype=np.int64),
                             vec_col: batch[vec_col]})
        cents = sign_planes(n_centroids, x.shape[1])
        qdots = quantize_fixed(x) @ cents.T
        probe = np.argsort(-qdots, axis=1, kind="stable")[:, :nprobe]
        # every probed list x every sub-shard
        keys = (probe[:, :, None] * list_shards
                + np.arange(list_shards)[None, None, :]).reshape(len(ids), -1)
        rep = keys.shape[1]
        take = np.repeat(np.arange(len(ids)), rep)
        return pa.table({"list_key": keys.reshape(-1).astype(np.int64),
                         "rid": np.repeat(ids, rep),
                         "side": np.ones(len(ids) * rep, dtype=np.int64),
                         vec_col: batch[vec_col].combine_chunks().take(
                             pa.array(take))})

    tagged = (corpus.map_batches(_tag_corpus, batch_format="pyarrow",
                                 batch_size=4096)
              .union(queries.map_batches(_tag_queries,
                                         batch_format="pyarrow",
                                         batch_size=4096)))

    def _score(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        qs, cs = g[side == 1], g[side == 0]
        if len(qs) == 0 or len(cs) == 0:
            return pd.DataFrame({"query_id": np.array([], dtype=np.int64),
                                 "vec_id": np.array([], dtype=np.int64),
                                 "sim": np.array([], dtype=np.float64)})
        qm = np.stack(qs[vec_col].to_numpy()).astype(np.float64)
        cm = np.stack(cs[vec_col].to_numpy()).astype(np.float64)
        qid = qs["rid"].to_numpy().astype(np.int64)
        cid = cs["rid"].to_numpy().astype(np.int64)
        qnorm = np.linalg.norm(qm, axis=1)
        cnorm = np.maximum(np.linalg.norm(cm, axis=1), 1e-300)
        # same expression order as _QueryState.sims_against (oracle parity)
        sims = (qm @ cm.T) / (qnorm[:, None] * cnorm[None, :])
        if exclude_self:
            sims = np.where(qid[:, None] == cid[None, :], -np.inf, sims)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        ps = np.take_along_axis(sims, part, axis=1)
        rows_q = np.repeat(qid, kk)
        rows_v = cid[part.reshape(-1)]
        rows_s = ps.reshape(-1)
        keep = rows_s > -np.inf
        return pd.DataFrame({"query_id": rows_q[keep],
                             "vec_id": rows_v[keep],
                             "sim": rows_s[keep]})

    local = tagged.groupby("list_key").map_groups(_score,
                                                  batch_format="pandas")
    return _merge_topk(local, k)


def sharded_adc_join(queries, corpus, pq_cents_ref, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     n_centroids: int = 64, nprobe: int = 8, m: int = 8,
                     list_shards: int = 1, exclude_self: bool = True):
    """CODES-NOT-VECTORS two-sided join — :func:`sharded_cosine_join`'s
    routing/salting skeleton with :func:`ivfpq_topk`'s scoring: corpus rows
    cross the exchange as (list_key, id, ONE packed int64 PQ code) — 24
    bytes/row instead of the full embedding — and groups score by ADC
    (m table lookups per candidate). At LAION scale this is the difference
    between shuffling the corpus' bytes and shuffling 1-2% of them; the
    query side still replicates nprobe x list_shards times but ships its
    fixed-point vector (needed to build the per-query LUTs in-group).

    Bit-identical to ``ivfpq_topk`` run with the same codebooks (same
    integer routing, codes, ADC and tie rules), so the two share an exact
    SQL oracle; parity asserted in pytest. Returns
    (query_id, vec_id, adc, adc_rank)."""
    import pandas as pd
    import ray as _ray

    from .relational import group_topk

    shifts = 4 * np.arange(m, dtype=np.int64)

    def _corpus_tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        empty_qv = pa.array([], type=pa.list_(pa.int64()))
        if len(ids) == 0:
            return pa.table({"list_key": np.array([], np.int64),
                             "rid": np.array([], np.int64),
                             "side": np.array([], np.int64),
                             "code": np.array([], np.int64),
                             "qv": empty_qv})
        cents_pq = np.asarray(_ray.get(pq_cents_ref), dtype=np.int64)
        xq = quantize_fixed(_batch_matrix(batch, vec_col))
        coarse = sign_planes(n_centroids, cents_pq.shape[1])
        assign = np.argmax(xq @ coarse.T, axis=1)
        codes = _pq_codes_matrix(xq, cents_pq, m)
        packed = (codes << shifts[None, :]).sum(axis=1)
        if list_shards > 1:
            shard = (ids * 2654435761 % 4294967296) % list_shards
        else:
            shard = np.zeros_like(ids)
        return pa.table({"list_key": assign * list_shards + shard,
                         "rid": ids,
                         "side": np.zeros(len(ids), dtype=np.int64),
                         "code": packed,
                         "qv": pa.array([[]] * len(ids),
                                        type=pa.list_(pa.int64()))})

    def _query_tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table({"list_key": np.array([], np.int64),
                             "rid": np.array([], np.int64),
                             "side": np.array([], np.int64),
                             "code": np.array([], np.int64),
                             "qv": pa.array([], type=pa.list_(pa.int64()))})
        cents_pq = np.asarray(_ray.get(pq_cents_ref), dtype=np.int64)
        xq = quantize_fixed(_batch_matrix(batch, vec_col))
        coarse = sign_planes(n_centroids, cents_pq.shape[1])
        qdots = xq @ coarse.T
        probe = np.argsort(-qdots, axis=1, kind="stable")[:, :nprobe]
        keys = (probe[:, :, None] * list_shards
                + np.arange(list_shards)[None, None, :]).reshape(len(ids), -1)
        rep = keys.shape[1]
        take = np.repeat(np.arange(len(ids)), rep)
        return pa.table({"list_key": keys.reshape(-1).astype(np.int64),
                         "rid": np.repeat(ids, rep),
                         "side": np.ones(len(ids) * rep, dtype=np.int64),
                         "code": np.zeros(len(ids) * rep, dtype=np.int64),
                         "qv": pa.array(list(xq[take].astype(np.int64)),
                                        type=pa.list_(pa.int64()))})

    tagged = (corpus.map_batches(_corpus_tag, batch_format="pyarrow",
                                 batch_size=4096)
              .union(queries.map_batches(_query_tag, batch_format="pyarrow",
                                         batch_size=4096)))

    ar = np.arange(m)

    def _score(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        qs, cs = g[side == 1], g[side == 0]
        empty = pd.DataFrame({"query_id": np.array([], np.int64),
                              "vec_id": np.array([], np.int64),
                              "adc": np.array([], np.int64)})
        if len(qs) == 0 or len(cs) == 0:
            return empty
        cents_pq = np.asarray(_ray.get(pq_cents_ref), dtype=np.int64)
        dim = cents_pq.shape[1]
        sub = dim // m
        cid = cs["rid"].to_numpy().astype(np.int64)
        packed = cs["code"].to_numpy().astype(np.int64)
        codes = (packed[:, None] >> shifts[None, :]) & 15
        qid = qs["rid"].to_numpy().astype(np.int64)
        qm = np.stack(qs["qv"].to_numpy()).astype(np.int64)
        # per-query (m, K) LUTs — same integer expression as ivfpq_topk
        luts = np.empty((len(qid), m, cents_pq.shape[0]), dtype=np.int64)
        for j in range(m):
            qsub = qm[:, j * sub:(j + 1) * sub]
            csub = cents_pq[:, j * sub:(j + 1) * sub]
            luts[:, j, :] = (np.einsum("ij,ij->i", qsub, qsub)[:, None]
                             + np.einsum("ij,ij->i", csub, csub)[None, :]
                             - 2 * (qsub @ csub.T))
        out_q, out_v, out_a = [], [], []
        for qi in range(len(qid)):
            cand = np.arange(len(cid))
            if exclude_self:
                cand = cand[cid != qid[qi]]
            if len(cand) == 0:
                continue
            adc = luts[qi, ar, codes[cand]].sum(axis=1)
            kk = min(k, len(cand))
            top = np.lexsort((cid[cand], adc))[:kk]
            out_q.append(np.full(kk, qid[qi], dtype=np.int64))
            out_v.append(cid[cand][top])
            out_a.append(adc[top])
        if not out_q:
            return empty
        return pd.DataFrame({"query_id": np.concatenate(out_q),
                             "vec_id": np.concatenate(out_v),
                             "adc": np.concatenate(out_a)})

    local = tagged.groupby("list_key").map_groups(_score,
                                                  batch_format="pandas")
    return group_topk(local, ["query_id"], [("adc", True), ("vec_id", True)],
                      k, rank_col="adc_rank")
