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


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if arr.num_chunks == 1:
        flat = arr.chunk(0).values.to_numpy(zero_copy_only=False)
        dim = len(arr.chunk(0)[0])
        return flat.reshape(-1, dim).astype(np.float64)
    return np.array(arr.to_pylist(), dtype=np.float64)


class _QueryState:
    """Per-worker ANN state: normalized broadcast query matrix."""

    def __init__(self, q: pa.Table, vec_col: str):
        self.qid = q["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        qm = _batch_matrix(q, vec_col)
        self.qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)


def cosine_topk(vectors, queries_ref, k: int, id_col: str = "vec_id",
                vec_col: str = "embedding", concurrency: int | None = None):
    """Exact global cosine top-k per query: per-batch local top-k (the big
    compute, matmul per Arrow batch; query matrix broadcast once and cached
    per worker) then a tiny grouped global top-k with a deterministic
    (sim desc, vec_id asc) order. Returns (query_id, vec_id, sim_rank, sim)."""
    from .util import cached_state

    def _local(batch: pa.Table) -> pa.Table:
        st: _QueryState = cached_state(queries_ref, lambda q: _QueryState(q, vec_col))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _batch_matrix(batch, vec_col)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
        sims = st.qm @ x.T  # (Q, B)
        # mask self-matches so a query never returns itself
        sims = np.where(st.qid[:, None] == ids[None, :], -np.inf, sims)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        ps = np.take_along_axis(sims, part, axis=1)
        return pa.table(
            {
                "query_id": np.repeat(st.qid, kk),
                "vec_id": ids[part].reshape(-1),
                "sim": ps.reshape(-1),
            }
        )

    local = vectors.map_batches(_local, batch_format="pyarrow", batch_size=4096)

    def _global(g: pd.DataFrame) -> pd.DataFrame:
        g = g[np.isfinite(g["sim"])]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.assign(sim_rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g

    return local.groupby("query_id").map_groups(_global, batch_format="pandas")


def lsh_topk(vectors, queries_ref, k: int, id_col: str = "vec_id",
             vec_col: str = "embedding", n_planes: int = 10, seed: int = 42):
    """Approximate cosine top-k via random-hyperplane LSH — the documented
    scale path: each vector lands in a sign-pattern bucket; a query only
    scores candidates in its own bucket or buckets within Hamming distance 1
    (multiprobe). Per batch, the candidate mask prunes the matmul; a final
    grouped top-k merges the partials. Recall < 1 by design (approximate);
    deterministic given the seed."""
    from .util import cached_state

    def _build(q: pa.Table):
        st = _QueryState(q, vec_col)
        rng = np.random.default_rng(seed)
        dim = st.qm.shape[1]
        planes = rng.standard_normal((dim, n_planes))
        qsig = ((st.qm @ planes) > 0) @ (1 << np.arange(n_planes))
        return st, planes, qsig.astype(np.int64)

    def _local(batch: pa.Table) -> pa.Table:
        st, planes, qsig = cached_state(queries_ref, _build)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _batch_matrix(batch, vec_col)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
        xsig = (((x @ planes) > 0) @ (1 << np.arange(n_planes))).astype(np.int64)
        # candidate mask: hamming(qsig, xsig) <= 1 (multiprobe radius 1)
        ham = np.bitwise_xor(qsig[:, None], xsig[None, :])
        popcnt = np.zeros_like(ham)
        for b in range(n_planes):
            popcnt += (ham >> b) & 1
        mask = popcnt <= 1
        sims = np.where(mask, st.qm @ x.T, -np.inf)
        sims = np.where(st.qid[:, None] == ids[None, :], -np.inf, sims)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        ps = np.take_along_axis(sims, part, axis=1)
        return pa.table(
            {
                "query_id": np.repeat(st.qid, kk),
                "vec_id": ids[part].reshape(-1),
                "sim": ps.reshape(-1),
            }
        )

    local = vectors.map_batches(_local, batch_format="pyarrow", batch_size=4096)

    def _global(g: pd.DataFrame) -> pd.DataFrame:
        g = g[np.isfinite(g["sim"])]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        return g.assign(sim_rank=np.arange(1, len(g) + 1, dtype=np.int64))

    return local.groupby("query_id").map_groups(_global, batch_format="pandas")


def l2_norms(vectors, id_col: str = "vec_id", vec_col: str = "embedding"):
    """(id, l2_norm) per vector — vectorized per batch."""

    def _n(batch: pa.Table) -> pa.Table:
        x = _batch_matrix(batch, vec_col)
        return pa.table(
            {id_col: batch[id_col], "l2_norm": np.sqrt(np.einsum("ij,ij->i", x, x))}
        )

    return vectors.map_batches(_n, batch_format="pyarrow", batch_size=8192)
