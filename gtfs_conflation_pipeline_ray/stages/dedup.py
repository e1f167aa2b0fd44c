"""Deduplication stages: exact (content-hash shuffle + per-group keep-rule),
MinHash+LSH near-dup, SimHash, n-gram Jaccard verification.

Exact dedup ≙ the reference's ``UNIQUE + INSERT OR IGNORE`` content-tuple
dedup (D2, ``/root/reference/src/daos/GtfsOsmNetworkDAO/loaders.js:39-49``):
hash-partition by the content key, keep the deterministic first per group.
Near-dup (MinHash/LSH, SimHash) are the scale-path additions: shingle →
signature per batch, explode to (band, band_hash) rows, groupby bands for
candidates, verify with signature agreement — the canonical
shuffle-by-band pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import text as tx
from .util import pool_size


def exact_dedup_groups(ds, hash_col: str, id_col: str):
    """Per content-hash: deterministic keeper (min id) + duplicate count.
    Returns (hash_col, keep_<id_col>, dup_count). Bucketed-combine: the
    min/count partials combine per batch, then per bucket — one vectorized
    pandas groupby each, no per-group Python."""
    from .relational import bucketed_groups

    keep, cnt = f"keep_{id_col}", "dup_count"

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(hash_col, as_index=False, sort=False).agg(
            **{keep: (id_col, "min"), cnt: (id_col, "size")}
        )
        out[cnt] = out[cnt].astype(np.int64)
        return out

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(hash_col, as_index=False, sort=False).agg(
            **{keep: (keep, "min"), cnt: (cnt, "sum")}
        )

    return bucketed_groups(ds, [hash_col], _final, pre_fn=_pre)


def minhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, shingle_k: int = 3,
                       concurrency: int | None = None):
    """Per-doc MinHash signature as ``num_perm`` int64 columns ``mh{i}``
    (flat columns instead of a list column keep downstream band explosion
    zero-copy). Permutation params are built once per actor."""

    class _Sig:
        def __init__(self):
            self.a, self.b = tx.minhash_params(num_perm)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch[text_col].to_pylist()
            # whole-batch vectorized path: one fnv1a64_batch over every
            # shingle string + one segmented multiply-mod-min — no per-doc
            # Python hashing loop (bit-identical signatures)
            flat, offsets = tx.batch_shingle_hashes(texts, shingle_k)
            sigs = tx.minhash_batch(flat, offsets, self.a, self.b)
            cols = {id_col: batch[id_col]}
            s64 = sigs.view(np.int64)
            for j in range(num_perm):
                cols[f"mh{j}"] = s64[:, j].copy()
            return pa.table(cols)

    return ds.map_batches(_Sig, batch_format="pyarrow", batch_size=1024,
                          concurrency=pool_size(concurrency))


def lsh_candidate_pairs(sig_ds, id_col: str = "doc_id", num_perm: int = 64,
                        bands: int = 16, band_member_cap: int = 256):
    """MinHash-LSH: fold each signature into ``bands`` band-hashes, explode to
    (band_id, band_hash, id) rows, groupby band bucket → emit candidate pairs
    (a < b). The groupby is the only shuffle and moves just
    (band_id, band_hash, id) triples — never the documents.

    A degenerate band bucket (many docs with an identical band hash — e.g. a
    corpus of empty docs) would emit O(m^2) pairs; members are capped at
    ``band_member_cap`` per (band_id, band_hash) (keep smallest ids,
    deterministic) and every truncation is LOGGED with the dropped count —
    the same guard the reference puts on its O(2^n) path enumeration
    (``findNonAxiomaticPaths.js:218-222``)."""
    import logging

    rows_per_band = num_perm // bands

    def _bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig = np.stack(
            [batch[f"mh{j}"].to_numpy(zero_copy_only=False) for j in range(num_perm)], axis=1
        ).astype(np.uint64)
        folded = np.empty((n, bands), dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        for b in range(bands):
            h = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
            for r in range(rows_per_band):
                h = (h ^ sig[:, b * rows_per_band + r]) * prime
            folded[:, b] = h
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "band_id": np.repeat(np.arange(bands, dtype=np.int64), n),
                "band_hash": folded.T.reshape(-1).view(np.int64),
                id_col: np.tile(ids, bands),
            }
        )

    exploded = sig_ds.map_batches(_bands, batch_format="pyarrow", batch_size=8192)

    # bucketed-combine over band buckets: inside each bucket, sort by
    # (band_id, band_hash, id), find group boundaries vectorized, and emit
    # pairs only for the (rare) buckets of size > 1.
    from .relational import bucketed_groups, distinct

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["band_id", "band_hash", id_col], kind="mergesort")
        bh = d[["band_id", "band_hash"]].to_numpy()
        ids = d[id_col].to_numpy().astype(np.int64)
        new = np.ones(len(d), dtype=bool)
        new[1:] = (bh[1:] != bh[:-1]).any(axis=1)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(d))
        a_out, b_out = [], []
        n_dropped = 0
        for s, e in zip(starts[ends - starts > 1], ends[ends - starts > 1]):
            members = np.unique(ids[s:e])
            if len(members) < 2:
                continue
            if len(members) > band_member_cap:
                n_dropped += len(members) - band_member_cap
                members = members[:band_member_cap]  # smallest ids, deterministic
            ii, jj = np.triu_indices(len(members), k=1)
            a_out.append(members[ii])
            b_out.append(members[jj])
        if n_dropped:
            logging.getLogger(__name__).warning(
                "lsh_candidate_pairs: capped %d members beyond %d per band bucket",
                n_dropped, band_member_cap,
            )
        if not a_out:
            return pd.DataFrame({"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(a_out), "doc_b": np.concatenate(b_out)})

    pairs = bucketed_groups(exploded, ["band_id", "band_hash"], _pairs)
    return distinct(pairs, ["doc_a", "doc_b"])


def lsh_verified_pairs(sig_ds, id_col: str = "doc_id", num_perm: int = 64,
                       bands: int = 16, jaccard_threshold: float = 0.5,
                       band_member_cap: int = 256):
    """Candidate generation + VERIFICATION in one shuffle — the full near-dup
    pipeline: banded LSH candidates (as ``lsh_candidate_pairs``) are verified
    by MinHash signature agreement (an unbiased Jaccard estimate; ≙ the
    reference verifying candidate matches before keeping them, D3/D4).
    Signatures ride through the band shuffle so verification happens
    in-group with no second join. Returns (doc_a, doc_b, jaccard_est) for
    pairs with estimate >= threshold, each pair once."""
    import logging

    rows_per_band = num_perm // bands
    sig_cols = [f"mh{j}" for j in range(num_perm)]

    def _bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig = np.stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in sig_cols], axis=1
        ).astype(np.uint64)
        folded = np.empty((n, bands), dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        for b in range(bands):
            h = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
            for r in range(rows_per_band):
                h = (h ^ sig[:, b * rows_per_band + r]) * prime
            folded[:, b] = h
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "band_id": np.repeat(np.arange(bands, dtype=np.int64), n),
            "band_hash": folded.T.reshape(-1).view(np.int64),
            id_col: np.tile(ids, bands),
        }
        s64 = sig.view(np.int64)
        for j, c in enumerate(sig_cols):  # signatures ride along (no re-join)
            cols[c] = np.tile(s64[:, j], bands)
        return pa.table(cols)

    exploded = sig_ds.map_batches(_bands, batch_format="pyarrow", batch_size=8192)

    from .relational import bucketed_groups, distinct, group_topk

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["band_id", "band_hash", id_col], kind="mergesort")
        bh = d[["band_id", "band_hash"]].to_numpy()
        ids = d[id_col].to_numpy().astype(np.int64)
        sig = d[sig_cols].to_numpy().astype(np.int64)
        new = np.ones(len(d), dtype=bool)
        new[1:] = (bh[1:] != bh[:-1]).any(axis=1)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(d))
        a_out, b_out, j_out = [], [], []
        n_dropped = 0
        for s, e in zip(starts[ends - starts > 1], ends[ends - starts > 1]):
            _, keep = np.unique(ids[s:e], return_index=True)
            mem = ids[s:e][keep]
            msig = sig[s:e][keep]
            if len(mem) < 2:
                continue
            if len(mem) > band_member_cap:
                n_dropped += len(mem) - band_member_cap
                mem, msig = mem[:band_member_cap], msig[:band_member_cap]
            ii, jj = np.triu_indices(len(mem), k=1)
            est = (msig[ii] == msig[jj]).mean(axis=1)
            ok = est >= jaccard_threshold
            a_out.append(mem[ii[ok]])
            b_out.append(mem[jj[ok]])
            j_out.append(est[ok])
        if n_dropped:
            logging.getLogger(__name__).warning(
                "lsh_verified_pairs: capped %d members beyond %d per band bucket",
                n_dropped, band_member_cap,
            )
        if not a_out:
            return pd.DataFrame({"doc_a": np.array([], np.int64),
                                 "doc_b": np.array([], np.int64),
                                 "jaccard_est": np.array([], np.float64)})
        return pd.DataFrame({"doc_a": np.concatenate(a_out),
                             "doc_b": np.concatenate(b_out),
                             "jaccard_est": np.concatenate(j_out)})

    pairs = bucketed_groups(exploded, ["band_id", "band_hash"], _pairs)
    # a pair can surface from several bands — keep one row per pair (the
    # estimate is identical in every band: same signatures)
    return group_topk(pairs, ["doc_a", "doc_b"], [("jaccard_est", False)], k=1)


def lsh_verified_pairs_joined(sig_ds, id_col: str = "doc_id",
                              num_perm: int = 64, bands: int = 16,
                              jaccard_threshold: float = 0.5,
                              band_member_cap: int = 256,
                              est_rows: int | None = None):
    """Result-identical to :func:`lsh_verified_pairs`, restructured for
    corpus scale: the ride-along plan tiles the FULL signature through the
    band explosion (num_perm x 8 bytes x bands ~= 8 KB/doc with defaults —
    measured 44 GB of object-store spill at 3M docs, OutOfDisk on this
    host), which is the right trade only while signatures x bands fit the
    store. Here the band shuffle moves (band_id, band_hash, id) ONLY;
    candidate pairs are deduped FIRST, then each side's signature arrives
    through one bucketed co-group against a PACKED (id, 8*num_perm-byte
    binary) signature table — signatures cross the wire 2x total instead
    of ``bands`` x. Verification math is bit-identical (same int64
    equality mean), so the two plans return the same rows and share one
    oracle; `test_sharded_join`-style parity is asserted in pytest."""
    import logging

    rows_per_band = num_perm // bands
    sig_cols = [f"mh{j}" for j in range(num_perm)]

    # the signature Dataset fans out to BOTH the band explosion and the
    # packed side-table; without pinning, each branch re-executes the
    # (expensive) shingle+minhash lineage — materialize once (signatures
    # are ~0.5% of corpus bytes: 8*num_perm per doc)
    sig_ds = sig_ds.materialize()

    def _pack(batch: pa.Table) -> pa.Table:
        sig = np.stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in sig_cols],
            axis=1).astype(np.int64)
        blobs = [sig[i].tobytes() for i in range(sig.shape[0])]
        return pa.table({
            id_col: batch[id_col],
            "sig": pa.array(blobs, type=pa.binary()),
        })

    packed = sig_ds.map_batches(_pack, batch_format="pyarrow",
                                batch_size=8192)

    def _bands_ids(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig = np.stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in sig_cols],
            axis=1).astype(np.uint64)
        folded = np.empty((n, bands), dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        for b in range(bands):
            h = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
            for r in range(rows_per_band):
                h = (h ^ sig[:, b * rows_per_band + r]) * prime
            folded[:, b] = h
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "band_id": np.repeat(np.arange(bands, dtype=np.int64), n),
            "band_hash": folded.T.reshape(-1).view(np.int64),
            id_col: np.tile(ids, bands),
        })

    exploded = sig_ds.map_batches(_bands_ids, batch_format="pyarrow",
                                  batch_size=8192)

    from .relational import bucketed_groups, distinct, group_topk

    def _cand(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["band_id", "band_hash", id_col], kind="mergesort")
        bh = d[["band_id", "band_hash"]].to_numpy()
        ids = d[id_col].to_numpy().astype(np.int64)
        new = np.ones(len(d), dtype=bool)
        new[1:] = (bh[1:] != bh[:-1]).any(axis=1)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(d))
        a_out, b_out = [], []
        n_dropped = 0
        for s, e in zip(starts[ends - starts > 1], ends[ends - starts > 1]):
            mem = np.unique(ids[s:e])  # sorted, deduped — same keep rule
            if len(mem) < 2:
                continue
            if len(mem) > band_member_cap:
                n_dropped += len(mem) - band_member_cap
                mem = mem[:band_member_cap]
            ii, jj = np.triu_indices(len(mem), k=1)
            a_out.append(mem[ii])
            b_out.append(mem[jj])
        if n_dropped:
            logging.getLogger(__name__).warning(
                "lsh_verified_pairs_joined: capped %d members beyond %d per band bucket",
                n_dropped, band_member_cap,
            )
        if not a_out:
            return pd.DataFrame({"doc_a": np.array([], np.int64),
                                 "doc_b": np.array([], np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(a_out),
                             "doc_b": np.concatenate(b_out)})

    # NO separate distinct barrier: a pair found in several bands repeats,
    # but all copies share doc_a and therefore the same join-1 bucket —
    # join 1's merge dedups them there (one groupby fewer in the plan)
    pairs = bucketed_groups(exploded, ["band_id", "band_hash"], _cand,
                            est_rows=(est_rows * bands
                                      if est_rows else None))

    def _attach(side_key: str, sig_out: str):
        """One bucketed co-group: pair rows pick up `sig_out` bytes from the
        packed signature row sharing their `side_key` id."""
        def _tag_sig(batch: pa.Table) -> pa.Table:
            return pa.table({
                "_k": batch[id_col],
                "side": np.zeros(batch.num_rows, dtype=np.int64),
                "doc_a": np.zeros(batch.num_rows, dtype=np.int64),
                "doc_b": np.zeros(batch.num_rows, dtype=np.int64),
                "sig": batch["sig"],
            })

        def _tag_pairs(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            prev = (batch["sig"] if "sig" in batch.column_names
                    else pa.array([b""] * n, type=pa.binary()))
            return pa.table({
                "_k": batch[side_key],
                "side": np.ones(n, dtype=np.int64),
                "doc_a": batch["doc_a"],
                "doc_b": batch["doc_b"],
                "sig": prev,
            })

        def _merge(g: pd.DataFrame) -> pd.DataFrame:
            s = g[g["side"] == 0]
            p = g[g["side"] == 1].drop_duplicates(["doc_a", "doc_b"])
            if len(p) == 0 or len(s) == 0:
                return pd.DataFrame({"doc_a": np.array([], np.int64),
                                     "doc_b": np.array([], np.int64),
                                     "sig": np.array([], object),
                                     sig_out: np.array([], object)})
            out = p.merge(s[["_k", "sig"]].rename(columns={"sig": sig_out}),
                          on="_k")
            return out[["doc_a", "doc_b", "sig", sig_out]]

        return _tag_sig, _tag_pairs, _merge

    # join 1: sig of doc_a
    tag_sig, tag_pairs, merge = _attach("doc_a", "sig_a")
    u1 = (packed.map_batches(tag_sig, batch_format="pyarrow",
                             batch_size=8192)
          .union(pairs.map_batches(tag_pairs, batch_format="pyarrow",
                                   batch_size=8192)))
    j1 = bucketed_groups(u1, ["_k"], merge, est_rows=est_rows)
    # rotate: carry sig_a forward in the generic "sig" slot semantics
    def _shift(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_a": batch["doc_a"], "doc_b": batch["doc_b"],
                         "sig": batch["sig_a"]})

    j1p = j1.map_batches(_shift, batch_format="pyarrow", batch_size=8192)

    tag_sig2, tag_pairs2, merge2 = _attach("doc_b", "sig_b")
    u2 = (packed.map_batches(tag_sig2, batch_format="pyarrow",
                             batch_size=8192)
          .union(j1p.map_batches(tag_pairs2, batch_format="pyarrow",
                                 batch_size=8192)))
    j2 = bucketed_groups(u2, ["_k"], merge2, est_rows=est_rows)

    def _verify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"doc_a": np.array([], np.int64),
                             "doc_b": np.array([], np.int64),
                             "jaccard_est": np.array([], np.float64)})
        sa = np.frombuffer(b"".join(batch["sig"].to_pylist()),
                           dtype=np.int64).reshape(n, num_perm)
        sb = np.frombuffer(b"".join(batch["sig_b"].to_pylist()),
                           dtype=np.int64).reshape(n, num_perm)
        est = (sa == sb).mean(axis=1)
        ok = est >= jaccard_threshold
        return pa.table({
            "doc_a": batch["doc_a"].to_numpy(zero_copy_only=False)
                     .astype(np.int64)[ok],
            "doc_b": batch["doc_b"].to_numpy(zero_copy_only=False)
                     .astype(np.int64)[ok],
            "jaccard_est": est[ok],
        })

    return j2.map_batches(_verify, batch_format="pyarrow", batch_size=8192)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit population count (SWAR; numpy 1.x has no
    ``bitwise_count``). Exact for any uint64 input."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def phash_neardup_pairs(ds, phash_col: str = "phash", id_col: str = "doc_id",
                        max_hamming: int = 3, band_bits: int = 16,
                        band_member_cap: int = 256):
    """Perceptual-hash Hamming near-duplicate pairs — THE image-payload
    dedup primitive (the input_hint schema carries ``phash:int64`` per
    image). Each 64-bit hash is split into ``64 // band_bits`` bands; rows
    agreeing on any band become candidates (one groupby shuffle moving
    (band_id, band_key, id, phash) only), verified in-bucket by exact
    popcount(xor) <= max_hamming. With the defaults (4 x 16-bit bands,
    max_hamming=3) the pigeonhole principle makes recall EXACT: <=3
    differing bits cannot touch all 4 bands, so every qualifying pair
    shares a clean band. Returns (doc_a, doc_b, hamming), each pair once.
    ≙ the reference's candidate-then-verify match loop (J4/J5) applied to
    the image key space."""
    import logging

    bands = 64 // band_bits
    bmask = np.uint64((1 << band_bits) - 1)

    def _bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ph = np.ascontiguousarray(
            batch[phash_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ).view(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if ids.dtype.kind in "iu":  # string ids (image_id) pass through
            ids = ids.astype(np.int64)
        band_id = np.repeat(np.arange(bands, dtype=np.int64), n)
        keys = np.concatenate([
            ((ph >> np.uint64(b * band_bits)) & bmask).view(np.int64)
            for b in range(bands)
        ])
        return pa.table({
            "band_id": band_id,
            "band_key": keys,
            id_col: np.tile(ids, bands),
            phash_col: np.tile(ph.view(np.int64), bands),
        })

    exploded = ds.map_batches(_bands, batch_format="pyarrow", batch_size=8192)

    from .relational import bucketed_groups, distinct

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["band_id", "band_key", id_col], kind="mergesort")
        bk = d[["band_id", "band_key"]].to_numpy()
        ids = d[id_col].to_numpy()
        if ids.dtype.kind in "iu":
            ids = ids.astype(np.int64)
        ph = d[phash_col].to_numpy().astype(np.int64).view(np.uint64)
        new = np.ones(len(d), dtype=bool)
        new[1:] = (bk[1:] != bk[:-1]).any(axis=1)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(d))
        a_out, b_out, h_out = [], [], []
        n_dropped = 0
        for s, e in zip(starts[ends - starts > 1], ends[ends - starts > 1]):
            _, keep = np.unique(ids[s:e], return_index=True)
            mem, mph = ids[s:e][keep], ph[s:e][keep]
            if len(mem) < 2:
                continue
            if len(mem) > band_member_cap:
                n_dropped += len(mem) - band_member_cap
                mem, mph = mem[:band_member_cap], mph[:band_member_cap]
            ii, jj = np.triu_indices(len(mem), k=1)
            ham = popcount64(mph[ii] ^ mph[jj])
            ok = ham <= max_hamming
            a_out.append(mem[ii[ok]])
            b_out.append(mem[jj[ok]])
            h_out.append(ham[ok])
        if n_dropped:
            logging.getLogger(__name__).warning(
                "phash_neardup_pairs: capped %d members beyond %d per band bucket",
                n_dropped, band_member_cap,
            )
        if not a_out:
            # typed empty frame: a bare object-dtype empty column loses the
            # schema when every block is empty (Ray can't size/unify it)
            id_dtype = "string" if ids.dtype.kind in "OU" else ids.dtype
            return pd.DataFrame({"doc_a": pd.Series(dtype=id_dtype),
                                 "doc_b": pd.Series(dtype=id_dtype),
                                 "hamming": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(a_out),
                             "doc_b": np.concatenate(b_out),
                             "hamming": np.concatenate(h_out)})

    pairs = bucketed_groups(exploded, ["band_id", "band_key"], _pairs)
    # a pair surfaces once per agreeing band; hamming is identical each time
    return distinct(pairs, ["doc_a", "doc_b", "hamming"])


def simhash(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, simhash) — 64-bit SimHash of word-hash features (whole-batch
    vectorized: one hashing pass + one segmented bit-vote)."""

    def _sh(batch: pa.Table) -> pa.Table:
        flat, offsets = tx.batch_word_hashes(batch[text_col].to_pylist())
        out = tx.simhash_batch(flat, offsets).view(np.int64)
        return pa.table({id_col: batch[id_col], "simhash": out})

    return ds.map_batches(_sh, batch_format="pyarrow", batch_size=4096)


def ngram_jaccard_pairs(docs, threshold_num: int = 1, threshold_den: int = 2,
                        block_cols: tuple = ("lang", "source"),
                        text_col: str = "text", id_col: str = "doc_id",
                        block_cap: int = 256, est_rows: int | None = None):
    """EXACT n-gram (word-set) Jaccard similarity for pairs inside a
    blocking key — the exact-verification sibling of the MinHash ESTIMATE
    (``lsh_verified_pairs``): every decision is the integer predicate
    ``den * |A∩B| >= num * |A∪B|`` over 64-bit word-hash sets, so a SQL
    oracle reproduces the pair set and counts bit-for-bit. Blocks shuffle
    by ``block_cols`` (bucketed combine); within a block, pairs are
    prefiltered by the lossless size-ratio bound (J >= t needs
    den*|A| >= num*|B| for |A| <= |B|) and a hot block is capped at
    ``block_cap`` docs (keep smallest ids, logged, never silent).
    Returns (doc_a, doc_b, n_inter, n_union), doc_a < doc_b."""
    import logging

    from ..functions.text import _WORD_ASCII_RE, fnv1a64_batch
    from .relational import bucketed_groups

    num, den = np.int64(threshold_num), np.int64(threshold_den)

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_i, out_u = [], [], [], []
        for _, grp in g.groupby(list(block_cols), sort=False):
            if len(grp) > block_cap:
                logging.getLogger(__name__).warning(
                    "ngram_jaccard: block capped %d -> %d docs", len(grp), block_cap)
                grp = grp.sort_values(id_col).head(block_cap)
            grp = grp.sort_values(id_col)
            ids = grp[id_col].to_numpy()
            hsets = []
            for t in grp[text_col]:
                ws = list({w.lower() for w in _WORD_ASCII_RE.findall(t)})
                # np.unique, not np.sort: two distinct words colliding in
                # 64-bit FNV must degrade to ONE set element, matching the
                # hash-set semantics the size-ratio prefilter and the
                # |A|/|B| counts assume
                hsets.append(np.unique(fnv1a64_batch(ws)))
            sizes = np.array([len(h) for h in hsets], dtype=np.int64)
            lo = np.minimum(sizes[:, None], sizes[None, :])
            hi = np.maximum(sizes[:, None], sizes[None, :])
            cand = np.triu((lo > 0) & (den * lo >= num * hi), k=1)
            for i, j in zip(*np.nonzero(cand)):
                a, b = hsets[i], hsets[j]
                pos = np.searchsorted(b, a)
                pos_ok = pos < len(b)
                ni = int(np.count_nonzero(b[pos[pos_ok]] == a[pos_ok]))
                nu = int(sizes[i] + sizes[j] - ni)
                if den * ni >= num * nu:
                    out_a.append(ids[i]); out_b.append(ids[j])
                    out_i.append(ni); out_u.append(nu)
        return pd.DataFrame({"doc_a": np.array(out_a, dtype=np.int64),
                             "doc_b": np.array(out_b, dtype=np.int64),
                             "n_inter": np.array(out_i, dtype=np.int64),
                             "n_union": np.array(out_u, dtype=np.int64)})

    return bucketed_groups(docs, list(block_cols), _pairs, est_rows=est_rows)


def dedup_clusters(docs, pairs, id_col: str = "doc_id",
                   a_col: str = "doc_a", b_col: str = "doc_b",
                   max_rounds: int = 32, n_parts: int = 8,
                   smallgraph_edges: int = 2_000_000):
    """Cluster assignment over the near-dup pair graph: connected components
    by min-label propagation with pointer doubling, then the canonical keep
    decision (min doc_id per component survives).

    This is the step the reference's match-equivalence dedup (D3,
    ``/root/reference/src/daos/GtfsOsmNetworkDAO/loaders.js:39-49`` keep-rule
    generalized to TRANSITIVE closure) and every production corpus-dedup
    pipeline run after pair generation: pairs only say "a ~ b"; deletion
    needs one survivor per equivalence CLASS, so a~b, b~c must collapse
    {a,b,c} to min(a,b,c) even though (a,c) was never emitted as a pair.

    Scale shape: the iterated frontier is the EDGE-TOUCHED node set (sparse
    relative to the corpus at 100 TB); each round is two bounded hash joins
    plus a combiner-first grouped min, and per-round materialization is
    bounded by that node set, never the corpus. Pointer doubling
    (lbl <- lbl(lbl)) gives O(log diameter) rounds -- the MapReduce-CC
    regime (Rastogi et al., "Finding Connected Components in MapReduce and
    Beyond") -- instead of O(diameter) for plain neighbor-min. Docs outside
    the pair graph never enter the loop; they pick up their own id in the
    final left join. Labels only decrease, so a stationary sum(lbl) is a
    PROOF of the fixpoint (any non-fixpoint round strictly decreases it).

    Returns (doc_id, cluster_id, cluster_size, keep) for every document.
    """
    from .relational import bucketed_groups, partial_groupby_sum

    def _to_edges(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": np.concatenate([a, b]),
                         "dst": np.concatenate([b, a])})

    edges = pairs.map_batches(_to_edges, batch_format="pyarrow",
                              batch_size=8192).materialize()

    def _self_cluster(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: ids, "cluster_id": ids,
                         "cluster_size": np.ones(len(ids), dtype=np.int64),
                         "keep": np.ones(len(ids), dtype=bool)})

    n_edges = edges.count()  # free: edges is materialized
    if n_edges == 0:
        return docs.map_batches(_self_cluster, batch_format="pyarrow",
                                batch_size=8192)
    # partition count sized to the FRONTIER, not the cluster: each round is
    # 2 joins + a grouped min over <= n_edges label rows, and at gate scale
    # that's a few hundred rows — 8 shuffle partitions per stage would be
    # pure scheduling overhead (~8 rounds x 4 shuffles). Callers at real
    # scale see n_parts grow with the edge set.
    n_parts = max(1, min(n_parts, n_edges // 50_000 + 1))

    # size-based plan selection: a near-dup edge set that fits one task's
    # memory (int64 pairs; 2M edges = 32 MB) collapses the whole loop into
    # ONE vectorized kernel on ONE worker — identical fixpoint, none of the
    # per-round join/shuffle latency (measured 13.3s -> ~2s at sf0.1, where
    # the label frontier is a few hundred rows and every Ray stage is pure
    # scheduling overhead). Larger graphs take the iterative path below.
    if n_edges <= smallgraph_edges:
        def _cc_kernel(batch: pa.Table) -> pa.Table:
            src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            nodes, inv = np.unique(np.concatenate([src, dst]),
                                   return_inverse=True)
            si, di = inv[:len(src)], inv[len(src):]
            lbl = np.arange(len(nodes), dtype=np.int64)
            for _ in range(max_rounds):
                prev = lbl.copy()
                nxt = lbl.copy()
                np.minimum.at(nxt, di, lbl[si])  # neighbor-min
                lbl = nxt[nxt]                   # pointer doubling
                lbl = np.minimum(lbl, nxt)
                if (lbl == prev).all():
                    break
            else:
                raise RuntimeError(
                    f"dedup_clusters: no fixpoint after {max_rounds} rounds")
            return pa.table({"node": nodes, "lbl": nodes[lbl]})

        labels = edges.repartition(1).map_batches(
            _cc_kernel, batch_format="pyarrow", batch_size=None).materialize()
        return _finish(docs, labels, id_col, n_parts)

    def _init_labels(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        return pa.table({"node": s, "lbl": s})

    def _min_pre(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False, sort=False, observed=True).min()

    def _min_final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False, sort=False, observed=True).min()

    def _ident(t: pa.Table) -> pa.Table:
        return t

    def _grouped_min(ds):
        # the trailing identity normalizes map_groups' pandas blocks back to
        # Arrow so union/join never see mixed block types
        return bucketed_groups(ds, ["node"], _min_final, pre_fn=_min_pre,
                               n_buckets=n_parts).map_batches(
            _ident, batch_format="pyarrow", batch_size=8192)

    labels = _grouped_min(
        edges.map_batches(_init_labels, batch_format="pyarrow", batch_size=8192)
    ).materialize()
    prev_sum = labels.sum("lbl")

    def _msg_sel(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["dst"], "lbl": batch["lbl"]})

    def _ptr_ren(batch: pa.Table) -> pa.Table:
        return pa.table({"pnode": batch["node"], "plbl": batch["lbl"]})

    def _ptr_sel(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "lbl": batch["plbl"]})

    for _ in range(max_rounds):
        # neighbor-min: lbl(dst) <- min(lbl(dst), lbl(src)) over all edges
        msg = edges.join(labels, "inner", n_parts, on=("src",), right_on=("node",))
        msg = msg.map_batches(_msg_sel, batch_format="pyarrow", batch_size=8192)
        labels = _grouped_min(labels.union(msg))
        # pointer doubling: lbl(node) <- lbl(lbl(node)); every lbl value is a
        # node id already present in the label table (labels start as node
        # ids and mins of node ids stay node ids), so the inner join is total
        ptr = labels.map_batches(_ptr_ren, batch_format="pyarrow", batch_size=8192)
        labels = labels.join(ptr, "inner", n_parts, on=("lbl",), right_on=("pnode",))
        labels = labels.map_batches(_ptr_sel, batch_format="pyarrow",
                                    batch_size=8192).materialize()
        cur_sum = labels.sum("lbl")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"dedup_clusters: no fixpoint after {max_rounds} rounds "
            "(pathological component diameter; raise max_rounds)")

    return _finish(docs, labels, id_col, n_parts)


def _finish(docs, labels, id_col: str, n_parts: int):
    """Shared tail of both CC plans: cluster assignment (left join, own id
    default), cluster sizes, canonical keep flag."""
    from .relational import partial_groupby_sum

    def _ident(t: pa.Table) -> pa.Table:
        return t

    assigned = docs.join(labels, "left_outer", n_parts,
                         on=(id_col,), right_on=("node",))

    def _assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = batch["lbl"].to_numpy(zero_copy_only=False)
        lbl = np.where(pd.isna(lbl), ids, lbl).astype(np.int64)
        return pa.table({id_col: ids, "cluster_id": lbl})

    assigned = assigned.map_batches(_assign, batch_format="pyarrow",
                                    batch_size=8192)
    sizes = partial_groupby_sum(assigned, ["cluster_id"], [],
                                count_as="cluster_size",
                                n_buckets=n_parts).map_batches(
        _ident, batch_format="pyarrow", batch_size=8192)
    out = assigned.join(sizes, "inner", n_parts,
                        on=("cluster_id",), right_on=("cluster_id",))

    def _keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cl = batch["cluster_id"].to_numpy(zero_copy_only=False)
        return pa.table({id_col: ids, "cluster_id": cl,
                         "cluster_size": batch["cluster_size"],
                         "keep": ids == cl})

    return out.map_batches(_keep, batch_format="pyarrow", batch_size=8192)


def span_dedup_stats(docs, text_col: str = "text", id_col: str = "doc_id",
                     span_words: int = 8, est_rows: int | None = None):
    """Repeated-span removal stats — RefinedWeb/Falcon-style paragraph dedup
    generalized to fixed ``span_words``-word windows (the corpus has no
    paragraph delimiters): each doc splits into consecutive word chunks,
    each chunk hashes (FNV-1a of the space-joined lowercase ``\\w+`` words,
    ≙ the minhash shingle tokenizer), and only the globally FIRST occurrence
    of a chunk — ordered by (doc_id, span_idx) — is canonical; later
    occurrences are the spans a span-dedup pass would DROP.

    Returns (doc_id, n_spans, n_dup) for every document (0/0 for wordless
    docs). Two bounded shuffles: groupby span-hash marks canonicals, groupby
    doc folds counts; span rows are (hash, doc, idx) int64 triples — TEXT
    never transits the shuffle (the D2 exact-dedup content-key pattern,
    ``GtfsOsmNetworkDAO/loaders.js:39-49``, applied below document
    granularity)."""
    from .relational import bucketed_groups, partial_groupby_sum

    W = span_words

    def _spans(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_doc, out_idx, chunks = [], [], []
        for did, t in zip(ids, batch[text_col].to_pylist()):
            ws = [w.lower() for w in tx._WORD_ASCII_RE.findall(t)]
            for i in range(0, len(ws), W):
                out_doc.append(did)
                out_idx.append(i // W)
                chunks.append(" ".join(ws[i:i + W]))
        h = tx.fnv1a64_batch(chunks).view(np.int64)
        return pa.table({"h": h,
                         "doc_id": np.array(out_doc, dtype=np.int64),
                         "idx": np.array(out_idx, dtype=np.int64)})

    spans = docs.map_batches(_spans, batch_format="pyarrow", batch_size=1024)

    def _mark(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["h", "doc_id", "idx"], kind="mergesort")
        hv = d["h"].to_numpy()
        first = np.ones(len(d), dtype=bool)
        first[1:] = hv[1:] != hv[:-1]
        return pd.DataFrame({"doc_id": d["doc_id"].to_numpy(),
                             "n_dup": (~first).astype(np.int64),
                             "n_spans": np.ones(len(d), dtype=np.int64)})

    marked = bucketed_groups(spans, ["h"], _mark, est_rows=est_rows)
    agg = partial_groupby_sum(marked, ["doc_id"], ["n_dup", "n_spans"],
                              est_rows=est_rows)

    def _ident(t: pa.Table) -> pa.Table:
        return t

    agg = agg.map_batches(_ident, batch_format="pyarrow", batch_size=8192)
    joined = docs.select_columns([id_col]).join(
        agg, "left_outer", 8, on=(id_col,), right_on=("doc_id",))

    def _fill(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = batch["n_spans"].to_numpy(zero_copy_only=False)
        nd = batch["n_dup"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: ids,
            "n_spans": np.where(pd.isna(ns), 0, ns).astype(np.int64),
            "n_dup": np.where(pd.isna(nd), 0, nd).astype(np.int64),
        })

    return joined.map_batches(_fill, batch_format="pyarrow", batch_size=8192)


def normalized_dedup_groups(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Normalization-insensitive ("fuzzy-exact") dedup — the corpus-cleaning
    pass that catches re-encoded copies exact dedup misses: documents that
    are byte-different but identical after ASCII case-folding +
    punctuation/whitespace collapapse (``text.ascii_normalize``) dedup into
    one group. Returns one row per duplicate group (n ≥ 2):
    (keep_<id>, n_dups, n_norm_chars). The normalized text itself never
    transits the shuffle — only its md5 + codepoint length ride to the
    bucketed combine (md5 is also what ``exact_dedup_groups`` keys on, and
    what DuckDB's GROUP BY norm degrades to under collision — none exist)."""
    import hashlib

    from ..functions.text import ascii_normalize
    from .relational import bucketed_groups

    keep = f"keep_{id_col}"

    def _norm(batch: pa.Table) -> pa.Table:
        norms = [ascii_normalize(t) for t in batch[text_col].to_pylist()]
        return pa.table({
            id_col: batch[id_col],
            "nh": pa.array([hashlib.md5(n.encode("utf-8")).hexdigest()
                            for n in norms], type=pa.string()),
            "nlen": np.fromiter((len(n) for n in norms), np.int64, len(norms)),
        })

    hashed = ds.map_batches(_norm, batch_format="pyarrow", batch_size=4096)

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("nh", as_index=False, sort=False).agg(
            **{keep: (id_col, "min"), "n_dups": (id_col, "size"),
               "n_norm_chars": ("nlen", "min")})
        out["n_dups"] = out["n_dups"].astype(np.int64)
        return out

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("nh", as_index=False, sort=False).agg(
            **{keep: (keep, "min"), "n_dups": ("n_dups", "sum"),
               "n_norm_chars": ("n_norm_chars", "min")})
        out = out[out["n_dups"] >= 2]
        return out.drop(columns=["nh"])

    return bucketed_groups(hashed, ["nh"], _final, pre_fn=_pre)


def _myers_levenshtein(a: str, b: str) -> int:
    """Exact unit-cost Levenshtein distance via Myers' bit-parallel
    algorithm (Myers 1999, Hyyrö 2001 form) — the whole pattern bitvector
    lives in ONE Python big int, so each text character costs ~10 word
    ops regardless of pattern length (vs the O(|a|) inner loop of the
    classic DP). Identical by definition to the full DP / DuckDB's
    ``levenshtein()``; pytest pins both."""
    m = len(a)
    if m == 0:
        return len(b)
    if len(b) == 0:
        return m
    peq: dict[str, int] = {}
    for i, c in enumerate(a):
        peq[c] = peq.get(c, 0) | (1 << i)
    mask = (1 << m) - 1
    high = 1 << (m - 1)
    pv, mv, score = mask, 0, m
    for c in b:
        eq = peq.get(c, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (~(xh | pv) & mask)
        mh = pv & xh
        if ph & high:
            score += 1
        if mh & high:
            score -= 1
        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask
        pv = mh | (~(xv | ph) & mask)
        mv = ph & xv
    return score


def edit_distance_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        max_dist: int = 16, prefix: int = 12,
                        block_cap: int = 64):
    """Edit-distance near-duplicate VERIFICATION — the fuzzy-dedup family's
    exact member next to MinHash/SimHash/n-gram Jaccard: candidate pairs
    block on the first ``prefix`` chars of the normalized text (lower,
    [a-z0-9] only — robust to the re-punctuation edits the fixture
    plants), blocks cap at ``block_cap`` members by min id (logged), and
    surviving pairs verify with the EXACT unit-cost Levenshtein distance
    on the raw text; pairs with distance <= ``max_dist`` emit.

    Engine-only sound prunes (they only skip pairs provably beyond
    ``max_dist``, so the SQL oracle needn't mirror them): length gap
    (d >= |len(a)-len(b)|) and the character-histogram bound
    (d >= ceil(L1(hist_a, hist_b) / 2): one substitution moves the
    histogram L1 by at most 2, one indel by 1). Random same-prefix pairs
    die in the histogram prune; the Myers DP runs only on genuinely
    close texts. Blocks shuffle by key; no all-pairs pass."""
    import logging

    from ..functions.text import _ASCII_LOWER_TBL, _AZ09_RUN_RE
    from .relational import bucketed_groups

    # ASCII-exact squeeze (cf. functions.text.ascii_normalize, which keeps
    # run separators): strip every non-[a-z0-9] codepoint outright — ≙
    # DuckDB regexp_replace(translate(text, A..Z, a..z), '[^a-z0-9]+', '', 'g')
    def _squeeze(s: str) -> str:
        return "".join(_AZ09_RUN_RE.findall(s.translate(_ASCII_LOWER_TBL)))

    def _norm(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        texts = t[text_col].to_pylist()
        norms = [_squeeze(s) for s in texts]
        return pa.table({
            id_col: t[id_col],
            text_col: t[text_col],
            "blk": pa.array([n[:prefix] for n in norms]),
        })

    blocked = ds.map_batches(_norm, batch_format="pyarrow", batch_size=4096)

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["blk", id_col], kind="mergesort")
        blk = d["blk"].to_numpy()
        ids = d[id_col].to_numpy()
        texts = d[text_col].to_numpy()
        starts = np.flatnonzero(np.r_[True, blk[1:] != blk[:-1]])
        ends = np.r_[starts[1:], len(d)]
        n_dropped = 0
        out_a, out_b, out_d = [], [], []
        for s, e in zip(starts, ends):
            if e - s > block_cap:
                n_dropped += e - s - block_cap
                e = s + block_cap  # ids sorted: keep the min-id members
            if e - s < 2:
                continue
            ts = texts[s:e]
            lens = np.fromiter((len(x) for x in ts), np.int64, e - s)
            hists = np.zeros((e - s, 128), np.int64)
            for i, x in enumerate(ts):
                cc = np.frombuffer(x.encode("utf-8"), np.uint8)
                hists[i] = np.bincount(cc[cc < 128], minlength=128)
            for i in range(e - s):
                ld = np.abs(lens[i + 1:] - lens[i])
                l1 = np.abs(hists[i + 1:] - hists[i]).sum(axis=1)
                cand = np.flatnonzero((ld <= max_dist)
                                      & (l1 <= 2 * max_dist)) + i + 1
                for j in cand:
                    dist = _myers_levenshtein(ts[i], ts[j])
                    if dist <= max_dist:
                        out_a.append(ids[s + i])
                        out_b.append(ids[s + j])
                        out_d.append(dist)
        if n_dropped:
            logging.getLogger(__name__).warning(
                "edit_distance_pairs: dropped %d members beyond the "
                "%d-per-block cap", n_dropped, block_cap)
        return pd.DataFrame({
            "doc_a": np.array(out_a, np.int64),
            "doc_b": np.array(out_b, np.int64),
            "edit_dist": np.array(out_d, np.int64),
        })

    return bucketed_groups(blocked, ["blk"], _pairs)
