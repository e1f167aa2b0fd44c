"""Text-analysis kernels for the training-data-pipeline operators: token
counts, quality ratios, language ID, fingerprints, MinHash/SimHash.

All kernels operate on a numpy object array / list of strings per batch and
return numpy arrays. They are deliberately dependency-free (regex + hashlib +
numpy) since the container has no NLP libraries.
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"\w+", re.UNICODE)
# ASCII word class — matches RE2's \w (DuckDB regexp_extract_all), so kernels
# that need a DuckDB-oracle-identical tokenization use this one
_WORD_ASCII_RE = re.compile(r"\w+", re.ASCII)
_ALPHA_RE = re.compile(r"[A-Za-z]")
_DIGIT_RE = re.compile(r"[0-9]")

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic (public common-word lists). Matched langs = the testdata corpus.
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the a of and to in is that it for on with as are was".split()),
    "de": frozenset("der die das und ist von zu mit den nicht ein eine im für auf".split()),
    "fr": frozenset("le la les de des et est un une pour dans que qui sur avec".split()),
    "es": frozenset("el la los las de y es un una para en que por con del".split()),
}


def token_counts(texts) -> np.ndarray:
    """Number of whitespace-separated tokens per string (≙ SQL
    ``len(list_filter(regexp_split_to_array(text,'\\s+'), x -> x <> ''))``)."""
    return np.fromiter(
        (len(_TOKEN_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
    )


def quality_counts(texts) -> dict[str, np.ndarray]:
    """Per-string character-class counts used for quality scoring. Integer
    counts → downstream ratios are exact int/int double divisions."""
    n = len(texts)
    return {
        "n_chars": np.fromiter((len(t) for t in texts), np.int64, n),
        "n_alpha": np.fromiter((len(_ALPHA_RE.findall(t)) for t in texts), np.int64, n),
        "n_digit": np.fromiter((len(_DIGIT_RE.findall(t)) for t in texts), np.int64, n),
        "n_tokens": token_counts(texts),
    }


def lang_id(texts) -> np.ndarray:
    """Heuristic language ID: CJK codepoint share, else argmax stopword-profile
    hit-rate (ties broken by profile name). Deterministic. Vectorized: all
    words of the batch hash once (``fnv1a64_batch``); per-language hits are
    one ``np.isin`` over the flat hash array + a segmented sum — no per-doc
    Python scoring loop (ASCII texts skip the CJK scan entirely)."""
    langs = sorted(_LANG_PROFILES)
    n = len(texts)
    out = np.full(n, "und", dtype=object)
    if n == 0:
        return out
    is_cjk = np.zeros(n, dtype=bool)
    word_lists = []
    for i, t in enumerate(texts):
        if t and not t.isascii() and sum("一" <= ch <= "鿿" for ch in t) / max(len(t), 1) > 0.2:
            is_cjk[i] = True
            word_lists.append([])
        else:
            word_lists.append([w.lower() for w in _WORD_RE.findall(t)])
    counts = np.fromiter((len(w) for w in word_lists), np.int64, n)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    flat = fnv1a64_batch([w for ws in word_lists for w in ws])
    nz = counts > 0
    scores = np.zeros((n, len(langs)))
    if flat.size:
        ones = np.zeros(len(flat))
        for li, lang in enumerate(langs):
            prof = fnv1a64_batch(sorted(_LANG_PROFILES[lang]))
            ones[:] = np.isin(flat, prof)
            hits = np.add.reduceat(ones, offsets[:-1][nz])
            scores[nz, li] = hits / counts[nz]
    best = np.argmax(scores, axis=1)  # first max = alphabetical tie-break
    has_score = scores[np.arange(n), best] > 0.0
    lang_arr = np.array(langs, dtype=object)
    out[nz & has_score] = lang_arr[best[nz & has_score]]
    out[is_cjk] = "zh"
    return out


# ---- deterministic 64-bit string/word hashing (FNV-1a) ----------------------
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a64(s: str) -> int:
    return _fnv1a64_bytes(s.encode("utf-8"))


def _fnv1a64_bytes(bs: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in bs:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a64_batch(strs: list[str]) -> np.ndarray:
    """FNV-1a of MANY strings at once — bit-identical to ``fnv1a64`` per
    string, but vectorized: utf-8 bytes land in a padded (n, maxlen) uint8
    matrix and the hash chain runs one numpy op per BYTE COLUMN (strings are
    short, so ~tens of vector ops replace n Python loops).

    Skew guard: strings are hashed in LENGTH-CLASS buckets (powers of two),
    so one pathological megabyte string can't inflate the dense matrix for
    the whole batch (1024 docs x one 1 MB doc would otherwise allocate ~1 GB
    and run maxlen column steps over everything); strings beyond
    ``_LONG_STR`` bytes fall back to the scalar loop individually."""
    n = len(strs)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bs = [s.encode("utf-8") for s in strs]
    lens = np.fromiter((len(b) for b in bs), np.int64, n)
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return out
    # length classes: ceil-log2 buckets; each bucket's matrix is at most 2x
    # its longest member, so total work stays O(total bytes)
    classes = np.zeros(n, dtype=np.int64)
    nz = lens > 0
    classes[nz] = np.floor(np.log2(lens[nz].astype(np.float64))).astype(np.int64)
    long_mask = lens > _LONG_STR
    for i in np.flatnonzero(long_mask):
        out[i] = _fnv1a64_bytes(bs[i])
    for cls in np.unique(classes[nz & ~long_mask]):
        idx = np.flatnonzero((classes == cls) & nz & ~long_mask)
        out[idx] = _fnv_matrix([bs[i] for i in idx], lens[idx])
    return out


_LONG_STR = 65536


def _fnv_matrix(bs: list[bytes], lens: np.ndarray) -> np.ndarray:
    """Dense-matrix FNV-1a over same-length-class byte strings."""
    n = len(bs)
    maxlen = int(lens.max())
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    buf = np.frombuffer(b"".join(bs), dtype=np.uint8)
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    cols = np.arange(len(buf), dtype=np.int64) - np.repeat(offs, lens)
    mat[rows, cols] = buf
    for j in range(maxlen):
        act = lens > j
        h[act] = (h[act] ^ mat[act, j].astype(np.uint64)) * _FNV_PRIME
    return h


def word_hashes(text: str) -> np.ndarray:
    """uint64 FNV-1a hash of each ``\\w+`` token (lowercased)."""
    return np.array(
        [fnv1a64(w.lower()) for w in _WORD_RE.findall(text)], dtype=np.uint64
    )


def batch_shingle_hashes(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Shingle hashes for a whole batch: flat uint64 hash array + per-doc
    offsets (len(texts)+1). Same values as ``shingle_hashes`` per doc (minus
    the per-doc dedup/sort, which MinHash's min() makes irrelevant) — the
    string hashing is one vectorized ``fnv1a64_batch`` call per batch instead
    of a Python loop per shingle."""
    shingles: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        ws = [w.lower() for w in _WORD_RE.findall(t)]
        if not ws:
            counts[i] = 0
        elif len(ws) < k:
            shingles.append(" ".join(ws))
            counts[i] = 1
        else:
            shingles.extend(" ".join(ws[j : j + k]) for j in range(len(ws) - k + 1))
            counts[i] = len(ws) - k + 1
    offsets = np.concatenate(([0], np.cumsum(counts)))
    return fnv1a64_batch(shingles), offsets


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of k-word shingles (document fingerprint universe for
    MinHash). Deduplicated + sorted for determinism."""
    ws = [w.lower() for w in _WORD_RE.findall(text)]
    if len(ws) < k:
        return np.array([fnv1a64(" ".join(ws))], dtype=np.uint64) if ws else np.array([], dtype=np.uint64)
    sh = {fnv1a64(" ".join(ws[i : i + k])) for i in range(len(ws) - k + 1)}
    return np.array(sorted(sh), dtype=np.uint64)


_MERSENNE61 = np.uint64((1 << 61) - 1)


def _affine_mod_m61(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a·x + b) mod (2^61-1) as a (len(a), len(x)) matrix with ONE output
    allocation and in-place ops — the naive broadcast expression allocates
    3-4 full-size temporaries, and first-touch page faults on those dominate
    the minhash hot loop for large batches. Bit-identical to the plain
    expression (numpy's uint64 ``%`` is exact)."""
    h = np.empty((len(a), len(x)), dtype=np.uint64)
    np.multiply(a[:, None], x[None, :], out=h)
    h += b[:, None]
    h %= _MERSENNE61
    return h


def minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameters for num_perm universal-hash
    permutations h(x) = (a*(x & 0xFFFFFFFF) + b) mod 2^61-1, with a < 2^31 so
    the product stays inside uint64 (fully vectorizable, no bigint path).

    The parameters are CLOSED-FORM splitmix64 mixes of the permutation index
    rather than RNG draws, so a SQL oracle can regenerate them exactly
    (``seed`` shifts the index base)."""
    i = np.arange(num_perm, dtype=np.uint64)
    a = splitmix64(i + np.uint64(seed)) % np.uint64(0x7FFFFFFF) + np.uint64(1)
    b = splitmix64(i + np.uint64(seed) + np.uint64(0x10000)) % _MERSENNE61
    return a, b


def splitmix64(z: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (Steele et al. 2014) — a statistically strong,
    closed-form uint64 mix that a SQL oracle can replicate with HUGEINT
    arithmetic (xor / shift / multiply mod 2^64)."""
    z = (z + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a set of uint64 element hashes.
    Vectorized (num_perm, n) multiply-mod in pure uint64; empty input -> all
    MAX. a*x < 2^63 and b < 2^61 so a*x+b never overflows uint64."""
    if len(hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = hashes.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    h = _affine_mod_m61(x, a, b)
    return np.min(h, axis=1)


def minhash_batch(flat: np.ndarray, offsets: np.ndarray, a: np.ndarray,
                  b: np.ndarray) -> np.ndarray:
    """MinHash signatures for a whole batch at once: one (num_perm, total)
    multiply-mod then a per-doc segmented min (``np.minimum.reduceat``).
    Bit-identical to calling ``minhash_signature`` per doc; empty docs get
    the all-MAX sentinel."""
    n = len(offsets) - 1
    sigs = np.full((n, len(a)), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat) == 0:
        return sigs
    x = flat.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    h = _affine_mod_m61(x, a, b)
    counts = np.diff(offsets)
    nz = counts > 0
    # flat is doc-contiguous, so reduceat over the non-empty doc starts
    # segments exactly at doc boundaries
    sigs[nz] = np.minimum.reduceat(h, offsets[:-1][nz], axis=1).T
    return sigs


def simhash64(hashes: np.ndarray) -> np.uint64:
    """64-bit SimHash over uint64 feature hashes (unweighted)."""
    if len(hashes) == 0:
        return np.uint64(0)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = bits.sum(axis=0) * 2 - len(hashes)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


def _char_gram_hashes(s: str, k: int) -> np.ndarray:
    """FNV-1a of every k-char-gram. ASCII fast path: byte sliding windows +
    one vector op per gram byte (k ops total); identical values to the
    per-gram Python loop (char slicing == byte slicing for ASCII)."""
    if len(s) < k:
        return np.empty(0, dtype=np.uint64)
    if s.isascii():
        bts = np.frombuffer(s.encode(), dtype=np.uint8)
        win = np.lib.stride_tricks.sliding_window_view(bts, k)
        h = np.full(win.shape[0], _FNV_OFFSET, dtype=np.uint64)
        for j in range(k):
            h = (h ^ win[:, j].astype(np.uint64)) * _FNV_PRIME
        return h
    return fnv1a64_batch([s[i : i + k] for i in range(len(s) - k + 1)])


def simhash_batch(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """SimHash for a whole batch: one (total, 64) bit matrix + segmented
    column sums (``np.add.reduceat``). Bit-identical to ``simhash64`` per
    doc; empty docs hash to 0."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.uint64)
    if len(flat) == 0:
        return out
    bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    counts = np.diff(offsets)
    nz = counts > 0
    sums = np.add.reduceat(bits, offsets[:-1][nz], axis=0)
    votes = sums * 2 - counts[nz][:, None]
    packed = ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nz] = packed
    return out


def batch_word_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Lowercased ``\\w+`` word hashes for a whole batch: flat uint64 array +
    per-doc offsets, hashed in one ``fnv1a64_batch`` call."""
    word_lists = [[w.lower() for w in _WORD_RE.findall(t)] for t in texts]
    counts = np.fromiter((len(w) for w in word_lists), np.int64, len(texts))
    offsets = np.concatenate(([0], np.cumsum(counts)))
    return fnv1a64_batch([w for ws in word_lists for w in ws]), offsets


def winnow_fingerprint(text: str, k: int = 5, w: int = 8) -> int:
    """Winnowing document fingerprint (Schleimer et al. 2003): min k-gram
    char hash per window, XOR-folded to one int64-compatible value."""
    s = text.lower()
    if len(s) < k:
        return fnv1a64(s)
    grams = _char_gram_hashes(s, k)
    if len(grams) <= w:
        sel = np.array([grams.min()], dtype=np.uint64)
    else:
        idx = np.arange(len(grams) - w + 1)
        windows = grams[idx[:, None] + np.arange(w)[None, :]]
        sel = np.unique(windows.min(axis=1))
    out = 0
    for v in sel:
        out ^= (int(v) * int(_FNV_PRIME) + len(sel)) & 0xFFFFFFFFFFFFFFFF
    return out


# --- ASCII-exact normalization (the "fuzzy-exact" dedup key) -----------------
# Lowercase ONLY A-Z (unicode case mapping differs subtly across engines, so
# the cross-engine-exact normalizer never touches non-ASCII letters), then
# collapse every run of non-[a-z0-9] codepoints to one space and trim — ≙
# DuckDB trim(regexp_replace(translate(text, 'A..Z', 'a..z'),
# '[^a-z0-9]+', ' ', 'g')).
_ASCII_LOWER_TBL = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")
_AZ09_RUN_RE = re.compile(r"[a-z0-9]+")


def ascii_normalize(t: str) -> str:
    return " ".join(_AZ09_RUN_RE.findall(t.translate(_ASCII_LOWER_TBL)))


# --- PII-shaped token predicates ---------------------------------------------
# Email-shaped: token contains '@' with a '.' somewhere after it (string
# predicate, no regex-engine semantics to mirror). Phone-shaped: token
# contains a run of >= 7 digits (pure existence test — Python re and RE2
# agree on existence even where greedy-capture semantics could differ).
_DIGIT_RUN7_RE = re.compile(r"[0-9]{7}")


def pii_token_counts(texts) -> dict[str, np.ndarray]:
    n = len(texts)
    n_emails = np.zeros(n, np.int64)
    n_digit = np.zeros(n, np.int64)
    for i, t in enumerate(texts):
        e = d = 0
        for tok in _TOKEN_RE.findall(t):
            a = tok.find("@")
            if a >= 0 and "." in tok[a + 1:]:
                e += 1
            if _DIGIT_RUN7_RE.search(tok) is not None:
                d += 1
        n_emails[i] = e
        n_digit[i] = d
    return {"n_emails": n_emails, "n_digit_tokens": n_digit}
