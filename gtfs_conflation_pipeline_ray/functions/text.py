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
    hit-rate (ties broken by profile name). Deterministic."""
    langs = sorted(_LANG_PROFILES)
    out = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        if t and sum("一" <= ch <= "鿿" for ch in t) / max(len(t), 1) > 0.2:
            out[i] = "zh"
            continue
        words = [w.lower() for w in _WORD_RE.findall(t)]
        if not words:
            out[i] = "und"
            continue
        best, best_score = "und", 0.0
        for lang in langs:
            score = sum(w in _LANG_PROFILES[lang] for w in words) / len(words)
            if score > best_score:
                best, best_score = lang, score
        out[i] = best if best_score > 0.0 else "und"
    return out


# ---- deterministic 64-bit string/word hashing (FNV-1a) ----------------------
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def word_hashes(text: str) -> np.ndarray:
    """uint64 FNV-1a hash of each ``\\w+`` token (lowercased)."""
    return np.array(
        [fnv1a64(w.lower()) for w in _WORD_RE.findall(text)], dtype=np.uint64
    )


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of k-word shingles (document fingerprint universe for
    MinHash). Deduplicated + sorted for determinism."""
    ws = [w.lower() for w in _WORD_RE.findall(text)]
    if len(ws) < k:
        return np.array([fnv1a64(" ".join(ws))], dtype=np.uint64) if ws else np.array([], dtype=np.uint64)
    sh = {fnv1a64(" ".join(ws[i : i + k])) for i in range(len(ws) - k + 1)}
    return np.array(sorted(sh), dtype=np.uint64)


_MERSENNE61 = np.uint64((1 << 61) - 1)


def minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameters for num_perm universal-hash
    permutations h(x) = (a*(x & 0xFFFFFFFF) + b) mod 2^61-1, with a < 2^31 so
    the product stays inside uint64 (fully vectorizable, no bigint path)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a set of uint64 element hashes.
    Vectorized (num_perm, n) multiply-mod in pure uint64; empty input -> all
    MAX. a*x < 2^63 and b < 2^61 so a*x+b never overflows uint64."""
    if len(hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = hashes.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    h = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE61
    return np.min(h, axis=1)


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


def winnow_fingerprint(text: str, k: int = 5, w: int = 8) -> int:
    """Winnowing document fingerprint (Schleimer et al. 2003): min k-gram
    char hash per window, XOR-folded to one int64-compatible value."""
    s = text.lower()
    if len(s) < k:
        return fnv1a64(s)
    grams = np.array([fnv1a64(s[i : i + k]) for i in range(len(s) - k + 1)], dtype=np.uint64)
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
