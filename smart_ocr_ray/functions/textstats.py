"""Text-analysis function family for training-data pipelines.

Language-ID (stopword/n-gram heuristic), quality scoring, token
counting, and document fingerprinting. These are the per-document
scalar functions behind the ``ops.text_analysis`` Ray stages; each is
kept exactly SQL-expressible where an oracle exists (see
``__ray_entry__.oracle_sql``) so the driver's DuckDB comparison can
verify them value-for-value.
"""

from __future__ import annotations

import hashlib
import re

_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"[a-zA-Z]+")
# A compact BPE-ish tokenizer regex (GPT-2 style simplification):
# word pieces, numbers, punctuation runs, whitespace collapsed.
_BPEISH_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")

# Stopword banks for the language-ID heuristic. Deliberately small and
# frozen — they are part of the oracle contract.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "von"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr": ("le", "la", "de", "et", "est", "un", "une", "dans", "pour", "que"),
}


def token_count(text: str) -> int:
    """Whitespace token count — matches DuckDB
    ``length(regexp_split_to_array(trim(text), '\\s+'))`` on non-empty
    trimmed text, 0 on empty."""
    return len(_TOKEN_RE.findall(text))


def bpeish_token_count(text: str) -> int:
    """Sub-word-ish token count: alpha runs + digit runs + single
    punctuation marks (a deterministic stand-in for a BPE tokenizer)."""
    return len(_BPEISH_RE.findall(text))


def char_count(text: str) -> int:
    return len(text)


def word_lengths_total(text: str) -> int:
    """Sum of whitespace-token lengths (for avg word length in SQL:
    ``list_sum(list_transform(tokens, x -> length(x)))``)."""
    return sum(len(t) for t in _TOKEN_RE.findall(text))


def stopword_hits(text: str, lang: str = "en") -> int:
    """Count of tokens (lowercased) that are in the language's stopword
    bank — matches DuckDB ``len(list_filter(tokens, t -> list_contains(...)))``."""
    bank = set(STOPWORDS[lang])
    return sum(1 for t in text.lower().split() if t in bank)


def predict_lang(text: str) -> str:
    """Heuristic language-ID: the language whose stopword bank scores the
    most hits; ties break by language-code order; 'und' (undetermined)
    when no bank scores ≥ 2 hits."""
    tokens = text.lower().split()
    if not tokens:
        return "und"
    token_set_counts = {}
    for lang in sorted(STOPWORDS):
        bank = set(STOPWORDS[lang])
        token_set_counts[lang] = sum(1 for t in tokens if t in bank)
    best_lang = min(
        token_set_counts, key=lambda code: (-token_set_counts[code], code)
    )
    return best_lang if token_set_counts[best_lang] >= 2 else "und"


# --- quality scoring (length / punctuation / stopword ratios) ---

_PUNCT_RE = re.compile(r"[.,;:!?]")


def quality_signals(text: str) -> dict:
    """Deterministic quality signals for corpus filtering.

    All ratios are over whitespace tokens / raw chars so each component
    is independently SQL-expressible.
    """
    tokens = _TOKEN_RE.findall(text)
    n_tokens = len(tokens)
    n_chars = len(text)
    alpha_tokens = sum(1 for t in tokens if _WORD_RE.fullmatch(t))
    punct = len(_PUNCT_RE.findall(text))
    stop_en = stopword_hits(text, "en")
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "alpha_token_ratio": alpha_tokens / n_tokens if n_tokens else 0.0,
        "punct_per_token": punct / n_tokens if n_tokens else 0.0,
        "stopword_ratio": stop_en / n_tokens if n_tokens else 0.0,
        "mean_token_len": (sum(len(t) for t in tokens) / n_tokens) if n_tokens else 0.0,
    }


def quality_score(text: str) -> float:
    """Composite quality score ∈ [0, 1]: rewards plausible length,
    punctuation presence, stopword density, and sane token lengths.
    Weights are frozen constants (part of the test contract)."""
    s = quality_signals(text)
    length_term = min(s["n_tokens"] / 100.0, 1.0)
    stop_term = min(s["stopword_ratio"] / 0.2, 1.0)
    punct_term = min(s["punct_per_token"] / 0.1, 1.0)
    len_ok = 1.0 if 2.0 <= s["mean_token_len"] <= 12.0 else 0.0
    return 0.4 * length_term + 0.3 * stop_term + 0.15 * punct_term + 0.15 * len_ok


# --- fingerprinting ---


def content_md5(text: str) -> str:
    """Exact-content fingerprint — oracle: DuckDB ``md5(text)``."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def content_sha256(data: bytes) -> str:
    """sha256 over raw bytes (document.py:50-56 analog, F11)."""
    return hashlib.sha256(data).hexdigest()


_MOD = (1 << 61) - 1
_BASE = 257


def rolling_hashes(text: str, k: int = 8) -> list[int]:
    """Rolling (Rabin-Karp) hashes of all k-grams of *text*."""
    data = text.encode("utf-8", "ignore")
    n = len(data)
    if n < k:
        return [_full_hash(data)] if n else []
    out = []
    h = 0
    power = pow(_BASE, k - 1, _MOD)
    for i, byte in enumerate(data):
        h = (h * _BASE + byte) % _MOD
        if i >= k:
            h = (h - data[i - k] * power * _BASE) % _MOD
        if i >= k - 1:
            out.append(h)
    return out


def _full_hash(data: bytes) -> int:
    h = 0
    for byte in data:
        h = (h * _BASE + byte) % _MOD
    return h


def _kgram_hash64(s: str) -> int:
    """64-bit k-gram hash == DuckDB ``md5_number_lower`` (so the winnow
    fingerprint is value-checkable by the driver's SQL oracle)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")


def winnow_fingerprint(text: str, k: int = 8, window: int = 16) -> list[int]:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD 2003):
    min k-gram hash per sliding window, deduplicated, sorted.

    k-grams are character k-grams hashed with an md5-derived 64-bit
    hash (any strong hash satisfies the winnowing guarantees; md5 was
    chosen over Rabin-Karp — still available as ``rolling_hashes`` —
    because DuckDB can recompute it, making the driver's value-hash
    gate applicable). Texts shorter than k contribute their whole text
    as the single k-gram."""
    if not text:
        return []
    if len(text) < k:
        hashes = [_kgram_hash64(text)]
    else:
        hashes = [_kgram_hash64(text[i : i + k]) for i in range(len(text) - k + 1)]
    if len(hashes) <= window:
        return sorted({min(hashes)})
    import numpy as np

    arr = np.asarray(hashes, dtype=np.uint64)
    mins = np.lib.stride_tricks.sliding_window_view(arr, window).min(axis=1)
    return [int(x) for x in np.unique(mins)]
