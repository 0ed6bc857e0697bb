"""Edit-distance metric family: Levenshtein, WER, CER, NES (F1–F4).

Semantics follow the reference implementations
(``/root/reference/src/socr/pipeline/consensus.py:56-100`` and
``/root/reference/src/socr/benchmark/scorer.py:42-145``): single-row DP
with O(min(m, n)) space, WER on whitespace-split words, CER on chars,
NES = 1 - dist/max(len) ∈ [0, 1].

The DP is implemented with numpy row vectorization so scoring long
documents inside ``map_batches`` stays off the pure-Python hot path.
"""

from __future__ import annotations

import numpy as np


def levenshtein(seq_a, seq_b) -> int:
    """Edit distance between two sequences (str or list of tokens).

    Common prefix/suffix are trimmed first (exactness-preserving): for
    the dominant scoring cases — identical texts, or texts differing in
    a bounded region — the quadratic DP runs only on the differing core.
    """
    # Trim common prefix.
    lo = 0
    hi_a, hi_b = len(seq_a), len(seq_b)
    while lo < hi_a and lo < hi_b and seq_a[lo] == seq_b[lo]:
        lo += 1
    # Trim common suffix (not crossing the prefix).
    while hi_a > lo and hi_b > lo and seq_a[hi_a - 1] == seq_b[hi_b - 1]:
        hi_a -= 1
        hi_b -= 1
    seq_a = seq_a[lo:hi_a]
    seq_b = seq_b[lo:hi_b]

    m, n = len(seq_a), len(seq_b)
    if m == 0:
        return n
    if n == 0:
        return m
    if m < n:
        seq_a, seq_b = seq_b, seq_a
        m, n = n, m

    # Map tokens to int codes so numpy can compare row-wise.
    vocab: dict = {}
    a = np.empty(m, dtype=np.int64)
    b = np.empty(n, dtype=np.int64)
    for i, tok in enumerate(seq_a):
        a[i] = vocab.setdefault(tok, len(vocab))
    for j, tok in enumerate(seq_b):
        b[j] = vocab.setdefault(tok, len(vocab))

    prev = np.arange(n + 1, dtype=np.int64)
    for i in range(1, m + 1):
        curr = np.empty(n + 1, dtype=np.int64)
        curr[0] = i
        sub = prev[:-1] + (b != a[i - 1])
        dele = prev[1:] + 1
        # curr[j] = min(curr[j-1]+1, dele[j-1], sub[j-1]) — the insertion
        # term has a sequential dependency; resolve it with a running min
        # (np.minimum.accumulate over candidate - index trick).
        cand = np.minimum(sub, dele)
        # curr[j] = min(cand[j-1], curr[j-1] + 1) for j=1..n
        # Equivalent: curr[j] + ... use accumulate on (cand - arange).
        shifted = np.minimum.accumulate(cand - np.arange(1, n + 1))
        curr[1:] = np.minimum(cand, shifted + np.arange(1, n + 1))
        # The accumulate trick handles chains of insertions; also fold in
        # the boundary curr[0] = i as an insertion source.
        curr[1:] = np.minimum(curr[1:], i + np.arange(1, n + 1))
        prev = curr
    return int(prev[n])


def wer(hypothesis: str, reference: str) -> float:
    """Word Error Rate: dist(ref_words, hyp_words)/len(ref); lowercased
    split (consensus.py:85-100). Can exceed 1.0."""
    ref_words = reference.lower().split()
    hyp_words = hypothesis.lower().split()
    if not ref_words:
        return 0.0 if not hyp_words else 1.0
    return levenshtein(ref_words, hyp_words) / len(ref_words)


def wer_cased(predicted: str, ground_truth: str) -> float:
    """Benchmark WER variant: case-sensitive split (scorer.py:87-107)."""
    ref_words = ground_truth.split()
    hyp_words = predicted.split()
    if not ref_words:
        return 0.0 if not hyp_words else 1.0
    return levenshtein(ref_words, hyp_words) / len(ref_words)


def cer(predicted: str, ground_truth: str) -> float:
    """Character Error Rate (scorer.py:109-125)."""
    if not ground_truth:
        return 0.0 if not predicted else 1.0
    return levenshtein(ground_truth, predicted) / len(ground_truth)


def nes(predicted: str, ground_truth: str) -> float:
    """Normalized Edit Similarity ∈ [0,1]; 1.0 = identical (scorer.py:127-145)."""
    if not ground_truth and not predicted:
        return 1.0
    if not ground_truth or not predicted:
        return 0.0
    distance = levenshtein(predicted, ground_truth)
    return 1.0 - distance / max(len(predicted), len(ground_truth))
