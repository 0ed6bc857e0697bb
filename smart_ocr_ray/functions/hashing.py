"""Vectorized hashing primitives for dedup: shingles, MinHash, SimHash.

Pure numpy — designed to run per-batch inside ``map_batches`` with no
Python-per-row loops in the hot path beyond tokenization.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)


def shingles(text: str, k: int = 3) -> set[str]:
    """Word k-gram shingles (lowercased)."""
    tokens = text.lower().split()
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def _hash64(s: str) -> np.uint64:
    """64-bit hash of a string == DuckDB's ``md5_number_lower``.

    Chosen (over blake2b) so an ANSI-SQL oracle can recompute the exact
    same shingle hashes — the driver's DuckDB gate can then value-check
    MinHash/SimHash/winnowing instead of a rows-only check.
    """
    return np.uint64(
        int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")
    )


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of the k-gram shingles of *text*."""
    sh = shingles(text, k)
    if not sh:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter((_hash64(s) for s in sh), dtype=np.uint64, count=len(sh))


class MinHasher:
    """num_perm universal-hash MinHash signatures over shingle hashes.

    Permutations (a·x + b mod p) are derived from a fixed seed so
    signatures are stable across workers and runs — build once per
    actor in ``__init__``.
    """

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)

    def signature(self, hashes: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 signature; all-max for empty input."""
        if hashes.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (num_perm, n) = (a[:,None]*x + b[:,None]) mod p, min over n.
        with np.errstate(over="ignore"):
            products = self.a[:, None] * hashes[None, :] + self.b[:, None]
        return (products % _MERSENNE).min(axis=1)

    def band_keys(self, sig: np.ndarray, num_bands: int = 16) -> list[bytes]:
        """LSH band keys: hash of each band's rows. num_bands must divide
        num_perm."""
        rows = self.num_perm // num_bands
        return [
            hashlib.blake2b(sig[i * rows : (i + 1) * rows].tobytes(), digest_size=8).digest()
            for i in range(num_bands)
        ]


def minhash_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Jaccard estimate from two signatures."""
    return float(np.mean(sig_a == sig_b))


def jaccard(a: set, b: set) -> float:
    """Exact Jaccard similarity of two sets."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def simhash(text: str, k: int = 3) -> np.uint64:
    """64-bit SimHash over shingle hashes (Charikar 2002)."""
    hashes = shingle_hashes(text, k)
    if hashes.size == 0:
        return np.uint64(0)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for bit_idx in np.nonzero(votes > 0)[0]:
        out |= np.uint64(1) << np.uint64(bit_idx)
    return out


def hamming64(a: np.ndarray, b: np.uint64) -> np.ndarray:
    """Vector Hamming distances between uint64 array *a* and scalar *b*."""
    x = np.bitwise_xor(a, b)
    return np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
