"""MinHash signatures and SimHash fingerprints for near-dup detection.

Miller has no near-dedup (SURVEY.md §2.7 — exact ``uniq -a`` only);
these extend the engine for training-data pipelines:

- MinHash (Broder 1997): k-permutation signatures over shingle sets;
  E[fraction of matching components] = Jaccard similarity. Batched:
  signatures for a whole batch of documents computed with one
  vectorized pass per document's shingle hash array.
- SimHash (Charikar 2002): 64-bit fingerprint; Hamming distance
  approximates cosine distance of the feature vectors.

Both use fixed-seed hashing only (deterministic under Ray retries).
"""

from __future__ import annotations

import numpy as np

from miller_ray.hashing import hash64, splitmix64

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHash:
    """k-permutation MinHash over uint64 element hashes.

    Permutations: pi_i(h) = (a_i * h + b_i) mod (2^61 - 1), with a_i, b_i
    derived from splitmix64 of the seed (a_i odd, nonzero).
    """

    __slots__ = ("k", "seed", "a", "b")

    def __init__(self, k: int = 128, seed: int = 0):
        self.k = k
        self.seed = seed
        idx = np.arange(1, k + 1, dtype=np.uint64)
        self.a = splitmix64(idx, seed=seed * 2 + 1) % (_MERSENNE - np.uint64(1)) + np.uint64(1)
        self.b = splitmix64(idx, seed=seed * 2 + 2) % _MERSENNE

    def signature(self, element_hashes: np.ndarray) -> np.ndarray:
        """Signature (k,) uint64 of one set given its element hashes."""
        if element_hashes.size == 0:
            return np.full(self.k, np.iinfo(np.uint64).max, dtype=np.uint64)
        h = element_hashes.astype(np.uint64) % _MERSENNE
        with np.errstate(over="ignore"):
            # (k, n) permuted values; 61-bit modulus avoids overflow bias
            vals = (np.multiply.outer(self.a, h) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def signatures_concat(self, flat_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Signatures (n_docs, k) for docs stored as a concatenated hash
        array + offsets (Arrow list layout: doc i owns
        flat_hashes[offsets[i]:offsets[i+1]]). Vectorized with
        np.minimum.reduceat per permutation."""
        n_docs = offsets.size - 1
        out = np.full((n_docs, self.k), np.iinfo(np.uint64).max, dtype=np.uint64)
        if flat_hashes.size == 0:
            return out
        h = flat_hashes.astype(np.uint64) % _MERSENNE
        starts = offsets[:-1]
        nonempty = offsets[1:] > starts
        red_starts = np.minimum(starts, h.size - 1).astype(np.int64)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                vals = (self.a[i] * h + self.b[i]) % _MERSENNE
                mins = np.minimum.reduceat(vals, red_starts)
                out[nonempty, i] = mins[nonempty]
        return out

    @staticmethod
    def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float(np.mean(sig_a == sig_b))

    def band_hashes(self, signatures: np.ndarray, bands: int) -> np.ndarray:
        """LSH banding: (n_docs, bands) uint64 band bucket keys."""
        n_docs, k = signatures.shape
        rows = k // bands
        sig = signatures[:, : bands * rows].reshape(n_docs, bands, rows)
        acc = np.zeros((n_docs, bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for r in range(rows):
                acc = splitmix64(acc ^ sig[:, :, r], seed=self.seed + 101 + r)
        return acc


def simhash64(feature_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of one document's feature hash array."""
    if feature_hashes.size == 0:
        return 0
    bits = ((feature_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.float64)
    if weights is None:
        score = bits.sum(axis=0) - feature_hashes.size / 2.0
    else:
        w = np.asarray(weights, dtype=np.float64)
        score = (bits * w[:, None]).sum(axis=0) - w.sum() / 2.0
    out = np.uint64(0)
    for i in range(64):
        if score[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_concat(flat_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """SimHash for docs in concatenated-hash + offsets layout -> (n,) uint64.

    Vectorized: per-bit popcount sums via np.add.reduceat over the flat
    bit matrix (64 reduceat passes, no per-doc Python loop).
    """
    n_docs = offsets.size - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if flat_hashes.size == 0:
        return out
    starts = np.minimum(offsets[:-1], flat_hashes.size - 1).astype(np.int64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.float64)
    nonempty = lens > 0
    h = flat_hashes.astype(np.uint64)
    for bit in range(64):
        ones = ((h >> np.uint64(bit)) & np.uint64(1)).astype(np.float64)
        sums = np.add.reduceat(ones, starts)
        bitval = (sums > lens / 2.0) & nonempty
        out |= bitval.astype(np.uint64) << np.uint64(bit)
    return out


def hamming64(a: np.ndarray, b: np.ndarray | int) -> np.ndarray:
    """Vectorized Hamming distance between uint64 fingerprints."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.uint64(b) if np.isscalar(b) else np.asarray(b, dtype=np.uint64))
    # popcount via byte-view + unpackbits-free lookup
    bytes_view = x.view(np.uint8).reshape(-1, 8)
    table = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    return table[bytes_view].sum(axis=1).astype(np.int64)


def shingle_hashes(token_hashes: np.ndarray, n: int = 3) -> np.ndarray:
    """Rolling n-gram shingle hashes from a 1-D array of token hashes."""
    if token_hashes.size < n:
        return splitmix64(token_hashes.astype(np.uint64), seed=5)
    h = token_hashes.astype(np.uint64)
    acc = h[: h.size - n + 1].copy()
    with np.errstate(over="ignore"):
        for i in range(1, n):
            acc = splitmix64(acc ^ h[i : h.size - n + 1 + i], seed=11 + i)
    return acc
