"""MinHash / SimHash / shingle kernels for near-duplicate detection.

All hashing is seeded and process-independent (blake2-derived permutation
parameters, no PYTHONHASHSEED dependence) so signatures are identical at any
parallelism. Signatures are mergeable per-batch artifacts; the LSH banding
turns near-dup search into a groupby on (band_id, band_hash) — the idiomatic
Ray Data shuffle shape (see SNIPPETS/ray guide: sketch → band → bucket).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)
_MAXH = np.uint64((1 << 61) - 1)


def _stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Distinct k-word shingle hashes (uint64) of the whitespace tokens."""
    toks = text.split()
    if len(toks) < k:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not joined:
        return np.empty(0, dtype=np.uint64)
    hs = np.fromiter((_stable_hash64(s) for s in set(joined)), np.uint64)
    return hs


class MinHasher:
    """num_perm universal-hash permutations h_i(x) = (a_i·x + b_i) mod p."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, int(_MERSENNE), num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), num_perm, dtype=np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """uint64[num_perm]; empty shingle set → all MAXH sentinel."""
        if shingle_hashes.size == 0:
            return np.full(self.num_perm, _MAXH, dtype=np.uint64)
        x = shingle_hashes.astype(np.uint64)
        with np.errstate(over="ignore"):
            # (num_perm, n) universal hashes; mod 2^61-1 keeps values well mixed
            hv = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return hv.min(axis=1)


def band_hashes(sig: np.ndarray, num_bands: int = 16) -> np.ndarray:
    """Hash each band of the signature to one uint64 bucket key."""
    rows = sig.size // num_bands
    out = np.empty(num_bands, dtype=np.uint64)
    for b in range(num_bands):
        chunk = sig[b * rows : (b + 1) * rows].tobytes()
        out[b] = int.from_bytes(hashlib.blake2b(chunk, digest_size=8).digest(), "big")
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (unit weights)."""
    toks = text.split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = _stable_hash64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    bits = (acc > 0).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def simhash_bands(h: int, num_bands: int = 4) -> list[int]:
    """Split a 64-bit simhash into num_bands 16-bit keys; two hashes within
    Hamming distance < num_bands share at least one identical band."""
    width = 64 // num_bands
    mask = (1 << width) - 1
    return [(h >> (b * width)) & mask for b in range(num_bands)]
