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
import pandas as pd

from drone_ray.hashing import mix64

_MERSENNE = np.uint64((1 << 61) - 1)
_MAXH = np.uint64((1 << 61) - 1)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

# MinHash arithmetic lives in GF(2^31-1): products of two 31-bit values fit
# exactly in uint64 (numpy) and in BIGINT (DuckDB), so the whole signature
# chain is reproducible as plain SQL — which is what makes minhash_near_dup
# an oracle-backed query rather than a trust-me sketch.
_P31 = np.uint64((1 << 31) - 1)
_SENT31 = np.uint64((1 << 31) - 2)  # empty-shingle-set sentinel


def _stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def md5_lower64(s: str) -> int:
    """Exact Python twin of DuckDB's ``md5_number_lower``: the last 8 bytes
    of the md5 digest read little-endian (verified empirically against
    DuckDB 1.0)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


def _token_hashes(toks: list[str]) -> np.ndarray:
    """uint64 per token — pandas hash_array (siphash with a fixed key): C
    speed, deterministic across processes (no PYTHONHASHSEED dependence)."""
    return pd.util.hash_array(np.asarray(toks, dtype=object)).astype(np.uint64)


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Distinct k-word shingle hashes (uint64) of the whitespace tokens —
    vectorized: one hash pass over tokens, then a numpy k-gram polynomial
    combine (no per-shingle string building / hashing)."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = _token_hashes(toks)
    n = th.size
    with np.errstate(over="ignore"):
        if n < k:
            acc = np.zeros(1, np.uint64)
            for j in range(n):
                acc = acc * _GOLDEN + th[j]
        else:
            acc = np.zeros(n - k + 1, np.uint64)
            for j in range(k):  # k is tiny (3); each step is vectorized
                acc = acc * _GOLDEN + th[j : n - k + 1 + j]
        return np.unique(mix64(acc))


def shingle_strings(text: str, k: int = 3) -> list[str]:
    """k-word shingle STRINGS of the whitespace tokens; <k tokens collapse
    to one all-token shingle, empty text to []. The string form (not a
    process-local hash) is what lets the DuckDB oracle regenerate shingles
    with ``tk[p] || ' ' || …`` and match bit-for-bit."""
    toks = text.split()
    if not toks:
        return []
    if len(toks) < k:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


class MinHasher:
    """num_perm universal-hash permutations h_i(x) = (a_i·x + b_i) mod p
    with p = 2^31-1 and a_i/b_i derived from md5 of fixed strings — every
    value on the chain is reproducible in SQL (see _MINHASH_SQL in
    pipelines/queries.py). Seeded and process-independent."""

    def __init__(self, num_perm: int = 128):
        p = int(_P31)
        self.num_perm = num_perm
        self.a = np.array(
            [1 + md5_lower64(f"mh-a-{i}") % (p - 1) for i in range(num_perm)], dtype=np.uint64
        )
        self.b = np.array(
            [md5_lower64(f"mh-b-{i}") % p for i in range(num_perm)], dtype=np.uint64
        )

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """uint64[num_perm]; empty shingle set → all-sentinel. Inputs are
        reduced mod p first so a·x fits uint64 exactly (no wraparound)."""
        if shingle_hashes.size == 0:
            return np.full(self.num_perm, _SENT31, dtype=np.uint64)
        x = shingle_hashes.astype(np.uint64) % _P31
        hv = (self.a[:, None] * x[None, :] + self.b[:, None]) % _P31
        return hv.min(axis=1)

    def signature_of_strings(self, shs: list[str]) -> np.ndarray:
        """Signature over md5-hashed shingle strings — the oracle-grade
        entry point (md5_lower64 == DuckDB md5_number_lower)."""
        if not shs:
            return np.full(self.num_perm, _SENT31, dtype=np.uint64)
        sid = np.array([md5_lower64(s) for s in shs], dtype=np.uint64)
        return self.signature(sid)


def band_hashes(sig: np.ndarray, num_bands: int = 16) -> np.ndarray:
    """Hash each band of the signature to one uint64 bucket key: md5 of the
    comma-joined decimal values — the same string DuckDB's
    ``string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)`` builds, so band
    equality is identical on both sides."""
    rows = sig.size // num_bands
    out = np.empty(num_bands, dtype=np.uint64)
    for b in range(num_bands):
        s = ",".join(str(int(v)) for v in sig[b * rows : (b + 1) * rows])
        out[b] = md5_lower64(s)
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (unit weights) — one vectorized
    bit-count over the token-hash matrix."""
    toks = text.split()
    if not toks:
        return 0
    th = _token_hashes(toks)
    bits = np.unpackbits(th.view(np.uint8).reshape(-1, 8), axis=1)  # (n, 64)
    votes = bits.sum(axis=0).astype(np.int64) * 2 - len(toks)
    out_bits = (votes > 0).astype(np.uint64)
    return int((out_bits << np.arange(64, dtype=np.uint64)).sum())


def simhash64_md5(text: str) -> int:
    """Oracle-grade 64-bit SimHash: token hash = md5_lower64(token) (==
    DuckDB ``md5_number_lower``), unit weight per token OCCURRENCE, bit j
    set iff the ±1 votes over (h >> j) & 1 sum positive — regenerable as
    plain SQL (queries._SIMHASH_SQL). ~3× slower than the siphash variant
    (one md5 per token); at corpus scale swap in ``simhash64`` and trade
    the SQL oracle for throughput."""
    toks = text.split()
    if not toks:
        return 0
    th = np.array([md5_lower64(t) for t in toks], dtype=np.uint64)
    bits = np.unpackbits(th.view(np.uint8).reshape(-1, 8), axis=1)  # (n, 64) LE bytes
    # byte order: view(uint8) is little-endian per 8-byte word; unpackbits is
    # MSB-first per byte — reorder to bit position 0..63
    bits = bits.reshape(-1, 8, 8)[:, :, ::-1].reshape(-1, 64)
    votes = bits.sum(axis=0).astype(np.int64) * 2 - len(toks)
    out_bits = (votes > 0).astype(np.uint64)
    return int((out_bits << np.arange(64, dtype=np.uint64)).sum())


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
