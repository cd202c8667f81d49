"""Stable 64-bit hashing for vertex ids and partition assignment.

The reference engine uses METIS-assigned integer partitions computed offline
(/root/reference/src/preprocess.py:2-27); we instead derive vertex ids by
hashing canonicalized URLs (SURVEY.md §2.3 M9) and assign partitions with a
stable hash so that every stage — edge build, partitioner, message routing —
agrees on ownership without any shared state.

All hashes here are deterministic across processes and Python versions
(no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK63 = (1 << 63) - 1


def hash_url(url: str) -> int:
    """64-bit (non-negative int64) id for a canonicalized URL.

    blake2b/8-byte keeps collision probability negligible for up to ~10^9
    distinct URLs per partition-space; ids are masked to 63 bits so they fit
    int64 without sign surprises in Arrow/parquet/DuckDB round-trips.
    """
    h = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "big") & _MASK63


def hash_urls(urls) -> np.ndarray:
    """Vectorized-ish batch version of :func:`hash_url` → int64 ndarray."""
    return np.fromiter(
        (hash_url(u) for u in urls), dtype=np.int64, count=len(urls)
    )


# --- partition assignment ---------------------------------------------------
#
# Vertex ownership: owner(v) = splitmix64(v) % P. A finalizer-style mixer is
# used (not plain modulo) so that structured id spaces (0..n-1 in tests,
# TPC-H keys) spread uniformly. Pure numpy, O(n) per batch, no Python loop.

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over an int64/uint64 ndarray → uint64 ndarray."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _GOLDEN
        z ^= z >> np.uint64(30)
        z *= _C1
        z ^= z >> np.uint64(27)
        z *= _C2
        z ^= z >> np.uint64(31)
    return z


def owner_partition(vids: np.ndarray, num_partitions: int) -> np.ndarray:
    """Partition owning each vertex id → int32 ndarray in [0, P)."""
    return (mix64(np.asarray(vids)) % np.uint64(num_partitions)).astype(np.int32)
