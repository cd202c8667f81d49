"""Vector kernels for similarity search over embedding columns."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """list<float> column → float64 (n, d) matrix (one copy, vectorized)."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def cosine_matrix(x: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n, d) × (m, d) → (n, m) cosine similarities (zero vectors → 0)."""
    xn = np.linalg.norm(x, axis=1, keepdims=True)
    qn = np.linalg.norm(q, axis=1, keepdims=True)
    xn[xn == 0] = 1.0
    qn[qn == 0] = 1.0
    return (x / xn) @ (q / qn).T


def hyperplane_signs(x: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane LSH bucket ids: sign bits of x·planes^T packed to
    one int64 per row. planes: (n_bits, d)."""
    bits = (x @ planes.T) > 0
    weights = (1 << np.arange(bits.shape[1])).astype(np.int64)
    return bits.astype(np.int64) @ weights


def make_planes(d: int, n_bits: int = 8, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_bits, d))
