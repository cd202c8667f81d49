"""Deterministic synthetic power-law edge tables, generated distributed.

Every edge is a pure function of its global index (splitmix64 mixing — no
RNG state), so any batching/parallelism yields identical rows. Endpoint
skew: ids are drawn as ``n_vertices · u^alpha`` with u uniform, giving a
power-law frequency tail (low ids are hubs) — the shape the reference's
SVHM partitioner targets (/root/reference/README.md:26-29).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from drone_ray.hashing import mix64

_TWO64 = float(1 << 64)


def _uniform(ids: np.ndarray, salt: int) -> np.ndarray:
    return mix64(ids ^ np.uint64(salt)).astype(np.float64) / _TWO64


def edge_batch(
    ids: np.ndarray, n_vertices: int, seed: int = 42, alpha: float = 3.0
) -> pa.Table:
    ids = ids.astype(np.uint64)
    u1 = _uniform(ids, seed * 2 + 1)
    u2 = _uniform(ids, seed * 2 + 2)
    src = (n_vertices * np.power(u1, alpha)).astype(np.int64)
    dst = (n_vertices * np.power(u2, alpha)).astype(np.int64)
    keep = src != dst
    return pa.table(
        {"src": pa.array(src[keep], pa.int64()), "dst": pa.array(dst[keep], pa.int64())}
    )


def power_law_edges(
    n_edges: int,
    n_vertices: int,
    seed: int = 42,
    alpha: float = 3.0,
    override_num_blocks: int | None = None,
):
    """Distributed Dataset of ~n_edges skewed edges (self-loops dropped)."""
    import ray.data as rd

    blocks = override_num_blocks or max(8, min(128, n_edges // 500_000))
    return rd.range(n_edges, override_num_blocks=blocks).map_batches(
        lambda b: edge_batch(np.asarray(b["id"]), n_vertices, seed, alpha),
        batch_format="numpy",
    )
