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


# --- community-structured graph (web-shaped: most links are intra-site) ----
HOSTLOC_BITS = 18  # vid layout: (community prefix << 45) | vertex id


def community_edge_batch(
    ids: np.ndarray,
    n_vertices: int,
    n_communities: int = 4096,
    intra: float = 0.85,
    seed: int = 42,
    alpha: float = 3.0,
) -> pa.Table:
    """Power-law edges where ``intra`` of them stay inside the source's
    community, with the community id packed into the top HOSTLOC_BITS of
    each vid — the same id layout hash_url(url, host_bits) produces for real
    URLs, so Ownership("host", HOSTLOC_BITS) co-locates each community.
    Models the web's intra-site link fraction (the reference's METIS
    edge-cut rationale, /root/reference/src/preprocess.py:2-27)."""
    if n_communities > n_vertices:
        # the clamp below would silently collapse "intra" edges of
        # communities beyond the vertex range onto vertex n_vertices-1
        raise ValueError(
            f"n_communities={n_communities} must be <= n_vertices={n_vertices}"
        )
    ids = ids.astype(np.uint64)
    ncomm = np.int64(n_communities)
    n_local = max(1, n_vertices // n_communities)
    u1 = _uniform(ids, seed * 5 + 1)
    u2 = _uniform(ids, seed * 5 + 2)
    u3 = _uniform(ids, seed * 5 + 3)
    u4 = _uniform(ids, seed * 5 + 4)
    src_v = (n_vertices * np.power(u1, alpha)).astype(np.int64)
    # community = v % ncomm (interleaved): site identity is independent of
    # page popularity, so every community holds an even slice of the
    # power-law mass — no community is hot just because its pages are.
    # Within a community the alpha-law re-applies over local indices, so
    # each site still has its own popular pages.
    c = src_v % ncomm
    intra_dst = np.minimum(
        c + (n_local * np.power(u2, alpha)).astype(np.int64) * ncomm,
        n_vertices - 1,
    )
    rand_dst = (n_vertices * np.power(u3, alpha)).astype(np.int64)
    dst_v = np.where(u4 < intra, intra_dst, rand_dst)
    keep = src_v != dst_v
    shift = np.int64(63 - HOSTLOC_BITS)
    src = ((src_v % ncomm) << shift) | src_v
    dst = ((dst_v % ncomm) << shift) | dst_v
    return pa.table(
        {"src": pa.array(src[keep], pa.int64()), "dst": pa.array(dst[keep], pa.int64())}
    )


def community_edges(
    n_edges: int,
    n_vertices: int,
    n_communities: int = 4096,
    intra: float = 0.85,
    seed: int = 42,
    alpha: float = 3.0,
    override_num_blocks: int | None = None,
):
    """Distributed Dataset of community-structured edges (see batch fn)."""
    import ray.data as rd

    blocks = override_num_blocks or max(8, min(128, n_edges // 500_000))
    return rd.range(n_edges, override_num_blocks=blocks).map_batches(
        lambda b: community_edge_batch(
            np.asarray(b["id"]), n_vertices, n_communities, intra, seed, alpha
        ),
        batch_format="numpy",
    )
