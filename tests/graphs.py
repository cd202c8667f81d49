"""Deterministic fixture graphs (FIXTURES.md §2): known shapes + seeded
power-law. Each returns (src, dst) int64 arrays of *directed* edges."""

from __future__ import annotations

import numpy as np


def chain(n: int = 20):
    v = np.arange(n - 1, dtype=np.int64)
    return v, v + 1


def cycle(n: int = 12):
    v = np.arange(n, dtype=np.int64)
    return v, (v + 1) % n


def star(n: int = 15):
    """Hub 0 → spokes, and spokes 1..n//2 → hub (in+out mix)."""
    out_s = np.zeros(n - 1, dtype=np.int64)
    out_d = np.arange(1, n, dtype=np.int64)
    in_s = np.arange(1, n // 2, dtype=np.int64)
    in_d = np.zeros(n // 2 - 1, dtype=np.int64)
    return np.concatenate([out_s, in_s]), np.concatenate([out_d, in_d])


def two_cliques_bridge(k: int = 5):
    """Two k-cliques (directed both ways) joined by one bridge edge."""
    s, d = [], []
    for base in (0, k):
        for i in range(k):
            for j in range(k):
                if i != j:
                    s.append(base + i)
                    d.append(base + j)
    s.append(k - 1)
    d.append(k)  # bridge
    return np.array(s, dtype=np.int64), np.array(d, dtype=np.int64)


def dangling(n: int = 10):
    """Chain into a sink with out-degree 0 plus a self-loop elsewhere."""
    s, d = chain(n)
    return np.concatenate([s, [2]]), np.concatenate([d, [2]])


def ba_powerlaw(n: int = 2000, m: int = 4, seed: int = 42):
    """Seeded Barabási–Albert-style preferential attachment, directed
    new→existing (power-law in-degree tail)."""
    rng = np.random.default_rng(seed)
    targets = list(range(m))
    repeated: list[int] = list(range(m))
    src, dst = [], []
    for v in range(m, n):
        chosen = rng.choice(len(repeated), size=m, replace=False)
        picks = {repeated[c] for c in chosen}
        for t in picks:
            src.append(v)
            dst.append(t)
            repeated.append(t)
        repeated.extend([v] * len(picks))
    return np.array(src, dtype=np.int64), np.array(dst, dtype=np.int64)


NAMED = {
    "chain": chain,
    "cycle": cycle,
    "star": star,
    "two_cliques": two_cliques_bridge,
    "dangling": dangling,
}
