"""Edge-table finalization: exact dedup (D3), degrees (G7/S5), vertices.

Reference behaviors being matched (SURVEY.md §2.8 D3, §2.6 G7):
  * duplicate (src, dst) edges collapse to one — the reference's AddEdge
    overwrites duplicates (/root/reference/src/graph/graph.go:213-243) and
    all weights are forced to 1.0 (graph.go:357-362), so last-wins == dedup;
  * global out-degree per vertex — the reference precomputes it offline into
    Degree.<i> files (/root/reference/src/graph/graph.go:462-485); here it is
    a pre-combined grouped count.

Every groupby here is preceded by a per-batch partial combine inside
map_batches so the shuffle moves (key, partial) rows, not raw rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum


def _unique_pairs(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    if len(s) == 0:
        return s, d
    keep = np.empty(len(s), dtype=bool)
    keep[0] = True
    keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
    return s[keep], d[keep]


def _batch_dedup(batch: pa.Table) -> pa.Table:
    s, d = _unique_pairs(
        batch["src"].to_numpy(zero_copy_only=False),
        batch["dst"].to_numpy(zero_copy_only=False),
    )
    return pa.table({"src": pa.array(s, pa.int64()), "dst": pa.array(d, pa.int64())})


def dedup_edges(edges: Dataset) -> Dataset:
    """Exact global dedup of (src, dst): per-batch unique → grouped count → keys.

    The grouped count is the dedup (one output row per distinct key); the
    count column is dropped. Shuffle key: (src, dst) — naturally unskewed.
    """
    partial = edges.select_columns(["src", "dst"]).map_batches(
        _batch_dedup, batch_format="pyarrow"
    )
    from ray.data.aggregate import Count

    return (
        partial.groupby(["src", "dst"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["src", "dst"])
    )


def _partial_degree(batch: pa.Table, col: str) -> pa.Table:
    v = batch[col].to_numpy(zero_copy_only=False)
    uniq, cnt = np.unique(v, return_counts=True)
    return pa.table(
        {col: pa.array(uniq, pa.int64()), "_cnt": pa.array(cnt, pa.int64())}
    )


def out_degrees(edges: Dataset) -> Dataset:
    """(src, out_degree) — per-batch bincount partial, then grouped sum."""
    partial = edges.map_batches(
        lambda b: _partial_degree(b, "src"), batch_format="pyarrow"
    )
    return partial.groupby("src").aggregate(Sum("_cnt", alias_name="out_degree"))


def in_degrees(edges: Dataset) -> Dataset:
    partial = edges.map_batches(
        lambda b: _partial_degree(b, "dst"), batch_format="pyarrow"
    )
    return partial.groupby("dst").aggregate(Sum("_cnt", alias_name="in_degree"))


def _batch_vids(batch: pa.Table) -> pa.Table:
    s = batch["src"].to_numpy(zero_copy_only=False)
    d = batch["dst"].to_numpy(zero_copy_only=False)
    return pa.table({"vid": pa.array(np.unique(np.concatenate([s, d])), pa.int64())})


def vertex_ids(edges: Dataset) -> Dataset:
    """Distinct vids appearing as src or dst (the reference's implicit vertex
    set incl. the dead Isolateds path, /root/reference/src/graph/graph.go:443-457)."""
    from ray.data.aggregate import Count

    partial = edges.map_batches(_batch_vids, batch_format="pyarrow")
    return (
        partial.groupby("vid").aggregate(Count(alias_name="_n")).select_columns(["vid"])
    )


def symmetrize(edges: Dataset) -> Dataset:
    """union(E, reverse(E)) — the explicit symmetrization required for WCC
    (the reference relies on its offline preprocessing doubling undirected
    edges, /root/reference/src/generate_subgraph_json.py:44)."""
    rev = edges.map_batches(
        lambda b: pa.table({"src": b["dst"], "dst": b["src"]}),
        batch_format="pyarrow",
    )
    return edges.union(rev)
