"""Triangle counting — non-iterative 2-round shuffle pipeline (SURVEY.md §2.12).

Not present in the reference (north-rule addition). Classic degree-oriented
wedge-join algorithm, expressed entirely in Ray Data:

  1. undirected simple graph: (u,v) = (min,max) distinct pairs, self-loops out
  2. degrees of the undirected graph (pre-combined grouped count)
  3. orient each edge low→high by (degree, vid) — bounds every vertex's
     out-neighborhood to O(sqrt(E)), the skew handling for power-law hubs
  4. wedges: per oriented source, ordered neighbor pairs (x, y) with center a
  5. closure: wedges semi-joined against oriented edges on (x, y)
  6. per-vertex counts: each matched wedge closes triangle {a, x, y}

Group-heavy steps are BUCKETED: instead of one map_groups call per vertex or
per (x,y) pair (Python overhead × millions of tiny groups), rows are grouped
by ``hash(key) % B`` and each bucket is processed with vectorized
numpy/pandas — the explicit partitioned hash-join pattern. Shuffle keys:
degrees `vid`; degree attach `u`/`v` (Dataset.join); wedges `hash(a)%B`;
closure `hash(x,y)%B`; counts `vid`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from drone_ray.hashing import mix64

_EDGE_MARKER = -1  # vids are non-negative (63-bit hashes / test ids)
_WEDGE_SCHEMA = pa.schema([("x", pa.int64()), ("y", pa.int64()), ("center", pa.int64())])


def _pin(schema: pa.Schema):
    def fix(b: pa.Table) -> pa.Table:
        return b.cast(schema) if b.num_columns else schema.empty_table()

    return fix


def _und_batch(b: pa.Table) -> pa.Table:
    s = b["src"].to_numpy(zero_copy_only=False)
    d = b["dst"].to_numpy(zero_copy_only=False)
    keep = s != d
    s, d = s[keep], d[keep]
    u = np.minimum(s, d)
    v = np.maximum(s, d)
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    if u.size:
        k = np.empty(u.size, dtype=bool)
        k[0] = True
        k[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        u, v = u[k], v[k]
    return pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})


def _degree_partial(b: pa.Table) -> pa.Table:
    ids = np.concatenate(
        [b["u"].to_numpy(zero_copy_only=False), b["v"].to_numpy(zero_copy_only=False)]
    )
    vid, cnt = np.unique(ids, return_counts=True)
    return pa.table({"vid": pa.array(vid, pa.int64()), "_c": pa.array(cnt, pa.int64())})


def _orient(b: pa.Table, num_buckets: int) -> pa.Table:
    u = b["u"].to_numpy(zero_copy_only=False)
    v = b["v"].to_numpy(zero_copy_only=False)
    du = b["du"].to_numpy(zero_copy_only=False)
    dv = b["dv"].to_numpy(zero_copy_only=False)
    u_first = (du < dv) | ((du == dv) & (u < v))
    a = np.where(u_first, u, v)
    bb = np.where(u_first, v, u)
    bd = np.where(u_first, dv, du)
    return pa.table(
        {
            "a": pa.array(a, pa.int64()),
            "b": pa.array(bb, pa.int64()),
            "bd": pa.array(bd, pa.int64()),
            "abucket": pa.array((mix64(a) % np.uint64(num_buckets)).astype(np.int64)),
        }
    )


def _pair_bucket(x: np.ndarray, y: np.ndarray, num_buckets: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = mix64(x) * np.uint64(0x9E3779B97F4A7C15) + mix64(y)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _wedges_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """All ordered out-neighbor pairs per center, vectorized per bucket."""
    g = g.sort_values(["a", "bd", "b"], kind="mergesort")
    a = g["a"].to_numpy()
    b = g["b"].to_numpy()
    if a.size < 2:
        return pd.DataFrame({"x": [], "y": [], "center": []}, dtype=np.int64)
    bounds = np.flatnonzero(np.concatenate(([True], a[1:] != a[:-1], [True])))
    xs, ys, cs = [], [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        k = e - s
        if k < 2:
            continue
        i, j = np.triu_indices(k, k=1)
        nb = b[s:e]
        xs.append(nb[i])
        ys.append(nb[j])
        cs.append(np.full(i.size, a[s], np.int64))
    if not xs:
        return pd.DataFrame({"x": [], "y": [], "center": []}, dtype=np.int64)
    return pd.DataFrame(
        {"x": np.concatenate(xs), "y": np.concatenate(ys), "center": np.concatenate(cs)}
    )


def _close_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized semi-join of a bucket's wedges against its edge markers."""
    is_edge = g["center"].to_numpy() == _EDGE_MARKER
    if not is_edge.any() or is_edge.all():
        return g.iloc[0:0][["x", "y", "center"]]
    edges = g.loc[is_edge, ["x", "y"]]
    wedges = g.loc[~is_edge, ["x", "y", "center"]]
    return wedges.merge(edges, on=["x", "y"])


def _undirected_with_degrees(edges: Dataset, num_partitions: int):
    # per-batch unique is only a partial dedup: (a,b) and (b,a) arriving in
    # different batches fold to the same (u,v) — finish with a grouped count
    und = (
        edges.map_batches(_und_batch, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["u", "v"])
    )
    deg = (
        und.map_batches(_degree_partial, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("_c", alias_name="deg"))
    )
    j1 = und.join(
        deg,
        join_type="inner",
        num_partitions=num_partitions,
        on=("u",),
        right_on=("vid",),
    ).select_columns(["u", "v", "deg"])
    j1 = j1.map_batches(lambda t: t.rename_columns(["u", "v", "du"]), batch_format="pyarrow")
    j2 = j1.join(
        deg,
        join_type="inner",
        num_partitions=num_partitions,
        on=("v",),
        right_on=("vid",),
    ).select_columns(["u", "v", "du", "deg"])
    return j2.map_batches(
        lambda t: t.rename_columns(["u", "v", "du", "dv"]), batch_format="pyarrow"
    )


def triangles(edges: Dataset, num_partitions: int = 16) -> Dataset:
    """All closed wedges: rows (x, y, center) — one row per triangle, where
    (x, y) and (center→x), (center→y) are degree-oriented edges."""
    num_buckets = max(16, num_partitions * 4)
    withdeg = _undirected_with_degrees(edges, num_partitions)
    oriented = withdeg.map_batches(
        lambda b: _orient(b, num_buckets), batch_format="pyarrow"
    )
    wedges = (
        oriented.groupby("abucket")
        .map_groups(_wedges_bucket, batch_format="pandas")
        .map_batches(_pin(_WEDGE_SCHEMA), batch_format="pyarrow")
    )

    def tag_pairs(b: pa.Table, center_col: str | None) -> pa.Table:
        x = b["x" if center_col else "a"].to_numpy(zero_copy_only=False)
        y = b["y" if center_col else "b"].to_numpy(zero_copy_only=False)
        center = (
            b["center"].to_numpy(zero_copy_only=False)
            if center_col
            else np.full(len(x), _EDGE_MARKER, np.int64)
        )
        return pa.table(
            {
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "center": pa.array(center, pa.int64()),
                "pbucket": pa.array(_pair_bucket(x, y, num_buckets)),
            }
        )

    wtagged = wedges.map_batches(lambda b: tag_pairs(b, "center"), batch_format="pyarrow")
    etagged = oriented.select_columns(["a", "b"]).map_batches(
        lambda b: tag_pairs(b, None), batch_format="pyarrow"
    )
    return (
        wtagged.union(etagged)
        .groupby("pbucket")
        .map_groups(_close_bucket, batch_format="pandas")
        .map_batches(_pin(_WEDGE_SCHEMA), batch_format="pyarrow")
    )


def triangle_count(edges: Dataset, num_partitions: int = 16) -> int:
    return triangles(edges, num_partitions).count()


def triangles_per_vertex(edges: Dataset, num_partitions: int = 16) -> Dataset:
    """(vid, triangles) — every triangle credits its three corners."""
    tri = triangles(edges, num_partitions)

    def melt(b: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                b["x"].to_numpy(zero_copy_only=False),
                b["y"].to_numpy(zero_copy_only=False),
                b["center"].to_numpy(zero_copy_only=False),
            ]
        )
        vid, cnt = np.unique(ids, return_counts=True)
        return pa.table({"vid": pa.array(vid, pa.int64()), "_c": pa.array(cnt, pa.int64())})

    out_schema = pa.schema([("vid", pa.int64()), ("triangles", pa.int64())])
    return (
        tri.map_batches(melt, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("_c", alias_name="triangles"))
        .map_batches(_pin(out_schema), batch_format="pyarrow")
    )
