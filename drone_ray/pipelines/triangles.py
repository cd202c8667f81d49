"""Triangle counting — non-iterative 2-round shuffle pipeline (SURVEY.md §2.12).

Not present in the reference (north-rule addition). Classic degree-oriented
wedge-join algorithm, expressed entirely in Ray Data:

  1. undirected simple graph: (u,v) = (min,max) distinct pairs, self-loops out
  2. degrees of the undirected graph (pre-combined grouped count)
  3. orient each edge low→high by (degree, vid) — bounds every vertex's
     out-neighborhood to O(sqrt(E)), the skew handling for power-law hubs
  4. wedges: per oriented-source group, all ordered neighbor pairs (x, y)
     with center a  (groupby(a).map_groups, numpy triu inside)
  5. triangles: hash-join wedges against oriented edges on (x, y)
  6. per-vertex counts: each matched wedge closes triangle {a, x, y}

Shuffle keys: degrees `vid`; orientation joins `u`/`v`; wedge grouping `a`;
closing join `(x, y)`. All joins are Ray Dataset hash joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum


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
        [
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False),
        ]
    )
    vid, cnt = np.unique(ids, return_counts=True)
    return pa.table({"vid": pa.array(vid, pa.int64()), "_c": pa.array(cnt, pa.int64())})


def _orient(b: pa.Table) -> pa.Table:
    u = b["u"].to_numpy(zero_copy_only=False)
    v = b["v"].to_numpy(zero_copy_only=False)
    du = b["du"].to_numpy(zero_copy_only=False)
    dv = b["dv"].to_numpy(zero_copy_only=False)
    u_first = (du < dv) | ((du == dv) & (u < v))
    a = np.where(u_first, u, v)
    bb = np.where(u_first, v, u)
    bd = np.where(u_first, dv, du)  # orientation key of the head vertex
    return pa.table(
        {
            "a": pa.array(a, pa.int64()),
            "b": pa.array(bb, pa.int64()),
            "bd": pa.array(bd, pa.int64()),
        }
    )


def _wedges(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(["bd", "b"])
    nb = g["b"].to_numpy()
    k = nb.size
    if k < 2:
        return pd.DataFrame({"x": [], "y": [], "center": []}, dtype=np.int64)
    i, j = np.triu_indices(k, k=1)
    return pd.DataFrame(
        {"x": nb[i], "y": nb[j], "center": np.full(i.size, g["a"].iloc[0], np.int64)}
    )


def _undirected_with_degrees(edges: Dataset, num_partitions: int):
    from ray.data.aggregate import Count

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
    j1 = j1.map_batches(
        lambda t: t.rename_columns(["u", "v", "du"]), batch_format="pyarrow"
    )
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


_WEDGE_SCHEMA = pa.schema([("x", pa.int64()), ("y", pa.int64()), ("center", pa.int64())])
_EDGE_MARKER = -1  # vids are non-negative (63-bit hashes / test ids)


def _close(group: pd.DataFrame) -> pd.DataFrame:
    if (group["center"] == _EDGE_MARKER).any():
        return group[group["center"] != _EDGE_MARKER]
    return group.iloc[0:0]


def _pin(schema: pa.Schema):
    def fix(b: pa.Table) -> pa.Table:
        return b.cast(schema) if b.num_columns else schema.empty_table()

    return fix


def triangles(edges: Dataset, num_partitions: int = 16) -> Dataset:
    """All closed wedges: rows (x, y, center) — one row per triangle, where
    (x, y) and (center→x), (center→y) are degree-oriented edges.

    The wedge↔edge closure is a union + groupby(["x","y"]) semi-join rather
    than a hash join: Ray's join operator rejects a fully-empty side (a
    triangle-free graph produces zero wedges), and the grouped form costs
    the same single shuffle on the same key."""
    withdeg = _undirected_with_degrees(edges, num_partitions)
    oriented = withdeg.map_batches(_orient, batch_format="pyarrow")
    wedges = (
        oriented.groupby("a")
        .map_groups(_wedges, batch_format="pandas")
        .map_batches(_pin(_WEDGE_SCHEMA), batch_format="pyarrow")
    )
    markers = oriented.map_batches(
        lambda b: pa.table(
            {
                "x": b["a"],
                "y": b["b"],
                "center": pa.array(
                    np.full(b.num_rows, _EDGE_MARKER, np.int64), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return (
        wedges.union(markers)
        .groupby(["x", "y"])
        .map_groups(_close, batch_format="pandas")
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
        return pa.table(
            {"vid": pa.array(vid, pa.int64()), "_c": pa.array(cnt, pa.int64())}
        )

    out_schema = pa.schema([("vid", pa.int64()), ("triangles", pa.int64())])
    return (
        tri.map_batches(melt, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("_c", alias_name="triangles"))
        .map_batches(_pin(out_schema), batch_format="pyarrow")
    )
