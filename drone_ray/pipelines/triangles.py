"""Triangle counting — non-iterative bucketed-shuffle pipeline (SURVEY.md §2.12).

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
numpy/pandas — the explicit partitioned hash-join pattern. Exactly four
all-to-all exchanges, all sort-based groupbys: center rows by ``hash(vid)``
(dedup + degree count for free — every copy of (vid, nbr) lands in vid's
bucket), pair rows by ``hash(u,v)`` (orientation), oriented adjacency by
``hash(center)`` (wedges), wedge∪edge rows by ``hash(x,y)`` (closure).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from drone_ray.hashing import mix64

_EDGE_MARKER = -1  # vids are non-negative (63-bit hashes / test ids)
_WEDGE_SCHEMA = pa.schema([("x", pa.int64()), ("y", pa.int64()), ("center", pa.int64())])


def _pin(schema: pa.Schema):
    def fix(b: pa.Table) -> pa.Table:
        return b.cast(schema) if b.num_columns else schema.empty_table()

    return fix


def _center_rows(b: pa.Table, num_buckets: int) -> pa.Table:
    """Each directed edge → two center rows (vid, nbr), self-loops dropped,
    in-batch pre-dedup, bucketed by hash(vid). Global dedup needs no extra
    shuffle: every copy of (vid, nbr) lands in vid's bucket."""
    s = b["src"].to_numpy(zero_copy_only=False)
    d = b["dst"].to_numpy(zero_copy_only=False)
    keep = s != d
    s, d = s[keep], d[keep]
    vid = np.concatenate([s, d])
    nbr = np.concatenate([d, s])
    order = np.lexsort((nbr, vid))
    vid, nbr = vid[order], nbr[order]
    if vid.size:
        k = np.empty(vid.size, dtype=bool)
        k[0] = True
        k[1:] = (vid[1:] != vid[:-1]) | (nbr[1:] != nbr[:-1])
        vid, nbr = vid[k], nbr[k]
    return pa.table(
        {
            "vid": pa.array(vid, pa.int64()),
            "nbr": pa.array(nbr, pa.int64()),
            "vbucket": pa.array((mix64(vid) % np.uint64(num_buckets)).astype(np.int64)),
        }
    )


def _attach_deg(g: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    """Per vid-bucket: finish the (vid, nbr) dedup, compute degree = neighbor
    count per vid (vectorized), re-key by the undirected pair for the
    orientation pairing stage."""
    vid = g["vid"].to_numpy()
    nbr = g["nbr"].to_numpy()
    order = np.lexsort((nbr, vid))
    vid, nbr = vid[order], nbr[order]
    if vid.size:
        k = np.empty(vid.size, dtype=bool)
        k[0] = True
        k[1:] = (vid[1:] != vid[:-1]) | (nbr[1:] != nbr[:-1])
        vid, nbr = vid[k], nbr[k]
    uniq, inv, cnt = np.unique(vid, return_inverse=True, return_counts=True)
    dvid = cnt[inv]
    km = np.minimum(vid, nbr)
    kM = np.maximum(vid, nbr)
    return pd.DataFrame(
        {
            "vid": vid,
            "nbr": nbr,
            "dvid": dvid.astype(np.int64),
            "pbucket": _pair_bucket(km, kM, num_buckets),
        }
    )


def _pair_orient(g: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    """Per pair-bucket: the two center rows of each edge meet here; pair them
    and orient low→high by (degree, vid)."""
    vid = g["vid"].to_numpy()
    nbr = g["nbr"].to_numpy()
    dvid = g["dvid"].to_numpy()
    km = np.minimum(vid, nbr)
    kM = np.maximum(vid, nbr)
    order = np.lexsort((vid, kM, km))
    vid, dvid = vid[order], dvid[order]
    km, kM = km[order], kM[order]
    # rows come in pairs: (vid=km, deg=du) then (vid=kM, deg=dv)
    u, v = km[::2], kM[::2]
    du, dv = dvid[::2], dvid[1::2]
    u_first = (du < dv) | ((du == dv) & (u < v))
    a = np.where(u_first, u, v)
    bb = np.where(u_first, v, u)
    bd = np.where(u_first, dv, du)
    return pd.DataFrame(
        {
            "a": a,
            "b": bb,
            "bd": bd.astype(np.int64),
            "abucket": (mix64(a) % np.uint64(num_buckets)).astype(np.int64),
        }
    )


def _pair_bucket(x: np.ndarray, y: np.ndarray, num_buckets: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = mix64(x) * np.uint64(0x9E3779B97F4A7C15) + mix64(y)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _wedges_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """All ordered out-neighbor pairs per center — one vectorized pass over
    the whole bucket (repeat/cumsum pair expansion; no per-center Python).
    Neighbors are sorted by (degree, vid) rank within each center, so a
    wedge's (x, y) is emitted in orientation order and the closing edge is
    exactly the oriented pair (x→y)."""
    g = g.sort_values(["a", "bd", "b"], kind="mergesort")
    a = g["a"].to_numpy()
    b = g["b"].to_numpy()
    n = a.size
    if n < 2:
        return pd.DataFrame({"x": [], "y": [], "center": []}, dtype=np.int64)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = a[1:] != a[:-1]
    grp_start = np.flatnonzero(new)
    k = np.diff(np.append(grp_start, n))  # center group sizes
    # row at in-group position p pairs (as x) with the k-1-p rows after it
    pos = np.arange(n) - np.repeat(grp_start, k)
    lens = np.repeat(k, k) - 1 - pos
    total = int(lens.sum())
    if total == 0:
        return pd.DataFrame({"x": [], "y": [], "center": []}, dtype=np.int64)
    x_idx = np.repeat(np.arange(n), lens)
    ctr = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    y_idx = x_idx + 1 + ctr
    return pd.DataFrame(
        {
            "x": b[x_idx].astype(np.int64, copy=False),
            "y": b[y_idx].astype(np.int64, copy=False),
            "center": a[x_idx].astype(np.int64, copy=False),
        }
    )


def _close_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized semi-join of a bucket's wedges against its edge markers."""
    is_edge = g["center"].to_numpy() == _EDGE_MARKER
    if not is_edge.any() or is_edge.all():
        return g.iloc[0:0][["x", "y", "center"]]
    edges = g.loc[is_edge, ["x", "y"]]
    wedges = g.loc[~is_edge, ["x", "y", "center"]]
    return wedges.merge(edges, on=["x", "y"])


def triangles(edges: Dataset, num_partitions: int = 16) -> Dataset:
    """All closed wedges: rows (x, y, center) — one row per triangle, where
    (x, y) and (center→x), (center→y) are degree-oriented edges.

    Every exchange is a sort-based bucketed groupby with a vectorized pandas
    body — no JoinOperator (its per-invocation aggregator actor pools
    dominate wall time at small/medium scale):

      dedup (u,v) → both-direction center rows by hash(vid) → per-bucket
      degree counts → re-key by pair hash → pair+orient → wedges by
      hash(center) → closure by pair hash.
    """
    num_buckets = max(16, num_partitions * 4)
    both = edges.map_batches(
        lambda b: _center_rows(b, num_buckets), batch_format="pyarrow"
    )
    withdeg = both.groupby("vbucket").map_groups(
        lambda g: _attach_deg(g, num_buckets), batch_format="pandas"
    )
    ori_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("bd", pa.int64()), ("abucket", pa.int64())]
    )
    # `oriented` fans out into BOTH the wedge stage and the closure's edge
    # side; Ray Data re-executes a lazy plan per consumer, which would run
    # the dedup/degree/orientation shuffles twice. It is one row per
    # undirected edge (≤ input size), so pinning it in the object store is
    # the cheap side of that trade — and it may spill, which is fine.
    oriented = (
        withdeg.groupby("pbucket")
        .map_groups(lambda g: _pair_orient(g, num_buckets), batch_format="pandas")
        .map_batches(_pin(ori_schema), batch_format="pyarrow", batch_size=None)
    ).materialize()
    wedges = (
        oriented.groupby("abucket")
        .map_groups(_wedges_bucket, batch_format="pandas")
        .map_batches(_pin(_WEDGE_SCHEMA), batch_format="pyarrow", batch_size=None)
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

    wtagged = wedges.map_batches(lambda b: tag_pairs(b, "center"), batch_format="pyarrow", batch_size=None)
    etagged = oriented.select_columns(["a", "b"]).map_batches(
        lambda b: tag_pairs(b, None), batch_format="pyarrow"
    )
    return (
        wtagged.union(etagged)
        .groupby("pbucket")
        .map_groups(_close_bucket, batch_format="pandas")
        .map_batches(_pin(_WEDGE_SCHEMA), batch_format="pyarrow", batch_size=None)
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
        tri.map_batches(melt, batch_format="pyarrow", batch_size=None)
        .groupby("vid")
        .aggregate(Sum("_c", alias_name="triangles"))
        .map_batches(_pin(out_schema), batch_format="pyarrow", batch_size=None)
    )


def edge_support(edges: Dataset, num_partitions: int = 16) -> Dataset:
    """(u, v, support) — triangles through each undirected edge (u < v).
    One melt pass over the triangle rows (each triangle credits its three
    edges) + a grouped sum; edges in no triangle emit no row."""
    tri = triangles(edges, num_partitions)

    def melt(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        c = b["center"].to_numpy(zero_copy_only=False)
        # orientation is degree-ordered; normalize each edge to vid order
        e1u, e1v = np.minimum(x, y), np.maximum(x, y)
        e2u, e2v = np.minimum(c, x), np.maximum(c, x)
        e3u, e3v = np.minimum(c, y), np.maximum(c, y)
        u = np.concatenate([e1u, e2u, e3u])
        v = np.concatenate([e1v, e2v, e3v])
        key = np.stack([u, v], axis=1)
        uk, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "u": pa.array(uk[:, 0], pa.int64()),
                "v": pa.array(uk[:, 1], pa.int64()),
                "_c": pa.array(cnt, pa.int64()),
            }
        )

    out_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()), ("support", pa.int64())])
    return (
        tri.map_batches(melt, batch_format="pyarrow", batch_size=None)
        .groupby(["u", "v"])
        .aggregate(Sum("_c", alias_name="support"))
        .map_batches(_pin(out_schema), batch_format="pyarrow", batch_size=None)
    )


def ktruss(edges: Dataset, k: int, num_partitions: int = 16, max_rounds: int = 200) -> Dataset:
    """k-truss: the maximal subgraph in which every edge lies on ≥ k-2
    triangles (Cohen, "Trusses: cohesive subgraphs for social network
    analysis", 2008; iterated as his MapReduce formulation — count support,
    drop light edges, repeat to fixpoint — "Graph twiddling in a MapReduce
    world", Computing in Science & Engineering 2009).

    A greatest fixpoint via a removal cascade (like graph simulation), so
    not recursive-CTE-expressible — conformance is the brute-force pytest
    oracle. Triangles are enumerated ONCE (4 bucketed exchanges); the peel
    then iterates over the (edge, triangle) INCIDENCE table only — three
    rows per triangle, one chained execution per round:

      bucket by (u, v): drop rows of edges with support < k-2
      bucket by triangle key: keep only triangles with all 3 rows alive

    Edges outside any triangle never enter the incidence and are dead by
    construction. Rounds are bounded by the peel depth (a handful on web
    graphs); the driver holds one row count per round. At 10^12-doc scale
    the incidence is O(#triangles) rows streamed through hash-bucket
    shuffles with spill — the storage/recompute trade every distributed
    truss algorithm makes.

    Returns undirected edges (u, v), u < v — every edge of the k-truss."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    import ray.data as rd

    num_buckets = max(16, num_partitions * 4)
    sup_min = k - 2
    empty_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    tri = triangles(edges, num_partitions)

    inc_schema = pa.schema(
        [
            ("u", pa.int64()),
            ("v", pa.int64()),
            ("tx", pa.int64()),
            ("ty", pa.int64()),
            ("tc", pa.int64()),
        ]
    )

    def melt_inc(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        c = b["center"].to_numpy(zero_copy_only=False)
        u = np.concatenate([np.minimum(x, y), np.minimum(c, x), np.minimum(c, y)])
        v = np.concatenate([np.maximum(x, y), np.maximum(c, x), np.maximum(c, y)])
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "tx": pa.array(np.tile(x, 3), pa.int64()),
                "ty": pa.array(np.tile(y, 3), pa.int64()),
                "tc": pa.array(np.tile(c, 3), pa.int64()),
            }
        )

    def _ebucket(b: pa.Table) -> pa.Table:
        if not b.num_columns or len(b) == 0:
            return inc_schema.empty_table().append_column("_b", pa.array([], pa.int64()))
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        return b.append_column("_b", pa.array(_pair_bucket(u, v, num_buckets)))

    def _tbucket(b: pa.Table) -> pa.Table:
        if not b.num_columns or len(b) == 0:
            return inc_schema.empty_table().append_column("_b", pa.array([], pa.int64()))
        x = b["tx"].to_numpy(zero_copy_only=False)
        y = b["ty"].to_numpy(zero_copy_only=False)
        c = b["tc"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = mix64(x) * np.uint64(0x9E3779B97F4A7C15) + mix64(y) + mix64(c)
        return b.append_column(
            "_b", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def drop_light(g: pd.DataFrame) -> pd.DataFrame:
        sup = g.groupby(["u", "v"], sort=False)["tx"].transform("size")
        return g.loc[sup.to_numpy() >= sup_min, ["u", "v", "tx", "ty", "tc"]]

    def keep_full(g: pd.DataFrame) -> pd.DataFrame:
        sz = g.groupby(["tx", "ty", "tc"], sort=False)["u"].transform("size")
        return g.loc[sz.to_numpy() == 3, ["u", "v", "tx", "ty", "tc"]]

    inc = tri.map_batches(melt_inc, batch_format="pyarrow", batch_size=None).materialize()
    n = inc.count()
    converged = n == 0
    for _ in range(max_rounds):
        if n == 0:
            return rd.from_arrow(empty_schema.empty_table())
        nxt = (
            inc.map_batches(_ebucket, batch_format="pyarrow", batch_size=None)
            .groupby("_b")
            .map_groups(drop_light, batch_format="pandas")
            .map_batches(_tbucket, batch_format="pyarrow", batch_size=None)
            .groupby("_b")
            .map_groups(keep_full, batch_format="pandas")
            .map_batches(_pin(inc_schema), batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        m = nxt.count()
        if m == n:
            converged = True
            break
        inc, n = nxt, m
    if not converged:
        # the contract is the exact greatest fixpoint — a silent partial
        # peel would disagree with it (deep cascades: raise the budget)
        raise RuntimeError(
            f"ktruss peel did not reach fixpoint within max_rounds={max_rounds}"
        )
    if n == 0:
        return rd.from_arrow(empty_schema.empty_table())

    # fixpoint: every edge still in the incidence has support >= k-2
    def edge_rows(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["u", "v"]].drop_duplicates()
        return pd.DataFrame({"src": d["u"], "dst": d["v"]})

    return (
        inc.map_batches(_ebucket, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(edge_rows, batch_format="pandas")
        .map_batches(_pin(empty_schema), batch_format="pyarrow", batch_size=None)
    )
