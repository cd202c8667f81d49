"""Pointer-jumping connected components over the edge Dataset (round 3).

Min-label propagation (graph/programs.ConnectedComponents) needs
O(diameter) supersteps — a chain of length n costs ~n boundary exchanges.
This module implements the alternating LARGE-STAR / SMALL-STAR contraction
(public algorithm: Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14), which converges in O(log n) rounds regardless of
diameter. Each round is ONE bucketed shuffle of the current edge set with a
fully vectorized per-bucket body — the Ray-Data-native shape for an
iterative edge-list algorithm (no actors, no per-key Python).

    large-star(u): m = min(N(u) ∪ {u});  emit (v, m) for v ∈ N(u), v > u
    small-star(u): m = min(N(u) ∪ {u});  emit (v, m) for v ∈ N(u), v < u,
                                         plus (u, m)

Alternating the two to a fixpoint leaves every component as a star rooted
at its minimum vertex; labels read straight off the final edges. Both
operations preserve connectivity and only ever link a vertex to a smaller
one, so the fixpoint labels equal the component minima — the same output
contract as the superstep WCC and the recursive-CTE oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from drone_ray.pipelines._util import pin_schema as _pin

from ray.data import Dataset

from drone_ray.hashing import adaptive_buckets, mix64

_NUM_BUCKETS = 64  # floor — actual count grows with est_rows (adaptive_buckets)


_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])
_ORIENT_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64()), ("_b", pa.int64())])
_EMIT_SCHEMA = pa.schema([("vid", pa.int64()), ("lbl", pa.int64()), ("_b", pa.int64())])


def _star_round(edges: Dataset, large: bool, num_buckets: int) -> Dataset:
    """One large- or small-star round: orient, bucket by hash(u), contract."""

    def orient(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "u" not in b.schema.names:
            return _ORIENT_SCHEMA.empty_table()
        a = b["u"].to_numpy(zero_copy_only=False)
        c = b["v"].to_numpy(zero_copy_only=False)
        u = np.concatenate([a, c])
        v = np.concatenate([c, a])
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "_b": pa.array((mix64(u) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def contract(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "u" not in g.columns:
            return pd.DataFrame({"u": [], "v": []})
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        new = np.empty(u.size, dtype=bool)
        new[0] = True
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        # m = min(N(u) ∪ {u}): neighbor lists are sorted within each group
        m_grp = np.minimum(v[starts], u[starts])
        m = np.repeat(m_grp, np.diff(np.append(starts, u.size)))
        if large:
            keep = v > u
            out_u, out_v = v[keep], m[keep]
        else:
            keep = v < u
            out_u = np.concatenate([v[keep], u[starts]])
            out_v = np.concatenate([m[keep], m_grp])
        drop = out_u != out_v  # self-edges carry no information
        df = pd.DataFrame({"u": out_u[drop], "v": out_v[drop]})
        return df.drop_duplicates()

    return (
        edges.map_batches(orient, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(contract, batch_format="pandas")
        .map_batches(_pin(_EDGE_SCHEMA), batch_format="pyarrow", batch_size=None)
    )


def _checksum(edges: Dataset) -> tuple[int, int]:
    """(row_count, order-independent content hash) of the edge set. The
    per-row hashing reduces inside map_batches; the driver sees one partial
    row per block, never the edges."""

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "u" not in b.schema.names:
            return pa.table({"n": pa.array([0], pa.int64()), "h": pa.array([0], pa.uint64())})
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = mix64(u * np.uint64(0x9E3779B97F4A7C15) ^ v)
            acc = int(np.bitwise_xor.reduce(h)) if h.size else 0
        return pa.table(
            {"n": pa.array([len(u)], pa.int64()), "h": pa.array([acc], pa.uint64())}
        )

    n = 0
    acc = 0
    for row in edges.map_batches(partial, batch_format="pyarrow", batch_size=None).take_all():
        n += int(row["n"])
        acc ^= int(row["h"])
    return n, acc


_LABEL_SCHEMA = pa.schema([("vid", pa.int64()), ("component", pa.int64())])


def _assemble_labels(star_edges: Dataset, num_buckets: int) -> Dataset:
    """Distributed label assembly from the star fixpoint: every edge is
    (child → root), so children read their label off the edge and roots are
    exactly the label values that never appear as a child. Both facts are
    local to a hash(vid) bucket — emit (vid=u, lbl=v) and (vid=v, lbl=v)
    per edge, bucket by vid, and take the per-vid min label (at a true
    fixpoint each vid carries exactly one distinct label; min also keeps
    the output well-defined on a max_rounds bailout). The driver never
    sees the vertex set."""

    def emit(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "u" not in b.schema.names:
            return _EMIT_SCHEMA.empty_table()
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        vid = np.concatenate([u, v])
        lbl = np.concatenate([v, v])
        return pa.table(
            {
                "vid": pa.array(vid, pa.int64()),
                "lbl": pa.array(lbl, pa.int64()),
                "_b": pa.array((mix64(vid) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def labels_of(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "vid" not in g.columns:
            return pd.DataFrame({"vid": [], "component": []})
        vid = g["vid"].to_numpy()
        lbl = g["lbl"].to_numpy()
        order = np.lexsort((lbl, vid))
        vid, lbl = vid[order], lbl[order]
        first = np.ones(vid.size, dtype=bool)
        first[1:] = vid[1:] != vid[:-1]
        return pd.DataFrame({"vid": vid[first], "component": lbl[first]})

    return (
        star_edges.map_batches(emit, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(labels_of, batch_format="pandas")
        .map_batches(_pin(_LABEL_SCHEMA), batch_format="pyarrow", batch_size=None)
    )


def connected_components_star(
    edges: Dataset,
    num_buckets: int | None = None,
    max_rounds: int = 64,
    est_rows: int | None = None,
) -> tuple[Dataset, int]:
    """(vid, component) label Dataset + rounds used. O(log n) shuffle
    rounds — the long-diameter alternative to the O(diameter)-superstep
    engine WCC.

    Each round materializes the contracted edge set (size ≤ the input edge
    count and shrinking) so the iterative lineage never re-executes; the
    driver only ever sees the per-round count/checksum — labels are
    assembled by one more bucketed pass (_assemble_labels), never
    concatenated driver-side."""
    if num_buckets is None:
        # oriented rounds double the rows; contraction only shrinks them
        num_buckets = adaptive_buckets(
            est_rows * 2 if est_rows else None, floor=_NUM_BUCKETS
        )

    def init(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "src" not in b.schema.names:
            return _EDGE_SCHEMA.empty_table()
        return pa.table(
            {
                "u": b["src"].cast(pa.int64()),
                "v": b["dst"].cast(pa.int64()),
            }
        )

    cur = edges.map_batches(init, batch_format="pyarrow", batch_size=None).materialize()
    prev_sig = None
    rounds = 0
    for _ in range(max_rounds):
        cur = _star_round(cur, large=True, num_buckets=num_buckets).materialize()
        cur = _star_round(cur, large=False, num_buckets=num_buckets).materialize()
        rounds += 1
        sig = _checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig

    # fixpoint: every edge is (child, root) — assemble labels distributed
    return _assemble_labels(cur, num_buckets), rounds
