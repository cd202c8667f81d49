"""Edge-table finalization: exact dedup (D3), degrees (G7/S5), vertices.

Reference behaviors being matched (SURVEY.md §2.8 D3, §2.6 G7):
  * duplicate (src, dst) edges collapse to one — the reference's AddEdge
    overwrites duplicates (/root/reference/src/graph/graph.go:213-243) and
    all weights are forced to 1.0 (graph.go:357-362), so last-wins == dedup;
  * global out-degree per vertex — the reference precomputes it offline into
    Degree.<i> files (/root/reference/src/graph/graph.go:462-485); here it is
    a pre-combined grouped count.

Implementation note: every aggregation here is per-batch partial combine →
ONE shuffle on a ``hash(key) % B`` bucket column → a vectorized numpy body
per bucket. Ray's built-in ``groupby(key).aggregate(...)`` iterates groups
in Python during the reduce, which collapses at millions of distinct keys;
the bucket pattern keeps the reduce vectorized regardless of key count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pandas as pd

from ray.data import Dataset

from drone_ray.hashing import adaptive_buckets, mix64

# floor for the bucket count: small inputs still fan out across the cluster.
# Actual counts grow with the input via hashing.adaptive_buckets — a fixed B
# means each map_groups bucket holds rows/B of the keyspace in ONE task, so
# per-task memory would grow linearly with data at a constant B.
_NUM_BUCKETS = 64


def _buckets(num_buckets: int | None, est_rows: int | None) -> int:
    return (
        num_buckets
        if num_buckets is not None
        else adaptive_buckets(est_rows, floor=_NUM_BUCKETS)
    )


def _unique_pairs(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    if len(s) == 0:
        return s, d
    keep = np.empty(len(s), dtype=bool)
    keep[0] = True
    keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
    return s[keep], d[keep]


def _pin(schema: pa.Schema):
    def fix(b: pa.Table) -> pa.Table:
        return b.cast(schema) if b.num_columns else schema.empty_table()

    return fix


def dedup_edges(
    edges: Dataset,
    num_buckets: int | None = None,
    est_rows: int | None = None,
) -> Dataset:
    """Exact global dedup of (src, dst): per-batch unique → bucket shuffle →
    per-bucket vectorized unique. Shuffle key: hash(src, dst) % B. B derives
    from ``est_rows`` (adaptive_buckets) unless pinned via ``num_buckets``."""
    num_buckets = _buckets(num_buckets, est_rows)

    def partial(b: pa.Table) -> pa.Table:
        s, d = _unique_pairs(
            b["src"].to_numpy(zero_copy_only=False),
            b["dst"].to_numpy(zero_copy_only=False),
        )
        with np.errstate(over="ignore"):
            bucket = (mix64(s) * np.uint64(0x9E3779B97F4A7C15) + mix64(d)) % np.uint64(
                num_buckets
            )
        return pa.table(
            {
                "src": pa.array(s, pa.int64()),
                "dst": pa.array(d, pa.int64()),
                "_b": pa.array(bucket.astype(np.int64)),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        s, d = _unique_pairs(g["src"].to_numpy(), g["dst"].to_numpy())
        return pd.DataFrame({"src": s, "dst": d})

    schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    return (
        edges.select_columns(["src", "dst"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(_pin(schema), batch_format="pyarrow", batch_size=None)
    )


def _degrees(edges: Dataset, col: str, out_name: str, num_buckets: int) -> Dataset:
    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {
                col: pa.array(uniq, pa.int64()),
                "_c": pa.array(cnt, pa.int64()),
                "_b": pa.array((mix64(uniq) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        v = g[col].to_numpy()
        c = g["_c"].to_numpy()
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        ng = np.empty(v.size, dtype=bool)
        if v.size:
            ng[0] = True
            ng[1:] = v[1:] != v[:-1]
            starts = np.flatnonzero(ng)
            sums = np.add.reduceat(c, starts)
            return pd.DataFrame({col: v[starts], out_name: sums})
        return pd.DataFrame({col: v, out_name: c})

    schema = pa.schema([(col, pa.int64()), (out_name, pa.int64())])
    return (
        edges.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(_pin(schema), batch_format="pyarrow", batch_size=None)
    )


def out_degrees(
    edges: Dataset,
    num_buckets: int | None = None,
    est_rows: int | None = None,
) -> Dataset:
    """(src, out_degree) — per-batch bincount partial, bucketed final sum."""
    return _degrees(
        edges.select_columns(["src"]), "src", "out_degree",
        _buckets(num_buckets, est_rows),
    )


def in_degrees(
    edges: Dataset,
    num_buckets: int | None = None,
    est_rows: int | None = None,
) -> Dataset:
    return _degrees(
        edges.select_columns(["dst"]), "dst", "in_degree",
        _buckets(num_buckets, est_rows),
    )


def _raw_count_cut(min_total: int | None, max_blocks: int) -> int:
    """Per-block survival cut for raw_endpoint_counts' pigeonhole filter."""
    return max(1, -(-int(min_total) // max_blocks)) if min_total else 1


def raw_count_slack(min_total: int | None, max_blocks: int = 65536) -> int:
    """Worst-case global undercount of a filtered raw_endpoint_counts sum:
    a vid can lose up to cut-1 rows in each of ≤ max_blocks blocks. Callers
    thresholding on the filtered sums must test against
    ``threshold - raw_count_slack(...)`` to keep the candidate set a
    superset. Zero when no filter is applied (cut == 1) — the filtered and
    unfiltered paths then behave identically."""
    return max_blocks * (_raw_count_cut(min_total, max_blocks) - 1)


def raw_endpoint_counts(
    edges: Dataset,
    num_buckets: int | None = None,
    est_rows: int | None = None,
    min_total: int | None = None,
    max_blocks: int = 65536,
) -> Dataset:
    """(vid, n_src, n_dst) — per-vertex RAW row counts (duplicates counted).
    One cheap partial-count shuffle; used as an upper bound for hub-candidate
    detection (raw ≥ deduped degree always).

    ``min_total``: when the caller only needs vids whose GLOBAL raw count can
    exceed this threshold (hub detection), each block drops vids below
    ceil(min_total / max_blocks) local rows — by pigeonhole a vid with total
    > min_total must exceed that in at least one of ≤ max_blocks blocks, so
    the surviving vid set is a strict superset of the true candidates while
    the shuffle shrinks from O(blocks·distinct) rows to the power-law tail
    (measured: the unfiltered pass was the dominant cost of a 1.2e9-edge
    build). Counts for surviving vids remain exact LOWER bounds ≥ their
    single-block maxima; with the default threshold split (min_total = T)
    a reported count can undercount by < T total, which the candidate test
    (count > T) absorbs because every true hub still reports > T - T = 0
    from its heavy blocks alone — callers MUST treat the result as a
    candidate filter, not exact degrees (build_graph re-derives exact
    deduped degrees on the candidate-touching rows)."""
    num_buckets = _buckets(num_buckets, est_rows)
    cut = _raw_count_cut(min_total, max_blocks)

    def partial(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        vids = np.unique(np.concatenate([s, d]))
        ns = np.bincount(np.searchsorted(vids, s), minlength=vids.size)
        nd = np.bincount(np.searchsorted(vids, d), minlength=vids.size)
        if cut > 1:
            keep = (ns + nd) >= cut
            vids, ns, nd = vids[keep], ns[keep], nd[keep]
        return pa.table(
            {
                "vid": pa.array(vids, pa.int64()),
                "n_src": pa.array(ns.astype(np.int64)),
                "n_dst": pa.array(nd.astype(np.int64)),
                "_b": pa.array((mix64(vids) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        vid = g["vid"].to_numpy()
        uniq, inv = np.unique(vid, return_inverse=True)
        return pd.DataFrame(
            {
                "vid": uniq,
                "n_src": np.bincount(inv, weights=g["n_src"].to_numpy(), minlength=uniq.size).astype(np.int64),
                "n_dst": np.bincount(inv, weights=g["n_dst"].to_numpy(), minlength=uniq.size).astype(np.int64),
            }
        )

    schema = pa.schema([("vid", pa.int64()), ("n_src", pa.int64()), ("n_dst", pa.int64())])
    return (
        edges.select_columns(["src", "dst"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(_pin(schema), batch_format="pyarrow", batch_size=None)
    )


def dual_degrees(
    edges: Dataset,
    num_buckets: int | None = None,
    est_rows: int | None = None,
) -> Dataset:
    """(vid, deg_fwd, deg_rev, deg_both) of the deduped edge table in one
    pipeline: deg_fwd = distinct out-neighbors, deg_rev = distinct
    in-neighbors, deg_both = distinct symmetrized neighbors (≠ fwd+rev when
    reciprocal pairs exist). Used by the dual graph layout's hub detection.

    Two bucketed exchanges: rows doubled with a dir tag and deduped per
    (u, v, dir) inside hash(u, v) buckets — every copy of a pair lands in
    one bucket, so per-u partial counts are exact there — then partials sum
    in hash(u) buckets."""
    num_buckets = _buckets(num_buckets, est_rows)

    def partial(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        u = np.concatenate([s, d])
        v = np.concatenate([d, s])
        dirc = np.concatenate([np.zeros(s.size, np.int8), np.ones(s.size, np.int8)])
        order = np.lexsort((dirc, v, u))
        u, v, dirc = u[order], v[order], dirc[order]
        if u.size:
            k = np.empty(u.size, dtype=bool)
            k[0] = True
            k[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1]) | (dirc[1:] != dirc[:-1])
            u, v, dirc = u[k], v[k], dirc[k]
        with np.errstate(over="ignore"):
            bucket = (mix64(u) * np.uint64(0x9E3779B97F4A7C15) + mix64(v)) % np.uint64(
                num_buckets
            )
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "dir": pa.array(dirc, pa.int8()),
                "_b": pa.array(bucket.astype(np.int64)),
            }
        )

    def pair_finish(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        dirc = g["dir"].to_numpy()
        order = np.lexsort((dirc, v, u))
        u, v, dirc = u[order], v[order], dirc[order]
        k = np.empty(u.size, dtype=bool)
        k[0] = True
        k[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1]) | (dirc[1:] != dirc[:-1])
        u, v, dirc = u[k], v[k], dirc[k]
        uniq, inv = np.unique(u, return_inverse=True)
        nf = np.bincount(inv, weights=(dirc == 0), minlength=uniq.size).astype(np.int64)
        nr = np.bincount(inv, weights=(dirc == 1), minlength=uniq.size).astype(np.int64)
        # distinct (u, v) ignoring dir
        kp = np.empty(u.size, dtype=bool)
        kp[0] = True
        kp[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        nb = np.bincount(inv[kp], minlength=uniq.size).astype(np.int64)
        return pd.DataFrame(
            {
                "vid": uniq,
                "deg_fwd": nf,
                "deg_rev": nr,
                "deg_both": nb,
                "_b2": (mix64(uniq) % np.uint64(num_buckets)).astype(np.int64),
            }
        )

    def vid_finish(g: pd.DataFrame) -> pd.DataFrame:
        vid = g["vid"].to_numpy()
        uniq, inv = np.unique(vid, return_inverse=True)
        out = {"vid": uniq}
        for c in ("deg_fwd", "deg_rev", "deg_both"):
            out[c] = np.bincount(inv, weights=g[c].to_numpy(), minlength=uniq.size).astype(
                np.int64
            )
        return pd.DataFrame(out)

    schema = pa.schema(
        [
            ("vid", pa.int64()),
            ("deg_fwd", pa.int64()),
            ("deg_rev", pa.int64()),
            ("deg_both", pa.int64()),
        ]
    )
    return (
        edges.select_columns(["src", "dst"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(pair_finish, batch_format="pandas")
        .groupby("_b2")
        .map_groups(vid_finish, batch_format="pandas")
        .map_batches(_pin(schema), batch_format="pyarrow", batch_size=None)
    )


def vertex_ids(
    edges: Dataset,
    num_buckets: int | None = None,
    est_rows: int | None = None,
) -> Dataset:
    """Distinct vids appearing as src or dst (the reference's implicit vertex
    set incl. the dead Isolateds path, /root/reference/src/graph/graph.go:443-457)."""
    num_buckets = _buckets(num_buckets, est_rows)

    def partial(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        vids = np.unique(np.concatenate([s, d]))
        return pa.table(
            {
                "vid": pa.array(vids, pa.int64()),
                "_b": pa.array((mix64(vids) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"vid": np.unique(g["vid"].to_numpy())})

    schema = pa.schema([("vid", pa.int64())])
    return (
        edges.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(_pin(schema), batch_format="pyarrow", batch_size=None)
    )


def symmetrize(edges: Dataset) -> Dataset:
    """union(E, reverse(E)) — the explicit symmetrization required for WCC
    (the reference relies on its offline preprocessing doubling undirected
    edges, /root/reference/src/generate_subgraph_json.py:44)."""
    rev = edges.map_batches(
        lambda b: pa.table({"src": b["dst"], "dst": b["src"]}),
        batch_format="pyarrow",
        batch_size=None,
    )
    return edges.union(rev)


_SAMPLE_P31 = np.uint64((1 << 31) - 1)
_SAMPLE_A = np.uint64(1_103_515_245)  # < 2^31: products of 31-bit values fit uint64/BIGINT
_SAMPLE_B = np.uint64(12_345)


def sample_edges(
    edges: Dataset, percent: int, num_buckets: int = 100, invert: bool = False
) -> Dataset:
    """Deterministic hash sampling: keep an edge iff
    ``((src % p)·A + (dst % p)·B) % p % num_buckets < percent`` with
    p = 2^31−1 — pure 31-bit modular arithmetic, so every product fits both
    uint64 (numpy, no wraparound) and BIGINT (DuckDB, no overflow error)
    and the sample is reproducible as plain SQL at any parallelism. A
    stateless vectorized filter: no shuffle, no RNG state, restart-safe —
    the sampling style a 100 TB pipeline needs (seeded RNG per block is NOT
    reproducible across repartitions)."""

    def keep(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.uint64) % _SAMPLE_P31
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64) % _SAMPLE_P31
        h = (s * _SAMPLE_A + d * _SAMPLE_B) % _SAMPLE_P31 % np.uint64(num_buckets)
        m = h < np.uint64(percent)
        return b.filter(pa.array(~m if invert else m))

    return edges.map_batches(keep, batch_format="pyarrow", batch_size=None)
