"""Distributed exact aggregates beyond plain groupby: value-histogram
quantiles and per-group arg-max. Both are two-stage bucketed reduces (the
pre-aggregate-inside-map_batches pattern) — nothing row-sized ever reaches
the driver.

Extensions beyond the reference (its only aggregates are the per-algorithm
message combines, /root/reference/src/algorithm/*.go); these are the table
primitives a 100 TB corpus-statistics pass needs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from drone_ray.hashing import adaptive_buckets, mix64
from drone_ray.pipelines._util import pin_schema


def neighbor_sample_2hop(
    edges,
    fanout1: int,
    fanout2: int,
    num_buckets: int | None = None,
    est_rows: int | None = None,
):
    """Two-hop deterministic neighborhood sampling (the GraphSAGE minibatch
    frontier, Hamilton et al. 2017): per root, ``fanout1`` first-hop
    neighbors by md5(src, dst) pair priority, then each sampled mid's own
    ``fanout2`` sample — the SAME per-source draw at both hops, so hop 2
    is one global fanout table joined against hop 1, not a per-root
    recomputation. Returns (root, mid, dst) rows.

    Shape: two group_sample reduces (each one bucketed shuffle over at
    most r rows/vertex) + ONE hash(mid) bucketed tagged-union join; the
    expansion is bounded by fanout1 × fanout2 per root by construction —
    the frontier-explosion guard GNN samplers exist to provide."""
    if num_buckets is None:
        num_buckets = adaptive_buckets(est_rows, floor=32)
    hop1 = group_sample(edges, "src", "dst", fanout1, num_buckets=num_buckets,
                        est_rows=est_rows, per_group_prio=True)
    hop2 = group_sample(edges, "src", "dst", fanout2, num_buckets=num_buckets,
                        est_rows=est_rows, per_group_prio=True)

    mid_schema = pa.schema(
        [("key", pa.int64()), ("other", pa.int64()), ("side", pa.int8()),
         ("_b", pa.int64())]
    )

    def tag(side: int, key_col: str, other_col: str):
        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or key_col not in b.schema.names:
                return mid_schema.empty_table()
            k = b[key_col].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "key": pa.array(k, pa.int64()),
                    "other": b[other_col].cast(pa.int64()),
                    "side": pa.array(np.full(k.size, side, np.int8)),
                    "_b": pa.array((mix64(k) % np.uint64(num_buckets)).astype(np.int64)),
                }
            )

        return f

    def join(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        a = g[side == 0]  # hop-1 rows keyed by mid
        b = g[side == 1]  # hop-2 rows keyed by their src (= mid)
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64) for c in ("root", "mid", "dst")}
            )
        m = a.merge(b, on="key", suffixes=("_1", "_2"))
        return pd.DataFrame(
            {"root": m["other_1"], "mid": m["key"], "dst": m["other_2"]}
        )

    out_schema = pa.schema(
        [("root", pa.int64()), ("mid", pa.int64()), ("dst", pa.int64())]
    )
    return (
        hop1.map_batches(tag(0, "dst", "src"), batch_format="pyarrow", batch_size=None)
        .union(
            hop2.map_batches(tag(1, "src", "dst"), batch_format="pyarrow",
                             batch_size=None)
        )
        .groupby("_b")
        .map_groups(join, batch_format="pandas")
        .map_batches(pin_schema(out_schema), batch_format="pyarrow", batch_size=None)
    )


def exact_quantiles(
    values: Dataset,
    col: str,
    qs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
    num_buckets: int | None = None,
) -> pa.Table:
    """(q, value) — EXACT discrete quantiles of an integer-valued column:
    value at 1-based rank ``ceil(q*n)`` of the sorted column, DuckDB's
    ``quantile_disc`` rule, so the result is SQL-attestable.

    Shape: per-batch ``np.unique`` partial histograms → one bucketed
    shuffle keyed on hash(value) → exact (value, count) histogram. Only
    the DISTINCT-value histogram crosses to the driver (sort + cumsum +
    rank pick over ~|support| rows) — exact and scale-safe whenever the
    value support is bounded (token counts, lengths, degrees, scores on a
    grid), which is the case worth exact answers; unbounded float columns
    want a mergeable sketch instead (see textstats.vocabulary_hll for the
    sketch precedent)."""
    num_buckets = num_buckets or adaptive_buckets(None, floor=32)

    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        uv, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {
                "v": pa.array(uv, pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
                "_b": pa.array((mix64(uv) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("v", sort=False)["c"].sum().reset_index()
        return out

    hist_parts = list(
        values.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(reduce_bucket, batch_format="pandas")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    if hist_parts:
        hist = pa.concat_tables(hist_parts)
        v = hist["v"].to_numpy(zero_copy_only=False)
        c = hist["c"].to_numpy(zero_copy_only=False)
    else:
        v = np.empty(0, np.int64)
        c = np.empty(0, np.int64)
    order = np.argsort(v)
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1]) if cum.size else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        rank = max(1, math.ceil(q * n))  # 1-based, quantile_disc rule
        out_q.append(float(q))
        out_v.append(int(v[np.searchsorted(cum, rank)]))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.int64())}
    )


_DD_OFFSET = np.int64(1) << np.int64(40)  # key-space shift so keys sort in value order


def _dd_keys(v: np.ndarray, gamma: float) -> np.ndarray:
    """DDSketch log-bin key per value: positive x maps to
    ceil(ln(x)/ln(gamma)) + OFFSET, zero to 0, negative x mirrors. Keys are
    monotone in the value, so rank statistics on keys are rank statistics
    on values."""
    lg = np.log(gamma)
    key = np.zeros(v.size, np.int64)
    pos, neg = v > 0, v < 0
    with np.errstate(divide="ignore"):
        key[pos] = np.ceil(np.log(v[pos]) / lg).astype(np.int64) + _DD_OFFSET
        key[neg] = -(np.ceil(np.log(-v[neg]) / lg).astype(np.int64) + _DD_OFFSET)
    return key


def _dd_rep(keys: np.ndarray, gamma: float) -> np.ndarray:
    """Representative value of each bin key: the geometric midpoint
    2·gamma^i/(gamma+1), within relative error (gamma-1)/(gamma+1) = alpha
    of every value in the bin."""
    rep = np.zeros(keys.size, np.float64)
    pos, neg = keys > 0, keys < 0
    rep[pos] = 2.0 * np.power(gamma, (keys[pos] - _DD_OFFSET).astype(np.float64)) / (gamma + 1.0)
    rep[neg] = -2.0 * np.power(gamma, (-keys[neg] - _DD_OFFSET).astype(np.float64)) / (gamma + 1.0)
    return rep


def ddsketch_quantiles(
    values: Dataset,
    col: str,
    qs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
    alpha: float = 0.01,
    num_buckets: int | None = None,
) -> pa.Table:
    """(q, value) — MERGEABLE quantile sketch for unbounded/float columns:
    the DDSketch log-binned histogram (Masson, Rim & Lee, "DDSketch: a fast
    and fully-mergeable quantile sketch with relative-error guarantees",
    VLDB 2019). Every value lands in bin ceil(log_gamma(x)) with
    gamma = (1+alpha)/(1-alpha); the returned quantile is the bin's
    geometric midpoint, within RELATIVE error ``alpha`` of the true
    quantile value.

    Unlike KLL-style compactor sketches, the bin histogram is a plain
    count map — merging is addition, so the reduce is deterministic and
    ORDER-INSENSITIVE (no merge-order seam at any parallelism), exactly
    the property a 100-TB tree reduce needs. Same two-stage shape as
    exact_quantiles: per-batch bin histograms → one bucketed shuffle →
    the driver sees only ~|bins| rows (log-scale: ~231 bins per decade of
    dynamic range at alpha=0.01). The bin rule is one ln + one divide, so
    the whole sketch is SQL-expressible and driver-attestable (the md5
    minhash-oracle move). Rank rule matches quantile_disc (1-based
    ceil(q·n)) on keys, which by key monotonicity is quantile_disc on
    values."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    num_buckets = num_buckets or adaptive_buckets(None, floor=32)

    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        uk, cnt = np.unique(_dd_keys(v, gamma), return_counts=True)
        return pa.table(
            {
                "v": pa.array(uk, pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
                "_b": pa.array((mix64(uk) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("v", sort=False)["c"].sum().reset_index()

    hist_parts = list(
        values.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(reduce_bucket, batch_format="pandas")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    if hist_parts:
        hist = pa.concat_tables(hist_parts)
        k = hist["v"].to_numpy(zero_copy_only=False)
        c = hist["c"].to_numpy(zero_copy_only=False)
    else:
        k = np.empty(0, np.int64)
        c = np.empty(0, np.int64)
    order = np.argsort(k)
    k, c = k[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1]) if cum.size else 0
    out_q, out_k = [], []
    for q in qs:
        if n == 0:
            continue
        rank = max(1, math.ceil(q * n))
        out_q.append(float(q))
        out_k.append(int(k[np.searchsorted(cum, rank)]))
    rep = _dd_rep(np.asarray(out_k, np.int64), gamma)
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(rep, pa.float64())}
    )


def _col_hash(arr) -> np.ndarray:
    """Deterministic process-independent uint64 hash of a key column:
    mix64 for integers, pandas hash_array (fixed-key siphash) otherwise."""
    a = np.asarray(arr)
    if a.dtype.kind in "iu":
        return mix64(a.astype(np.int64))
    return pd.util.hash_array(a.astype(object)).astype(np.uint64)


def group_argmax_count(
    ds: Dataset,
    group_col: str,
    item_col: str,
    num_buckets: int | None = None,
    k: int = 1,
) -> Dataset:
    """Per group, the ``k`` items with the MOST rows — (group, item, n),
    count-descending with ties broken to the smallest item (deterministic,
    SQL QUALIFY-expressible). Key columns may be int or string.

    Two bucketed reduces: exact (group, item) counts in hash(group, item)
    buckets, then per-group top-k in hash(group) buckets. Both stages
    pre-aggregate inside map_batches, so shuffle volume is bounded by
    distinct (group, item) pairs, not input rows."""
    num_buckets = num_buckets or adaptive_buckets(None, floor=32)

    def partial(b: pa.Table) -> pd.DataFrame:
        df = b.select([group_col, item_col]).to_pandas()
        out = df.groupby([group_col, item_col], sort=False).size().reset_index(name="n")
        with np.errstate(over="ignore"):
            h = (
                _col_hash(out[group_col].to_numpy()) * np.uint64(0x9E3779B97F4A7C15)
                + _col_hash(out[item_col].to_numpy())
            ) % np.uint64(num_buckets)
        out["_b"] = h.astype(np.int64)
        return out

    def sum_pairs(gdf: pd.DataFrame) -> pd.DataFrame:
        out = gdf.groupby([group_col, item_col], sort=False)["n"].sum().reset_index()
        out["_b2"] = (
            _col_hash(out[group_col].to_numpy()) % np.uint64(num_buckets)
        ).astype(np.int64)
        return out

    def argmax_group(gdf: pd.DataFrame) -> pd.DataFrame:
        # top-k counts per group, ties to smallest item
        o = gdf.sort_values(
            [group_col, "n", item_col], ascending=[True, False, True], kind="mergesort"
        )
        win = o.groupby(group_col, sort=False).head(k)
        return win[[group_col, item_col, "n"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(sum_pairs, batch_format="pandas")
        .groupby("_b2")
        .map_groups(argmax_group, batch_format="pandas")
    )


def group_count_distinct(
    ds: Dataset,
    group_col: str,
    item_col: str,
    num_buckets: int | None = None,
) -> Dataset:
    """(group, n_distinct) — EXACT distinct-item count per group, the
    count(DISTINCT x) GROUP BY primitive. Per-batch (group, item) dedup →
    hash(group, item) buckets finish the global pair dedup and emit
    per-group partial counts → hash(group) buckets sum. Shuffle volume is
    bounded by distinct pairs; the exact counterpart of the HLL sketch
    (textstats.vocabulary_hll) for when cardinalities fit."""
    num_buckets = num_buckets or adaptive_buckets(None, floor=32)

    def partial(b: pa.Table) -> pd.DataFrame:
        df = b.select([group_col, item_col]).to_pandas().drop_duplicates()
        with np.errstate(over="ignore"):
            h = (
                _col_hash(df[group_col].to_numpy()) * np.uint64(0x9E3779B97F4A7C15)
                + _col_hash(df[item_col].to_numpy())
            ) % np.uint64(num_buckets)
        df = df.assign(_b=h.astype(np.int64))
        return df

    def count_bucket(gdf: pd.DataFrame) -> pd.DataFrame:
        d = gdf.drop_duplicates(subset=[group_col, item_col])
        out = d.groupby(group_col, sort=False).size().reset_index(name="n_distinct")
        out["_b2"] = (
            _col_hash(out[group_col].to_numpy()) % np.uint64(num_buckets)
        ).astype(np.int64)
        return out

    def sum_group(gdf: pd.DataFrame) -> pd.DataFrame:
        return gdf.groupby(group_col, sort=False)["n_distinct"].sum().reset_index()

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(count_bucket, batch_format="pandas")
        .groupby("_b2")
        .map_groups(sum_group, batch_format="pandas")
    )


def group_sample(
    ds: Dataset,
    group_col: str,
    id_col: str,
    r: int,
    num_buckets: int | None = None,
    est_rows: int | None = None,
    per_group_prio: bool = False,
) -> Dataset:
    """Deterministic fixed-size sample per group: the ``r`` rows of each
    group with the smallest md5 priority ``md5_lower64(f"gs-{id}")`` — the
    order-free equivalent of per-group reservoir sampling (uniform over
    ids, reproducible at any parallelism / partitioning, and expressible
    in SQL as a row_number() over the same md5 ordering, which is what
    makes this sampler oracle-backed instead of a trust-me RNG).

    Mergeable by construction: "r smallest priorities" is a semilattice,
    so each batch keeps at most r rows per group (vectorized lexsort +
    rank mask) and one hash(group) bucket shuffle of those O(r·G) partial
    rows finishes the reduce — the per-source subsampling pattern a
    100-TB corpus needs (cap each site/language/domain at r documents
    without a global sort).

    ``per_group_prio``: hash the (group, id) PAIR instead of the id alone —
    each group then draws an INDEPENDENT sample (what neighborhood/fanout
    sampling wants), instead of every group preferring the same
    globally-lucky ids (what a per-entity cap wants: a document capped in
    one group stays capped in every group).

    Returns (group_col, id_col) rows."""
    from drone_ray.functions.minhash import md5_lower64

    if num_buckets is None:
        num_buckets = adaptive_buckets(est_rows, floor=32)

    def _prio(groups, ids) -> np.ndarray:
        if per_group_prio:
            return np.fromiter(
                (md5_lower64(f"gs-{g}-{i}") for g, i in zip(groups, ids)),
                dtype=np.uint64,
                count=len(ids),
            )
        return np.fromiter(
            (md5_lower64(f"gs-{i}") for i in ids), dtype=np.uint64, count=len(ids)
        )

    def _keep_r(g: np.ndarray, i: np.ndarray, p: np.ndarray):
        """Rows of the r smallest priorities per group (ties impossible:
        ids are unique per group in the driver tables; a duplicate id
        would tie deterministically on the id itself). Groups sort by
        integer code, not raw value — string keys lexsort slowly and
        hashes could collide two groups into one rank sequence."""
        _, code = np.unique(g, return_inverse=True)
        order = np.lexsort((i, p, code))
        code, g, i, p = code[order], g[order], i[order], p[order]
        new = np.empty(code.size, dtype=bool)
        if code.size:
            new[0] = True
            new[1:] = code[1:] != code[:-1]
        starts = np.flatnonzero(new)
        rank = np.arange(code.size) - np.repeat(
            starts, np.diff(np.append(starts, code.size))
        )
        keep = rank < r
        return g[keep], i[keep], p[keep]

    def partial(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        i = b[id_col].to_numpy(zero_copy_only=False)
        if g.size == 0:
            # pin the INPUT's key types (generic API — int or string groups);
            # hardcoded types here would break schema unification at the
            # shuffle whenever an upstream filter leaves an empty block
            return pa.table(
                {
                    group_col: pa.array([], b.schema.field(group_col).type),
                    id_col: pa.array([], b.schema.field(id_col).type),
                    "_p": pa.array([], pa.uint64()),
                    "_b": pa.array([], pa.int64()),
                }
            )
        gk, ik, pk = _keep_r(g, i, _prio(g, i))
        bk = (_col_hash(gk) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                group_col: pa.array(gk),
                id_col: pa.array(ik),
                "_p": pa.array(pk, pa.uint64()),
                "_b": pa.array(bk),
            }
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df[group_col].to_numpy()
        i = df[id_col].to_numpy()
        p = df["_p"].to_numpy()
        gk, ik, _pk = _keep_r(g, i, p)
        return pd.DataFrame({group_col: gk, id_col: ik})

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
    )
