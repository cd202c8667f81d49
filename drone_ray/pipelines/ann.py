"""Approximate-nearest-neighbor search over an embedding column.

Baseline: exact brute-force cosine top-k — per-batch numpy matmul against a
broadcast query matrix (ray.put once, read per task), per-batch partial
top-k, tiny final merge. Scale path: random-hyperplane LSH buckets probed
per query (approximate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from drone_ray.functions.vectors import (
    batch_matrix,
    cosine_matrix,
    hyperplane_signs,
    make_planes,
)


def _query_matrix(emb: Dataset, query_ids, id_col: str, vec_col: str):
    """Collect the query vectors with a pushed-down distributed filter —
    only the ≤|query_ids| matching rows ever reach the driver."""
    qarr = np.unique(np.asarray(list(query_ids), dtype=np.int64))

    def pick(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(np.isin(ids, qarr)))

    parts = list(
        emb.select_columns([id_col, vec_col])
        .map_batches(pick, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    t = pa.concat_tables(parts) if parts else None
    if t is None or t.num_rows == 0:
        return np.empty(0, np.int64), np.zeros((0, 0))
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    q = batch_matrix(t, vec_col)
    order = np.argsort(ids)
    return ids[order], q[order]


def ann_topk_exact(
    emb: Dataset,
    query_ids=(0, 1, 2, 3, 4),
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """(query_id, vec_id, cosine) — exact top-k per query, deterministic
    ties broken by ascending vec_id; cosine rounded to 6 decimals after
    selection. Each task holds only (batch × queries) similarities."""
    qids, q = _query_matrix(emb, query_ids, id_col, vec_col)
    ref = ray.put((qids, q))

    def partial(b: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        x = batch_matrix(b, vec_col)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if x.size == 0 or qm.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        sims = cosine_matrix(x, qm)  # (n, m)
        kk = min(k, len(ids))
        out_q, out_v, out_c = [], [], []
        for m, qid in enumerate(qi):
            s = sims[:, m]
            # O(n) argpartition narrows the candidate set; rows tied with the
            # k-th cosine are all kept so the (cosine desc, vec_id asc)
            # tie-break stays deterministic, then the order is resolved on
            # just those candidates
            if kk < len(ids):
                part = np.argpartition(-s, kk - 1)[:kk]
                cand = np.flatnonzero(s >= s[part].min())
            else:
                cand = np.arange(len(ids))
            idx = cand[np.lexsort((ids[cand], -s[cand]))][:kk]
            out_q.append(np.full(idx.size, qid, np.int64))
            out_v.append(ids[idx])
            out_c.append(s[idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )

    # final merge: tiny (n_batches × m × k rows)
    df = emb.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    out = (
        df.sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["cosine"] = out["cosine"].round(6)
    return pa.Table.from_pandas(out, preserve_index=False)


def ann_topk_lsh(
    emb: Dataset,
    query_ids=(0, 1, 2, 3, 4),
    k: int = 10,
    n_bits: int = 6,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate top-k: candidates limited to vectors sharing a
    random-hyperplane bucket with the query in any of n_tables tables."""
    qids, q = _query_matrix(emb, query_ids, id_col, vec_col)
    d = q.shape[1] if q.size else 1
    planes = [make_planes(d, n_bits, seed=42 + t) for t in range(n_tables)]
    qbuckets = [hyperplane_signs(q, p) for p in planes]  # per table: (m,)
    ref = ray.put((qids, q, planes, qbuckets))

    def partial(b: pa.Table) -> pa.Table:
        qi, qm, pls, qbs = ray.get(ref)
        x = batch_matrix(b, vec_col)
        ids = np.array(b[id_col].to_pylist(), dtype=np.int64)
        out = {"query_id": [], "vec_id": [], "cosine": []}
        if x.size and qm.size:
            xb = [hyperplane_signs(x, p) for p in pls]
            for m, qid in enumerate(qi):
                cand = np.zeros(len(ids), dtype=bool)
                for t in range(len(pls)):
                    cand |= xb[t] == qbs[t][m]
                if not cand.any():
                    continue
                s = cosine_matrix(x[cand], qm[m : m + 1])[:, 0]
                cids = ids[cand]
                idx = np.lexsort((cids, -s))[: min(k, len(cids))]
                out["query_id"].extend([qid] * len(idx))
                out["vec_id"].extend(cids[idx].tolist())
                out["cosine"].extend(s[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )

    df = emb.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    out = (
        df.sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["cosine"] = out["cosine"].round(6)
    return pa.Table.from_pandas(out, preserve_index=False)


def _kmeans_lite(x: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic seeded Lloyd iterations on a driver-side SAMPLE — the
    coarse quantizer for IVF. The sample is bounded (not the dataset), so
    this stays O(sample·k·iters) regardless of corpus size."""
    rng = np.random.default_rng(seed)
    k = min(k, len(x))
    cent = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(k):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(0)
    return cent


def kmeans_distributed(
    emb: Dataset,
    n_clusters: int,
    iters: int = 5,
    sample_mod: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Exact Lloyd k-means over the FULL corpus, distributed: each iteration
    is one map_batches pass emitting per-batch partial (cluster, sum, count)
    rows — k×d doubles per batch — reduced on the driver in a deterministic
    sorted order (cluster, then min-vec_id batch key), so repeated runs give
    bit-identical centroids. The driver only ever holds k×d centroids plus
    k×n_batches partial rows; nothing scales with corpus size. Costs
    ``iters`` full passes — use over the sample-capped trainer when the
    bounded sample is no longer representative (≥10^8 vectors).

    Init: the n_clusters modulo-sampled rows with the SMALLEST vec_id —
    a per-batch partial top-k + a tiny driver merge. (A plain
    ``.limit(k)`` over the sampled stream picks whichever blocks arrive
    first, so two invocations in the same session could train different
    centroids — observed at sf0.001; "k smallest ids" is a semilattice,
    order-free at any parallelism.)"""

    def pick_init(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(ids % sample_mod == 0))
        if t.num_rows > n_clusters:
            ids2 = t[id_col].to_numpy(zero_copy_only=False)
            t = t.take(pa.array(np.argsort(ids2)[:n_clusters]))
        return t

    init_parts = list(
        emb.select_columns([id_col, vec_col])
        .map_batches(pick_init, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    init_parts = [t for t in init_parts if t.num_rows]
    if not init_parts:
        return np.zeros((0, 1))
    all_init = pa.concat_tables(init_parts)
    order = np.argsort(all_init[id_col].to_numpy(zero_copy_only=False))[:n_clusters]
    cent = batch_matrix(all_init.take(pa.array(order)), vec_col).astype(np.float64)
    k, d = cent.shape

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(b: pa.Table) -> pa.Table:
            c = ray.get(ref)
            x = batch_matrix(b, vec_col)
            ids = b[id_col].to_numpy(zero_copy_only=False)
            if x.size == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "bkey": pa.array([], pa.int64()),
                        "count": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.list_(pa.float64())),
                    }
                )
            dist = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            assign = dist.argmin(1)
            sums = np.zeros((k, d))
            np.add.at(sums, assign, x)
            counts = np.bincount(assign, minlength=k)
            nz = np.flatnonzero(counts)
            bkey = int(ids.min())
            return pa.table(
                {
                    "cluster": pa.array(nz, pa.int64()),
                    "bkey": pa.array([bkey] * len(nz), pa.int64()),
                    "count": pa.array(counts[nz], pa.int64()),
                    "vsum": pa.array(list(sums[nz]), pa.list_(pa.float64())),
                }
            )

        parts = emb.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
        if not len(parts):
            break
        parts = parts.sort_values(["cluster", "bkey"], kind="mergesort")
        cl = parts["cluster"].to_numpy()
        cnt = parts["count"].to_numpy()
        vs = np.vstack(parts["vsum"].to_numpy())
        new = cent.copy()
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        tot = np.add.reduceat(cnt, starts)
        ssum = np.add.reduceat(vs, starts, axis=0)
        new[cl[starts]] = ssum / tot[:, None]
        cent = new
    return cent


def ann_topk_ivf(
    emb: Dataset,
    query_ids=(0, 1, 2, 3, 4),
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_mod: int = 7,
    max_train: int = 65536,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train: str = "sample",
) -> pa.Table:
    """IVF approximate top-k: a seeded k-means coarse quantizer (trained on
    a deterministic sample) assigns every vector to a cluster inside
    map_batches; each query probes only its n_probe nearest clusters, so
    per-batch similarity work drops to ~n_probe/n_clusters of the exact
    scan. Approximate by design: vectors in unprobed clusters are invisible
    to that query (recall grows with n_probe).

    The training sample is HARD-BOUNDED: the 1/sample_mod modulo filter is
    followed by ``.limit(max_train)``, so at most max_train vectors ever
    reach the driver regardless of corpus size (streaming execution stops
    the upstream read once the limit is satisfied). Deterministic: block
    order of a parquet read is stable, so the same input yields the same
    sample and the same centroids.

    ``train="distributed"`` swaps the sample trainer for kmeans_distributed
    (exact Lloyd over the whole corpus, iters full passes) — the scale path
    when the capped sample stops being representative.
    """
    if train == "distributed":
        cent = kmeans_distributed(
            emb, n_clusters, sample_mod=sample_mod, id_col=id_col, vec_col=vec_col
        )
    else:

        def pick_sample(b: pa.Table) -> pa.Table:
            ids = b[id_col].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % sample_mod == 0))

        sample_parts = list(
            emb.select_columns([id_col, vec_col])
            .map_batches(pick_sample, batch_format="pyarrow", batch_size=None)
            .limit(max_train)
            .iter_batches(batch_format="pyarrow", batch_size=None)
        )
        strain = (
            np.vstack([batch_matrix(t, vec_col) for t in sample_parts if t.num_rows])
            if sample_parts
            else np.zeros((0, 1))
        )
        cent = (
            _kmeans_lite(strain, n_clusters) if strain.shape[0] else np.zeros((0, 1))
        )
    if cent.shape[0] == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    qids, q = _query_matrix(emb, query_ids, id_col, vec_col)
    # per query: the n_probe nearest centroids (by cosine)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(qn @ cn.T), axis=1)[:, :n_probe]  # (m, n_probe)
    ref = ray.put((qids, q, cent, probe))

    def partial(b: pa.Table) -> pa.Table:
        qi, qm, cc, pr = ray.get(ref)
        x = batch_matrix(b, vec_col)
        ids = np.array(b[id_col].to_pylist(), dtype=np.int64)
        out = {"query_id": [], "vec_id": [], "cosine": []}
        if x.size and qm.size:
            d = ((x[:, None, :] - cc[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)  # cluster of each vector
            for m, qid in enumerate(qi):
                cand = np.isin(assign, pr[m])
                if not cand.any():
                    continue
                s = cosine_matrix(x[cand], qm[m : m + 1])[:, 0]
                cids = ids[cand]
                idx = np.lexsort((cids, -s))[: min(k, len(cids))]
                out["query_id"].extend([qid] * len(idx))
                out["vec_id"].extend(cids[idx].tolist())
                out["cosine"].extend(s[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )

    df = emb.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    out = (
        df.sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["cosine"] = out["cosine"].round(6)
    return pa.Table.from_pandas(out, preserve_index=False)
