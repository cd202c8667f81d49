"""Deduplication family over a documents table (doc_id, text):

  * exact        — content-fingerprint groupby (hash-partition, keep min id)
  * MinHash+LSH  — shingle → minhash → band → bucket groupby → candidate
                   pairs → exact-Jaccard verification
  * SimHash      — 64-bit simhash, banded buckets, Hamming-verified pairs
  * n-gram Jaccard — the verification kernel, exposed directly
  * embedding cosine — exact blocked matmul baseline + LSH-bucketed variant

Scale notes: every candidate-generation step is a map_batches + groupby on a
bucket key (no driver-side pairwise loops), and Jaccard verification is a
bucketed pair⋈docs join (two hops, see verify_jaccard) — no whole-corpus
materialization anywhere. The one exception is embedding_near_dups_exact,
the declared small-side oracle baseline; its scale path is the LSH variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from drone_ray.pipelines._util import pin_schema as _pin

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from drone_ray.functions.minhash import (
    MinHasher,
    band_hashes,
    hamming64,
    jaccard,
    shingle_strings,
    simhash64_md5,
    simhash_bands,
    word_shingles,
)
from drone_ray.functions.text import fingerprint
from drone_ray.functions.vectors import batch_matrix, cosine_matrix, hyperplane_signs, make_planes
from drone_ray.hashing import adaptive_buckets


def _buckets(num_buckets: int | None, est_rows: int | None, floor: int = 32) -> int:
    """Shuffle fan-out: grows with the estimated row count of THIS shuffle
    (hashing.adaptive_buckets), with the historical constant as the floor."""
    return (
        num_buckets
        if num_buckets is not None
        else adaptive_buckets(est_rows, floor=floor)
    )


# --- exact dedup -----------------------------------------------------------
def exact_dedup(docs: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """(fp, doc_id=min id, n_dups) per distinct content fingerprint."""

    def fp_batch(b: pa.Table) -> pa.Table:
        fps = [fingerprint(t) for t in b[text_col].to_pylist()]
        return pa.table({"fp": pa.array(fps, pa.string()), id_col: b[id_col]})

    return (
        docs.map_batches(fp_batch, batch_format="pyarrow", batch_size=None)
        .groupby("fp")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_dups"))
    )


# --- MinHash + LSH ---------------------------------------------------------
class _MinhashStage:
    """Actor-pool stage: permutation params built once per actor."""

    def __init__(self, num_perm: int, num_bands: int, k: int, id_col: str, text_col: str):
        self.mh = MinHasher(num_perm=num_perm)
        self.num_bands = num_bands
        self.k = k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, t in zip(ids, texts):
            sig = self.mh.signature_of_strings(shingle_strings(t, self.k))
            bh = band_hashes(sig, self.num_bands)
            out_id.extend([i] * self.num_bands)
            out_band.extend(range(self.num_bands))
            out_hash.extend(bh.tolist())
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(np.array(out_hash, dtype=np.uint64).astype(np.int64)),
                self.id_col: pa.array(out_id),
            }
        )


def _expand_group_pairs(keys: list[np.ndarray], ids: np.ndarray):
    """All ordered (i < j) id pairs within contiguous runs of ``keys`` —
    one repeat/cumsum pass over the whole bucket, no per-group Python.
    ``keys``/``ids`` must already be sorted by (*keys, ids). Returns
    (a_idx, b_idx) row indices into the input arrays."""
    n = ids.size
    if n < 2:
        e = np.empty(0, np.int64)
        return e, e
    new = np.empty(n, dtype=bool)
    new[0] = True
    diff = keys[0][1:] != keys[0][:-1]
    for k in keys[1:]:
        diff = diff | (k[1:] != k[:-1])
    new[1:] = diff
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    pos = np.arange(n) - np.repeat(starts, sizes)
    lens = np.repeat(sizes, sizes) - 1 - pos
    total = int(lens.sum())
    if total == 0:
        e = np.empty(0, np.int64)
        return e, e
    a_idx = np.repeat(np.arange(n), lens)
    ctr = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    return a_idx, a_idx + 1 + ctr


def _bucket_pairs(g: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Candidate pairs for every (band_id, band_hash) group in one bucket."""
    bid = g["band_id"].to_numpy()
    bh = g["band_hash"].to_numpy()
    ids = g[id_col].to_numpy()
    order = np.lexsort((ids, bh, bid))
    bid, bh, ids = bid[order], bh[order], ids[order]
    ai, bi = _expand_group_pairs([bid, bh], ids)
    if ai.size == 0:
        return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
    df = pd.DataFrame({"a": ids[ai], "b": ids[bi]})
    return df.drop_duplicates()


_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _dedupe_pairs(pairs: Dataset, schema: pa.Schema, num_buckets: int = 32) -> Dataset:
    """Global distinct on (a, b): bucket shuffle + per-bucket vectorized
    drop_duplicates. Any extra columns are identical across copies of a pair
    (band-independent functions of the two docs), so keeping the first is
    exact. Avoids groupby(["a","b"]).aggregate(...) whose hash-aggregate
    actor pools dominate wall time at small scale."""
    from drone_ray.hashing import mix64

    def tag(b: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (
                mix64(b["a"].to_numpy(zero_copy_only=False)) * np.uint64(0x9E3779B97F4A7C15)
                + mix64(b["b"].to_numpy(zero_copy_only=False))
            ) % np.uint64(num_buckets)
        return b.append_column("_pb", pa.array(h.astype(np.int64)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["a", "b"]).drop(columns=["_pb"])

    return (
        pairs.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("_pb")
        .map_groups(finish, batch_format="pandas")
        .map_batches(_pin(schema), batch_format="pyarrow", batch_size=None)
    )


def minhash_candidates(
    docs: Dataset,
    *,
    num_perm: int = 128,
    num_bands: int = 16,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 4,
    dedupe: bool = True,
    est_docs: int | None = None,
) -> Dataset:
    """Candidate pairs (a < b) sharing at least one LSH band; globally
    distinct unless ``dedupe=False``."""
    from drone_ray.hashing import mix64

    # band shuffle carries docs × bands rows
    num_buckets = _buckets(None, est_docs * num_bands if est_docs else None)

    def add_bucket(b: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (
                b["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                + mix64(b["band_hash"].to_numpy(zero_copy_only=False))
            ) % np.uint64(num_buckets)
        return b.append_column("_b", pa.array(h.astype(np.int64)))

    bands = docs.map_batches(
        _MinhashStage,
        fn_constructor_args=(num_perm, num_bands, k, id_col, text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
    # ONE shuffle on hash(band key) % B; all groups of a bucket expand to
    # pairs in a single vectorized pass (a per-(band,hash) map_groups would
    # pay one Python call per distinct band value — tens of thousands)
    pairs = (
        bands.groupby("_b")
        .map_groups(lambda g: _bucket_pairs(g, id_col), batch_format="pandas")
        .map_batches(_pin(_PAIR_SCHEMA), batch_format="pyarrow", batch_size=None)
    )
    if not dedupe:
        # verify_jaccard's second hop groups by hash(a, b) anyway, so its
        # per-bucket dedupe is free — callers that feed the verifier skip
        # this extra shuffle
        return pairs
    return _dedupe_pairs(pairs, _PAIR_SCHEMA)


def verify_jaccard(
    pairs: Dataset,
    docs: Dataset,
    *,
    k: int = 3,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
    est_docs: int | None = None,
) -> Dataset:
    """Exact k-shingle Jaccard for each candidate pair; keeps jaccard ≥
    threshold. Two bucketed hops, nothing on the driver:

      1. each pair explodes into two (doc_id, a, b, side) rows; pair rows
         and doc rows meet in hash(doc_id) buckets where the text attaches
         (vectorized searchsorted — the explicit partitioned hash join);
      2. the two text-carrying rows of each pair meet in hash(a, b) buckets
         where the Jaccard is computed.

    Texts ship through the shuffle once per hop; memory per task is one
    bucket, so the operator scales with cluster width, not corpus size.
    """
    from drone_ray.hashing import mix64

    num_buckets = _buckets(num_buckets, est_docs)

    def pair_rows(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        did = np.concatenate([a, bb])
        return pa.table(
            {
                "did": pa.array(did, pa.int64()),
                "a": pa.array(np.concatenate([a, a]), pa.int64()),
                "b": pa.array(np.concatenate([bb, bb]), pa.int64()),
                "side": pa.array(
                    np.concatenate([np.zeros(a.size, np.int8), np.ones(a.size, np.int8)])
                ),
                "text": pa.nulls(did.size, pa.string()),
                "_b": pa.array((mix64(did) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def doc_rows(b: pa.Table) -> pa.Table:
        did = b[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "did": pa.array(did, pa.int64()),
                "a": pa.array(np.full(did.size, -1), pa.int64()),
                "b": pa.array(np.full(did.size, -1), pa.int64()),
                "side": pa.array(np.full(did.size, -1, np.int8)),
                "text": b[text_col],
                "_b": pa.array((mix64(did) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def attach_text(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        is_doc = side == -1
        prs = g[~is_doc]
        if not len(prs):
            return pd.DataFrame(
                {
                    "a": np.empty(0, np.int64),
                    "b": np.empty(0, np.int64),
                    "side": np.empty(0, np.int8),
                    "text": np.empty(0, object),
                    "_pb": np.empty(0, np.int64),
                }
            )
        dd = g["did"].to_numpy()[is_doc]
        tt = g["text"].to_numpy()[is_doc]
        order = np.argsort(dd)
        dd, tt = dd[order], tt[order]
        want = prs["did"].to_numpy()
        pos = np.searchsorted(dd, want)
        # candidate ids must all exist in docs — validate instead of letting
        # searchsorted silently attach a neighboring doc's text (or raise an
        # opaque IndexError on an exhausted bucket)
        ok = pos < dd.size
        if not ok.all() or (dd[pos[ok]] != want[ok]).any():
            missing = np.setdiff1d(want, dd)
            raise ValueError(
                f"verify_jaccard: {missing.size} candidate doc ids missing from "
                f"the docs table (e.g. {missing[:5].tolist()})"
            )
        a = prs["a"].to_numpy()
        bb = prs["b"].to_numpy()
        with np.errstate(over="ignore"):
            pb = (mix64(a) * np.uint64(0x9E3779B97F4A7C15) + mix64(bb)) % np.uint64(num_buckets)
        return pd.DataFrame(
            {
                "a": a,
                "b": bb,
                "side": prs["side"].to_numpy(),
                "text": tt[pos],
                "_pb": pb.astype(np.int64),
            }
        )

    def score(g: pd.DataFrame) -> pd.DataFrame:
        # duplicate candidate pairs (multi-band hits) collapse here — all
        # copies of (a, b) share this bucket by construction
        g = g.drop_duplicates(subset=["a", "b", "side"])
        g = g.sort_values(["a", "b", "side"], kind="mergesort")
        a = g["a"].to_numpy()
        bb = g["b"].to_numpy()
        texts = g["text"].to_numpy()
        # rows come in (side 0, side 1) pairs after the sort
        js = [
            round(jaccard(word_shingles(x, k), word_shingles(y, k)), 6)
            for x, y in zip(texts[::2], texts[1::2])
        ]
        out = pd.DataFrame({"a": a[::2], "b": bb[::2], "jaccard": np.array(js, np.float64)})
        return out[out["jaccard"] >= threshold]

    prs = pairs.map_batches(pair_rows, batch_format="pyarrow", batch_size=None)
    dcs = docs.select_columns([id_col, text_col]).map_batches(
        doc_rows, batch_format="pyarrow", batch_size=None
    )
    joined = prs.union(dcs).groupby("_b").map_groups(attach_text, batch_format="pandas")
    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())])
    return (
        joined.groupby("_pb")
        .map_groups(score, batch_format="pandas")
        .map_batches(_pin(out_schema), batch_format="pyarrow", batch_size=None)
    )


def minhash_near_dups(docs: Dataset, threshold: float = 0.7, **kw) -> Dataset:
    return verify_jaccard(
        minhash_candidates(docs, dedupe=False, **kw), docs, threshold=threshold
    )


# --- SimHash ---------------------------------------------------------------
def simhash_table(docs: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """Oracle-grade hashing (md5 per token == DuckDB md5_number_lower) so
    the full banded chain is driver-attested SQL — see queries._SIMHASH_SQL.
    At corpus scale swap simhash64_md5 → simhash64 (vectorized siphash,
    ~3× faster) and the query drops to pytest-only conformance."""

    def sh(b: pa.Table) -> pa.Table:
        hs = [simhash64_md5(t) for t in b[text_col].to_pylist()]
        return pa.table(
            {id_col: b[id_col], "simhash": pa.array(np.array(hs, np.uint64).astype(np.int64))}
        )

    return docs.map_batches(sh, batch_format="pyarrow", batch_size=None)


def simhash_near_dups(
    docs: Dataset,
    max_hamming: int = 3,
    num_bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Pairs (a, b, hamming ≤ max_hamming). Banding guarantee: distance <
    num_bands implies a shared band, so max_hamming ≤ num_bands-1 is exact."""
    sh = simhash_table(docs, id_col, text_col)

    def explode(b: pa.Table) -> pa.Table:
        ids, hs = b[id_col].to_pylist(), b["simhash"].to_pylist()
        rid, rband, rkey, rhash = [], [], [], []
        for i, h in zip(ids, hs):
            for bi, key in enumerate(simhash_bands(h & 0xFFFFFFFFFFFFFFFF, num_bands)):
                rid.append(i)
                rband.append(bi)
                rkey.append(key)
                rhash.append(h)
        return pa.table(
            {
                "band_id": pa.array(rband, pa.int32()),
                "band_key": pa.array(rkey, pa.int64()),
                id_col: pa.array(rid),
                "simhash": pa.array(rhash, pa.int64()),
            }
        )

    from drone_ray.hashing import mix64

    num_buckets = 32

    def add_bucket(b: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (
                b["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                + mix64(b["band_key"].to_numpy(zero_copy_only=False))
            ) % np.uint64(num_buckets)
        return b.append_column("_b", pa.array(h.astype(np.int64)))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """All same-(band_id, band_key) pairs in one bucket, one vectorized
        expansion + Hamming filter (no per-band-value Python)."""
        bid = g["band_id"].to_numpy()
        bkey = g["band_key"].to_numpy()
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        order = np.lexsort((ids, bkey, bid))
        bid, bkey, ids, hs = bid[order], bkey[order], ids[order], hs[order]
        ai, bi = _expand_group_pairs([bid, bkey], ids)
        empty = pd.DataFrame(
            {
                "a": np.empty(0, np.int64),
                "b": np.empty(0, np.int64),
                "hamming": np.empty(0, np.int64),
            }
        )
        if ai.size == 0:
            return empty
        d = hamming64(hs[ai], hs[bi])
        keep = d <= max_hamming
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "a": ids[ai][keep],
                "b": ids[bi][keep],
                "hamming": d[keep].astype(np.int64),
            }
        ).drop_duplicates()

    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int64())])
    pairs = (
        sh.map_batches(explode, batch_format="pyarrow", batch_size=None)
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(_pin(schema), batch_format="pyarrow", batch_size=None)
    )
    # a pair's hamming is band-independent, so distinct == min
    return _dedupe_pairs(pairs, schema)


# --- exact n-gram Jaccard near-dup ----------------------------------------
def ngram_jaccard_near_dups(
    docs: Dataset,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    metric: str = "jaccard",
) -> Dataset:
    """EXACT token-n-gram similarity pairs. ``metric="jaccard"`` (default):
    symmetric (a < b, jaccard ≥ threshold) rows. ``metric="containment"``:
    DIRECTED (contained, container, c/|A| ≥ threshold) rows — Broder's
    containment, the doc-inside-doc signal. Jaccard notes below; this is the
    oracle-able member of the near-dup family (MinHash/SimHash above are its
    approximations). SQL-equivalent semantics: whitespace tokens of the
    trimmed text, distinct n-token shingles, docs with fewer than n tokens
    have no shingles.

    Fully bucketed, three shuffles, nothing driver-side:
      1. (shingle_hash, doc, n_shingles) rows meet in hash(shingle) buckets;
         per-bucket vectorized pair expansion emits (a, b, na, nb, c) with c
         = shared shingles IN THIS BUCKET (each shingle group lives wholly
         in one bucket, so partial counts are disjoint);
      2. partials meet in hash(a, b) buckets where c sums and the Jaccard
         c/(na+nb−c) filters.

    Sizes ride along on every shingle row (one int64), so no sizes join
    exists. Skew note: a shingle shared by k docs expands to k(k−1)/2
    pairs — that quadratic is inherent to EXACT Jaccard (it is the
    candidate-free ground truth); at web scale use minhash_near_dups +
    verify_jaccard, which this operator's semantics anchor."""
    from drone_ray.functions.minhash import _token_hashes
    from drone_ray.hashing import mix64

    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")

    def shingle_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        texts = b[text_col].to_pylist()
        sh_all, doc_all, nsh_all = [], [], []
        g = np.uint64(0x9E3779B97F4A7C15)
        for did, text in zip(ids, texts):
            toks = (text or "").split()
            if len(toks) < n:
                continue
            th = _token_hashes(toks)
            with np.errstate(over="ignore"):
                acc = np.zeros(th.size - n + 1, np.uint64)
                for j in range(n):
                    acc = acc * g + th[j : th.size - n + 1 + j]
                sh = np.unique(mix64(acc))
            sh_all.append(sh)
            doc_all.append(np.full(sh.size, did, np.int64))
            nsh_all.append(np.full(sh.size, sh.size, np.int64))
        if not sh_all:
            return pa.table(
                {
                    "sh": pa.array([], pa.int64()),
                    "doc": pa.array([], pa.int64()),
                    "nsh": pa.array([], pa.int64()),
                    "_b": pa.array([], pa.int64()),
                }
            )
        sh = np.concatenate(sh_all)
        return pa.table(
            {
                "sh": pa.array(sh.view(np.int64), pa.int64()),
                "doc": pa.array(np.concatenate(doc_all), pa.int64()),
                "nsh": pa.array(np.concatenate(nsh_all), pa.int64()),
                "_b": pa.array((sh % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sh = g["sh"].to_numpy()
        d = g["doc"].to_numpy()
        ns = g["nsh"].to_numpy()
        order = np.lexsort((d, sh))
        sh, d, ns = sh[order], d[order], ns[order]
        empty = pd.DataFrame(
            {c: np.empty(0, np.int64) for c in ("a", "b", "na", "nb", "c", "_pb")}
        )
        if sh.size == 0:
            return empty
        a_idx, b_idx = _expand_group_pairs([sh], d)
        if a_idx.size == 0:
            return empty
        a, bb = d[a_idx], d[b_idx]  # d ascending within group ⇒ a < b
        na, nb = ns[a_idx], ns[b_idx]
        df = (
            pd.DataFrame({"a": a, "b": bb, "na": na, "nb": nb})
            .groupby(["a", "b"], sort=False)
            .agg(na=("na", "first"), nb=("nb", "first"), c=("na", "size"))
            .reset_index()
        )
        with np.errstate(over="ignore"):
            pb = (
                mix64(df["a"].to_numpy()) * np.uint64(0x9E3779B97F4A7C15)
                + mix64(df["b"].to_numpy())
            ) % np.uint64(num_buckets)
        df["_pb"] = pb.astype(np.int64)
        return df

    def score(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["a", "b"], sort=False)
            .agg(na=("na", "first"), nb=("nb", "first"), c=("c", "sum"))
            .reset_index()
        )
        a = agg["a"].to_numpy()
        b = agg["b"].to_numpy()
        na = agg["na"].to_numpy()
        nb = agg["nb"].to_numpy()
        c = agg["c"].to_numpy()
        if metric == "containment":
            # Broder containment c/|A|: DIRECTED rows (contained, container)
            # — catches doc-inside-doc (boilerplate wrappers, quoting) that
            # symmetric Jaccard dilutes when the container is much larger
            ca = c / na
            cb = c / nb
            ka = ca >= threshold
            kb = cb >= threshold
            return pd.DataFrame(
                {
                    "a": np.concatenate([a[ka], b[kb]]),
                    "b": np.concatenate([b[ka], a[kb]]),
                    "containment": np.round(np.concatenate([ca[ka], cb[kb]]), 6),
                }
            )
        j = c / (na + nb - c)
        keep = j >= threshold
        return pd.DataFrame(
            {"a": a[keep], "b": b[keep], "jaccard": np.round(j[keep], 6)}
        )

    val_col = "containment" if metric == "containment" else "jaccard"
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()), (val_col, pa.float64())])
    return (
        docs.select_columns([id_col, text_col])
        .map_batches(shingle_rows, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby("_pb")
        .map_groups(score, batch_format="pandas")
        .map_batches(_pin(schema), batch_format="pyarrow", batch_size=None)
    )


def dup_span_stats(
    docs: Dataset,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> Dataset:
    """Per-document duplicated-span statistics — the position-level
    exact-substring duplication signal of Lee et al., "Deduplicating
    Training Data Makes Language Models Better" (ACL 2022,
    arXiv:2107.06499), at n-token granularity: the n-gram starting at
    token position p of a document is DUPLICATED iff the identical n-gram
    occurs in at least 2 distinct documents. Emits one row per document
    with ≥ n tokens: (doc_id, total_ngrams, dup_ngrams, dup_ratio) —
    the memorization-risk profile a cleaning pipeline thresholds on.

    SQL-equivalent semantics (queries._DUP_SPANS_SQL): whitespace tokens
    of the trimmed text, positions NOT deduplicated (unlike the Jaccard
    shingles above — a 5×-repeated span counts 5 positions), cross-doc
    test via count(DISTINCT doc_id) ≥ 2. The engine compares 64-bit mixed
    rolling hashes where the oracle compares strings — the same
    collision stance as ngram_jaccard_near_dups.

    Two bucketed shuffles, nothing driver-side: a document's text is one
    row, so its per-(shingle, doc) position counts are complete per batch;
    (1) they meet in hash(shingle) buckets where each row is one distinct
    doc, so the distinct-doc count closes per group; (2) per-doc partial
    (dup, total) sums close in hash(doc) buckets. Skew-free: no pair
    expansion anywhere — a shingle shared by k docs costs k rows, not k²."""
    from drone_ray.functions.minhash import _token_hashes
    from drone_ray.hashing import mix64

    def shingle_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        texts = b[text_col].to_pylist()
        sh_all, doc_all, npos_all = [], [], []
        g = np.uint64(0x9E3779B97F4A7C15)
        for did, text in zip(ids, texts):
            toks = (text or "").split()
            if len(toks) < n:
                continue
            th = _token_hashes(toks)
            with np.errstate(over="ignore"):
                acc = np.zeros(th.size - n + 1, np.uint64)
                for j in range(n):
                    acc = acc * g + th[j : th.size - n + 1 + j]
                sh = mix64(acc)
            uq, cnt = np.unique(sh, return_counts=True)
            sh_all.append(uq)
            doc_all.append(np.full(uq.size, did, np.int64))
            npos_all.append(cnt.astype(np.int64))
        if not sh_all:
            return pa.table(
                {
                    "sh": pa.array([], pa.int64()),
                    "doc": pa.array([], pa.int64()),
                    "npos": pa.array([], pa.int64()),
                    "_b": pa.array([], pa.int64()),
                }
            )
        sh = np.concatenate(sh_all)
        return pa.table(
            {
                "sh": pa.array(sh.view(np.int64), pa.int64()),
                "doc": pa.array(np.concatenate(doc_all), pa.int64()),
                "npos": pa.array(np.concatenate(npos_all), pa.int64()),
                "_b": pa.array((sh % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def bucket_docs(g: pd.DataFrame) -> pd.DataFrame:
        sh = g["sh"].to_numpy()
        doc = g["doc"].to_numpy()
        npos = g["npos"].to_numpy()
        empty = pd.DataFrame(
            {c: np.empty(0, np.int64) for c in ("doc", "tot", "dup", "_b2")}
        )
        if sh.size == 0:
            return empty
        # each (sh, doc) row is one distinct doc ⇒ group size == ndocs
        uq, inv, cnt = np.unique(sh, return_inverse=True, return_counts=True)
        dup_pos = np.where(cnt[inv] >= 2, npos, 0)
        df = (
            pd.DataFrame({"doc": doc, "tot": npos, "dup": dup_pos})
            .groupby("doc", sort=False)
            .sum()
            .reset_index()
        )
        d = df["doc"].to_numpy(np.int64)
        df["_b2"] = (mix64(d) % np.uint64(num_buckets)).astype(np.int64)
        return df

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc", sort=False)[["tot", "dup"]].sum().reset_index()
        return pd.DataFrame(
            {
                "doc_id": agg["doc"],
                "total_ngrams": agg["tot"],
                "dup_ngrams": agg["dup"],
                "dup_ratio": np.round(agg["dup"].to_numpy() / agg["tot"].to_numpy(), 6),
            }
        )

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("total_ngrams", pa.int64()),
            ("dup_ngrams", pa.int64()),
            ("dup_ratio", pa.float64()),
        ]
    )
    return (
        docs.select_columns([id_col, text_col])
        .map_batches(shingle_rows, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(bucket_docs, batch_format="pandas")
        .groupby("_b2")
        .map_groups(finish, batch_format="pandas")
        .map_batches(_pin(schema), batch_format="pyarrow", batch_size=None)
    )


# --- embedding cosine near-dup --------------------------------------------
@ray.remote
def _block_pair_sims(ta, tb, threshold, id_col, vec_col, same: bool):
    """Cosine pairs (a < b, sim ≥ threshold) between two embedding blocks.
    ``same=True`` compares a block to itself (upper triangle only)."""
    aids = np.asarray(ta[id_col]).astype(np.int64)
    x = batch_matrix(ta, vec_col)
    if same:
        bids, y = aids, x
    else:
        bids = np.asarray(tb[id_col]).astype(np.int64)
        y = batch_matrix(tb, vec_col)
    if aids.size == 0 or bids.size == 0:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
    sims = cosine_matrix(x, y)
    ii, jj = np.nonzero(sims >= threshold)
    if same:
        # a same-block pair shows up at (i, j) AND (j, i) — keep the upper
        # triangle only (also drops the i == i self-pairs)
        m = ii < jj
        ii, jj = ii[m], jj[m]
    a, bb, s = aids[ii], bids[jj], sims[ii, jj]
    lo = np.minimum(a, bb)
    hi = np.maximum(a, bb)
    keep = lo < hi  # cross-block self-ids can't occur; ordering normalizes
    return pa.table(
        {
            "a": pa.array(lo[keep], pa.int64()),
            "b": pa.array(hi[keep], pa.int64()),
            "cosine": pa.array(np.round(s[keep], 6), pa.float64()),
        }
    )


def embedding_near_dups_exact(
    emb: Dataset, threshold: float = 0.9, id_col: str = "vec_id", vec_col: str = "embedding"
) -> Dataset:
    """Exact pairs (a < b, cosine ≥ threshold), BLOCKED: the embedding table
    is materialized into object-store blocks and one Ray task runs per
    unordered block pair — each task reads exactly two blocks, so no process
    (driver included) ever holds the full matrix. Exact all-pairs is
    inherently O(n²) similarity work; the block grid is the scalable
    schedule for it (and the oracle baseline for the LSH variant below,
    which is the web-scale path that avoids the O(n²) altogether)."""
    mat = emb.select_columns([id_col, vec_col]).materialize()
    refs: list = []
    for bundle in mat.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    if not refs:
        return ray.data.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
        )
    out = [
        _block_pair_sims.remote(refs[i], refs[j], threshold, id_col, vec_col, i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    return ray.data.from_arrow_refs(out)


def embedding_near_dups_lsh(
    emb: Dataset,
    threshold: float = 0.9,
    n_bits: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """Scale path: random-hyperplane buckets (n_tables independent tables),
    exact cosine only within buckets. Approximate — pairs in no shared
    bucket are missed; recall grows with n_tables."""

    def explode(b: pa.Table) -> pa.Table:
        # Arrow-native: the vector column is REUSED (zero-copy slice per
        # table replica), never materialized to Python lists; only the
        # signature computation touches numpy
        x = batch_matrix(b, vec_col)
        n = len(b)
        parts = []
        for t in range(n_tables):
            p = make_planes(x.shape[1] if x.size else 1, n_bits, seed=42 + t)
            sig = hyperplane_signs(x, p) if x.size else np.empty(0, np.int64)
            parts.append(
                pa.table(
                    {
                        "table_id": pa.array(np.full(n, t, np.int32)),
                        "bucket": pa.array(sig, pa.int64()),
                        id_col: b[id_col],
                        "vec": b[vec_col],
                    }
                )
            )
        return pa.concat_tables(parts) if parts else pa.table({})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        if ids.size < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        x = np.vstack(g["vec"].to_numpy())
        sims = cosine_matrix(x, x)
        i, j = np.triu_indices(ids.size, k=1)
        s = sims[i, j]
        keep = s >= threshold
        return pd.DataFrame(
            {"a": ids[i][keep], "b": ids[j][keep], "cosine": np.round(s[keep], 6)}
        )

    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("cosine", pa.float64())])
    pairs = (
        emb.map_batches(explode, batch_format="pyarrow", batch_size=None)
        .groupby(["table_id", "bucket"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(_pin(schema), batch_format="pyarrow", batch_size=None)
    )
    # a pair's cosine is table-independent, so distinct == min
    return _dedupe_pairs(pairs, schema)


# --- near-dup clustering ---------------------------------------------------
def dedup_clusters(
    docs: Dataset,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """The production dedup composition: exact n-gram-Jaccard pairs →
    connected components over the pair graph → every document labeled with
    its cluster id (the component minimum) and an ``is_canonical`` flag
    marking the one survivor per cluster. Unpaired docs are singleton
    clusters of themselves.

    Components come from the pointer-jumping contraction
    (pipelines/cc_star.py) — O(log dup-chain) bucketed shuffle rounds, so
    transitive near-dup chains (a≈b≈c with a≉c) collapse into one cluster
    exactly like a sequential union-find would.

    The label table holds only docs that HAVE a near-dup (∝ pair count),
    broadcast once via ray.put and searchsorted per batch. At a 100 TB
    corpus with a high dup rate, swap the broadcast for the bucketed
    pair⋈docs join pattern of verify_jaccard (dedup.py) — the output
    contract is unchanged.
    """
    from drone_ray.pipelines.cc_star import connected_components_star

    pairs = ngram_jaccard_near_dups(docs, threshold=threshold, n=n,
                                    id_col=id_col, text_col=text_col)
    edges = pairs.map_batches(
        lambda b: pa.table({"src": b["a"], "dst": b["b"]}),
        batch_format="pyarrow",
        batch_size=None,
    )
    labels, _rounds = connected_components_star(edges)
    # broadcast side is ∝ near-dup pair count (small by construction here);
    # see docstring for the bucketed-join swap at extreme dup rates
    lt = pa.concat_tables(labels.iter_batches(batch_format="pyarrow", batch_size=None))
    lv = lt["vid"].to_numpy() if lt.num_rows else np.empty(0, np.int64)
    lc = lt["component"].to_numpy() if lt.num_rows else np.empty(0, np.int64)
    order = np.argsort(lv)
    ref = ray.put((lv[order], lc[order]))

    def tag(b: pa.Table) -> pa.Table:
        vids, comps = ray.get(ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(vids, ids)
        safe = np.minimum(pos, max(vids.size - 1, 0))
        found = (vids.size > 0) & (pos < vids.size) & (vids[safe] == ids)
        cluster = np.where(found, comps[safe], ids)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster_id": pa.array(cluster, pa.int64()),
                "is_canonical": pa.array(cluster == ids),
            }
        )

    return docs.map_batches(tag, batch_format="pyarrow", batch_size=None)
