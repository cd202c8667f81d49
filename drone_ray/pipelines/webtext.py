"""Webtext-cleaning operators a Common-Crawl-scale training-data pipeline
runs between extraction and tokenization:

  * chunk_dedup       -- CCNet-style corpus-level boilerplate removal:
                         fixed-width token chunks deduped corpus-wide; the
                         first occurrence in (doc_id, chunk_id) order wins,
                         every later identical chunk is dropped and the doc
                         text is reassembled from its surviving chunks.
  * pii_scrub         -- email / IPv4 / phone redaction with per-category
                         counts. Patterns are RE2-compatible (explicit
                         [0-9], no lookaround) so DuckDB regexp_replace /
                         regexp_extract_all is an exact oracle.
  * repetition_stats  -- Gopher-style repetition signals per document
                         (top-token fraction, top-bigram fraction) plus a
                         thresholded keep flag.

Scale notes: pii_scrub and repetition_stats are stateless vectorized-batch
map_batches (per-doc token work is inherently per-row, as in
functions/text.py). chunk_dedup is two bucketed shuffles -- chunk-hash
buckets to pick winners, doc buckets to reassemble -- with one vectorized
pass per bucket and no driver-side state; memory per task is one bucket.
The reference engine has no cleaning stages (it consumes pre-built edge
lists); these extend the engine for the LLM-training-data mandate.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from drone_ray.pipelines._util import pin_schema as _pin

CHUNK_W = 16
_NUM_BUCKETS = 32

# --- PII patterns (identical semantics in Python re and DuckDB's RE2:
#     leftmost-first, greedy, ASCII classes only) ---------------------------
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PAT = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_PAT = r"\b[0-9]{3}-[0-9]{4}\b"

_EMAIL_RE = re.compile(EMAIL_PAT)
_IPV4_RE = re.compile(IPV4_PAT)
_PHONE_RE = re.compile(PHONE_PAT)


def scrub_pii_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Redact emails -> IPv4s -> phones (in that order: each count is taken
    on the text AFTER the previous substitution, mirroring the nested
    regexp_replace oracle exactly)."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    n_emails = np.empty(n, np.int64)
    n_ips = np.empty(n, np.int64)
    n_phones = np.empty(n, np.int64)
    clean = []
    for i, t in enumerate(texts):
        t, n_emails[i] = _EMAIL_RE.subn("<EMAIL>", t)
        t, n_ips[i] = _IPV4_RE.subn("<IP>", t)
        t, n_phones[i] = _PHONE_RE.subn("<PHONE>", t)
        clean.append(t)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_emails": pa.array(n_emails),
            "n_ips": pa.array(n_ips),
            "n_phones": pa.array(n_phones),
            "text_clean": pa.array(clean, pa.string()),
        }
    )


def pii_scrub(docs: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """(doc_id, n_emails, n_ips, n_phones, text_clean) per document."""
    return docs.map_batches(
        lambda b: scrub_pii_batch(b, id_col, text_col),
        batch_format="pyarrow",
        batch_size=None,
    )


# --- Gopher-style repetition signals ---------------------------------------
def repetition_stats_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Per doc: n_tokens, top_token_frac = max token count / n_tokens,
    top_bigram_frac = max bigram count / (n_tokens - 1), and keep = 1 iff
    n_tokens >= 10 AND top_token_frac <= 0.2 AND top_bigram_frac <= 0.15.
    Fractions are raw IEEE divisions (NOT rounded): double division of the
    same integers is bit-identical in numpy and DuckDB, whereas round()
    half-tie semantics differ between Python and SQL."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    n_tokens = np.zeros(n, np.int64)
    ttf = np.zeros(n, np.float64)
    tbf = np.zeros(n, np.float64)
    for i, t in enumerate(texts):
        tk = t.split()
        nt = len(tk)
        n_tokens[i] = nt
        if nt:
            ttf[i] = max(Counter(tk).values()) / nt
        if nt >= 2:
            tbf[i] = max(Counter(zip(tk, tk[1:])).values()) / (nt - 1)
    keep = ((n_tokens >= 10) & (ttf <= 0.2) & (tbf <= 0.15)).astype(np.int64)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tokens),
            "top_token_frac": pa.array(ttf),
            "top_bigram_frac": pa.array(tbf),
            "keep": pa.array(keep),
        }
    )


def repetition_stats(docs: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    return docs.map_batches(
        lambda b: repetition_stats_batch(b, id_col, text_col),
        batch_format="pyarrow",
        batch_size=None,
    )


# --- corpus-level chunk dedup ----------------------------------------------
def _chunk_bucket(chunks: list[str], num_buckets: int) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(c.encode(), digest_size=8).digest(), "big")
            % num_buckets
            for c in chunks
        ),
        np.int64,
        count=len(chunks),
    )


def chunk_dedup(
    docs: Dataset,
    width: int = CHUNK_W,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
    est_chunks: int | None = None,
) -> Dataset:
    """Corpus-wide duplicate-chunk removal (CCNet paragraph dedup adapted to
    fixed ``width``-token chunks, since the corpus has no line structure).
    ``num_buckets`` derives from ``est_chunks`` (≈ corpus tokens / width)
    via hashing.adaptive_buckets unless pinned.

    Returns one row per input doc: (doc_id, n_chunks, n_kept, text_clean)
    where text_clean is the space-join of the doc's surviving chunks in
    chunk order. A chunk survives iff its (doc_id, chunk_id) is the
    lexicographically smallest occurrence of that exact chunk text in the
    corpus -- so shared boilerplate survives only in the first doc that
    carries it, and within-doc repeats collapse to the first copy.
    """
    from drone_ray.hashing import adaptive_buckets

    if num_buckets is None:
        num_buckets = adaptive_buckets(est_chunks, floor=_NUM_BUCKETS)

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        out_id, out_cid, out_chunk = [], [], []
        for i, t in zip(ids, b[text_col].to_pylist()):
            tk = t.split()
            for c in range(0, (len(tk) + width - 1) // width):
                out_id.append(i)
                out_cid.append(c)
                out_chunk.append(" ".join(tk[c * width : (c + 1) * width]))
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "chunk_id": pa.array(out_cid, pa.int64()),
                "chunk": pa.array(out_chunk, pa.string()),
                "_b": pa.array(_chunk_bucket(out_chunk, num_buckets)),
            }
        )

    def mark_winners(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per chunk-hash bucket: first (doc, chunk_id)
        # occurrence of each distinct chunk string keeps, the rest drop
        ch = g["chunk"].to_numpy()
        ids = g[id_col].to_numpy()
        cid = g["chunk_id"].to_numpy()
        order = np.lexsort((cid, ids, ch))
        keep_sorted = np.empty(len(g), dtype=bool)
        keep_sorted[:1] = True
        keep_sorted[1:] = ch[order][1:] != ch[order][:-1]
        keep = np.empty(len(g), dtype=bool)
        keep[order] = keep_sorted
        return pd.DataFrame(
            {
                id_col: ids,
                "chunk_id": cid,
                "chunk": ch,
                "keep": keep,
                "_db": ids % num_buckets,
            }
        )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-doc run boundaries; the string join per doc is the
        # only (unavoidable) Python step
        ids = g[id_col].to_numpy()
        cid = g["chunk_id"].to_numpy()
        order = np.lexsort((cid, ids))
        ids, cid = ids[order], cid[order]
        keep = g["keep"].to_numpy()[order]
        ch = g["chunk"].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        ends = np.r_[starts[1:], ids.size]
        n_kept = np.add.reduceat(keep.astype(np.int64), starts)
        texts = [
            " ".join(ch[i] for i in range(s, e) if keep[i])
            for s, e in zip(starts, ends)
        ]
        return pd.DataFrame(
            {
                id_col: ids[starts],
                "n_chunks": ends - starts,
                "n_kept": n_kept,
                "text_clean": texts,
            }
        )

    schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("n_chunks", pa.int64()),
            ("n_kept", pa.int64()),
            ("text_clean", pa.string()),
        ]
    )

    deduped = (
        docs.map_batches(explode, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(mark_winners, batch_format="pandas")
        .groupby("_db")
        .map_groups(assemble, batch_format="pandas")
        .map_batches(_pin(schema), batch_format="pyarrow", batch_size=None)
    )

    # zero-token docs produce no chunk rows -- union their empty results so
    # every input doc appears exactly once in the output
    def empties(b: pa.Table) -> pa.Table:
        ids = [
            i
            for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist())
            if not t.split()
        ]
        k = len(ids)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_chunks": pa.array([0] * k, pa.int64()),
                "n_kept": pa.array([0] * k, pa.int64()),
                "text_clean": pa.array([""] * k, pa.string()),
            }
        )

    empty_docs = docs.map_batches(empties, batch_format="pyarrow", batch_size=None)
    return deduped.union(empty_docs)


def decontaminate(
    docs,
    bench_mod: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Benchmark decontamination: score every document's 3-gram overlap
    against a benchmark set (here the deterministic subset doc_id %
    bench_mod == 0, standing in for an eval suite). The benchmark's
    distinct shingle hashes are collected once and broadcast via ray.put —
    benchmark suites are small by nature (thousands of documents), which
    is what makes the broadcast the right shape even at a 100 TB corpus;
    the corpus side stays a stateless streaming map.

    Shingles are the oracle-grade md5 of the shingle STRING
    (functions.minhash.md5_lower64 == DuckDB md5_number_lower), so the
    whole scoring chain is driver-attested SQL (queries._DECONTAM_SQL).
    Output: (doc_id, n_shingles, n_overlap, contamination, is_benchmark).
    """
    import numpy as np
    import pyarrow as pa

    import ray

    from drone_ray.functions.minhash import md5_lower64, shingle_strings

    def bench_part(b: pa.Table) -> pa.Table:
        out = set()
        ids = b[id_col].to_pylist()
        for i, t in zip(ids, b[text_col].to_pylist()):
            if i % bench_mod == 0:
                for s in shingle_strings(t, 3):
                    out.add(md5_lower64(s))
        return pa.table({"h": pa.array(sorted(out), pa.uint64())})

    bench_hashes = np.unique(
        docs.map_batches(bench_part, batch_format="pyarrow", batch_size=None)
        .to_pandas()["h"]
        .to_numpy()
        .astype(np.uint64)
    )
    ref = ray.put(bench_hashes)

    def score(b: pa.Table) -> pa.Table:
        bh = ray.get(ref)
        ids = b[id_col].to_pylist()
        nsh, nov = [], []
        for t in b[text_col].to_pylist():
            hs = np.unique(
                np.array(
                    [md5_lower64(s) for s in shingle_strings(t, 3)], dtype=np.uint64
                )
            )
            nsh.append(int(hs.size))
            if hs.size and bh.size:
                pos = np.searchsorted(bh, hs)
                safe = np.minimum(pos, bh.size - 1)
                nov.append(int(((pos < bh.size) & (bh[safe] == hs)).sum()))
            else:
                nov.append(0)
        ids_np = np.asarray(ids, dtype=np.int64)
        nsh_np = np.asarray(nsh, dtype=np.int64)
        nov_np = np.asarray(nov, dtype=np.int64)
        frac = np.where(nsh_np > 0, nov_np / np.maximum(nsh_np, 1), 0.0)
        return pa.table(
            {
                id_col: pa.array(ids_np, pa.int64()),
                "n_shingles": pa.array(nsh_np, pa.int64()),
                "n_overlap": pa.array(nov_np, pa.int64()),
                "contamination": pa.array(np.round(frac, 6), pa.float64()),
                "is_benchmark": pa.array(ids_np % bench_mod == 0),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", batch_size=None)


def corpus_clean(
    docs: Dataset,
    *,
    width: int = CHUNK_W,
    id_col: str = "doc_id",
    text_col: str = "text",
    est_chunks: int | None = None,
) -> Dataset:
    """The composed cleaning chain a training-data pipeline actually runs,
    end-to-end: PII scrub → Gopher repetition gate → corpus-wide chunk
    dedup. One row per SURVIVING document:
    (doc_id, n_chunks, n_kept, text_clean).

    Stage shape: the scrub and the gate are per-row functions, so they are
    FUSED into one stateless map_batches pass (no intermediate shuffle,
    dropped docs never enter the exchange); the only all-to-all work is
    chunk_dedup's two bucketed shuffles over the surviving corpus."""

    def scrub_and_gate(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        out_ids, out_txt = [], []
        for i, t in zip(ids, texts):
            t, _ = _EMAIL_RE.subn("<EMAIL>", t)
            t, _ = _IPV4_RE.subn("<IP>", t)
            t, _ = _PHONE_RE.subn("<PHONE>", t)
            tk = t.split()
            nt = len(tk)
            if nt < 10:
                continue
            if max(Counter(tk).values()) / nt > 0.2:
                continue
            if max(Counter(zip(tk, tk[1:])).values()) / (nt - 1) > 0.15:
                continue
            out_ids.append(i)
            out_txt.append(t)
        return pa.table(
            {
                id_col: pa.array(out_ids, pa.int64()),
                text_col: pa.array(out_txt, pa.string()),
            }
        )

    survivors = docs.map_batches(scrub_and_gate, batch_format="pyarrow", batch_size=None)
    return chunk_dedup(
        survivors, width=width, id_col=id_col, text_col=text_col, est_chunks=est_chunks
    )


PACK_BUDGET = 2048  # tokens per packed training sequence
PACK_BUCKETS = 16  # gate-scale stream-shard count (production: adaptive)


def pack_sequences(
    docs: Dataset,
    *,
    budget: int = PACK_BUDGET,
    num_buckets: int | None = None,
    est_rows: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Pretraining sequence packing by deterministic concat-and-chunk: shard
    the corpus into ``num_buckets`` independent token streams (shard =
    md5(doc_id) % B — the order-free equivalent of "shuffle, then
    concatenate"), lay each shard's documents end-to-end in (md5 priority,
    doc_id) order, and cut the stream every ``budget`` tokens. One row per
    non-empty document:

        (doc_id, bucket, seq, tok_offset, n_seqs, n_tokens)

    where ``seq`` is the within-shard index of the packed sequence the
    document STARTS in, ``tok_offset`` its token offset inside that
    sequence, and ``n_seqs`` how many consecutive sequences it spans
    (documents longer than the residual budget wrap — the standard
    GPT-style "concat + chunk" packing, not padding-based binning).

    Every quantity is a pure function of (doc_id, n_tokens) and the md5
    order, so the whole packer is SQL-attestable as one window cumsum —
    no RNG, reproducible at any parallelism. Scale shape: one stateless
    map_batches (token count + priority) and ONE hash(bucket) shuffle;
    each shard packs independently inside its group, which is exactly how
    a 100-TB tokenization job shards its output anyway. Token counts use
    the whitespace convention of functions/text.token_stats_batch."""
    from drone_ray.functions.minhash import md5_lower64
    from drone_ray.hashing import adaptive_buckets

    if num_buckets is None:
        num_buckets = adaptive_buckets(est_rows, floor=PACK_BUCKETS)

    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("bucket", pa.int64()),
            ("seq", pa.int64()),
            ("tok_offset", pa.int64()),
            ("n_seqs", pa.int64()),
            ("n_tokens", pa.int64()),
        ]
    )
    mid_schema = pa.schema(
        [(id_col, pa.int64()), ("n_tokens", pa.int64()), ("_p", pa.uint64()), ("_b", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or id_col not in b.schema.names:
            return mid_schema.empty_table()
        ids = b[id_col].to_numpy(zero_copy_only=False)
        texts = b[text_col].to_pylist()
        nt = np.fromiter((len(t.split()) for t in texts), np.int64, len(texts))
        pr = np.fromiter(
            (md5_lower64(f"sp-{i}") for i in ids), np.uint64, len(ids)
        )
        keep = nt > 0  # empty docs contribute no tokens to any stream
        ids, nt, pr = ids[keep], nt[keep], pr[keep]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(nt),
                "_p": pa.array(pr, pa.uint64()),
                "_b": pa.array((pr % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or id_col not in g.columns:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64) for c in out_schema.names}
            )
        i = g[id_col].to_numpy()
        n = g["n_tokens"].to_numpy()
        p = g["_p"].to_numpy()
        bk = g["_b"].to_numpy()
        order = np.lexsort((i, p))
        i, n, p, bk = i[order], n[order], p[order], bk[order]
        cum = np.cumsum(n) - n  # exclusive prefix: tokens before this doc
        seq = cum // budget
        return pd.DataFrame(
            {
                id_col: i,
                "bucket": bk,
                "seq": seq,
                "tok_offset": cum % budget,
                "n_seqs": (cum + n - 1) // budget - seq + 1,
                "n_tokens": n,
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(pack, batch_format="pandas")
        .map_batches(_pin(out_schema), batch_format="pyarrow", batch_size=None)
    )


SPLIT_BINS = ((80, "train"), (90, "val"), (100, "test"))  # md5 % 100 cutoffs


def corpus_split(
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    strat_col: str = "lang",
) -> Dataset:
    """Deterministic train/val/test split report, stratified by
    ``strat_col``: each document lands in the bin of md5(doc_id) % 100
    (80/10/10 — hash-based so membership is reproducible at any
    parallelism, under resharding, and in SQL), and the report is one row
    per (split, stratum): (split, lang, n_docs, n_tokens). The per-doc
    assignment never materializes anywhere — each batch pre-aggregates to
    at most 3×|strata| partial rows and a tiny groupby finishes, so the
    driver-visible state is O(splits × strata) at any corpus size."""
    from drone_ray.functions.minhash import md5_lower64

    mid = pa.schema(
        [
            ("split", pa.string()),
            (strat_col, pa.string()),
            ("n_docs", pa.int64()),
            ("n_tokens", pa.int64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or id_col not in b.schema.names:
            return mid.empty_table()
        ids = b[id_col].to_numpy(zero_copy_only=False)
        texts = b[text_col].to_pylist()
        strata = b[strat_col].to_pylist()
        nt = np.fromiter((len(t.split()) for t in texts), np.int64, len(texts))
        h = np.fromiter(
            (md5_lower64(f"split-{i}") % 100 for i in ids), np.int64, len(ids)
        )
        split = np.full(len(ids), "test", dtype=object)
        split[h < SPLIT_BINS[1][0]] = "val"
        split[h < SPLIT_BINS[0][0]] = "train"
        df = pd.DataFrame(
            {"split": split, strat_col: strata, "n_docs": 1, "n_tokens": nt}
        )
        agg = (
            df.groupby(["split", strat_col], sort=False)
            .agg(n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(agg, schema=mid, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["split", strat_col], sort=False)
            .agg(n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"))
            .reset_index()
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["split", strat_col])
        .map_groups(finish, batch_format="pandas")
        .map_batches(_pin(mid), batch_format="pyarrow", batch_size=None)
    )


def domain_mix(
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_cols: tuple = ("lang", "source"),
) -> pa.Table:
    """Domain-mixing report: per (lang, source) domain, document/token
    counts, the domain's token share, and the resampling weight that would
    equalize token mass across domains (``mix_weight = (1/G) / share`` —
    sample-with-weight w makes every domain contribute 1/G of the mixed
    corpus, the standard baseline before tuned mixture rates à la
    DoReMi/The Pile). One stateless pre-aggregating pass + a tiny
    O(domains) reduce; the driver only ever holds G rows."""
    gc = list(group_cols)
    mid = pa.schema(
        [(c, pa.string()) for c in gc]
        + [("n_docs", pa.int64()), ("n_tokens", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or text_col not in b.schema.names:
            return mid.empty_table()
        nt = np.fromiter(
            (len(t.split()) for t in b[text_col].to_pylist()), np.int64, b.num_rows
        )
        df = pd.DataFrame({c: b[c].to_pylist() for c in gc})
        df["n_docs"] = 1
        df["n_tokens"] = nt
        agg = df.groupby(gc, sort=False).sum().reset_index()
        return pa.Table.from_pandas(agg, schema=mid, preserve_index=False)

    def reduce_groups(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(gc, sort=False).sum().reset_index()

    small = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(gc)
        .map_groups(reduce_groups, batch_format="pandas")
        .to_pandas()  # O(domains) rows — the only driver materialization
    )
    total = float(small["n_tokens"].sum())
    G = len(small)
    if G == 0:
        return pa.schema(
            [(c, pa.string()) for c in gc]
            + [("n_docs", pa.int64()), ("n_tokens", pa.int64()),
               ("token_share", pa.float64()), ("mix_weight", pa.float64())]
        ).empty_table()
    nt = small["n_tokens"].to_numpy(np.float64)
    # all-empty corpus: shares/weights are 0-vectors of length G, not scalars
    share = nt / total if total else np.zeros(G, np.float64)
    w = np.where(share > 0, (1.0 / G) / np.where(share > 0, share, 1.0), 0.0)
    out = {c: pa.array(small[c], pa.string()) for c in gc}
    out["n_docs"] = pa.array(small["n_docs"], pa.int64())
    out["n_tokens"] = pa.array(small["n_tokens"], pa.int64())
    # half-away rounding to the 1e-6 grid (DuckDB round(); exact-tie hazard
    # as in graphstats.jaccard_pairs)
    out["token_share"] = pa.array(np.floor(share * 1e6 + 0.5) / 1e6, pa.float64())
    out["mix_weight"] = pa.array(np.floor(w * 1e6 + 0.5) / 1e6, pa.float64())
    return pa.table(out)
