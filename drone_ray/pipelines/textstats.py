"""Corpus-level token analytics over the documents table: vocabulary size
and term frequencies. Bucketed vectorized reduces (see stages/edges.py note
on Ray groupby at high key cardinality)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

_NUM_BUCKETS = 64  # floor — grows with est_tokens via hashing.adaptive_buckets


def _buckets(num_buckets: int | None, est_tokens: int | None) -> int:
    from drone_ray.hashing import adaptive_buckets

    return (
        num_buckets
        if num_buckets is not None
        else adaptive_buckets(est_tokens, floor=_NUM_BUCKETS)
    )


def _token_hash_bucket(tokens: list[str], num_buckets: int) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
            % num_buckets
            for t in tokens
        ),
        np.int64,
        count=len(tokens),
    )


def _partial_tf(b: pa.Table, text_col: str, num_buckets: int) -> pa.Table:
    counts: dict[str, int] = {}
    for t in b[text_col].to_pylist():
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    toks = list(counts)
    return pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "_c": pa.array([counts[t] for t in toks], pa.int64()),
            "_b": pa.array(_token_hash_bucket(toks, num_buckets)),
        }
    )


def term_frequencies(
    docs: Dataset,
    text_col: str = "text",
    num_buckets: int | None = None,
    est_tokens: int | None = None,
) -> Dataset:
    """(token, n_occurrences) over the whole corpus. Per-bucket rows are
    bounded by distinct tokens (vocabulary), so ``est_tokens`` should be a
    vocabulary-scale estimate, not corpus token occurrences."""
    nb = _buckets(num_buckets, est_tokens)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("token", sort=False)["_c"].sum().reset_index()
        return out.rename(columns={"_c": "n_occurrences"})

    schema = pa.schema([("token", pa.string()), ("n_occurrences", pa.int64())])
    return (
        docs.map_batches(lambda b: _partial_tf(b, text_col, nb), batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(
            lambda b: b.cast(schema) if b.num_columns else schema.empty_table(),
            batch_format="pyarrow",
            batch_size=None,
        )
    )


def vocabulary_size(docs: Dataset, text_col: str = "text") -> pa.Table:
    """Single row (n_distinct_tokens) — exact distinct count via the same
    bucketed shuffle (a mergeable-sketch version would swap the exact
    per-bucket set for an HLL; exact keeps the DuckDB oracle exact)."""
    n = term_frequencies(docs, text_col).count()
    return pa.table({"n_distinct_tokens": pa.array([n], pa.int64())})


def top_tokens(docs: Dataset, k: int = 50, text_col: str = "text") -> Dataset:
    """Top-k tokens by frequency, deterministic ties by token string."""
    return term_frequencies(docs, text_col).sort(
        ["n_occurrences", "token"], descending=[True, False]
    ).limit(k)


def document_frequencies(
    docs: Dataset,
    text_col: str = "text",
    num_buckets: int | None = None,
    est_tokens: int | None = None,
) -> Dataset:
    """(token, df) — number of documents containing each token. Same
    bucketed shuffle as term_frequencies, but per-batch partials count
    each (doc, token) once."""
    nb = _buckets(num_buckets, est_tokens)

    def partial(b: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in b[text_col].to_pylist():
            for w in set(t.split()):
                counts[w] = counts.get(w, 0) + 1
        toks = list(counts)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "_c": pa.array([counts[t] for t in toks], pa.int64()),
                "_b": pa.array(_token_hash_bucket(toks, nb)),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("token", sort=False)["_c"].sum().reset_index()
        return out.rename(columns={"_c": "df"})

    schema = pa.schema([("token", pa.string()), ("df", pa.int64())])
    return (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(
            lambda b: b.cast(schema) if b.num_columns else schema.empty_table(),
            batch_format="pyarrow",
            batch_size=None,
        )
    )


def tfidf_top_terms(
    docs: Dataset,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Per-document top-k terms by tf·idf, idf = ln((N+1)/(df+1)).

    Two passes: a bucketed document-frequency reduce, then the (token, idf)
    table broadcast once via ray.put and joined per batch with a
    searchsorted (sorted token array, no Python dict). Ranking is on the
    ROUNDED score (6 decimals) with token-string tiebreak, so the DuckDB
    oracle's window ordering agrees bit-for-bit — raw float ordering would
    let a last-ulp ln() difference swap two ranks.

    Scale note (100 TB): the broadcast vocabulary is the whole corpus
    vocab; cap it (min-df filter) or switch to the bucketed pair⋈docs join
    pattern when vocab ≫ worker heap. N (total docs) is a driver-side
    count() — one metadata pass.
    """
    import math

    import ray

    n_docs = docs.count()
    dft = document_frequencies(docs, text_col).to_pandas()
    toks = dft["token"].to_numpy()
    order = np.argsort(toks)
    toks_sorted = toks[order]
    idf = np.log((n_docs + 1.0) / (dft["df"].to_numpy()[order] + 1.0))
    ref = ray.put((toks_sorted, idf))

    def per_doc(b: pa.Table) -> pa.Table:
        vt, vidf = ray.get(ref)
        ids_out, tok_out, tf_out, sc_out = [], [], [], []
        doc_rep, words = [], []
        ids = b[id_col].to_pylist()
        for i, t in zip(ids, b[text_col].to_pylist()):
            ws = t.split()
            words.extend(ws)
            doc_rep.extend([i] * len(ws))
        if not words:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        wa = np.asarray(words, dtype=object)
        da = np.asarray(doc_rep, dtype=np.int64)
        # (doc, token) tf counts in one lexsort pass
        okey = np.lexsort((wa, da))
        da, wa = da[okey], wa[okey]
        new = np.empty(da.size, dtype=bool)
        new[0] = True
        new[1:] = (da[1:] != da[:-1]) | (wa[1:] != wa[:-1])
        starts = np.flatnonzero(new)
        tf = np.diff(np.append(starts, da.size))
        gd, gw = da[starts], wa[starts]
        pos = np.searchsorted(vt, gw)
        safe = np.minimum(pos, max(vt.size - 1, 0))
        found = (pos < vt.size) & (vt[safe] == gw)
        score = np.round(tf * np.where(found, vidf[safe], 0.0), 6)
        # per-doc top-k on (rounded score desc, token asc)
        okey2 = np.lexsort((gw, -score, gd))
        gd2, gw2, tf2, sc2 = gd[okey2], gw[okey2], tf[okey2], score[okey2]
        gstart = np.flatnonzero(np.concatenate(([True], gd2[1:] != gd2[:-1])))
        rank = np.arange(gd2.size) - np.repeat(gstart, np.diff(np.append(gstart, gd2.size)))
        keep = rank < k
        return pa.table(
            {
                id_col: pa.array(gd2[keep], pa.int64()),
                "token": pa.array(list(gw2[keep]), pa.string()),
                "tf": pa.array(tf2[keep], pa.int64()),
                "score": pa.array(sc2[keep], pa.float64()),
            }
        )

    schema = pa.schema(
        [(id_col, pa.int64()), ("token", pa.string()), ("tf", pa.int64()), ("score", pa.float64())]
    )
    return docs.map_batches(per_doc, batch_format="pyarrow", batch_size=None)


_HLL_P = 14  # 2^14 registers → ~0.8% standard error, 16 KiB per partial


def _hll_partial(tokens_hash: np.ndarray, m: int) -> np.ndarray:
    """HyperLogLog register array from uint64 hashes: bucket = low p bits,
    rank = 1 + leading-zero count of the remaining 64−p bits."""
    p = int(np.log2(m))
    bucket = (tokens_hash & np.uint64(m - 1)).astype(np.int64)
    rest = tokens_hash >> np.uint64(p)
    width = 64 - p
    # rank = width - floor(log2(rest)) for rest>0, else width+1
    nz = rest > 0
    rank = np.full(tokens_hash.size, width + 1, dtype=np.int64)
    if nz.any():
        # float64 log2 is exact for the leading-bit position of <2^53
        # values; 50-bit rest values fit
        rank[nz] = width - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
    regs = np.zeros(m, dtype=np.int64)
    np.maximum.at(regs, bucket, rank)
    return regs


def vocabulary_hll(docs: Dataset, text_col: str = "text") -> pa.Table:
    """Approximate distinct-token count via HyperLogLog — the mergeable
    sketch a 100 TB corpus needs where the exact bucketed shuffle
    (vocabulary_size) would move the whole token set: each batch emits one
    16 KiB register array, merged by a per-register max (associative and
    commutative, so any merge tree gives the identical sketch —
    parallelism-invariant by construction). Deterministic hashing
    (blake2-seeded siphash via pandas hash_array), no RNG. Standard error
    ~0.8% at 2^14 registers; the pytest gate bounds the estimate against
    the exact count."""
    import pandas as _pd

    m = 1 << _HLL_P

    def partial(b: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in b[text_col].to_pylist():
            toks.extend(t.split())
        if not toks:
            regs = np.zeros(m, dtype=np.int64)
        else:
            th = _pd.util.hash_array(np.asarray(toks, dtype=object)).astype(np.uint64)
            regs = _hll_partial(th, m)
        return pa.table({"regs": pa.array([regs.tolist()])})

    merged = np.zeros(m, dtype=np.int64)
    for b in docs.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for row in b["regs"].to_pylist():
            merged = np.maximum(merged, np.asarray(row, dtype=np.int64))

    # standard HLL estimator with the small-range (linear counting) fix
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -merged.astype(np.float64)))
    zeros = int((merged == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return pa.table(
        {
            "n_distinct_tokens_hll": pa.array([int(round(est))], pa.int64()),
            "registers": pa.array([m], pa.int64()),
        }
    )


def bpe_train(
    docs: Dataset,
    n_merges: int = 20,
    num_shards: int = 8,
    text_col: str = "text",
    est_tokens: int | None = None,
) -> pa.Table:
    """Distributed BPE tokenizer training (Sennrich, Haddow & Birch, "Neural
    machine translation of rare words with subword units", ACL 2016),
    GPT-2-style: merges never cross word boundaries, so training runs on
    the corpus WORD-FREQUENCY table, not the raw text — the standard
    trainer trick that makes 100 TB feasible (the word table is
    vocabulary-sized). Returns the learned merge table, one row per rank:
    (rank, left, right, merged, count).

    Shape: one bucketed shuffle builds (word, count) via term_frequencies;
    the table is then .split() across ``num_shards`` raw Ray actors that
    hold their shard's symbolized words IN-ACTOR across rounds — the
    legitimate escape hatch from the Dataset API, since per-round mutable
    state (apply last merge, recount pairs) is exactly what map_batches
    cannot persist. Each round ships only per-shard pair-count dicts
    (O(active pairs)) to the driver, which takes the argmax with a
    deterministic tie-break (max count, then lexicographically smallest
    pair) and broadcasts the merge. Driver memory = the global pair-count
    dict — the same profile as every reference BPE trainer; the corpus
    itself is never revisited after the single TF pass."""
    import ray

    tf = term_frequencies(docs, text_col, est_tokens=est_tokens)
    shards = tf.split(num_shards)

    @ray.remote
    class _BPEShard:
        def __init__(self, ds):
            words: list[str] = []
            counts: list[int] = []
            for b in ds.iter_batches(batch_format="pyarrow"):
                words.extend(b["token"].to_pylist())
                counts.extend(b["n_occurrences"].to_pylist())
            self.syms = [tuple(w) for w in words]
            self.counts = counts

        def pair_counts(self):
            pc: dict = {}
            for s, c in zip(self.syms, self.counts):
                for a, b in zip(s, s[1:]):
                    k = (a, b)
                    pc[k] = pc.get(k, 0) + c
            return pc

        def apply(self, a, b):
            m = a + b
            out = []
            for s in self.syms:
                i, ns = 0, []
                n = len(s)
                while i < n:
                    if i + 1 < n and s[i] == a and s[i + 1] == b:
                        ns.append(m)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                out.append(tuple(ns))
            self.syms = out
            return True

    actors = [_BPEShard.remote(s) for s in shards]
    try:
        rows = []
        for rank in range(n_merges):
            total: dict = {}
            for d in ray.get([a.pair_counts.remote() for a in actors]):
                for k, v in d.items():
                    total[k] = total.get(k, 0) + v
            if not total:
                break
            (a, b), c = min(total.items(), key=lambda kv: (-kv[1], kv[0]))
            rows.append((rank, a, b, a + b, int(c)))
            ray.get([x.apply.remote(a, b) for x in actors])
    finally:
        for x in actors:
            ray.kill(x)
    return pa.table(
        {
            "rank": pa.array([r[0] for r in rows], pa.int64()),
            "left": pa.array([r[1] for r in rows], pa.string()),
            "right": pa.array([r[2] for r in rows], pa.string()),
            "merged": pa.array([r[3] for r in rows], pa.string()),
            "count": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def unigram_perplexity(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
    est_tokens: int | None = None,
) -> Dataset:
    """Per-document unigram language-model perplexity over the corpus's own
    token distribution — the CCNet-style quality signal (Wenzek et al.,
    "CCNet: extracting high-quality monolingual datasets from web crawl
    data", LREC 2020, uses KenLM perplexity; the unigram LM is its
    order-1, fully-SQL-attestable form):

        ppl(d) = exp(−(1/|d|) Σ_t log(count(t) / N))

    No smoothing needed: the model is trained on the same corpus it
    scores, so every token is in-vocabulary by construction. Returns
    (doc_id, n_tokens, unigram_ppl) for non-empty documents.

    Shape: the term-frequency table (one bucketed shuffle, materialized —
    it is read twice: the total-count aggregate and the join) joins the
    exploded (token, doc) occurrence rows inside hash(token) buckets —
    the two-sided tagged-union join every degree-attach here uses, never
    a broadcast of the O(vocabulary) model. Per-doc partials pre-aggregate
    inside the token bucket, so the second (doc-keyed) shuffle carries at
    most one row per (doc, token-bucket)."""
    nb = _buckets(num_buckets, est_tokens)
    tf = term_frequencies(docs, text_col, num_buckets=num_buckets,
                          est_tokens=est_tokens).materialize()
    total = float(tf.sum("n_occurrences") or 0.0)

    mid = pa.schema(
        [
            ("token", pa.string()),
            (id_col, pa.int64()),
            ("k", pa.int64()),  # occurrences of token in doc (0 = model row)
            ("c", pa.int64()),  # corpus count (model rows only)
            ("_b", pa.int64()),
        ]
    )

    def doc_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or id_col not in b.schema.names:
            return mid.empty_table()
        toks: list[str] = []
        ids: list[int] = []
        ks: list[int] = []
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            cnt: dict[str, int] = {}
            for w in t.split():
                cnt[w] = cnt.get(w, 0) + 1
            toks.extend(cnt)
            ids.extend([i] * len(cnt))
            ks.extend(cnt.values())
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                id_col: pa.array(ids, pa.int64()),
                "k": pa.array(ks, pa.int64()),
                "c": pa.array(np.zeros(len(toks), np.int64)),
                "_b": pa.array(_token_hash_bucket(toks, nb)),
            }
        )

    def model_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "token" not in b.schema.names:
            return mid.empty_table()
        toks = b["token"].to_pylist()
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                id_col: pa.array(np.full(len(toks), -1, np.int64)),
                "k": pa.array(np.zeros(len(toks), np.int64)),
                "c": b["n_occurrences"],
                "_b": pa.array(_token_hash_bucket(toks, nb)),
            }
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        model = g[g["c"] > 0]
        logp = dict(
            zip(model["token"], np.log(model["c"].to_numpy(np.float64) / total))
        )
        d = g[g["k"] > 0]
        if len(d) == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "lp": pd.Series([], dtype=np.float64),
                 "nt": pd.Series([], dtype=np.int64),
                 "_b2": pd.Series([], dtype=np.int64)}
            )
        k = d["k"].to_numpy(np.float64)
        lp = k * np.fromiter((logp[t] for t in d["token"]), np.float64, len(d))
        out = (
            pd.DataFrame({id_col: d[id_col].to_numpy(), "lp": lp,
                          "nt": d["k"].to_numpy()})
            .groupby(id_col, sort=False).sum().reset_index()
        )
        from drone_ray.hashing import mix64

        out["_b2"] = (
            mix64(out[id_col].to_numpy()) % np.uint64(nb)
        ).astype(np.int64)
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(id_col, sort=False).agg(
            lp=("lp", "sum"), nt=("nt", "sum")
        ).reset_index()
        return pd.DataFrame(
            {
                id_col: agg[id_col],
                "n_tokens": agg["nt"].astype(np.int64),
                "unigram_ppl": np.round(
                    np.exp(-agg["lp"].to_numpy() / agg["nt"].to_numpy()), 4
                ),
            }
        )

    schema = pa.schema(
        [(id_col, pa.int64()), ("n_tokens", pa.int64()),
         ("unigram_ppl", pa.float64())]
    )
    return (
        docs.map_batches(doc_rows, batch_format="pyarrow", batch_size=None)
        .union(tf.map_batches(model_rows, batch_format="pyarrow", batch_size=None))
        .groupby("_b")
        .map_groups(attach, batch_format="pandas")
        .groupby("_b2")
        .map_groups(finish, batch_format="pandas")
        .map_batches(
            lambda b: b.cast(schema) if b.num_columns else schema.empty_table(),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
