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

_NUM_BUCKETS = 64


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


def _partial_tf(b: pa.Table, text_col: str) -> pa.Table:
    counts: dict[str, int] = {}
    for t in b[text_col].to_pylist():
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    toks = list(counts)
    return pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "_c": pa.array([counts[t] for t in toks], pa.int64()),
            "_b": pa.array(_token_hash_bucket(toks, _NUM_BUCKETS)),
        }
    )


def term_frequencies(docs: Dataset, text_col: str = "text") -> Dataset:
    """(token, n_occurrences) over the whole corpus."""

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("token", sort=False)["_c"].sum().reset_index()
        return out.rename(columns={"_c": "n_occurrences"})

    schema = pa.schema([("token", pa.string()), ("n_occurrences", pa.int64())])
    return (
        docs.map_batches(lambda b: _partial_tf(b, text_col), batch_format="pyarrow", batch_size=None)
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
