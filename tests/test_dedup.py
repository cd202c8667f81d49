"""Dedup family: exact vs pandas, MinHash-LSH vs brute-force Jaccard,
SimHash banding guarantee, embedding near-dup exact vs numpy."""

import itertools

import numpy as np
import pytest
import pyarrow as pa

from drone_ray.functions.minhash import MinHasher, hamming64, jaccard, simhash64_md5, word_shingles
from drone_ray.functions.vectors import cosine_matrix
from drone_ray.pipelines.dedup import (
    embedding_near_dups_exact,
    exact_dedup,
    minhash_near_dups,
    simhash_near_dups,
)

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _docs(seed=0, n=60, dup_groups=8):
    """Synthetic docs with planted near-duplicates (small token edits)."""
    rng = np.random.default_rng(seed)
    texts = []
    for g in range(dup_groups):
        base = " ".join(rng.choice(WORDS, 30).tolist())
        texts.append(base)
        # near-dup: swap one word
        toks = base.split()
        toks[5] = WORDS[g % len(WORDS)]
        texts.append(" ".join(toks))
        # exact dup
        texts.append(base)
    while len(texts) < n:
        texts.append(" ".join(rng.choice(WORDS, 30).tolist()))
    ids = list(range(len(texts)))
    return ids, texts


def _ds(ids, texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))


def test_exact_dedup_groups():
    ids, texts = _docs()
    out = exact_dedup(_ds(ids, texts)).to_pandas()
    # planted: one exact dup per group
    from collections import Counter

    exp = Counter(texts)
    got = dict(zip(out["fp"], out["n_dups"]))
    assert sorted(got.values()) == sorted(exp.values())
    # representative id is the min of each duplicate set
    for _, row in out.iterrows():
        dups = [i for i, t in zip(ids, texts) if t == texts[row["doc_id"]]]
        assert row["doc_id"] == min(dups)


def test_minhash_lsh_finds_planted_near_dups():
    ids, texts = _docs()
    got = minhash_near_dups(_ds(ids, texts), threshold=0.5).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    # brute-force oracle: all pairs with true jaccard >= 0.5
    sh = [word_shingles(t, 3) for t in texts]
    exp_pairs = {
        (a, b)
        for a, b in itertools.combinations(ids, 2)
        if jaccard(sh[a], sh[b]) >= 0.5
    }
    # no false positives (verification is exact) …
    assert got_pairs <= exp_pairs
    # … and full recall for the planted high-similarity pairs: 16 bands of
    # 8 rows hit j≥0.85 with prob ≈1-(1-0.85^8)^16 > 0.99. Borderline pairs
    # (j barely over 0.5) have ~6% band-hit probability and may legitimately
    # be missed — approximate by design.
    strong = {
        (a, b)
        for a, b in itertools.combinations(ids, 2)
        if jaccard(sh[a], sh[b]) >= 0.85
    }
    assert strong <= got_pairs
    # reported jaccard values are the exact ones
    for _, r in got.iterrows():
        assert abs(r["jaccard"] - jaccard(sh[int(r["a"])], sh[int(r["b"])])) < 1e-6


def test_minhash_signature_similarity_estimate():
    mh = MinHasher(num_perm=256)
    a = word_shingles("the quick brown fox jumps over the lazy dog " * 5, 3)
    b = word_shingles("the quick brown fox leaps over the lazy dog " * 5, 3)
    sa, sb = mh.signature(a), mh.signature(b)
    est = (sa == sb).mean()
    true = jaccard(a, b)
    assert abs(est - true) < 0.15


def test_simhash_near_dups():
    ids, texts = _docs()
    out = simhash_near_dups(_ds(ids, texts), max_hamming=3).to_pandas()
    # the pipeline hashes with the oracle-grade md5 variant (matches
    # queries._SIMHASH_SQL); the brute-force expectation must too
    hs = np.array([simhash64_md5(t) for t in texts], dtype=np.uint64)
    exp = {
        (a, b): int(hamming64(hs[a : a + 1], hs[b : b + 1])[0])
        for a, b in itertools.combinations(ids, 2)
        if hamming64(hs[a : a + 1], hs[b : b + 1])[0] <= 3
    }
    got = {(r["a"], r["b"]): r["hamming"] for _, r in out.iterrows()}
    assert got == exp  # banding is exact for hamming <= bands-1


def test_embedding_near_dup_exact_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((80, 16))
    x[40] = x[10] + 0.01 * rng.standard_normal(16)  # planted near-dup
    ids = np.arange(80, dtype=np.int64)
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"vec_id": ids, "embedding": pa.array(x.tolist(), pa.list_(pa.float32()))})
    )
    out = embedding_near_dups_exact(ds, threshold=0.8).to_pandas()
    xs = np.array(pa.table({"e": pa.array(x.tolist(), pa.list_(pa.float32()))})["e"].to_pylist())
    sims = cosine_matrix(xs.astype(np.float64), xs.astype(np.float64))
    i, j = np.triu_indices(80, 1)
    exp = {(int(a), int(b)) for a, b in zip(i[sims[i, j] >= 0.8], j[sims[i, j] >= 0.8])}
    assert set(zip(out["a"], out["b"])) == exp
    assert (10, 40) in exp


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_exact_matches_sql_oracle():
    """Exact 3-gram Jaccard pairs must equal the DuckDB oracle bit-for-bit
    (this operator is the dedup family's oracle-able ground truth)."""
    import duckdb

    import ray.data as rd

    from drone_ray.pipelines.dedup import ngram_jaccard_near_dups
    from drone_ray.pipelines.queries import REGISTRY

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy cat",
                "completely different text with no overlap here",
                "  the quick brown fox jumps over the lazy dog  ",
                "short one",  # < 3 tokens: no shingles
                "",
            ],
        }
    )
    got = (
        ngram_jaccard_near_dups(rd.from_arrow(docs), threshold=0.5, num_buckets=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = (
        con.execute(REGISTRY["ngram_jaccard_near_dup"][1])
        .df()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert got["a"].tolist() == want["a"].tolist()
    assert got["b"].tolist() == want["b"].tolist()
    assert got["jaccard"].tolist() == want["jaccard"].tolist()


def test_dedup_clusters_transitive():
    """a≈b and b≈c (but a≉c) must land in ONE cluster with min-id canonical;
    unpaired docs are singleton clusters."""
    from drone_ray.pipelines.dedup import dedup_clusters

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    texts = [
        base,                                     # 0: chains with 1
        base + " extra tail words here",          # 1: chains with 0 and 2
        base + " extra tail words here now ok",   # 2: chains with 1
        "completely different text about nothing at all in particular",  # 3
        "",                                        # 4: empty → singleton
    ]
    ids = list(range(len(texts)))
    out = dedup_clusters(_ds(ids, texts), threshold=0.5).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out.doc_id.tolist() == ids
    # 0,1,2 share one cluster rooted at 0
    assert out.cluster_id[0] == out.cluster_id[1] == out.cluster_id[2] == 0
    assert out.cluster_id[3] == 3 and out.cluster_id[4] == 4
    assert out.is_canonical.tolist() == [True, False, False, True, True]


def test_ngram_containment_directed_pairs():
    import pyarrow as pa
    import ray.data as rd

    from drone_ray.pipelines.dedup import ngram_jaccard_near_dups

    small = "alpha beta gamma delta epsilon"            # 3 shingles
    big = small + " zeta eta theta iota kappa lambda"   # contains all of small's
    other = "one two three four five six"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([small, big, other], pa.string()),
        }
    )
    got = ngram_jaccard_near_dups(
        rd.from_arrow(t), threshold=0.9, metric="containment"
    ).to_pandas()
    rows = {(int(r["a"]), int(r["b"])): float(r["containment"]) for _, r in got.iterrows()}
    # small ⊂ big: containment(1 in 2) = 1.0; the reverse is 3/9 < 0.9
    assert rows == {(1, 2): 1.0}
    # symmetric Jaccard misses it at the same bar: 3/9 = 0.333
    j = ngram_jaccard_near_dups(rd.from_arrow(t), threshold=0.9).to_pandas()
    assert len(j) == 0


def test_dup_span_stats_brute():
    """dup_span_stats vs a brute-force per-position n-gram count."""
    import ray.data as rd

    from drone_ray.pipelines.dedup import dup_span_stats

    docs = [
        (1, "a b c d e a b c"),        # "a b c" twice in-doc
        (2, "x a b c y"),              # shares "a b c" with doc 1
        (3, "p q r s"),                # unique grams
        (4, "a b"),                    # < n tokens: no row
        (5, "   "),                    # empty: no row
        (6, "p q r s"),                # exact dup of doc 3
    ]
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in docs])
    got = {
        r["doc_id"]: (r["total_ngrams"], r["dup_ngrams"], r["dup_ratio"])
        for r in dup_span_stats(ds, n=3, num_buckets=4).take_all()
    }
    # brute force
    from collections import Counter, defaultdict

    grams = defaultdict(list)  # doc -> list of gram strings per position
    for i, t in docs:
        toks = t.split()
        if len(toks) < 3:
            continue
        grams[i] = [" ".join(toks[p : p + 3]) for p in range(len(toks) - 2)]
    docs_of = defaultdict(set)
    for i, gs in grams.items():
        for g in gs:
            docs_of[g].add(i)
    exp = {}
    for i, gs in grams.items():
        dup = sum(1 for g in gs if len(docs_of[g]) >= 2)
        exp[i] = (len(gs), dup, round(dup / len(gs), 6))
    assert got == exp
    # doc 1: positions 0 and 5 both "a b c" (cross-doc dup with doc 2) —
    # BOTH positions count (no shingle dedup)
    assert got[1][1] >= 2
    assert got[3] == (2, 2, 1.0) and got[6] == (2, 2, 1.0)
