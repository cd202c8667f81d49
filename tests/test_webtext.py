"""Webtext-cleaning operators: PII scrub edge cases, Gopher repetition
signals vs brute force, corpus-level chunk dedup vs a Python oracle."""

from collections import Counter

import pyarrow as pa
import pytest

from drone_ray.pipelines.webtext import (
    CHUNK_W,
    chunk_dedup,
    pii_scrub,
    repetition_stats,
    repetition_stats_batch,
    scrub_pii_batch,
)


def _docs_table(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_scrub_pii_batch():
    b = _docs_table(
        [
            "mail me at a.b+c@sub.example.org today",
            "server 192.168.0.1 and 10.0.0.255 respond",
            "call 555-0199 or 555-1234 now",
            "no pii here at all",
            "x@y.io sits at 1.2.3.4 call 555-7777",
            "",
        ]
    )
    out = scrub_pii_batch(b)
    assert out["n_emails"].to_pylist() == [1, 0, 0, 0, 1, 0]
    assert out["n_ips"].to_pylist() == [0, 2, 0, 0, 1, 0]
    assert out["n_phones"].to_pylist() == [0, 0, 2, 0, 1, 0]
    clean = out["text_clean"].to_pylist()
    assert clean[0] == "mail me at <EMAIL> today"
    assert clean[1] == "server <IP> and <IP> respond"
    assert clean[2] == "call <PHONE> or <PHONE> now"
    assert clean[3] == "no pii here at all"
    assert clean[4] == "<EMAIL> sits at <IP> call <PHONE>"
    assert clean[5] == ""


def test_repetition_stats_brute():
    texts = [
        "",
        "one",
        "a a a a a a a a a a",  # 10 tokens, ttf = 1.0 -> dropped
        "the quick brown fox jumps over the lazy dog again and again ok",
        "x y " * 30,  # bigram 'y x' and 'x y' dominate -> dropped
    ]
    out = repetition_stats_batch(_docs_table(texts))
    for i, t in enumerate(texts):
        tk = t.split()
        nt = len(tk)
        assert out["n_tokens"][i].as_py() == nt
        exp_ttf = max(Counter(tk).values()) / nt if nt else 0.0
        exp_tbf = (
            max(Counter(zip(tk, tk[1:])).values()) / (nt - 1) if nt >= 2 else 0.0
        )
        assert out["top_token_frac"][i].as_py() == pytest.approx(exp_ttf, abs=0)
        assert out["top_bigram_frac"][i].as_py() == pytest.approx(exp_tbf, abs=0)
        exp_keep = int(nt >= 10 and exp_ttf <= 0.2 and exp_tbf <= 0.15)
        assert out["keep"][i].as_py() == exp_keep
    assert out["keep"].to_pylist() == [0, 0, 0, 1, 0]


def _brute_chunk_dedup(texts, width=CHUNK_W):
    """First (doc_id, chunk_id) occurrence of each chunk string wins."""
    seen = set()
    rows = []
    for did, t in enumerate(texts):
        tk = t.split()
        n_chunks = (len(tk) + width - 1) // width
        kept = []
        for c in range(n_chunks):
            ch = " ".join(tk[c * width : (c + 1) * width])
            if ch not in seen:
                seen.add(ch)
                kept.append(ch)
        rows.append((did, n_chunks, len(kept), " ".join(kept)))
    return rows


def test_chunk_dedup_vs_brute():
    import ray.data as rd

    boiler = " ".join(f"b{i}" for i in range(CHUNK_W))
    texts = [
        boiler + " unique tail zero alpha beta",
        "plain document two with its own words only here",
        boiler + " another tail for document three",
        "",
        "   ",  # whitespace-only: zero chunks
        boiler,  # exactly the boilerplate, fully deduped away
        # within-doc repeat: same chunk twice in one doc
        " ".join(f"w{i % CHUNK_W}" for i in range(2 * CHUNK_W)),
    ]
    out = (
        chunk_dedup(rd.from_arrow(_docs_table(texts)), num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _brute_chunk_dedup(texts)
    assert len(out) == len(texts)
    for did, n_chunks, n_kept, clean in exp:
        row = out.iloc[did]
        assert row["doc_id"] == did
        assert row["n_chunks"] == n_chunks, did
        assert row["n_kept"] == n_kept, did
        assert row["text_clean"] == clean, did
    # the planted boilerplate survived only in doc 0
    assert out.iloc[0]["n_kept"] == out.iloc[0]["n_chunks"]
    assert out.iloc[2]["n_kept"] == out.iloc[2]["n_chunks"] - 1
    assert out.iloc[5]["n_kept"] == 0 and out.iloc[5]["text_clean"] == ""
    # doc 6 repeats its own chunk: second copy dropped within-doc
    assert out.iloc[6]["n_chunks"] == 2 and out.iloc[6]["n_kept"] == 1


def test_pii_scrub_dataset_roundtrip():
    import ray.data as rd

    out = pii_scrub(rd.from_arrow(_docs_table(["a@b.co x", "clean"]))).to_pandas()
    assert sorted(out["text_clean"]) == ["<EMAIL> x", "clean"]


def test_repetition_stats_dataset():
    import ray.data as rd

    out = repetition_stats(
        rd.from_arrow(_docs_table(["a b c d e f g h i j k l", "a a"]))
    ).to_pandas()
    assert set(out["keep"]) == {0, 1}


def test_decontaminate_planted():
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from drone_ray.pipelines.webtext import decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    texts = {
        0: bench_text,                                   # benchmark doc (mod 10)
        1: bench_text,                                   # full copy → contamination 1.0
        2: "alpha beta gamma delta unrelated words here",# partial overlap
        3: "totally different content with no overlap at all",
        4: "",                                           # empty → 0 shingles
        10: "second benchmark doc about other things entirely",  # benchmark
    }
    ds = rd.from_arrow(
        pa.table({"doc_id": list(texts), "text": list(texts.values())})
    )
    out = (
        decontaminate(ds, bench_mod=10)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[0, "is_benchmark"]) and bool(out.loc[10, "is_benchmark"])
    assert out.loc[1, "contamination"] == 1.0
    # doc 2: shingles = 5, overlapping = 2 ("alpha beta gamma","beta gamma delta")
    assert out.loc[2, "n_shingles"] == 5 and out.loc[2, "n_overlap"] == 2
    assert out.loc[3, "n_overlap"] == 0
    assert out.loc[4, "n_shingles"] == 0 and out.loc[4, "contamination"] == 0.0


def test_corpus_clean_composed_chain():
    """PII is scrubbed before chunking, repetitive/short docs are gated
    out, and shared boilerplate survives only in the lowest doc_id."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from drone_ray.pipelines.webtext import corpus_clean

    boiler = " ".join(f"b{i}" for i in range(16))
    good = " ".join(f"w{i}" for i in range(40))
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    boiler + " " + good,                       # keeps, owns boiler
                    boiler + " " + good + " extra tokens here",# boiler chunk deduped away
                    "spam " * 50,                              # top-token frac 1.0 -> gated
                    "too short",                               # <10 tokens -> gated
                    "mail me at a.b@example.com " + good,      # pii scrubbed, keeps
                ],
                pa.string(),
            ),
        }
    )
    out = (
        corpus_clean(rd.from_arrow(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 4]
    t0, t1, t4 = out["text_clean"].tolist()
    assert t0.startswith("b0 b1")               # doc 0 keeps the boiler chunk
    assert not t1.startswith("b0")              # doc 1's copy was deduped
    assert "<EMAIL>" in t4 and "a.b@example.com" not in t4
    # doc 1 lost exactly its boiler chunk
    row1 = out[out.doc_id == 1].iloc[0]
    assert row1["n_chunks"] - row1["n_kept"] >= 1


def test_pack_sequences_brute():
    """Concat-and-chunk packing vs a sequential brute force: per bucket,
    docs in (md5 priority, id) order, exclusive cumsum cut every `budget`
    tokens; empty docs dropped."""
    import ray.data as rd

    from drone_ray.functions.minhash import md5_lower64
    from drone_ray.pipelines.webtext import pack_sequences

    texts = ["w " * n for n in [3, 7, 1, 12, 5, 0, 9, 2, 30, 4]]
    texts[5] = "   "  # whitespace-only → 0 tokens → excluded
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(10), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    budget, B = 10, 4
    got = (
        pack_sequences(docs, budget=budget, num_buckets=B)
        .to_pandas().set_index("doc_id").sort_index()
    )

    items = []
    for i, t in enumerate(texts):
        n = len(t.split())
        if n:
            items.append((md5_lower64(f"sp-{i}"), i, n))
    expect = {}
    for b in range(B):
        cum = 0
        for pr, i, n in sorted(x for x in items if x[0] % B == b):
            expect[i] = (b, cum // budget, cum % budget,
                         (cum + n - 1) // budget - cum // budget + 1, n)
            cum += n
    assert len(got) == len(expect)
    for i, (b, seq, off, nseq, n) in expect.items():
        row = got.loc[i]
        assert (row.bucket, row.seq, row.tok_offset, row.n_seqs, row.n_tokens) \
            == (b, seq, off, nseq, n)


def test_corpus_split_stratified_counts():
    """80/10/10 md5 split report vs a per-row brute force over two strata."""
    import ray.data as rd

    from drone_ray.functions.minhash import md5_lower64
    from drone_ray.pipelines.webtext import corpus_split

    n = 500
    langs = ["en" if i % 3 else "de" for i in range(n)]
    texts = [("tok " * (i % 7)).strip() for i in range(n)]
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(langs, pa.string())})
    )
    got = corpus_split(docs).to_pandas().set_index(["split", "lang"]).sort_index()

    expect: dict[tuple, list] = {}
    for i in range(n):
        h = md5_lower64(f"split-{i}") % 100
        s = "train" if h < 80 else ("val" if h < 90 else "test")
        e = expect.setdefault((s, langs[i]), [0, 0])
        e[0] += 1
        e[1] += len(texts[i].split())
    assert len(got) == len(expect)
    for k, (nd, nt) in expect.items():
        assert got.loc[k, "n_docs"] == nd and got.loc[k, "n_tokens"] == nt


def test_quality_sample_brute():
    """Deterministic soft filter: keep iff md5/2^64 < quality, recomputed
    per row driver-side."""
    from drone_ray.functions.minhash import md5_lower64
    from drone_ray.functions.text import quality_batch
    from drone_ray.pipelines.queries import q_quality_sample

    sf = "/root/testdata/sf0.001"
    got = q_quality_sample(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    q = quality_batch(t)
    expect = {}
    for i, s in zip(q["doc_id"].to_pylist(), q["quality"].to_pylist()):
        if md5_lower64(f"qs-{i}") / 2**64 < s:
            expect[i] = s
    assert dict(zip(got["doc_id"], got["quality"])) == expect
    # the sampler is a genuine subset, biased toward high scores
    assert 0 < len(expect) < len(t)


def test_corpus_prepare_composition():
    """corpus_prepare == clean → quality-gate → pack, recomputed stagewise
    with the public pieces + a driver-side brute pack."""
    from drone_ray.functions.minhash import md5_lower64
    from drone_ray.functions.text import quality_batch
    from drone_ray.pipelines.queries import (
        PACK_BUCKETS,
        PACK_BUDGET,
        _read,
        q_corpus_prepare,
    )
    from drone_ray.pipelines.webtext import corpus_clean

    sf = "/root/testdata/sf0.001"
    got = q_corpus_prepare(sf).to_pandas().set_index("doc_id").sort_index()

    cleaned = corpus_clean(_read(sf, "documents", ["doc_id", "text"]))
    items = []
    for b in cleaned.iter_batches(batch_format="pyarrow"):
        q = quality_batch(b, text_col="text_clean")
        for i, s, t in zip(
            q["doc_id"].to_pylist(), q["quality"].to_pylist(),
            b["text_clean"].to_pylist(),
        ):
            if md5_lower64(f"qs-{i}") / 2**64 < s:
                n = len(t.split())
                if n:
                    items.append((md5_lower64(f"sp-{i}"), i, n))
    expect = {}
    for bk in range(PACK_BUCKETS):
        cum = 0
        for pr, i, n in sorted(x for x in items if x[0] % PACK_BUCKETS == bk):
            expect[i] = (bk, cum // PACK_BUDGET, cum % PACK_BUDGET, n)
            cum += n
    assert len(got) == len(expect)
    for i, (bk, seq, off, n) in expect.items():
        row = got.loc[i]
        assert (row.bucket, row.seq, row.tok_offset, row.n_tokens) == (bk, seq, off, n)


def test_domain_mix_brute():
    """token shares + uniform-target weights vs a driver recomputation."""
    import pyarrow.parquet as pq

    from drone_ray.pipelines.queries import _read
    from drone_ray.pipelines.webtext import domain_mix

    sf = "/root/testdata/sf0.001"
    got = (
        domain_mix(_read(sf, "documents", ["doc_id", "text", "lang", "source"]))
        .to_pandas().set_index(["lang", "source"]).sort_index()
    )
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["text", "lang", "source"])
    agg: dict = {}
    for txt, la, so in zip(t["text"].to_pylist(), t["lang"].to_pylist(),
                           t["source"].to_pylist()):
        e = agg.setdefault((la, so), [0, 0])
        e[0] += 1
        e[1] += len(txt.split())
    total = sum(v[1] for v in agg.values())
    G = len(agg)
    assert len(got) == G
    # weighted token mass is equalized: share * weight == 1/G for each domain
    for k, (nd, nt) in agg.items():
        row = got.loc[k]
        assert row.n_docs == nd and row.n_tokens == nt
        assert abs(row.token_share - nt / total) < 2e-6
        assert abs(row.token_share * row.mix_weight - 1 / G) < 1e-4


def test_domain_mix_degenerate_inputs():
    """All-empty corpus → zero shares/weights; no crash."""
    import ray.data as rd

    from drone_ray.pipelines.webtext import domain_mix

    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["   ", ""], pa.string()),
                  "lang": pa.array(["en", "de"], pa.string()),
                  "source": pa.array(["a", "b"], pa.string())})
    )
    t = domain_mix(docs)
    assert len(t) == 2
    assert t["token_share"].to_pylist() == [0.0, 0.0]
    assert t["mix_weight"].to_pylist() == [0.0, 0.0]
