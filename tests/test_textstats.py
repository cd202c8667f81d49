"""Text-analysis kernels: token stats vs pure python, fingerprint
normalization, language ID on the per-language pages vocabulary."""

import pyarrow as pa

from drone_ray.functions.text import (
    detect_lang,
    fingerprint,
    langid_batch,
    quality_batch,
    token_stats_batch,
)
from drone_ray.sources.pages import pages_table


def test_token_stats():
    b = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b  a", "", "  x\ty z z\n"],
        }
    )
    out = token_stats_batch(b)
    assert out["n_tokens"].to_pylist() == [3, 0, 4]
    assert out["n_uniq_tokens"].to_pylist() == [2, 0, 3]
    assert out["n_chars"].to_pylist() == [6, 0, 10]


def test_fingerprint_normalization():
    assert fingerprint("A  b\tC") == fingerprint("a b c")
    assert fingerprint("") == fingerprint("   ")
    assert fingerprint("ab") != fingerprint("a b")


def test_detect_lang():
    assert detect_lang("der hund und die katze mit einem ball") == "de"
    assert detect_lang("the cat and the dog is on a mat for it") == "en"
    assert detect_lang("el perro y la casa en un lugar que es") == "es"
    assert detect_lang("le chien et la maison est dans un jardin pour") == "fr"
    assert detect_lang("图分区顶点边爬虫锚点") == "zh"
    assert detect_lang("") == "en"


def test_langid_on_pages_fixture():
    """German and Chinese synthetic pages use per-language vocab; the
    heuristic must separate zh (CJK) perfectly and de mostly."""
    t = pages_table(300, seed=42)
    out = langid_batch(
        pa.table({"doc_id": list(range(300)), "text": t["text"]})
    )
    preds = out["lang_pred"].to_pylist()
    langs = t["lang"].to_pylist()
    texts = t["text"].to_pylist()
    zh_rows = [i for i in range(300) if langs[i] == "zh" and texts[i]]
    assert all(preds[i] == "zh" for i in zh_rows)
    de_rows = [i for i in range(300) if langs[i] == "de" and texts[i]]
    de_acc = sum(preds[i] == "de" for i in de_rows) / len(de_rows)
    assert de_acc > 0.9


def test_quality_batch_ranges():
    b = pa.table(
        {
            "doc_id": [1, 2],
            "text": ["the quick brown fox jumps over the lazy dog " * 10, "!!! 111 ???"],
        }
    )
    out = quality_batch(b)
    q = out["quality"].to_pylist()
    assert 0.0 <= q[1] < q[0] <= 1.0


def test_bpe_tokens_semantics():
    from drone_ray.functions.text import bpe_tokens

    assert bpe_tokens("ab12, c-d!") == ["ab", "1", "2", ",", "c", "-", "d", "!"]
    assert bpe_tokens("") == []
    assert bpe_tokens("   ") == []


def test_tfidf_top_terms():
    import math

    from drone_ray.pipelines.textstats import tfidf_top_terms

    def _ds(ids, texts):
        import ray.data as rd

        return rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))

    ids = [0, 1, 2, 3]
    texts = [
        "apple apple banana cherry",
        "banana cherry cherry date",
        "apple date date date",
        "",
    ]
    out = tfidf_top_terms(_ds(ids, texts), k=2).to_pandas()
    # brute force
    N = len(texts)
    df = {}
    for t in texts:
        for w in set(t.split()):
            df[w] = df.get(w, 0) + 1
    exp_rows = []
    for i, t in zip(ids, texts):
        tf = {}
        for w in t.split():
            tf[w] = tf.get(w, 0) + 1
        scored = sorted(
            ((round(c * math.log((N + 1) / (df[w] + 1)), 6), w, c) for w, c in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        for s, w, c in scored:
            exp_rows.append((i, w, c, s))
    got = [
        (int(r.doc_id), r.token, int(r.tf), float(r.score))
        for r in out.sort_values(["doc_id", "score", "token"], ascending=[True, False, True]).itertuples()
    ]
    assert got == exp_rows


def test_vocabulary_hll_error_bound():
    import numpy as np

    from drone_ray.pipelines.textstats import vocabulary_hll, vocabulary_size

    def _ds(ids, texts):
        import ray.data as rd

        return rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))

    rng = np.random.default_rng(47)
    # ~20k distinct tokens spread over 200 docs
    vocab = [f"tok{i}" for i in range(20000)]
    texts = [
        " ".join(rng.choice(vocab, size=400, replace=True)) for _ in range(200)
    ]
    ds = _ds(list(range(len(texts))), texts)
    exact = vocabulary_size(ds)["n_distinct_tokens"][0].as_py()
    est = vocabulary_hll(ds)["n_distinct_tokens_hll"][0].as_py()
    assert abs(est - exact) / exact < 0.03, (est, exact)

    # partition-count invariance: the register merge is a max — any tree
    est2 = vocabulary_hll(ds.repartition(17))["n_distinct_tokens_hll"][0].as_py()
    assert est2 == est


def test_bpe_train_matches_brute():
    """Distributed BPE merges == a pure-Python reference trainer on the
    same word counts (max count, lexicographically smallest pair ties)."""
    import pyarrow.parquet as pq

    from drone_ray.pipelines.queries import _read
    from drone_ray.pipelines.textstats import bpe_train

    sf = "/root/testdata/sf0.001"
    got = bpe_train(_read(sf, "documents", ["text"]), n_merges=12, num_shards=3)

    wc: dict[str, int] = {}
    for t in pq.read_table(f"{sf}/documents.parquet", columns=["text"])["text"].to_pylist():
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    syms = {w: tuple(w) for w in wc}
    expect = []
    for rank in range(12):
        pc: dict = {}
        for w, s in syms.items():
            c = wc[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rank, a, b, a + b, c))
        m = a + b
        for w, s in list(syms.items()):
            i, ns, n = 0, [], len(s)
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    ns.append(m)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = tuple(ns)
    rows = list(zip(got["rank"].to_pylist(), got["left"].to_pylist(),
                    got["right"].to_pylist(), got["merged"].to_pylist(),
                    got["count"].to_pylist()))
    assert rows == expect
    # partition invariance: different shard count, identical merges
    got2 = bpe_train(_read(sf, "documents", ["text"]), n_merges=12, num_shards=5)
    assert got2.equals(got)


def test_unigram_perplexity_brute():
    """ppl(d) = exp(-mean log p) vs a driver recomputation; constant docs
    of frequent tokens score LOWER ppl than rare-token docs."""
    import math

    import pyarrow.parquet as pq

    from drone_ray.pipelines.queries import _read
    from drone_ray.pipelines.textstats import unigram_perplexity

    sf = "/root/testdata/sf0.001"
    got = (
        unigram_perplexity(_read(sf, "documents", ["doc_id", "text"]))
        .to_pandas().set_index("doc_id").sort_index()
    )
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    cnt: dict = {}
    docs = []
    for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        tk = txt.split()
        if tk:
            docs.append((i, tk))
            for w in tk:
                cnt[w] = cnt.get(w, 0) + 1
    total = sum(cnt.values())
    assert len(got) == len(docs)
    for i, tk in docs:
        lp = sum(math.log(cnt[w] / total) for w in tk)
        ppl = math.exp(-lp / len(tk))
        row = got.loc[i]
        assert row.n_tokens == len(tk)
        # engine output is rounded to 4 decimals
        assert abs(row.unigram_ppl - ppl) <= 5.1e-5 + ppl * 1e-9
