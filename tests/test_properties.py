"""Property-based conformance (hypothesis): the core operators must agree
with their pandas/pure-python twins on arbitrary inputs, and extraction
must be batch-size invariant on adversarial markup."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from drone_ray.stages.extract import extract_links, extract_text


@st.composite
def edge_arrays(draw):
    # n >= 1: a zero-row Dataset yields zero blocks, whose to_pandas() is
    # column-less — a Ray representation artifact, not operator behavior
    n = draw(st.integers(1, 300))
    vals = st.integers(min_value=-(2**62), max_value=2**62)
    src = draw(st.lists(vals, min_size=n, max_size=n))
    dst = draw(st.lists(vals, min_size=n, max_size=n))
    return np.array(src, np.int64), np.array(dst, np.int64)


@settings(max_examples=20, deadline=None)
@given(edge_arrays())
def test_dedup_edges_matches_pandas(arrs):
    import ray.data as rd

    from drone_ray.stages.edges import dedup_edges

    src, dst = arrs
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    got = dedup_edges(ds).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    exp = (
        pd.DataFrame({"src": src, "dst": dst})
        .drop_duplicates()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


_MARKUPISH = st.text(
    alphabet="<>ap/& ;qt\"'=hrefbctitle\n\t-!x0123",
    max_size=400,
)


@settings(max_examples=50, deadline=None)
@given(_MARKUPISH)
def test_extract_is_pure_and_total(html):
    """Extraction never raises on arbitrary markup-ish bytes and is a pure
    function (same input → same output; the batch-size invariance the
    driver's byte contract rests on)."""
    t1 = extract_text(html)
    l1 = extract_links(html)
    assert extract_text(html) == t1
    assert extract_links(html) == l1
    # full-entity mode is total too
    extract_text(html, entities="full")
    extract_links(html, decode_href=True)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=500))
def test_exact_quantiles_rank_rule_property(vals):
    import math

    import ray.data as rd

    from drone_ray.pipelines.aggregates import exact_quantiles

    v = np.array(vals, np.int64)
    out = exact_quantiles(rd.from_arrow(pa.table({"v": v})), "v", (0.25, 0.5, 0.75))
    sv = np.sort(v)
    for q, got in zip(out["q"].to_pylist(), out["value"].to_pylist()):
        assert got == int(sv[max(1, math.ceil(q * v.size)) - 1])


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=200))
def test_ilog2_exact(vals):
    from drone_ray.graph.programs import _ilog2

    v = np.array(vals, np.uint64)
    got = _ilog2(v)
    for x, g in zip(vals, got.tolist()):
        assert g == (x.bit_length() - 1 if x > 0 else 0)


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_gather_neighbors_matches_loop(data):
    from drone_ray.graph.programs import _gather_neighbors

    n = data.draw(st.integers(1, 30))
    lens = data.draw(st.lists(st.integers(0, 5), min_size=n, max_size=n))
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=indptr[1:])
    adj = np.arange(int(indptr[-1]), dtype=np.int64) * 7
    rows = np.array(
        sorted(data.draw(st.sets(st.integers(0, n - 1), max_size=n))), np.int64
    )
    kept, klens, dsts = _gather_neighbors(indptr, adj, rows)
    exp_kept = [r for r in rows.tolist() if lens[r] > 0]
    assert kept.tolist() == exp_kept
    assert klens.tolist() == [lens[r] for r in exp_kept]
    exp_dsts = [x for r in exp_kept for x in adj[indptr[r]:indptr[r + 1]].tolist()]
    assert dsts.tolist() == exp_dsts


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=120))
def test_hll_register_merge_is_order_free(vals):
    """HyperANF registers: max-merge is associative/commutative/idempotent,
    so any merge tree gives the identical sketch."""
    from drone_ray.graph.programs import HyperANF

    rng = np.random.default_rng(1)
    rows = np.array(
        [rng.integers(0, 30, 64).astype(np.uint8) for _ in range(len(vals))]
    )
    merged_fwd = np.zeros(64, np.uint8)
    for r in rows:
        merged_fwd = np.maximum(merged_fwd, r)
    order = rng.permutation(len(rows))
    merged_rev = np.zeros(64, np.uint8)
    for i in order:
        merged_rev = np.maximum(merged_rev, np.maximum(rows[i], rows[i]))  # idempotent
    assert np.array_equal(merged_fwd, merged_rev)
    est = HyperANF._est(np.stack([merged_fwd, merged_rev]))
    assert est[0] == est[1]


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10**6), st.integers(1, 500)),
                min_size=1, max_size=120, unique_by=lambda t: t[0]))
def test_pack_sequences_invariants(items):
    """Offsets within a shard form an exclusive prefix sum in (md5, id)
    order; every offset < budget; spans cover exactly n_tokens."""
    import ray.data as rd

    from drone_ray.functions.minhash import md5_lower64
    from drone_ray.pipelines.webtext import pack_sequences

    budget, B = 64, 4
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([i for i, _ in items], pa.int64()),
                  "text": pa.array(["w " * n for _, n in items], pa.string())})
    )
    got = pack_sequences(docs, budget=budget, num_buckets=B).to_pandas()
    assert (got["tok_offset"] < budget).all()
    assert len(got) == len(items)
    by_bucket: dict = {}
    for r in got.itertuples():
        by_bucket.setdefault(r.bucket, []).append(r)
    for bk, rows in by_bucket.items():
        rows.sort(key=lambda r: (md5_lower64(f"sp-{r.doc_id}"), r.doc_id))
        cum = 0
        for r in rows:
            assert r.seq == cum // budget and r.tok_offset == cum % budget
            assert r.n_seqs == (cum + r.n_tokens - 1) // budget - cum // budget + 1
            cum += r.n_tokens
