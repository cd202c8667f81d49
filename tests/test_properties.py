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
