"""Distributed exact aggregates (quantiles via value histogram, per-group
arg-max) vs pandas/numpy oracles."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from drone_ray.pipelines.aggregates import exact_quantiles, group_argmax_count


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


def test_exact_quantiles_matches_rank_rule():
    rng = np.random.default_rng(0)
    v = rng.integers(0, 500, 20_000).astype(np.int64)
    qs = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    out = exact_quantiles(_ds(pa.table({"v": v})), "v", qs)
    sv = np.sort(v)
    for q, got in zip(out["q"].to_pylist(), out["value"].to_pylist()):
        rank = max(1, math.ceil(q * v.size))
        assert got == int(sv[rank - 1]), f"q={q}"


def test_exact_quantiles_skewed_and_tiny():
    # heavy ties + a tiny input exercise the cumsum/searchsorted boundaries
    v = np.array([5] * 100 + [1] * 3 + [9], dtype=np.int64)
    out = exact_quantiles(_ds(pa.table({"v": v})), "v", (0.5, 1.0))
    d = dict(zip(out["q"].to_pylist(), out["value"].to_pylist()))
    sv = np.sort(v)
    assert d[0.5] == int(sv[math.ceil(0.5 * v.size) - 1])
    assert d[1.0] == 9

    one = exact_quantiles(_ds(pa.table({"v": np.array([42], np.int64)})), "v", (0.1, 0.9))
    assert one["value"].to_pylist() == [42, 42]


def test_group_argmax_count_int_and_string_keys():
    rng = np.random.default_rng(1)
    n = 30_000
    g = rng.integers(0, 7, n)
    it = rng.integers(0, 40, n).astype(np.int64)
    types = np.array(["click", "view", "error", "purchase", "scroll", "hover", "load"])
    df = pd.DataFrame({"event_type": types[g], "user_id": it})

    out = (
        group_argmax_count(_ds(pa.Table.from_pandas(df)), "event_type", "user_id")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    counts = df.groupby(["event_type", "user_id"]).size().reset_index(name="n")
    exp = (
        counts.sort_values(["event_type", "n", "user_id"], ascending=[True, False, True])
        .drop_duplicates("event_type")
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_group_topk_and_count_distinct():
    from drone_ray.pipelines.aggregates import group_count_distinct

    rng = np.random.default_rng(4)
    n = 20_000
    g = rng.integers(0, 5, n)
    it = rng.integers(0, 30, n).astype(np.int64)
    types = np.array(["a", "b", "c", "d", "e"])
    df = pd.DataFrame({"t": types[g], "u": it})
    ds = _ds(pa.Table.from_pandas(df))

    # top-3 per group
    out = (
        group_argmax_count(ds, "t", "u", k=3)
        .to_pandas()
        .sort_values(["t", "n", "u"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    counts = df.groupby(["t", "u"]).size().reset_index(name="n")
    exp = (
        counts.sort_values(["t", "n", "u"], ascending=[True, False, True])
        .groupby("t", sort=False)
        .head(3)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)

    # exact distinct counts
    got = (
        group_count_distinct(ds, "t", "u")
        .to_pandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    expd = df.groupby("t")["u"].nunique().reset_index(name="n_distinct")
    pd.testing.assert_frame_equal(got, expd, check_dtype=False)
