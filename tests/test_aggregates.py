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


def test_ddsketch_quantiles_relative_error_and_merge_invariance():
    from drone_ray.pipelines.aggregates import ddsketch_quantiles

    rng = np.random.default_rng(11)
    v = np.exp(rng.normal(4.0, 2.0, 20_000))  # heavy-tailed positive floats
    qs = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    alpha = 0.01
    t = ddsketch_quantiles(_ds(pa.table({"v": v})), "v", qs, alpha=alpha)
    got = dict(zip(t["q"].to_pylist(), t["value"].to_pylist()))
    for q in qs:
        exact = np.sort(v)[max(1, int(np.ceil(q * v.size))) - 1]  # quantile_disc
        assert abs(got[q] - exact) <= alpha * exact * 1.0000001, (q, got[q], exact)

    # order-insensitive merge: 64-way split must give the IDENTICAL table
    ds64 = _ds(pa.table({"v": v})).repartition(64)
    t64 = ddsketch_quantiles(ds64, "v", qs, alpha=alpha)
    assert t64.equals(t)


def test_ddsketch_zero_and_negative_values():
    from drone_ray.pipelines.aggregates import ddsketch_quantiles

    v = np.array([-100.0, -1.0, 0.0, 0.0, 1.0, 100.0])
    t = ddsketch_quantiles(_ds(pa.table({"v": v})), "v", (0.5,), alpha=0.01)
    # rank ceil(0.5*6)=3 -> the first zero
    assert t["value"].to_pylist() == [0.0]
    t2 = ddsketch_quantiles(_ds(pa.table({"v": v})), "v", (0.01, 0.99), alpha=0.01)
    lo, hi = t2["value"].to_pylist()
    assert abs(lo + 100.0) <= 1.01 and abs(hi - 100.0) <= 1.01  # mirrored bins


def test_ddsketch_bin_rule_matches_duckdb_over_domain():
    # the SQL oracle reproduces ceil(ln(v)/ln(gamma)) — prove numpy and
    # DuckDB agree bit-for-bit over the whole token-count domain 1..2^20
    import duckdb

    from drone_ray.pipelines.aggregates import _dd_keys, _DD_OFFSET

    alpha = 0.01
    gamma = (1 + alpha) / (1 - alpha)
    v = np.arange(1, 1 << 20, dtype=np.float64)
    np_keys = _dd_keys(v, gamma) - _DD_OFFSET
    db = duckdb.connect().execute(
        f"SELECT CAST(ceil(ln(v)/ln({gamma!r})) AS BIGINT) AS b "
        f"FROM range(1, {1 << 20}) t(v)"
    ).fetchnumpy()["b"]
    assert int((db != np_keys).sum()) == 0


def test_group_sample_matches_brute_and_batching_invariant():
    import numpy as np
    import pyarrow as pa

    from drone_ray.functions.minhash import md5_lower64
    from drone_ray.pipelines.aggregates import group_sample

    rng = np.random.default_rng(3)
    n = 500
    groups = np.array(["abc"[int(x)] for x in rng.integers(0, 3, n)], dtype=object)
    ids = rng.permutation(10_000)[:n].astype(np.int64)  # unique ids
    t = pa.table({"g": pa.array(groups, pa.string()), "i": pa.array(ids, pa.int64())})

    def brute(r):
        out = {}
        for g, i in zip(groups, ids):
            out.setdefault(g, []).append((md5_lower64(f"gs-{i}"), int(i)))
        keep = set()
        for g, rows in out.items():
            for _, i in sorted(rows)[:r]:
                keep.add((g, i))
        return keep

    import ray.data as rd

    for r, blocks in ((7, 1), (7, 8), (25, 4)):
        ds = rd.from_arrow(t).repartition(blocks)
        got = group_sample(ds, "g", "i", r).to_pandas()
        gset = {(row["g"], int(row["i"])) for _, row in got.iterrows()}
        assert gset == brute(r), (r, blocks)


def test_group_sample_small_groups_kept_whole():
    import pyarrow as pa
    import ray.data as rd

    from drone_ray.pipelines.aggregates import group_sample

    t = pa.table(
        {"g": pa.array(["x", "x", "y"], pa.string()), "i": pa.array([1, 2, 3], pa.int64())}
    )
    got = group_sample(rd.from_arrow(t), "g", "i", 10).to_pandas()
    assert len(got) == 3  # groups smaller than r pass through entirely


def test_group_sample_string_keys_and_ids():
    """group_sample over STRING group keys and STRING ids (the per-host
    page-quota shape) vs a brute-force md5 ranking."""
    import ray.data as rd

    from drone_ray.functions.minhash import md5_lower64
    from drone_ray.pipelines.aggregates import group_sample

    hosts = [f"h{i % 7}.example" for i in range(200)]
    urls = [f"http://h{i % 7}.example/p{i}" for i in range(200)]
    ds = rd.from_arrow(pa.table({"host": pa.array(hosts), "url": pa.array(urls)}))
    got = group_sample(ds, "host", "url", 3, num_buckets=8).to_pandas()

    by_host: dict[str, list] = {}
    for h, u in zip(hosts, urls):
        by_host.setdefault(h, []).append((md5_lower64(f"gs-{u}"), u))
    expect = set()
    for h, rows in by_host.items():
        for _, u in sorted(rows)[:3]:
            expect.add((h, u))
    assert set(zip(got["host"], got["url"])) == expect


def test_group_sample_per_group_prio_independent_draws():
    """per_group_prio hashes the (group, id) pair: each group draws an
    independent sample vs the brute md5 ranking, unlike the shared-id
    priority mode where every group prefers the same lucky ids."""
    import ray.data as rd

    from drone_ray.functions.minhash import md5_lower64
    from drone_ray.pipelines.aggregates import group_sample

    gs = [g for g in range(6) for _ in range(40)]
    ids = [i % 40 for i in range(240)]  # same id set in every group
    ds = rd.from_arrow(pa.table({"g": pa.array(gs, pa.int64()),
                                 "i": pa.array(ids, pa.int64())}))
    got = group_sample(ds, "g", "i", 5, num_buckets=8, per_group_prio=True).to_pandas()

    expect = set()
    for g in range(6):
        ranked = sorted(range(40), key=lambda i: (md5_lower64(f"gs-{g}-{i}"), i))
        for i in ranked[:5]:
            expect.add((g, i))
    assert set(zip(got["g"], got["i"])) == expect
    # independence: the sampled id sets are NOT identical across groups
    per_group = {}
    for g, i in expect:
        per_group.setdefault(g, set()).add(i)
    assert len({frozenset(v) for v in per_group.values()}) > 1


def test_neighbor_sample_2hop_matches_brute():
    """fanout-(2,2) two-hop frontier vs brute per-source md5 rankings."""
    import ray.data as rd

    from drone_ray.functions.minhash import md5_lower64
    from drone_ray.pipelines.aggregates import neighbor_sample_2hop

    rng = np.random.default_rng(7)
    src = rng.integers(0, 25, 200).astype(np.int64)
    dst = rng.integers(0, 25, 200).astype(np.int64)
    keep = src != dst
    pairs = sorted(set(zip(src[keep].tolist(), dst[keep].tolist())))
    ds = rd.from_arrow(pa.table({"src": pa.array([p[0] for p in pairs], pa.int64()),
                                 "dst": pa.array([p[1] for p in pairs], pa.int64())}))
    got = neighbor_sample_2hop(ds, 2, 2, num_buckets=8).to_pandas()

    outs: dict[int, list] = {}
    for s, d in pairs:
        outs.setdefault(s, []).append(d)

    def sample(v, f):
        return sorted(outs.get(v, []),
                      key=lambda d: (md5_lower64(f"gs-{v}-{d}"), d))[:f]

    expect = set()
    for root in outs:
        for mid in sample(root, 2):
            for d in sample(mid, 2):
                expect.add((root, mid, d))
    assert set(zip(got["root"], got["mid"], got["dst"])) == expect
