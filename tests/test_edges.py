"""Edge finalization operators (dedup D3, degrees G7, symmetrize) vs pandas."""

import numpy as np
import pandas as pd
import pyarrow as pa

from drone_ray.stages.edges import dedup_edges, in_degrees, out_degrees, symmetrize


def _ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


def _rand(n=2000, v=100, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, v, n).astype(np.int64), rng.integers(0, v, n).astype(np.int64)


def test_dedup_edges():
    src, dst = _rand()
    got = dedup_edges(_ds(src, dst)).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    exp = (
        pd.DataFrame({"src": src, "dst": dst})
        .drop_duplicates()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_out_degrees_and_in_degrees():
    src, dst = _rand(seed=1)
    got = out_degrees(_ds(src, dst)).to_pandas().sort_values("src").reset_index(drop=True)
    exp = (
        pd.DataFrame({"src": src})
        .groupby("src")
        .size()
        .rename("out_degree")
        .reset_index()
    )
    pd.testing.assert_frame_equal(got, exp)

    got_in = in_degrees(_ds(src, dst)).to_pandas().sort_values("dst").reset_index(drop=True)
    exp_in = (
        pd.DataFrame({"dst": dst}).groupby("dst").size().rename("in_degree").reset_index()
    )
    pd.testing.assert_frame_equal(got_in, exp_in)


def test_symmetrize():
    src = np.array([1, 2], dtype=np.int64)
    dst = np.array([2, 3], dtype=np.int64)
    got = symmetrize(_ds(src, dst)).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    exp = pd.DataFrame(
        {"src": [1, 2, 2, 3], "dst": [2, 1, 3, 2]}, dtype=np.int64
    ).sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_sample_edges_deterministic():
    import numpy as np
    import pyarrow as pa

    from drone_ray.stages.edges import sample_edges

    import ray.data as rd

    rng = np.random.default_rng(3)
    src = rng.integers(0, 5000, 20000).astype(np.int64)
    dst = rng.integers(0, 5000, 20000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    out = sample_edges(ds, 7).to_pandas()
    # brute force the keep predicate
    P = np.uint64(2**31 - 1)
    h = (
        (src.astype(np.uint64) % P) * np.uint64(1103515245)
        + (dst.astype(np.uint64) % P) * np.uint64(12345)
    ) % P % np.uint64(100)
    keep = h < 7
    assert len(out) == int(keep.sum())
    exp = set(zip(src[keep].tolist(), dst[keep].tolist()))
    got = set(zip(out.src.tolist(), out.dst.tolist()))
    assert got == exp
    # rate is in the right ballpark
    assert 0.04 < len(out) / len(src) < 0.10
    # repartitioned input yields the identical sample (statelessness)
    out2 = sample_edges(ds.repartition(13), 7).to_pandas()
    assert set(zip(out2.src.tolist(), out2.dst.tolist())) == exp


def test_bucket_count_invariance_b256():
    """Bucket fan-out is a pure parallelism knob: B=256 must be bit-identical
    to the default floor (B=64) — the adaptive_buckets scale-up path changes
    nothing but per-task slice size."""
    from drone_ray.stages.edges import dual_degrees

    src, dst = _rand(n=5000, v=300, seed=7)
    for fn, key in ((dedup_edges, ["src", "dst"]), (out_degrees, ["src"]), (dual_degrees, ["vid"])):
        base = fn(_ds(src, dst)).to_pandas().sort_values(key).reset_index(drop=True)
        wide = (
            fn(_ds(src, dst), num_buckets=256)
            .to_pandas()
            .sort_values(key)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(base, wide)


def test_adaptive_buckets_growth():
    from drone_ray.hashing import adaptive_buckets

    assert adaptive_buckets(None, floor=64) == 64
    assert adaptive_buckets(0, floor=64) == 64
    assert adaptive_buckets(10_000, floor=64) == 64  # floor wins on small inputs
    # 10^9 rows / 4M rows-per-bucket = 250 → bounded per-task heap
    assert adaptive_buckets(1_000_000_000, floor=64) == 250
    assert adaptive_buckets(10**13, floor=64) == 65536  # cap
    # monotone in est_rows
    prev = 0
    for e in (10**6, 10**8, 10**9, 10**10, 10**11):
        b = adaptive_buckets(e, floor=32)
        assert b >= prev
        prev = b


def test_raw_endpoint_counts_pigeonhole_filter_superset():
    """min_total filtering must (a) keep every vid whose GLOBAL raw count
    exceeds the threshold (pigeonhole superset), (b) undercount surviving
    sums by at most raw_count_slack."""
    import ray.data as rd

    from drone_ray.stages.edges import raw_count_slack, raw_endpoint_counts

    rng = np.random.default_rng(7)
    # one genuine hub (vid 0) spread evenly across blocks + uniform noise
    hub = np.zeros(3000, np.int64)
    noise = rng.integers(1, 5000, 20_000).astype(np.int64)
    src = np.concatenate([hub, noise])
    dst = rng.integers(1, 5000, src.size).astype(np.int64)
    perm = rng.permutation(src.size)
    ds = rd.from_arrow(
        pa.table({"src": pa.array(src[perm]), "dst": pa.array(dst[perm])})
    ).repartition(16)

    T, B = 2000, 64  # cut = ceil(2000/64) = 32 > 1: the filter engages
    filt = pa.concat_tables(
        raw_endpoint_counts(ds, min_total=T, max_blocks=B).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    slack = raw_count_slack(T, B)
    assert slack > 0
    got = dict(zip(filt["vid"].to_pylist(),
                   (np.asarray(filt["n_src"]) + np.asarray(filt["n_dst"])).tolist()))
    # (a) the true hub survives and passes the widened candidate test
    assert 0 in got and got[0] > T - slack
    # (b) no surviving sum exceeds its true total, undercount bounded
    full = pa.concat_tables(
        raw_endpoint_counts(ds).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    truth = dict(zip(full["vid"].to_pylist(),
                     (np.asarray(full["n_src"]) + np.asarray(full["n_dst"])).tolist()))
    for v, n in got.items():
        assert n <= truth[v] and truth[v] - n <= slack
    # and the filtered row count is a small fraction of the unfiltered one
    assert filt.num_rows < full.num_rows / 5
