"""WeightedPageRank (weight-proportional transitions) vs a dense numpy
power-iteration oracle; unit weights must reproduce classic PageRank."""

import numpy as np
import pyarrow as pa
import pytest

from drone_ray.oracles import pagerank_oracle, pagerank_weighted_oracle
from drone_ray.pipelines.analytics import pagerank, pagerank_weighted


def _ds(src, dst, w):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": np.asarray(src, np.int64),
                "dst": np.asarray(dst, np.int64),
                "w": np.asarray(w, np.float64),
            }
        )
    )


def _rand_graph(n=300, m=1800, seed=11, wmax=7):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, wmax + 1, src.size).astype(np.float64)
    return src, dst, w


def _sorted(t, col):
    v = t["vid"].to_numpy()
    o = np.argsort(v)
    return v[o], t[col].to_numpy()[o]


def test_weighted_pagerank_vs_dense_oracle():
    src, dst, w = _rand_graph()
    res = pagerank_weighted(lambda: _ds(src, dst, w), "wpr_rand_v1", num_partitions=3)
    vids, scores = _sorted(res.to_table(), "score")
    ovids, opr = pagerank_weighted_oracle(src, dst, w)
    assert np.array_equal(vids, ovids)
    assert np.abs(scores - opr).max() < 1e-6
    assert res.converged


def test_weighted_pagerank_unit_weights_equal_classic():
    src, dst, _ = _rand_graph(seed=23)
    w1 = np.ones(src.size)
    res_w = pagerank_weighted(lambda: _ds(src, dst, w1), "wpr_unit_v1", num_partitions=2)
    res_c = pagerank(
        lambda: _ds(src, dst, w1).select_columns(["src", "dst"]),
        "wpr_unit_classic_v1",
        num_partitions=2,
    )
    vw, sw = _sorted(res_w.to_table(), "score")
    vc, sc = _sorted(res_c.to_table(), "score")
    assert np.array_equal(vw, vc)
    assert np.abs(sw - sc).max() < 1e-9


def test_weighted_pagerank_duplicate_edges_min_weight():
    # (0,1) appears with w 6 and 2: transitions must use 2 (min dedup)
    src = np.array([0, 0, 0, 1], dtype=np.int64)
    dst = np.array([1, 1, 2, 2], dtype=np.int64)
    w = np.array([6.0, 2.0, 2.0, 1.0])
    res = pagerank_weighted(lambda: _ds(src, dst, w), "wpr_dup_v1", num_partitions=2)
    vids, scores = _sorted(res.to_table(), "score")
    ovids, opr = pagerank_weighted_oracle(src, dst, w)
    assert np.array_equal(vids, ovids)
    assert np.abs(scores - opr).max() < 1e-6


def test_weighted_pagerank_rejects_hubs():
    src, dst, w = _rand_graph(n=100, m=900, seed=3)
    with pytest.raises(Exception, match="split hubs"):
        pagerank_weighted(
            lambda: _ds(src, dst, w), "wpr_hub_v1", num_partitions=2, hub_threshold=5
        )


def test_katz_vs_dense_oracle():
    from drone_ray.oracles import katz_oracle
    from drone_ray.pipelines.analytics import katz_centrality

    src, dst, _ = _rand_graph(n=250, m=1500, seed=31)
    res = katz_centrality(
        lambda: _ds(src, dst, np.ones(src.size)).select_columns(["src", "dst"]),
        "katz_rand_v1",
        num_partitions=3,
        alpha=0.005,
        eps=0.0,
        max_steps=41,
    )
    vids, scores = _sorted(res.to_table(), "score")
    ovids, ox = katz_oracle(src, dst, alpha=0.005, iters=40)
    assert np.array_equal(vids, ovids)
    assert np.abs(scores - ox).max() < 1e-12
