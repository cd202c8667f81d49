"""Weighted SSSP (distributed asynchronous Bellman-Ford) vs a dense
Dijkstra oracle: random digraphs, duplicate edges with differing weights
(min-weight dedup), hub splitting (weighted delegate expansion), and
partition-count invariance."""

import numpy as np
import pyarrow as pa
import pytest

from drone_ray.oracles import dijkstra_oracle
from drone_ray.pipelines.analytics import sssp_weighted
from tests.graphs import ba_powerlaw


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


def _check(src, dst, w, key, source, **kw):
    res = sssp_weighted(lambda: _ds(src, dst, w), key, int(source), **kw)
    t = res.to_table()
    got = dict(zip(t["vid"].to_pylist(), t["dist"].to_pylist()))
    exp = dijkstra_oracle(src, dst, w, int(source))
    assert set(got) == set(exp), (
        f"reachable sets differ: extra={set(got) - set(exp)}, missing={set(exp) - set(got)}"
    )
    for v, d in exp.items():
        assert got[v] == pytest.approx(d, abs=1e-9), f"vid {v}: {got[v]} != {d}"
    return res


def _rand_graph(n=400, m=2400, seed=0, wmax=9):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, wmax + 1, src.size).astype(np.float64)
    return src, dst, w


def test_weighted_sssp_random_vs_dijkstra():
    src, dst, w = _rand_graph(seed=1)
    _check(src, dst, w, "wsssp_rand1_v1", src.min(), num_partitions=3)


def test_weighted_sssp_duplicate_edges_keep_min_weight():
    # the same (src, dst) pair appears with weights 5 then 2 then 9; paths
    # must use 2 (csr dedup takes the min, SQL oracle takes MIN(w))
    src = np.array([0, 0, 0, 1, 2], dtype=np.int64)
    dst = np.array([1, 1, 1, 2, 3], dtype=np.int64)
    w = np.array([5.0, 2.0, 9.0, 1.0, 1.0])
    res = _check(src, dst, w, "wsssp_dup_v1", 0, num_partitions=2)
    t = res.to_table()
    got = dict(zip(t["vid"].to_pylist(), t["dist"].to_pylist()))
    assert got[1] == 2.0 and got[3] == 4.0


def test_weighted_sssp_cheap_long_path_beats_direct_edge():
    # direct 0->3 edge costs 10; the 3-hop path costs 3 — a BFS-degenerate
    # engine (hop counts) would return 1 hop and miss the weighted optimum
    src = np.array([0, 0, 1, 2], dtype=np.int64)
    dst = np.array([3, 1, 2, 3], dtype=np.int64)
    w = np.array([10.0, 1.0, 1.0, 1.0])
    res = _check(src, dst, w, "wsssp_path_v1", 0, num_partitions=2)
    t = res.to_table()
    got = dict(zip(t["vid"].to_pylist(), t["dist"].to_pylist()))
    assert got[3] == 3.0


def test_weighted_sssp_powerlaw_with_hub_split():
    src, dst = ba_powerlaw(n=600, m=3, seed=5)
    rng = np.random.default_rng(7)
    w = rng.integers(1, 8, src.size).astype(np.float64)
    # threshold low enough that the BA hubs split — exercises raw-value hub
    # broadcast + weighted delegate expansion
    _check(
        src, dst, w, "wsssp_hub_v1", src.min(), num_partitions=4, hub_threshold=40
    )


def test_weighted_sssp_partition_invariance():
    src, dst, w = _rand_graph(n=200, m=1000, seed=3)
    tables = []
    for P in (1, 2, 5):
        res = sssp_weighted(
            lambda: _ds(src, dst, w), f"wsssp_pinv{P}_v1", int(src.min()), num_partitions=P
        )
        t = res.to_table()
        o = np.argsort(t["vid"].to_numpy())
        tables.append((t["vid"].to_numpy()[o], t["dist"].to_numpy()[o]))
    for vids, dists in tables[1:]:
        assert np.array_equal(vids, tables[0][0])
        assert np.array_equal(dists, tables[0][1])


def test_weighted_sssp_zero_weights_ok():
    # zero-weight edges are legal (nonnegative requirement only)
    src = np.array([0, 1, 1], dtype=np.int64)
    dst = np.array([1, 2, 3], dtype=np.int64)
    w = np.array([0.0, 0.0, 2.0])
    _check(src, dst, w, "wsssp_zero_v1", 0, num_partitions=2)


def test_negative_weights_rejected_at_build():
    import pytest

    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([1, 2], dtype=np.int64)
    w = np.array([1.0, -2.0])
    with pytest.raises(Exception, match="must be >= 0"):
        sssp_weighted(lambda: _ds(src, dst, w), "wsssp_neg_v2", 0, num_partitions=2)
