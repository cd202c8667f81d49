"""BellmanFordSSSP (negative-weight shortest paths with cycle detection)
vs the textbook Bellman-Ford oracle: random strided DAGs with negative
weights, agreement with WeightedSSSP on nonnegative inputs, partition-count
invariance, the build-time / program-level negative-weight guards, and both
detection paths (local wave cap, global superstep bound)."""

import numpy as np
import pyarrow as pa
import pytest

from drone_ray.graph.programs import NegativeCycleError
from drone_ray.hashing import Ownership
from drone_ray.oracles import bellman_ford_oracle
from drone_ray.pipelines.analytics import bellman_ford_sssp, sssp_weighted


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


def _check(src, dst, w, key, source, n, **kw):
    res = bellman_ford_sssp(
        lambda: _ds(src, dst, w), key, int(source), n_vertices=n, **kw
    )
    t = res.to_table()
    got = dict(zip(t["vid"].to_pylist(), t["dist"].to_pylist()))
    exp = bellman_ford_oracle(src, dst, w, int(source))
    assert exp is not None, "oracle found a negative cycle in a DAG?!"
    assert set(got) == set(exp), (
        f"reachable sets differ: extra={set(got) - set(exp)}, missing={set(exp) - set(got)}"
    )
    for v, d in exp.items():
        assert got[v] == pytest.approx(d, abs=1e-9), f"vid {v}: {got[v]} != {d}"
    return t


def _neg_dag(n=300, m=2400, seed=0):
    """Random DAG (src < dst) with integer weights in [-3, 7] — negative
    edges but provably no cycle of any sign."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, m).astype(np.int64)
    b = rng.integers(0, n, m).astype(np.int64)
    src, dst = np.minimum(a, b), np.maximum(a, b)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(-3, 8, src.size).astype(np.float64)
    return src, dst, w


def test_bellman_ford_negative_dag_vs_oracle():
    src, dst, w = _neg_dag(seed=1)
    assert (w < 0).any()
    _check(src, dst, w, "bf_dag1_v1", src.min(), n=300, num_partitions=3)


def test_bellman_ford_partition_invariance():
    src, dst, w = _neg_dag(n=150, m=900, seed=2)
    t1 = _check(src, dst, w, "bf_dag2_p1_v1", src.min(), n=150, num_partitions=1)
    t4 = _check(src, dst, w, "bf_dag2_p4_v1", src.min(), n=150, num_partitions=4)
    assert t1.sort_by("vid").equals(t4.sort_by("vid"))


def test_bellman_ford_matches_weighted_sssp_on_nonnegative():
    rng = np.random.default_rng(3)
    src = rng.integers(0, 200, 1200).astype(np.int64)
    dst = rng.integers(0, 200, 1200).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, 9, src.size).astype(np.float64)
    s = int(src.min())
    bf = bellman_ford_sssp(
        lambda: _ds(src, dst, w), "bf_pos_v1", s, n_vertices=200, num_partitions=3
    ).to_table()
    ws = sssp_weighted(
        lambda: _ds(src, dst, w), "bf_pos_ws_v1", s, num_partitions=3
    ).to_table()
    assert bf.sort_by("vid").equals(ws.sort_by("vid"))


def test_negative_cycle_within_one_partition_raises():
    # 0 -> 1 -> 2 -> 1 with cycle weight -4, all local at P=1: the local
    # wave cap (n_local + 1) trips inside the first superstep
    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 1], dtype=np.int64)
    w = np.array([1.0, -2.0, -2.0])
    with pytest.raises(NegativeCycleError):
        bellman_ford_sssp(
            lambda: _ds(src, dst, w), "bf_cyc_local_v1", 0, n_vertices=3,
            num_partitions=1,
        )


def test_negative_cycle_across_partitions_raises():
    # pick two vids owned by DIFFERENT partitions at P=2 so the -10 cycle
    # spans the boundary: each local subgraph is acyclic (the wave cap never
    # trips) and detection falls to the driver's V-superstep bound
    own = Ownership()
    cands = np.arange(1, 64, dtype=np.int64)
    parts = own.of(cands, 2)
    a = int(cands[parts == 0][0])
    b = int(cands[parts == 1][0])
    src = np.array([0, a, b], dtype=np.int64)
    dst = np.array([a, b, a], dtype=np.int64)
    w = np.array([1.0, -5.0, -5.0])
    with pytest.raises(NegativeCycleError):
        bellman_ford_sssp(
            lambda: _ds(src, dst, w), "bf_cyc_cross_v1", 0, n_vertices=3,
            num_partitions=2,
        )


def test_unreachable_negative_cycle_is_fine():
    # negative cycle exists but is NOT reachable from the source: distances
    # from the source are well-defined and the run must succeed
    src = np.array([0, 1, 7, 8], dtype=np.int64)
    dst = np.array([1, 2, 8, 7], dtype=np.int64)
    w = np.array([2.0, -1.0, -3.0, -3.0])
    t = bellman_ford_sssp(
        lambda: _ds(src, dst, w), "bf_cyc_unreach_v1", 0, n_vertices=9,
        num_partitions=2,
    ).to_table()
    got = dict(zip(t["vid"].to_pylist(), t["dist"].to_pylist()))
    assert got == {0: 0.0, 1: 2.0, 2: 1.0}


def test_nonneg_build_rejects_negative_weights():
    from drone_ray.graph.partition import _check_weights

    with pytest.raises(ValueError, match="BellmanFord"):
        _check_weights(np.array([1.0, -2.0]))
    _check_weights(np.array([1.0, -2.0]), allow_negative=True)
    with pytest.raises(ValueError, match="finite"):
        _check_weights(np.array([np.inf]), allow_negative=True)
    with pytest.raises(ValueError, match="finite"):
        _check_weights(np.array([np.nan]))


def test_weighted_sssp_program_rejects_negative_layout():
    # a layout built with allow_negative_weights=True must still be refused
    # by the MONOTONE program (WeightedSSSP) — only BellmanFordSSSP may run
    from drone_ray.graph.programs import WeightedSSSP
    from drone_ray.pipelines.analytics import _run, graph_for

    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([1, 2], dtype=np.int64)
    w = np.array([1.0, -1.0])
    m = graph_for(
        lambda: _ds(src, dst, w), "bf_guard_v1", 1, weight_col="w",
        allow_negative_weights=True,
    )
    with pytest.raises(ValueError, match="BellmanFord"):
        _run(m, WeightedSSSP, {"source": 0})
