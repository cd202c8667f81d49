"""Conformance of the superstep engine vs dense oracles (FIXTURES.md §5) on
the named fixture graphs + seeded power-law, plus partition invariance."""

import numpy as np
import pyarrow as pa
import pytest

from drone_ray.oracles import (
    bfs_oracle,
    components_oracle,
    lpa_oracle,
    pagerank_oracle,
)
from drone_ray.pipelines.analytics import (
    connected_components,
    label_propagation,
    pagerank,
    sssp,
)
from tests.graphs import NAMED, ba_powerlaw


def _edges_ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


def _sorted(t: pa.Table, col: str):
    v = t["vid"].to_numpy()
    o = np.argsort(v)
    return v[o], t[col].to_numpy()[o]


@pytest.mark.parametrize("name", sorted(NAMED))
def test_pagerank_matches_oracle(name):
    src, dst = NAMED[name]()
    res = pagerank(lambda: _edges_ds(src, dst), f"pr_{name}", num_partitions=2)
    vids, scores = _sorted(res.to_table(), "score")
    ovids, opr = pagerank_oracle(src, dst)
    assert np.array_equal(vids, ovids)
    assert np.abs(scores - opr).max() < 1e-6
    assert res.converged


@pytest.mark.parametrize("name", sorted(NAMED))
def test_components_match_oracle(name):
    src, dst = NAMED[name]()
    res = connected_components(lambda: _edges_ds(src, dst), f"cc_{name}", num_partitions=2)
    vids, comp = _sorted(res.to_table(), "component")
    ovids, ocomp = components_oracle(src, dst)
    assert np.array_equal(vids, ovids)
    assert np.array_equal(comp, ocomp)


@pytest.mark.parametrize("name", ["chain", "cycle", "two_cliques", "star"])
def test_lpa_matches_oracle(name):
    src, dst = NAMED[name]()
    res = label_propagation(
        lambda: _edges_ds(src, dst), f"lpa_{name}", num_partitions=2, max_rounds=6
    )
    vids, labels = _sorted(res.to_table(), "label")
    ovids, olab, _ = lpa_oracle(src, dst, max_rounds=6)
    assert np.array_equal(vids, ovids)
    assert np.array_equal(labels, olab)
    # fixpoint invariant: every label is one of the initial labels (= a vid)
    assert np.isin(labels, ovids).all()


@pytest.mark.parametrize("name", ["chain", "star", "dangling", "two_cliques"])
def test_sssp_matches_bfs(name):
    src, dst = NAMED[name]()
    res = sssp(lambda: _edges_ds(src, dst), f"sssp_{name}", source=0, num_partitions=2)
    t = res.to_table()
    got = dict(zip(t["vid"].to_numpy().tolist(), t["dist"].to_numpy().tolist()))
    assert got == bfs_oracle(src, dst, 0)


def test_powerlaw_pagerank_and_cc():
    src, dst = ba_powerlaw(n=2000, m=4, seed=42)
    res = pagerank(lambda: _edges_ds(src, dst), "pr_ba", num_partitions=4)
    vids, scores = _sorted(res.to_table(), "score")
    ovids, opr = pagerank_oracle(src, dst)
    assert np.array_equal(vids, ovids)
    assert np.abs(scores - opr).max() < 1e-6

    res2 = connected_components(lambda: _edges_ds(src, dst), "cc_ba", num_partitions=4)
    vids2, comp = _sorted(res2.to_table(), "component")
    ovids2, ocomp = components_oracle(src, dst)
    assert np.array_equal(comp, ocomp)


def test_partition_invariance():
    """Identical results at P ∈ {1, 2, 8} (FIXTURES.md §6)."""
    src, dst = ba_powerlaw(n=500, m=3, seed=7)
    base_pr = None
    base_cc = None
    for P in (1, 2, 8):
        r = pagerank(lambda: _edges_ds(src, dst), f"inv_pr_{P}", num_partitions=P)
        _, scores = _sorted(r.to_table(), "score")
        rc = connected_components(lambda: _edges_ds(src, dst), f"inv_cc_{P}", num_partitions=P)
        _, comp = _sorted(rc.to_table(), "component")
        if base_pr is None:
            base_pr, base_cc = scores, comp
        else:
            assert np.abs(scores - base_pr).max() < 1e-9
            assert np.array_equal(comp, base_cc)


def test_self_loops_and_duplicate_edges():
    src = np.array([0, 0, 0, 1, 1, 2], dtype=np.int64)
    dst = np.array([1, 1, 0, 2, 2, 0], dtype=np.int64)
    res = pagerank(lambda: _edges_ds(src, dst), "pr_dups", num_partitions=2)
    vids, scores = _sorted(res.to_table(), "score")
    ovids, opr = pagerank_oracle(src, dst)  # oracle dedups identically
    assert np.abs(scores - opr).max() < 1e-6


def test_pipeline_depth_invariance():
    """The superstep speculation window is an execution detail: depths
    1/2/4 run the same number of steps and produce bit-identical scores
    (should_stop only fires on a zero-message step, so speculative steps
    are state-preserving no-ops)."""
    src, dst = ba_powerlaw(n=400, m=3, seed=11)
    base = None
    base_steps = None
    for depth in (1, 2, 4):
        r = pagerank(
            lambda: _edges_ds(src, dst),
            f"depth_{depth}",
            num_partitions=2,
            pipeline_depth=depth,
        )
        _, scores = _sorted(r.to_table(), "score")
        if base is None:
            base, base_steps = scores, r.steps
        else:
            assert np.array_equal(scores, base)
            assert r.steps == base_steps
        assert r.converged
