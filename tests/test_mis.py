"""Deterministic MIS vs the sequential greedy oracle + set validity."""

import numpy as np
import pyarrow as pa
import pytest

from drone_ray.functions.minhash import md5_lower64
from drone_ray.pipelines.analytics import mis
from tests.graphs import NAMED, ba_powerlaw


def _edges_ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


def _greedy_mis(src, dst):
    """Sequential greedy over md5-priority order — the parallel rounds'
    proven-equal fixpoint (random-permutation greedy)."""
    vs = np.unique(np.concatenate([src, dst]))
    nbr = {int(v): set() for v in vs}
    for s, d in zip(src, dst):
        if s != d:
            nbr[int(s)].add(int(d))
            nbr[int(d)].add(int(s))
    in_set = set()
    blocked = set()
    for v in sorted(vs, key=lambda v: (md5_lower64(f"mis-{v}"), v)):
        v = int(v)
        if v in blocked:
            continue
        in_set.add(v)
        blocked.update(nbr[v])
    return in_set, nbr


@pytest.mark.parametrize("name", ["chain", "cycle", "star", "two_cliques", "dangling"])
def test_mis_matches_greedy(name):
    src, dst = NAMED[name]()
    res = mis(lambda: _edges_ds(src, dst), f"mis_{name}", num_partitions=2)
    assert res.converged
    t = res.to_table()
    got = {int(v) for v, m in zip(t["vid"].to_numpy(), t["in_mis"].to_numpy()) if m}
    expect, nbr = _greedy_mis(src, dst)
    assert got == expect
    # validity: independent …
    for v in got:
        assert not (nbr[v] & got)
    # … and maximal
    for v in t["vid"].to_numpy().tolist():
        assert v in got or (nbr[v] & got)


def test_mis_powerlaw_partition_invariance():
    src, dst = ba_powerlaw(n=1200, m=3, seed=9)
    expect, _ = _greedy_mis(src, dst)
    for P in (2, 5):
        res = mis(lambda: _edges_ds(src, dst), "mis_pl1200", num_partitions=P)
        assert res.converged
        t = res.to_table()
        got = {int(v) for v, m in zip(t["vid"].to_numpy(), t["in_mis"].to_numpy()) if m}
        assert got == expect


def _greedy_coloring(src, dst):
    """Sequential greedy in (md5 priority, vid) order — the JP fixpoint."""
    vs = np.unique(np.concatenate([src, dst]))
    nbr = {int(v): set() for v in vs}
    for s, d in zip(src, dst):
        if s != d:
            nbr[int(s)].add(int(d))
            nbr[int(d)].add(int(s))
    color = {}
    for v in sorted(vs, key=lambda v: (md5_lower64(f"mis-{v}"), v)):
        v = int(v)
        used = {color[u] for u in nbr[v] if u in color}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    return color, nbr


@pytest.mark.parametrize("name", ["chain", "cycle", "star", "two_cliques", "dangling"])
def test_coloring_matches_greedy(name):
    from drone_ray.pipelines.analytics import coloring

    src, dst = NAMED[name]()
    res = coloring(lambda: _edges_ds(src, dst), f"col_{name}", num_partitions=2)
    assert res.converged
    t = res.to_table()
    got = dict(zip(t["vid"].to_numpy().tolist(), t["color"].to_numpy().tolist()))
    expect, nbr = _greedy_coloring(src, dst)
    assert got == expect
    for v, c in got.items():  # proper coloring
        assert c >= 0 and all(got[u] != c for u in nbr[v])


def test_coloring_powerlaw_partition_invariance():
    from drone_ray.pipelines.analytics import coloring

    src, dst = ba_powerlaw(n=1200, m=3, seed=17)
    expect, _ = _greedy_coloring(src, dst)
    for P in (2, 5):
        res = coloring(lambda: _edges_ds(src, dst), "col_pl1200", num_partitions=P)
        assert res.converged
        t = res.to_table()
        got = dict(zip(t["vid"].to_numpy().tolist(), t["color"].to_numpy().tolist()))
        assert got == expect


def test_coloring_resume_identical(tmp_path):
    from drone_ray.graph.harness import run_vertex_program
    from drone_ray.graph.programs import GreedyColoring
    from drone_ray.pipelines.analytics import graph_for

    src, dst = ba_powerlaw(n=400, m=3, seed=18)
    man = graph_for(lambda: _edges_ds(src, dst), "col_resume", 2, symmetrize=True)
    ck = str(tmp_path / "ck")
    interrupted = run_vertex_program(
        man, GreedyColoring, {}, direction="both",
        checkpoint_dir=ck, checkpoint_every=1, max_steps=2,
    )
    assert not interrupted.converged
    resumed = run_vertex_program(man, GreedyColoring, {}, direction="both",
                                 checkpoint_dir=ck, resume=True)
    assert resumed.converged
    t = resumed.to_table()
    got = dict(zip(t["vid"].to_numpy().tolist(), t["color"].to_numpy().tolist()))
    expect, _ = _greedy_coloring(src, dst)
    assert got == expect


def test_coloring_65_clique_multiword_mask():
    """A 65-clique needs 65 colors: the multi-word seen-mask (default 256
    colors) must produce a proper coloring — on a complete graph greedy
    assigns every vertex a distinct color 0..64."""
    k = 65
    s, d = [], []
    for i in range(k):
        for j in range(k):
            if i != j:
                s.append(i)
                d.append(j)
    from drone_ray.pipelines.analytics import coloring

    res = coloring(lambda: _edges_ds(np.array(s, np.int64), np.array(d, np.int64)),
                   "col_clique65_v2", num_partitions=2)
    t = res.to_table()
    cols = sorted(t["color"].to_numpy().tolist())
    assert cols == list(range(k))


def test_coloring_refuses_saturated_mask():
    """With max_colors=64 a 65-clique must raise loudly, not silently
    emit color 0 (the seen-mask saturation guard)."""
    k = 65
    s, d = [], []
    for i in range(k):
        for j in range(k):
            if i != j:
                s.append(i)
                d.append(j)
    from drone_ray.pipelines.analytics import coloring

    with pytest.raises(Exception) as ei:
        coloring(lambda: _edges_ds(np.array(s, np.int64), np.array(d, np.int64)),
                 "col_clique65_cap64", num_partitions=2, max_colors=64)
    assert "64" in str(ei.value)
