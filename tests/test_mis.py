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
