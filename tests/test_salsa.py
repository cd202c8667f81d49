"""SALSA vs a dense numpy oracle + partition/pipelining invariance."""

import numpy as np
import pyarrow as pa
import pytest

from drone_ray.pipelines.analytics import salsa
from tests.graphs import NAMED, ba_powerlaw


def _edges_ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


def _dense_salsa(src, dst, K):
    vs = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(vs)}
    s = np.array([idx[int(x)] for x in src])
    d = np.array([idx[int(x)] for x in dst])
    n = len(vs)
    od = np.bincount(s, minlength=n)
    idg = np.bincount(d, minlength=n)
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(K):
        a = np.bincount(d, weights=h[s] / od[s], minlength=n)
        h = np.bincount(s, weights=a[d] / idg[d], minlength=n)
    return vs, a, h


@pytest.mark.parametrize("name", ["chain", "star", "two_cliques", "dangling"])
def test_salsa_matches_dense(name):
    src, dst = NAMED[name]()
    res = salsa(lambda: _edges_ds(src, dst), f"salsa_{name}", num_partitions=2, iters=7)
    t = res.to_table()
    v = t["vid"].to_numpy()
    o = np.argsort(v)
    ovs, oa, oh = _dense_salsa(src, dst, 7)
    assert np.array_equal(v[o], ovs)
    assert np.abs(t["auth"].to_numpy()[o] - oa).max() < 1e-9
    assert np.abs(t["hub"].to_numpy()[o] - oh).max() < 1e-9


def test_salsa_powerlaw_partition_invariance():
    src, dst = ba_powerlaw(n=800, m=3, seed=5)
    ovs, oa, oh = _dense_salsa(src, dst, 9)
    for P in (2, 5):
        res = salsa(lambda: _edges_ds(src, dst), "salsa_pl800", num_partitions=P, iters=9)
        t = res.to_table()
        v = t["vid"].to_numpy()
        o = np.argsort(v)
        assert np.array_equal(v[o], ovs)
        assert np.abs(t["auth"].to_numpy()[o] - oa).max() < 1e-9
        assert np.abs(t["hub"].to_numpy()[o] - oh).max() < 1e-9
