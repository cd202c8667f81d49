"""HyperANF vs the exact BFS neighborhood function on fixture graphs."""

import numpy as np
import pyarrow as pa

from drone_ray.pipelines.analytics import hyperanf
from tests.graphs import ba_powerlaw, chain, cycle


def _edges_ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


def _exact_nf(src, dst):
    """NF(t) = #{(v,u): dist(v→u) <= t} by BFS from every vertex."""
    vs = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(vs)}
    n = len(vs)
    adj = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        adj[idx[int(s)]].append(idx[int(d)])
    counts = {}  # t -> pairs within distance t
    per_v_final = np.zeros(n, np.int64)
    maxt = 0
    for v in range(n):
        dist = {v: 0}
        frontier = [v]
        t = 0
        while frontier:
            nxt = []
            for x in frontier:
                for y in adj[x]:
                    if y not in dist:
                        dist[y] = t + 1
                        nxt.append(y)
            frontier = nxt
            t += 1
        per_v_final[v] = len(dist)
        for d in dist.values():
            maxt = max(maxt, d)
            counts[d] = counts.get(d, 0) + 1
    nf = []
    run = 0
    for t in range(maxt + 1):
        run += counts.get(t, 0)
        nf.append(run)
    return np.array(nf, np.float64), per_v_final


def test_hyperanf_matches_exact_nf_powerlaw():
    src, dst = ba_powerlaw(n=300, m=3, seed=7)
    exact, _ = _exact_nf(src, dst)
    t = hyperanf(lambda: _edges_ds(src, dst), "hanf_pl300", num_partitions=2, p=10)
    got = t["nf_estimate"].to_numpy()
    # engine runs exactly as many supersteps as the graph's true NF horizon
    assert len(got) == len(exact)
    # per-step estimates within HLL error (p=10 → σ≈3.3%; allow 5σ headroom)
    rel = np.abs(got - exact) / exact
    assert rel.max() < 0.17, rel
    # monotone nondecreasing by construction (registers only grow)
    assert (np.diff(got) >= -1e-9).all()
    # effective diameter within ±1 of the exact definition
    eff_exact = int(np.argmax(exact >= 0.9 * exact[-1]))
    eff_got = int(t["effective_diameter"][0].as_py())
    assert abs(eff_got - eff_exact) <= 1


def test_hyperanf_partition_invariance():
    src, dst = ba_powerlaw(n=300, m=3, seed=7)
    a = hyperanf(lambda: _edges_ds(src, dst), "hanf_pl300", num_partitions=2, p=8)
    b = hyperanf(lambda: _edges_ds(src, dst), "hanf_pl300", num_partitions=4, p=8)
    # register merges are associative/commutative/idempotent → identical
    # sketches at any partitioning; only the float sum order differs
    assert len(a) == len(b)
    assert np.allclose(a["nf_estimate"].to_numpy(), b["nf_estimate"].to_numpy(),
                       rtol=1e-9)
    assert a["effective_diameter"][0].as_py() == b["effective_diameter"][0].as_py()


def test_hyperanf_chain_and_cycle_shape():
    # chain of 20: NF horizon = 19 hops; cycle of 12: 11 hops, NF(t) linear
    src, dst = chain(20)
    exact, _ = _exact_nf(src, dst)
    t = hyperanf(lambda: _edges_ds(src, dst), "hanf_chain", num_partitions=2, p=10)
    assert len(t) == len(exact)
    # tiny cardinalities hit the linear-counting range → near-exact
    assert np.abs(t["nf_estimate"].to_numpy() - exact).max() / exact[-1] < 0.05

    src, dst = cycle(12)
    exact, _ = _exact_nf(src, dst)
    t = hyperanf(lambda: _edges_ds(src, dst), "hanf_cycle", num_partitions=2, p=10)
    assert len(t) == len(exact)
    assert np.abs(t["nf_estimate"].to_numpy() - exact).max() / exact[-1] < 0.05
