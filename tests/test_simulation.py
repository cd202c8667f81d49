"""Graph simulation vs naive fixpoint oracle (reference Sim parity)."""

import numpy as np
import pyarrow as pa
import pytest

from drone_ray.oracles import simulation_oracle
from drone_ray.pipelines.analytics import graph_simulation
from drone_ray.sources.text import PatternGraph
from tests.graphs import ba_powerlaw, chain, two_cliques_bridge

# chain-with-branch pattern: 0 → 1 → {2, 3}; attrs chosen to hit vid % 100
P_ATTRS = {0: 1, 1: 2, 2: 3, 3: 5}
P_TARGETS = {0: [1], 1: [2, 3], 2: [], 3: []}


def _ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


CASES = {
    "chain": chain(30),
    "two_cliques": two_cliques_bridge(5),
    "ba": ba_powerlaw(300, 3, 5),
    "rand": (
        np.random.default_rng(8).integers(0, 120, 800).astype(np.int64),
        np.random.default_rng(9).integers(0, 120, 800).astype(np.int64),
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_simulation_matches_oracle(name):
    src, dst = CASES[name]
    res = graph_simulation(
        lambda: _ds(src, dst), f"sim_{name}", P_ATTRS, P_TARGETS, num_partitions=3
    )
    t = res.to_table()
    got = sorted(zip(t["pattern_node"].to_pylist(), t["vid"].to_pylist()))
    exp = simulation_oracle(src, dst, P_ATTRS, P_TARGETS)
    assert got == exp


def test_simulation_partition_invariance():
    src, dst = CASES["rand"]
    results = []
    for P in (1, 4):
        res = graph_simulation(
            lambda: _ds(src, dst), f"sim_inv_{P}", P_ATTRS, P_TARGETS, num_partitions=P
        )
        t = res.to_table()
        results.append(sorted(zip(t["pattern_node"].to_pylist(), t["vid"].to_pylist())))
    assert results[0] == results[1]


def test_pattern_reader():
    pg = PatternGraph.parse(["0 1 1 1", "1 2 2 2 3", "2 3 0", "3 5 0"])
    assert pg.attrs == P_ATTRS
    assert pg.targets == P_TARGETS
    assert pg.sources[1] == [0]


def test_simulation_hub_split_identical():
    # hub-split graphs now work: (pnode, delta) packs into the scalar hub
    # broadcast channel (GraphSimulation.expand_hub)
    from drone_ray.oracles import simulation_oracle

    src, dst = ba_powerlaw(300, 3, 5)
    res = graph_simulation(
        lambda: _ds(src, dst),
        "sim_hub",
        P_ATTRS,
        P_TARGETS,
        num_partitions=4,
        hub_threshold=15,
    )
    t = res.to_table()
    got = sorted(zip(t["pattern_node"].to_pylist(), t["vid"].to_pylist()))
    exp = simulation_oracle(src, dst, P_ATTRS, P_TARGETS)
    assert got == exp
