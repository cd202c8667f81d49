"""Triangle pipeline vs brute-force oracle (exact, FIXTURES.md §5)."""

import numpy as np
import pyarrow as pa
import pytest

from drone_ray.oracles import triangles_oracle
from drone_ray.pipelines.triangles import triangle_count, triangles_per_vertex
from tests.graphs import ba_powerlaw, chain, two_cliques_bridge


def _ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


CASES = {
    "two_cliques": two_cliques_bridge(5),
    "chain_no_triangles": chain(10),
    "rand": (
        np.random.default_rng(5).integers(0, 60, 400).astype(np.int64),
        np.random.default_rng(6).integers(0, 60, 400).astype(np.int64),
    ),
    "ba": ba_powerlaw(150, 3, 9),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_triangles_match_oracle(name):
    src, dst = CASES[name]
    exp_total, ovids, opc = triangles_oracle(src, dst)
    assert triangle_count(_ds(src, dst), num_partitions=4) == exp_total
    pv = triangles_per_vertex(_ds(src, dst), num_partitions=4).to_pandas()
    got = (
        {} if pv.empty else dict(zip(pv["vid"].astype(int), pv["triangles"].astype(int)))
    )
    exp = {int(v): int(c) for v, c in zip(ovids, opc) if c > 0}
    assert got == exp
