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


def _brute_ktruss(src, dst, k):
    """Reference peeling with Python sets."""
    edges = {(min(int(s), int(d)), max(int(s), int(d))) for s, d in zip(src, dst) if s != d}
    while True:
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        keep = {
            (u, v) for u, v in edges if len(adj[u] & adj[v]) >= k - 2
        }
        if keep == edges:
            return edges
        edges = keep


@pytest.mark.parametrize("k", [3, 4, 5])
def test_ktruss_matches_brute(k):
    from drone_ray.pipelines.triangles import ktruss

    src, dst = CASES["rand"]
    got = ktruss(_ds(src, dst), k, num_partitions=4).to_pandas()
    gset = {(int(r["src"]), int(r["dst"])) for _, r in got.iterrows()}
    assert gset == _brute_ktruss(src, dst, k)


def test_ktruss_planted_clique():
    from drone_ray.pipelines.triangles import ktruss

    # 6-clique + a pendant path: the 5-truss is exactly the clique
    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    path = [(5, 10), (10, 11), (11, 12)]
    src = [e[0] for e in clique + path]
    dst = [e[1] for e in clique + path]
    got = ktruss(_ds(np.array(src, np.int64), np.array(dst, np.int64)), 5).to_pandas()
    gset = {(int(r["src"]), int(r["dst"])) for _, r in got.iterrows()}
    assert gset == set(clique)
    # k above the clique's truss number empties the graph
    got7 = ktruss(_ds(np.array(src, np.int64), np.array(dst, np.int64)), 7).to_pandas()
    assert len(got7) == 0


def test_edge_support_planted():
    from drone_ray.pipelines.triangles import edge_support

    # triangle 0-1-2 plus pendant 2-3: supports 1,1,1 and no row for (2,3)
    got = edge_support(_ds([0, 1, 0, 2], [1, 2, 2, 3]), num_partitions=2).to_pandas()
    sup = {(int(r["u"]), int(r["v"])): int(r["support"]) for _, r in got.iterrows()}
    assert sup == {(0, 1): 1, (0, 2): 1, (1, 2): 1}
