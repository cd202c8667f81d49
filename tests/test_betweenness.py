"""Sampled-Brandes betweenness on the dualview superstep engine vs a dense
Brandes oracle."""

import numpy as np
import pyarrow as pa

from drone_ray.oracles import betweenness_oracle
from drone_ray.pipelines.analytics import betweenness
from tests.graphs import ba_powerlaw


def _ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}))


def _check(src, dst, sources, key, P=3):
    res = betweenness(lambda: _ds(src, dst), key, sources, num_partitions=P)
    t = res.to_table()
    got = dict(zip(t["vid"].to_pylist(), t["bc"].to_pylist()))
    exp = betweenness_oracle(src, dst, sources)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9, f"vid {v}: {got[v]} != {exp[v]}"


def test_betweenness_chain():
    # path graph: interior vertices carry all the centrality
    src = np.array([0, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 4], dtype=np.int64)
    _check(src, dst, [0, 1, 2, 3, 4], "bc_chain_v1", P=2)


def test_betweenness_diamond_split_paths():
    # two shortest paths 0->3: sigma/delta fractions must split correctly
    src = np.array([0, 0, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 3, 4], dtype=np.int64)
    _check(src, dst, [0], "bc_diamond_v1", P=2)


def test_betweenness_random_sampled_sources():
    rng = np.random.default_rng(17)
    src = rng.integers(0, 80, 400).astype(np.int64)
    dst = rng.integers(0, 80, 400).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    sources = [0, 7, 13, 42]
    _check(src, dst, sources, "bc_rand_v1", P=3)


def test_betweenness_powerlaw_all_sources_exact():
    src, dst = ba_powerlaw(n=60, m=2, seed=9)
    sources = sorted(set(np.concatenate([src, dst]).tolist()))
    _check(src, dst, sources, "bc_ba_exact_v1", P=3)


def test_betweenness_missing_and_isolated_sources():
    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([1, 2], dtype=np.int64)
    # 99 not in the graph; 2 has no out-edges — both must no-op gracefully
    _check(src, dst, [0, 2, 99], "bc_edge_v1", P=2)


def test_harmonic_vs_bfs_oracle():
    from drone_ray.oracles import bfs_oracle
    from drone_ray.pipelines.analytics import harmonic_centrality

    rng = np.random.default_rng(23)
    src = rng.integers(0, 60, 300).astype(np.int64)
    dst = rng.integers(0, 60, 300).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    sources = [0, 5, 11, 40]
    res = harmonic_centrality(lambda: _ds(src, dst), "harm_rand_v1", sources, num_partitions=3)
    t = res.to_table()
    got = dict(zip(t["vid"].to_pylist(), t["harmonic"].to_pylist()))
    vids = set(np.concatenate([src, dst]).tolist())
    exp = {int(v): 0.0 for v in vids}
    for s in sources:
        if s not in vids:
            continue
        for v, d in bfs_oracle(src, dst, s).items():
            if d >= 1:
                exp[v] += 1.0 / d
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9, f"vid {v}"


def test_betweenness_exact_all_sources_mode():
    # sources="all" must equal the brute oracle over every vertex, and a
    # second call must short-circuit on the _DONE marker (resume schedule)
    src, dst = ba_powerlaw(n=40, m=2, seed=5)
    vids = sorted(set(np.concatenate([src, dst]).tolist()))
    res = betweenness(
        lambda: _ds(src, dst), "bc_exact_all_v1", "all",
        num_partitions=3, source_batch=7,
    )
    t = res.to_table()
    got = dict(zip(t["vid"].to_pylist(), t["bc"].to_pylist()))
    exp = betweenness_oracle(src, dst, vids)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9, f"vid {v}: {got[v]} != {exp[v]}"
    res2 = betweenness(
        lambda: _ds(src, dst), "bc_exact_all_v1", "all",
        num_partitions=3, source_batch=7,
    )
    assert res2.steps == 0  # cached result, no supersteps re-run
    t2 = res2.to_table()
    got2 = dict(zip(t2["vid"].to_pylist(), t2["bc"].to_pylist()))
    assert got2 == got


def test_harmonic_exact_all_sources_mode():
    from drone_ray.oracles import bfs_oracle
    from drone_ray.pipelines.analytics import harmonic_centrality

    rng = np.random.default_rng(31)
    src = rng.integers(0, 35, 150).astype(np.int64)
    dst = rng.integers(0, 35, 150).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    vids = sorted(set(np.concatenate([src, dst]).tolist()))
    res = harmonic_centrality(
        lambda: _ds(src, dst), "harm_exact_all_v1", "all",
        num_partitions=3, source_batch=6,
    )
    t = res.to_table()
    got = dict(zip(t["vid"].to_pylist(), t["harmonic"].to_pylist()))
    exp = {int(v): 0.0 for v in vids}
    for s in vids:
        for v, d in bfs_oracle(src, dst, s).items():
            if d >= 1:
                exp[v] += 1.0 / d
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9, f"vid {v}"

def test_closeness_vs_bfs_oracle():
    from drone_ray.oracles import bfs_oracle
    from drone_ray.pipelines.analytics import closeness_centrality

    rng = np.random.default_rng(41)
    src = rng.integers(0, 60, 300).astype(np.int64)
    dst = rng.integers(0, 60, 300).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    sources = [0, 5, 11, 40]
    res = closeness_centrality(lambda: _ds(src, dst), "clo_rand_v1", sources, num_partitions=3)
    t = res.to_table()
    got = {
        int(v): (s, r)
        for v, s, r in zip(t["vid"].to_pylist(), t["sum_d"].to_pylist(), t["reach"].to_pylist())
    }
    vids = set(np.concatenate([src, dst]).tolist())
    exp = {int(v): [0.0, 0.0] for v in vids}
    for s in sources:
        if s not in vids:
            continue
        for v, d in bfs_oracle(src, dst, s).items():
            if d >= 1:
                exp[v][0] += d
                exp[v][1] += 1.0
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == tuple(exp[v]), f"vid {v}: {got[v]} != {exp[v]}"


def test_closeness_exact_all_sources_mode():
    from drone_ray.oracles import bfs_oracle
    from drone_ray.pipelines.analytics import closeness_centrality

    rng = np.random.default_rng(43)
    src = rng.integers(0, 35, 150).astype(np.int64)
    dst = rng.integers(0, 35, 150).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    vids = sorted(set(np.concatenate([src, dst]).tolist()))
    res = closeness_centrality(
        lambda: _ds(src, dst), "clo_exact_all_v1", "all",
        num_partitions=3, source_batch=6,
    )
    t = res.to_table()
    got = {
        int(v): (s, r)
        for v, s, r in zip(t["vid"].to_pylist(), t["sum_d"].to_pylist(), t["reach"].to_pylist())
    }
    exp = {int(v): [0.0, 0.0] for v in vids}
    for s in vids:
        for v, d in bfs_oracle(src, dst, s).items():
            if d >= 1:
                exp[v][0] += d
                exp[v][1] += 1.0
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == tuple(exp[v]), f"vid {v}"
