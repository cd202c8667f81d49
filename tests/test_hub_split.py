"""High-degree vertex splitting (north-rule skew handling): identical
results with and without splitting, and the hub owner's outbound message
volume collapses from O(degree) to O(P)."""

import numpy as np
import pyarrow as pa

from drone_ray.pipelines.analytics import (
    connected_components,
    graph_for,
    label_propagation,
    pagerank,
    sssp,
)
from tests.graphs import ba_powerlaw, star


def _ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


def _sorted(t, col):
    o = np.argsort(t["vid"].to_numpy())
    return t["vid"].to_numpy()[o], t[col].to_numpy()[o]


def test_hub_split_bit_identical_all_programs():
    src, dst = ba_powerlaw(n=600, m=4, seed=21)
    # reversed BA edges → early vertices have huge out-degree after symmetrize
    src, dst = dst, src
    for name, fn, col, kw in [
        ("pr", pagerank, "score", {}),
        ("cc", connected_components, "component", {}),
        ("lpa", label_propagation, "label", {"max_rounds": 5}),
        ("sssp", sssp, "dist", {"source": int(src[0])}),
    ]:
        plain = fn(lambda: _ds(src, dst), f"hub_{name}_plain", num_partitions=4, **kw)
        split = fn(
            lambda: _ds(src, dst),
            f"hub_{name}_split",
            num_partitions=4,
            hub_threshold=20,
            **kw,
        )
        pv, pc_ = _sorted(plain.to_table(), col)
        sv, sc = _sorted(split.to_table(), col)
        assert np.array_equal(pv, sv), name
        if name == "pr":
            # summation order differs (hub contributions combine at the
            # receiver instead of the sender) → ulp-level float drift
            assert np.abs(pc_ - sc).max() < 1e-12, "pr: values differ"
        else:
            assert np.array_equal(pc_, sc), f"{name}: values differ"


def test_hub_split_reduces_owner_fanout():
    # star: hub 0 with ~all out-edges; threshold forces a split
    src, dst = star(400)
    plain = pagerank(lambda: _ds(src, dst), "hubvol_plain", num_partitions=4)
    split = pagerank(
        lambda: _ds(src, dst), "hubvol_split", num_partitions=4, hub_threshold=50
    )
    pv, ps = _sorted(plain.to_table(), "score")
    sv, ss = _sorted(split.to_table(), "score")
    assert np.array_equal(ps, ss)
    # peval outbound rows: plain ships one row per hub out-edge, split ships
    # O(P) hub broadcasts instead
    plain_out = sum(m["msgs_out"] for m in plain.metrics if m["step"] == 0)
    split_out = sum(m["msgs_out"] for m in split.metrics if m["step"] == 0)
    split_hub = sum(m.get("hub_out", 0) for m in split.metrics if m["step"] == 0)
    assert split_out + split_hub < plain_out / 3
    assert split_hub >= 1


def test_hub_split_resume(tmp_path):
    from drone_ray.graph.harness import run_vertex_program
    from drone_ray.graph.programs import PageRank
    from drone_ray.oracles import pagerank_oracle

    src, dst = ba_powerlaw(n=400, m=4, seed=22)
    src, dst = dst, src
    man = graph_for(lambda: _ds(src, dst), "hub_resume", 4, hub_threshold=20)
    ck = str(tmp_path / "ck")
    run_vertex_program(man, PageRank, {"eps": 1e-10}, checkpoint_dir=ck, checkpoint_every=2, max_steps=5)
    resumed = run_vertex_program(man, PageRank, {"eps": 1e-10}, checkpoint_dir=ck, resume=True)
    t = resumed.to_table()
    o = np.argsort(t["vid"].to_numpy())
    ovids, opr = pagerank_oracle(src, dst)
    assert np.abs(t["score"].to_numpy()[o] - opr).max() < 1e-6
