"""Distributed Louvain vs the dense single-machine mirror oracle."""

import numpy as np
import pyarrow as pa

from drone_ray.oracles import louvain_oracle
from drone_ray.pipelines.louvain import louvain
from tests.graphs import ba_powerlaw


def _ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)})
    )


def _run(src, dst, **kw):
    out, info = louvain(_ds(src, dst), **kw)
    t = out.to_pandas().sort_values("vid").reset_index(drop=True)
    return dict(zip(t["vid"], t["community"])), info


def _modularity_direct(src, dst, comm):
    """Independent Q from the ORIGINAL graph + final communities — no
    contraction path shared with either implementation."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    keep = src != dst
    u = np.concatenate([src[keep], dst[keep]])
    v = np.concatenate([dst[keep], src[keep]])
    pairs, w = np.unique(np.stack([u, v], axis=1), axis=0, return_counts=True)
    m2 = w.sum()
    cu = np.array([comm[x] for x in pairs[:, 0]])
    cv = np.array([comm[x] for x in pairs[:, 1]])
    w_in = w[cu == cv].sum()
    vids = np.unique(pairs[:, 0])
    k = np.zeros(vids.size, np.int64)
    np.add.at(k, np.searchsorted(vids, pairs[:, 0]), w)
    labs = np.array([comm[x] for x in vids])
    uq, inv = np.unique(labs, return_inverse=True)
    vol = np.zeros(uq.size, np.int64)
    np.add.at(vol, inv, k)
    return w_in / m2 - float(np.sum((vol / m2) ** 2))


def _check(src, dst, key=None, **kw):
    got, info = _run(src, dst, **kw)
    vids, comm, q = louvain_oracle(src, dst,
                                   max_rounds=kw.get("max_rounds", 10),
                                   max_levels=kw.get("max_levels", 4))
    exp = dict(zip(vids.tolist(), comm.tolist()))
    assert got == exp
    assert abs(info["modularity"] - q) < 1e-12
    # the reported Q must equal the independent computation from the
    # original graph — validates the contraction bookkeeping end-to-end
    assert abs(info["modularity"] - _modularity_direct(src, dst, got)) < 1e-9
    return got, info


def test_two_cliques_bridge():
    # two 5-cliques joined by one edge: Louvain must find exactly the cliques
    e = []
    for base in (0, 100):
        for i in range(5):
            for j in range(i + 1, 5):
                e.append((base + i, base + j))
    e.append((0, 100))
    src = np.array([a for a, _ in e], np.int64)
    dst = np.array([b for _, b in e], np.int64)
    got, info = _check(src, dst, max_rounds=6, max_levels=2, num_buckets=4)
    c0 = {got[v] for v in range(5)}
    c1 = {got[v] for v in range(100, 105)}
    assert len(c0) == 1 and len(c1) == 1 and c0 != c1
    assert info["modularity"] > 0.4


def test_random_graph_matches_oracle():
    rng = np.random.default_rng(7)
    src = rng.integers(0, 80, 360).astype(np.int64)
    dst = rng.integers(0, 80, 360).astype(np.int64)
    _check(src, dst, max_rounds=5, max_levels=2, num_buckets=4)


def test_powerlaw_matches_oracle():
    src, dst = ba_powerlaw(n=100, m=2, seed=3)
    got, info = _check(src, dst, max_rounds=5, max_levels=2, num_buckets=4)
    assert info["modularity"] > 0  # BA graphs still have weak structure


def test_bucket_and_partition_invariance():
    rng = np.random.default_rng(11)
    src = rng.integers(0, 60, 250).astype(np.int64)
    dst = rng.integers(0, 60, 250).astype(np.int64)
    a, ia = _run(src, dst, num_buckets=3, max_rounds=4, max_levels=2)
    import ray.data as rd

    ds = _ds(src, dst).repartition(7)
    out, ib = louvain(ds, num_buckets=8, max_rounds=4, max_levels=2)
    t = out.to_pandas().sort_values("vid").reset_index(drop=True)
    b = dict(zip(t["vid"], t["community"]))
    assert a == b
    assert ia["modularity"] == ib["modularity"]


def test_empty_and_self_loops_only():
    src = np.array([3, 4], np.int64)
    dst = np.array([3, 4], np.int64)  # self-loops are dropped -> empty graph
    out, info = louvain(_ds(src, dst))
    assert info["m2"] == 0 and info["modularity"] == 0.0
    assert out.count() == 0


def test_planted_partition_quality():
    # 4 planted blocks of 12 with dense intra (p=0.6) / sparse inter edges
    rng = np.random.default_rng(23)
    src, dst = [], []
    for b in range(4):
        lo = b * 12
        for i in range(12):
            for j in range(i + 1, 12):
                if rng.random() < 0.6:
                    src.append(lo + i)
                    dst.append(lo + j)
    for _ in range(10):
        a, b = rng.integers(0, 48, 2)
        if a // 12 != b // 12:
            src.append(int(a))
            dst.append(int(b))
    src = np.array(src, np.int64)
    dst = np.array(dst, np.int64)
    got, info = _check(src, dst, max_rounds=8, max_levels=3, num_buckets=4)
    # the 4 planted blocks must each be (near-)pure: vertices of one block
    # overwhelmingly share one community
    for b in range(4):
        labs = [got[v] for v in range(b * 12, (b + 1) * 12) if v in got]
        top = max(labs.count(x) for x in set(labs))
        assert top >= len(labs) - 3
    assert info["modularity"] > 0.45


def test_weighted_equals_expanded_multigraph():
    """louvain(weight_col) must equal louvain on the multigraph with each
    edge repeated w times — weights are exact multi-edge multiplicities."""
    import ray.data as rd

    rng = np.random.default_rng(31)
    src = rng.integers(0, 30, 80).astype(np.int64)
    dst = rng.integers(0, 30, 80).astype(np.int64)
    w = rng.integers(1, 4, 80).astype(np.int64)
    wd = rd.from_arrow(pa.table({"src": src, "dst": dst, "w": w}))
    out_w, info_w = louvain(wd, max_rounds=4, max_levels=2, num_buckets=4,
                            weight_col="w")
    es = np.repeat(src, w)
    ed = np.repeat(dst, w)
    out_m, info_m = louvain(_ds(es, ed), max_rounds=4, max_levels=2, num_buckets=4)
    tw = out_w.to_pandas().sort_values("vid").reset_index(drop=True)
    tm = out_m.to_pandas().sort_values("vid").reset_index(drop=True)
    assert tw.equals(tm)
    assert info_w["modularity"] == info_m["modularity"]
    assert info_w["m2"] == info_m["m2"]


def test_weighted_rejects_float_weights():
    import pytest
    import ray.data as rd

    wd = rd.from_arrow(
        pa.table({"src": np.array([0], np.int64), "dst": np.array([1], np.int64),
                  "w": np.array([0.5], np.float64)})
    )
    with pytest.raises(Exception) as ei:
        louvain(wd, weight_col="w")
    assert "integer" in str(ei.value)


def test_checkpoint_resume_bit_identical(tmp_path):
    """A run killed after level 0 must resume to the exact cold-run result."""
    rng = np.random.default_rng(53)
    src = rng.integers(0, 50, 220).astype(np.int64)
    dst = rng.integers(0, 50, 220).astype(np.int64)
    cold_out, cold_info = louvain(_ds(src, dst), max_rounds=4, max_levels=2,
                                  num_buckets=4)
    cold = cold_out.to_pandas().sort_values("vid").reset_index(drop=True)
    ck = str(tmp_path / "ck")
    # "killed" run: only level 0 completes
    louvain(_ds(src, dst), max_rounds=4, max_levels=1, num_buckets=4,
            checkpoint_dir=ck)
    # resumed run: must skip level 0 (history restored) and finish level 1
    out2, info2 = louvain(_ds(src, dst), max_rounds=4, max_levels=2,
                          num_buckets=4, checkpoint_dir=ck)
    got = out2.to_pandas().sort_values("vid").reset_index(drop=True)
    assert got.equals(cold)
    assert info2["modularity"] == cold_info["modularity"]
    assert info2["history"] == cold_info["history"]


def test_checkpoint_knob_mismatch_refused(tmp_path):
    import pytest

    src = np.array([0, 1, 2], np.int64)
    dst = np.array([1, 2, 0], np.int64)
    ck = str(tmp_path / "ck")
    louvain(_ds(src, dst), max_rounds=4, max_levels=1, num_buckets=4,
            checkpoint_dir=ck)
    if not any(d.startswith("level=") for d in __import__("os").listdir(ck)):
        return  # no moves on the toy cycle -> nothing checkpointed to refuse
    with pytest.raises(ValueError):
        louvain(_ds(src, dst), max_rounds=5, max_levels=2, num_buckets=4,
                checkpoint_dir=ck)
