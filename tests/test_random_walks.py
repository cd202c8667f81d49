"""Deterministic random-walk corpus: validity, determinism, invariance."""

import numpy as np
import pyarrow as pa
import pytest

from drone_ray.pipelines.analytics import random_walks


def _edges_ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )


def _rand_graph(seed=11, n=30, m=120):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    pairs = sorted({(int(s), int(d)) for s, d in zip(src[keep], dst[keep])})
    return [p[0] for p in pairs], [p[1] for p in pairs]


def _brute(src, dst, L, nw):
    from collections import defaultdict

    from drone_ray.functions.minhash import md5_lower64

    outs = defaultdict(list)
    for s, d in zip(src, dst):
        outs[s].append(d)
    for k in outs:
        outs[k] = sorted(set(outs[k]))
    rows = []
    for v in sorted(set(src) | set(dst)):
        for k in range(nw):
            wid = v * nw + k
            cur = v
            rows.append((wid, 0, cur))
            for step in range(L):
                ns = outs.get(cur, [])
                if not ns:
                    break
                cur = ns[md5_lower64(f"rw-{wid}-{step}") % len(ns)]
                rows.append((wid, step + 1, cur))
    return sorted(rows)


def _run(src, dst, P, L, nw, key):
    got = random_walks(
        lambda: _edges_ds(src, dst), key, num_partitions=P,
        walk_length=L, num_walks=nw,
    ).to_table().to_pandas()
    return sorted(
        (int(r["walk_id"]), int(r["step"]), int(r["vid"]))
        for _, r in got.iterrows()
    )


def test_walks_match_brute_and_are_partition_invariant():
    src, dst = _rand_graph()
    exp = _brute(src, dst, L=5, nw=1)
    assert _run(src, dst, 1, 5, 1, "rw_t1") == exp
    assert _run(src, dst, 4, 5, 1, "rw_t4") == exp


def test_walks_are_valid_edge_sequences():
    src, dst = _rand_graph(seed=12)
    edges = set(zip(src, dst))
    rows = _run(src, dst, 3, 6, 2, "rw_valid")
    by_walk = {}
    for wid, step, vid in rows:
        by_walk.setdefault(wid, []).append((step, vid))
    for wid, path in by_walk.items():
        path.sort()
        # steps are contiguous from 0 (no gaps — a walk ends, never pauses)
        assert [s for s, _ in path] == list(range(len(path)))
        for (s0, v0), (_, v1) in zip(path, path[1:]):
            assert (v0, v1) in edges, (wid, s0, v0, v1)


def test_walks_stop_at_dangling():
    # 0→1→2, 2 dangling: every walk reaching 2 ends there
    rows = _run([0, 1], [1, 2], 2, 5, 1, "rw_dangle")
    assert (0, 0, 0) in rows and (0, 1, 1) in rows and (0, 2, 2) in rows
    assert max(s for w, s, v in rows if w == 0) == 2
    assert max(s for w, s, v in rows if w == 2) == 0  # starts dangling


def test_walks_num_walks_ids():
    src, dst = [0, 1], [1, 0]
    rows = _run(src, dst, 2, 3, 3, "rw_nw")
    wids = {w for w, _, _ in rows}
    assert wids == {0, 1, 2, 3, 4, 5}  # vid*3+k for vid in {0,1}


def test_walks_reject_hub_split():
    from drone_ray.pipelines.analytics import graph_for, _run as _run_prog
    from drone_ray.graph.programs import RandomWalks

    src = [0] * 8 + [1]
    dst = list(range(1, 9)) + [0]
    m = graph_for(
        lambda: _edges_ds(src, dst), "rw_hubguard", 2, hub_threshold=4
    )
    with pytest.raises(Exception, match="hub"):
        _run_prog(m, RandomWalks, {"walk_length": 2}, direction="fwd")
