"""Message combine/route kernels: correctness + the order-independence
property the reference relies on (SURVEY.md §2.10)."""

import numpy as np

from drone_ray.graph.messages import combine, combine_inbound, route
from drone_ray.hashing import owner_partition


def test_combine_sum_and_min():
    m = {"vid": np.array([3, 1, 3, 1, 2]), "val": np.array([1.0, 2.0, 4.0, 8.0, 16.0])}
    out = combine(m, "sum")
    assert out["vid"].tolist() == [1, 2, 3]
    assert out["val"].tolist() == [10.0, 16.0, 5.0]
    out = combine(m, "min")
    assert out["val"].tolist() == [2.0, 16.0, 1.0]


def test_combine_extra_key():
    m = {
        "vid": np.array([1, 1, 1, 2]),
        "label": np.array([7, 7, 8, 7]),
        "val": np.array([1, 1, 1, 1], dtype=np.int64),
    }
    out = combine(m, "sum", extra_key="label")
    assert out["vid"].tolist() == [1, 1, 2]
    assert out["label"].tolist() == [7, 8, 7]
    assert out["val"].tolist() == [2, 1, 1]


def test_message_order_never_changes_result():
    rng = np.random.default_rng(0)
    vid = rng.integers(0, 50, 500)
    val = rng.random(500)
    base = combine({"vid": vid.copy(), "val": val.copy()}, "sum")
    for seed in range(5):
        perm = np.random.default_rng(seed).permutation(500)
        out = combine({"vid": vid[perm], "val": val[perm]}, "sum")
        assert np.array_equal(out["vid"], base["vid"])
        assert np.allclose(out["val"], base["val"])


def test_route_partitions_by_owner_and_precombines():
    rng = np.random.default_rng(1)
    vid = rng.integers(0, 100, 1000)
    val = np.ones(1000)
    P = 4
    routed = route({"vid": vid, "val": val}, P, "sum")
    total = 0.0
    for q, payload in enumerate(routed):
        if payload is None:
            continue
        assert (owner_partition(payload["vid"], P) == q).all()
        # pre-combined: unique vids per destination
        assert len(np.unique(payload["vid"])) == len(payload["vid"])
        total += payload["val"].sum()
    assert total == 1000.0


def test_combine_inbound_two_level_equals_global():
    """Sender-side partial + owner-side final == one global combine."""
    rng = np.random.default_rng(2)
    vid = rng.integers(0, 30, 400)
    val = rng.random(400)
    P = 4
    # simulate 3 senders each routing a slice
    chunks = np.array_split(np.arange(400), 3)
    per_dest: list[list] = [[] for _ in range(P)]
    for c in chunks:
        routed = route({"vid": vid[c], "val": val[c]}, P, "sum")
        for q in range(P):
            per_dest[q].append(routed[q])
    got = {}
    for q in range(P):
        fin = combine_inbound(per_dest[q], "sum")
        if fin is not None:
            got.update(dict(zip(fin["vid"].tolist(), fin["val"].tolist())))
    exp = combine({"vid": vid, "val": val}, "sum")
    expd = dict(zip(exp["vid"].tolist(), exp["val"].tolist()))
    assert set(got) == set(expd)
    for k in expd:
        assert abs(got[k] - expd[k]) < 1e-12


def test_push_combined_compact_channel_equals_generic():
    # push_combined's compact dense/sparse payloads + the mapped owner-side
    # combine must equal the generic (vid,val) route+combine path exactly
    import numpy as np

    from drone_ray.graph.csr import PartitionGraph
    from drone_ray.graph.messages import combine_inbound_local, route
    from drone_ray.hashing import owner_partition

    rng = np.random.default_rng(5)
    P = 4
    src = rng.integers(0, 200, 3000).astype(np.int64)
    dst = rng.integers(0, 200, 3000).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    vids = np.unique(np.concatenate([src, dst]))
    graphs = []
    for p in range(P):
        owned = vids[owner_partition(vids, P) == p]
        sel = np.isin(owner_partition(src, P), [p])
        graphs.append(PartitionGraph(p, P, owned, src[sel], dst[sel]))

    for op in ("sum", "min"):
        # every sender pushes a value per owned vertex along its out-edges
        compact_payloads = [[None] * P for _ in range(P)]  # [receiver][sender]
        generic_payloads = [[None] * P for _ in range(P)]
        for p, g in enumerate(graphs):
            rows = np.arange(g.n)
            vals = (g.owned % 17).astype(np.float64) + p
            routed, _ = g.push_combined(rows, vals, op=op)
            dsts, vv = g.push(rows, vals)
            gen = route({"vid": dsts, "val": vv}, P, op, precombine=True)
            for q in range(P):
                compact_payloads[q][p] = routed[q]
                generic_payloads[q][p] = gen[q]
        for q, g in enumerate(graphs):
            # register static boundaries like the harness handshake does
            g._in_idx_full = [
                g.local_index(graphs[s].outbound_boundary(q, remote_only=False))
                for s in range(P)
            ]
            g._in_idx_rem = [
                g.local_index(graphs[s].outbound_boundary(q, remote_only=True))
                for s in range(P)
            ]
            got = combine_inbound_local(g, compact_payloads[q], op)
            exp = combine_inbound_local(g, generic_payloads[q], op)
            assert got is not None and exp is not None
            assert np.array_equal(got["vid"], exp["vid"])
            assert np.array_equal(got["val"], exp["val"])
            assert np.array_equal(got["li"], g.local_index(got["vid"]))


def test_route_and_combine_2d_max_registers():
    """2-D uint8 register payloads (HyperANF): route()'s precombine and the
    owner combine reduce by elementwise max, identity 0, vs a dict brute."""
    rng = np.random.default_rng(3)
    n, R, P = 40, 8, 3
    vids = rng.integers(0, 12, n).astype(np.int64)
    vals = rng.integers(0, 60, (n, R)).astype(np.uint8)

    expect: dict[int, np.ndarray] = {}
    for v, row in zip(vids.tolist(), vals):
        expect[v] = np.maximum(expect.get(v, np.zeros(R, np.uint8)), row)

    routed = route({"vid": vids, "val": vals}, P, "max", precombine=True)
    got: dict[int, np.ndarray] = {}
    for q, m in enumerate(routed):
        if m is None:
            continue
        assert (owner_partition(m["vid"], P) == q).all()
        for v, row in zip(m["vid"].tolist(), m["val"]):
            assert v not in got  # precombine deduped per destination
            got[v] = row
    assert set(got) == set(expect)
    for v in expect:
        assert np.array_equal(got[v], expect[v])
