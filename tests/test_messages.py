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
