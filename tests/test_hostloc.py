"""Host-locality ownership (hashing.Ownership mode "host").

Partitioning is a pure performance choice — results must be bit-identical
to page-hash ownership — and co-locating same-site pages must actually cut
cross-partition message volume (the METIS edge-cut rationale the reference
applies offline, /root/reference/src/preprocess.py:2-27).
"""

import numpy as np
import pytest

from drone_ray.hashing import Ownership, hash_url, url_host

HB = 18


def _edges_tables(n_hosts=8, pages_per_host=40, intra=0.8, seed=7):
    """Deterministic host-structured link graph with host-layout vids."""
    rng = np.random.default_rng(seed)
    urls = [
        f"https://h{k}.example/p/{i}" for k in range(n_hosts) for i in range(pages_per_host)
    ]
    vids = np.array([hash_url(u, HB) for u in urls], dtype=np.int64)
    host_of = np.repeat(np.arange(n_hosts), pages_per_host)
    src, dst = [], []
    for a in range(len(urls)):
        for _ in range(4):
            if rng.random() < intra:
                cand = np.flatnonzero(host_of == host_of[a])
            else:
                cand = np.arange(len(urls))
            b = int(rng.choice(cand))
            if b != a:
                src.append(vids[a])
                dst.append(vids[b])
    import pyarrow as pa

    return pa.table(
        {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    )


def test_hash_url_host_prefix_layout():
    a = hash_url("https://h3.example/p/1", HB)
    b = hash_url("https://h3.example/p/2", HB)
    c = hash_url("https://h4.example/p/1", HB)
    shift = 63 - HB
    assert a >> shift == b >> shift
    assert a >> shift != c >> shift
    # host_bits=0 stays the round-1 page hash
    assert hash_url("https://h3.example/p/1") != a
    assert url_host("https://h3.example/p/1") == "h3.example"


def test_host_ownership_colocates_and_salts():
    own = Ownership("host", HB)
    vids = np.array([hash_url(f"https://h1.example/p/{i}", HB) for i in range(50)])
    parts = own.of(vids, 8)
    assert (parts == parts[0]).all()
    # salting the host's prefix spreads its pages back out
    pref = int(own.prefix_of(vids[:1])[0])
    salted = Ownership("host", HB, [pref])
    sparts = salted.of(vids, 8)
    assert len(set(sparts.tolist())) > 1
    # a different (unsalted) host stays co-located
    other = np.array([hash_url(f"https://h2.example/p/{i}", HB) for i in range(50)])
    assert (salted.of(other, 8) == salted.of(other, 8)[0]).all()


def test_ownership_roundtrip():
    own = Ownership("host", HB, [5, 99], placed={7: 3, 123: 11})
    d = own.to_dict()
    back = Ownership.from_dict(d)
    v = np.arange(1000, dtype=np.int64) << (63 - HB)
    assert (own.of(v, 16) == back.of(v, 16)).all()
    assert Ownership.from_dict(None).mode == "page"
    # placed prefixes route to their assigned partition; salted wins over placed
    pv = np.array([7 << (63 - HB), (7 << (63 - HB)) | 12345], dtype=np.int64)
    assert (own.of(pv, 16) == 3).all()
    both = Ownership("host", HB, salted=[7], placed={7: 3})
    spread = both.of(np.arange(50, dtype=np.int64) | np.int64(7 << (63 - HB)), 16)
    assert len(set(spread.tolist())) > 1


def test_greedy_placement_balances_heavy_hosts(tmp_path):
    """Top-K heavy hosts are packed onto the lightest partitions — max/mean
    partition load must drop vs plain prefix hashing."""
    import pyarrow as pa
    import ray.data as rd

    from drone_ray.graph.partition import detect_mega_hosts

    rng = np.random.default_rng(9)
    # 64 hosts with skewed sizes (but none over the salt threshold)
    sizes = (400 / np.arange(1, 65) ** 0.8).astype(int) + 5
    vids = np.concatenate(
        [
            np.array([hash_url(f"https://s{k}.example/p/{i}", HB) for i in range(s)])
            for k, s in enumerate(sizes)
        ]
    )
    src = vids[rng.integers(0, len(vids), 6000)]
    dst = vids[rng.integers(0, len(vids), 6000)]
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    own = detect_mega_hosts(edges, num_partitions=8, host_bits=HB)
    assert own.placed_pref.size > 0
    plain = Ownership("host", HB)
    lo = np.bincount(own.of(src, 8), minlength=8)
    lp = np.bincount(plain.of(src, 8), minlength=8)
    assert lo.max() / lo.mean() < lp.max() / lp.mean()
    assert lo.max() / lo.mean() < 1.35


@pytest.mark.usefixtures("ray_session")
def test_host_ownership_identical_results_fewer_boundary_msgs(tmp_path):
    import ray.data as rd

    from drone_ray.graph.harness import run_vertex_program
    from drone_ray.graph.partition import build_graph
    from drone_ray.graph.programs import ConnectedComponents, PageRank

    edges = _edges_tables()
    results = {}
    msgs = {}
    for mode in ("page", "host"):
        own = Ownership(mode, HB) if mode == "host" else None
        man = build_graph(
            rd.from_arrow(edges), str(tmp_path / f"g_{mode}"), 4, dual=True, ownership=own
        )
        pr = run_vertex_program(man, PageRank, {"eps": 1e-10}, max_steps=200)
        t = pr.to_table().sort_by("vid")
        results[mode] = t
        msgs[mode] = sum(m.get("msgs_out", 0) for m in pr.metrics)
        cc = run_vertex_program(man, ConnectedComponents, {}, direction="both")
        results[mode + "_cc"] = cc.to_table().sort_by("vid")
    # PR: same vids, scores equal up to float summation order; CC: exact
    assert results["page"]["vid"].equals(results["host"]["vid"])
    np.testing.assert_allclose(
        results["page"]["score"].to_numpy(),
        results["host"]["score"].to_numpy(),
        atol=1e-9,
    )
    assert results["page_cc"].equals(results["host_cc"])
    # 80% intra-host links ⇒ cross-partition volume must drop substantially
    assert msgs["host"] < 0.6 * msgs["page"]


def test_min_fixpoint_exact_above_2_53():
    """Regression: labels beyond 2^53 must not round through float64.
    (int64 + 0.0 promotes to float64; hash-derived vids corrupted.)"""
    from drone_ray.graph.csr import PartitionGraph
    from drone_ray.graph.programs import _local_min_fixpoint

    base = (1 << 62) + 12345
    # chain 0-1-2-3 with adjacent vids differing by less than float64 ulp
    vids = np.array([base, base + 1, base + 2, base + 3], dtype=np.int64)
    src = np.array([base, base + 1, base + 2, base + 1, base + 2, base + 3])
    dst = np.array([base + 1, base + 2, base + 3, base, base + 1, base + 2])
    g = PartitionGraph(0, 1, vids, src, dst)
    vals = vids.copy()
    _local_min_fixpoint(g, vals)
    assert (vals == base).all()


@pytest.mark.usefixtures("ray_session")
def test_detect_mega_hosts_salts_only_the_giant(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from drone_ray.graph.partition import detect_mega_hosts

    # one mega-site with 90% of all pages + many small sites
    urls = [f"https://mega.example/p/{i}" for i in range(900)] + [
        f"https://s{k}.example/p/{i}" for k in range(20) for i in range(5)
    ]
    vids = np.array([hash_url(u, HB) for u in urls], dtype=np.int64)
    rng = np.random.default_rng(3)
    src = vids[rng.integers(0, len(vids), 4000)]
    dst = vids[rng.integers(0, len(vids), 4000)]
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    own = detect_mega_hosts(edges, num_partitions=8, host_bits=HB)
    mega_pref = int(Ownership("host", HB).prefix_of(vids[:1])[0])
    assert mega_pref in set(int(x) for x in own.salted)
    assert own.salted.size < 5  # small sites stay host-owned
    # with the salt, no partition owns more than ~half the vertices
    parts = own.of(np.unique(vids), 8)
    counts = np.bincount(parts, minlength=8)
    assert counts.max() < 0.5 * counts.sum()


def test_path_fingerprint_detects_inplace_mutation(tmp_path):
    """Registry graph-cache keys fold in path_fingerprint: regenerating a
    testdata parquet in place must change the key (→ layout rebuild)."""
    import pyarrow.parquet as pq

    from drone_ray.pipelines.analytics import path_fingerprint

    import pyarrow as pa

    f = tmp_path / "edges.parquet"
    pq.write_table(pa.table({"src": [1, 2], "dst": [2, 3]}), f)
    fp1 = path_fingerprint(str(tmp_path))
    pq.write_table(pa.table({"src": [9, 8], "dst": [8, 7]}), f)  # same rows, new bytes
    fp2 = path_fingerprint(str(tmp_path))
    assert fp1 != fp2
    assert path_fingerprint(str(tmp_path)) == fp2  # stable when untouched


@pytest.mark.usefixtures("ray_session")
def test_pagerank_pages_hostloc_same_scores():
    """The host-partitioned flagship must produce the same multiset of
    PageRank scores as the page-hash flagship (vids differ by id layout)."""
    from drone_ray.pipelines.queries import q_pagerank_pages, q_pagerank_pages_hostloc

    sf_dir = "/root/testdata/sf0.001"
    a = np.sort(q_pagerank_pages(sf_dir)["score"].to_numpy())
    b = np.sort(q_pagerank_pages_hostloc(sf_dir)["score"].to_numpy())
    assert a.size == b.size
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_placed_partition_count_mismatch_raises():
    """Ownership with a placement detected for P=32 must refuse a graph
    built with fewer partitions (silently dropping edges otherwise)."""
    own = Ownership("host", HB, placed={7: 11})
    v = np.array([(7 << (63 - HB)) | 5], dtype=np.int64)
    assert own.of(v, 16)[0] == 11
    with pytest.raises(ValueError, match="only 8 partitions"):
        own.of(v, 8)
