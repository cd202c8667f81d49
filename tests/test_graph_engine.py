"""Conformance of the superstep engine vs dense oracles (FIXTURES.md §5) on
the named fixture graphs + seeded power-law, plus partition invariance."""

import numpy as np
import pyarrow as pa
import pytest

from drone_ray.oracles import (
    bfs_oracle,
    components_oracle,
    lpa_oracle,
    pagerank_oracle,
)
from drone_ray.pipelines.analytics import (
    connected_components,
    label_propagation,
    pagerank,
    sssp,
)
from tests.graphs import NAMED, ba_powerlaw


def _edges_ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


def _sorted(t: pa.Table, col: str):
    v = t["vid"].to_numpy()
    o = np.argsort(v)
    return v[o], t[col].to_numpy()[o]


@pytest.mark.parametrize("name", sorted(NAMED))
def test_pagerank_matches_oracle(name):
    src, dst = NAMED[name]()
    res = pagerank(lambda: _edges_ds(src, dst), f"pr_{name}", num_partitions=2)
    vids, scores = _sorted(res.to_table(), "score")
    ovids, opr = pagerank_oracle(src, dst)
    assert np.array_equal(vids, ovids)
    assert np.abs(scores - opr).max() < 1e-6
    assert res.converged


@pytest.mark.parametrize("name", sorted(NAMED))
def test_components_match_oracle(name):
    src, dst = NAMED[name]()
    res = connected_components(lambda: _edges_ds(src, dst), f"cc_{name}", num_partitions=2)
    vids, comp = _sorted(res.to_table(), "component")
    ovids, ocomp = components_oracle(src, dst)
    assert np.array_equal(vids, ovids)
    assert np.array_equal(comp, ocomp)


@pytest.mark.parametrize("name", ["chain", "cycle", "two_cliques", "star"])
def test_lpa_matches_oracle(name):
    src, dst = NAMED[name]()
    res = label_propagation(
        lambda: _edges_ds(src, dst), f"lpa_{name}", num_partitions=2, max_rounds=6
    )
    vids, labels = _sorted(res.to_table(), "label")
    ovids, olab, _ = lpa_oracle(src, dst, max_rounds=6)
    assert np.array_equal(vids, ovids)
    assert np.array_equal(labels, olab)
    # fixpoint invariant: every label is one of the initial labels (= a vid)
    assert np.isin(labels, ovids).all()


@pytest.mark.parametrize("name", ["chain", "star", "dangling", "two_cliques"])
def test_sssp_matches_bfs(name):
    src, dst = NAMED[name]()
    res = sssp(lambda: _edges_ds(src, dst), f"sssp_{name}", source=0, num_partitions=2)
    t = res.to_table()
    got = dict(zip(t["vid"].to_numpy().tolist(), t["dist"].to_numpy().tolist()))
    assert got == bfs_oracle(src, dst, 0)


def test_powerlaw_pagerank_and_cc():
    src, dst = ba_powerlaw(n=2000, m=4, seed=42)
    res = pagerank(lambda: _edges_ds(src, dst), "pr_ba", num_partitions=4)
    vids, scores = _sorted(res.to_table(), "score")
    ovids, opr = pagerank_oracle(src, dst)
    assert np.array_equal(vids, ovids)
    assert np.abs(scores - opr).max() < 1e-6

    res2 = connected_components(lambda: _edges_ds(src, dst), "cc_ba", num_partitions=4)
    vids2, comp = _sorted(res2.to_table(), "component")
    ovids2, ocomp = components_oracle(src, dst)
    assert np.array_equal(comp, ocomp)


def test_partition_invariance():
    """Identical results at P ∈ {1, 2, 8} (FIXTURES.md §6)."""
    src, dst = ba_powerlaw(n=500, m=3, seed=7)
    base_pr = None
    base_cc = None
    for P in (1, 2, 8):
        r = pagerank(lambda: _edges_ds(src, dst), f"inv_pr_{P}", num_partitions=P)
        _, scores = _sorted(r.to_table(), "score")
        rc = connected_components(lambda: _edges_ds(src, dst), f"inv_cc_{P}", num_partitions=P)
        _, comp = _sorted(rc.to_table(), "component")
        if base_pr is None:
            base_pr, base_cc = scores, comp
        else:
            assert np.abs(scores - base_pr).max() < 1e-9
            assert np.array_equal(comp, base_cc)


def test_self_loops_and_duplicate_edges():
    src = np.array([0, 0, 0, 1, 1, 2], dtype=np.int64)
    dst = np.array([1, 1, 0, 2, 2, 0], dtype=np.int64)
    res = pagerank(lambda: _edges_ds(src, dst), "pr_dups", num_partitions=2)
    vids, scores = _sorted(res.to_table(), "score")
    ovids, opr = pagerank_oracle(src, dst)  # oracle dedups identically
    assert np.abs(scores - opr).max() < 1e-6


def test_pipeline_depth_invariance():
    """The superstep speculation window is an execution detail: depths
    1/2/4 run the same number of steps and produce bit-identical scores
    (should_stop only fires on a zero-message step, so speculative steps
    are state-preserving no-ops)."""
    src, dst = ba_powerlaw(n=400, m=3, seed=11)
    base = None
    base_steps = None
    for depth in (1, 2, 4):
        r = pagerank(
            lambda: _edges_ds(src, dst),
            f"depth_{depth}",
            num_partitions=2,
            pipeline_depth=depth,
        )
        _, scores = _sorted(r.to_table(), "score")
        if base is None:
            base, base_steps = scores, r.steps
        else:
            assert np.array_equal(scores, base)
            assert r.steps == base_steps
        assert r.converged


# ---------------------------------------------------------------------------
# HITS (dualview actors + driver-fed global normalizer) and personalized PR


@pytest.mark.parametrize("name", ["chain", "cycle", "two_cliques", "star"])
def test_hits_matches_oracle(name):
    from drone_ray.oracles import hits_oracle
    from drone_ray.pipelines.analytics import hits
    from tests.graphs import NAMED as _N

    src, dst = _N[name]()
    res = hits(lambda: _edges_ds(src, dst), f"hits_{name}", num_partitions=2, iters=12)
    t = res.to_table()
    vids, auth = _sorted(t, "auth")
    _, hub = _sorted(t, "hub")
    ovids, oauth, ohub = hits_oracle(src, dst, iters=12)
    assert np.array_equal(vids, ovids)
    assert np.abs(auth - oauth).max() < 1e-12
    assert np.abs(hub - ohub).max() < 1e-12
    assert res.converged


def test_hits_powerlaw_partition_invariance():
    from drone_ray.oracles import hits_oracle
    from drone_ray.pipelines.analytics import hits

    src, dst = ba_powerlaw(n=800, m=3, seed=9)
    ovids, oauth, ohub = hits_oracle(src, dst, iters=20)
    for P in (1, 4):
        res = hits(lambda: _edges_ds(src, dst), f"hits_pl_{P}", num_partitions=P, iters=20)
        t = res.to_table()
        vids, auth = _sorted(t, "auth")
        _, hub = _sorted(t, "hub")
        assert np.array_equal(vids, ovids)
        assert np.abs(auth - oauth).max() < 1e-12
        assert np.abs(hub - ohub).max() < 1e-12


def test_hits_refuses_legacy_feedback_less_checkpoint(tmp_path):
    """Feedback programs checkpoint since round 4 — but a manifest WITHOUT
    the persisted feedback (written by an older engine) must be refused:
    resuming with a stale/absent global normalizer would silently corrupt
    scores."""
    import json
    import os

    from drone_ray.pipelines.analytics import hits

    src, dst = ba_powerlaw(n=100, m=2, seed=3)
    ck = str(tmp_path / "ck")
    hits(
        lambda: _edges_ds(src, dst),
        "hits_ckpt_legacy",
        num_partitions=2,
        iters=4,
        checkpoint_dir=ck,
        checkpoint_every=2,
        max_steps=5,
    )
    # strip the feedback field to simulate a pre-round-4 checkpoint
    mpaths = sorted(
        os.path.join(ck, d, "manifest.json") for d in os.listdir(ck) if d.startswith("step=")
    )
    assert mpaths
    for mp in mpaths:
        with open(mp) as f:
            doc = json.load(f)
        assert "feedback" in doc  # the new contract writes it
        del doc["feedback"]
        with open(mp, "w") as f:
            json.dump(doc, f)
    with pytest.raises(ValueError, match="predates driver-feedback"):
        hits(
            lambda: _edges_ds(src, dst),
            "hits_ckpt_legacy",
            num_partitions=2,
            iters=4,
            checkpoint_dir=ck,
            resume=True,
        )


def test_ppr_matches_oracle():
    from drone_ray.oracles import ppr_oracle
    from drone_ray.pipelines.analytics import personalized_pagerank

    src, dst = ba_powerlaw(n=600, m=3, seed=5)
    K, MOD = 60, 7
    res = personalized_pagerank(
        lambda: _edges_ds(src, dst),
        "ppr_pl",
        teleport_mod=MOD,
        num_partitions=3,
        eps=0.0,
        max_steps=K + 1,
    )
    vids, scores = _sorted(res.to_table(), "score")
    ovids, opr = ppr_oracle(src, dst, teleport_mod=MOD, iters=K)
    assert np.array_equal(vids, ovids)
    assert np.abs(scores - opr).max() < 1e-10
    # teleport-set members anchor positive mass; far-away leaves can be 0
    assert scores[vids % MOD == 0].min() > 0.1


def test_kcore_matches_peeling_oracle():
    from drone_ray.oracles import kcore_oracle
    from drone_ray.pipelines.analytics import kcore

    src, dst = ba_powerlaw(n=700, m=4, seed=11)
    for k in (3, 5, 8):
        res = kcore(
            lambda: _edges_ds(src, dst), f"kcore_pl_k{k}", num_partitions=3, k=k
        )
        t = res.to_table()
        vids, cdeg = _sorted(t, "core_deg")
        ovids, odeg = kcore_oracle(src, dst, k)
        assert np.array_equal(vids, ovids), f"k={k} member mismatch"
        assert np.array_equal(cdeg, odeg), f"k={k} core_deg mismatch"


def test_kcore_derived_k():
    """k=None derives k = global_min_degree + offset via driver feedback."""
    from drone_ray.oracles import kcore_oracle
    from drone_ray.pipelines.analytics import kcore

    src, dst = ba_powerlaw(n=500, m=3, seed=13)
    # brute min undirected degree
    s2 = np.concatenate([src, dst]); d2 = np.concatenate([dst, src])
    keep = s2 != d2
    pairs = np.unique(np.stack([s2[keep], d2[keep]], axis=1), axis=0)
    vids_all, counts = np.unique(pairs[:, 0], return_counts=True)
    k_expected = int(counts.min()) + 2
    res = kcore(
        lambda: _edges_ds(src, dst), "kcore_pl_auto", num_partitions=2, offset=2
    )
    vids, cdeg = _sorted(res.to_table(), "core_deg")
    ovids, odeg = kcore_oracle(src, dst, k_expected)
    assert np.array_equal(vids, ovids)
    assert np.array_equal(cdeg, odeg)


def test_kcore_whole_graph_is_core():
    """k below the degree floor: nothing peels, core = whole graph."""
    from drone_ray.pipelines.analytics import kcore
    from tests.graphs import NAMED as _N

    src, dst = _N["two_cliques"]()
    res = kcore(lambda: _edges_ds(src, dst), "kcore_clique_low", num_partitions=2, k=2)
    t = res.to_table()
    assert t.num_rows == np.unique(np.concatenate([src, dst])).size
    assert res.converged


def test_coreness_matches_brute_force():
    from drone_ray.pipelines.analytics import coreness

    src, dst = ba_powerlaw(n=900, m=4, seed=17)
    res = coreness(lambda: _edges_ds(src, dst), "coreness_pl", num_partitions=3)
    vids, core = _sorted(res.to_table(), "coreness")

    # brute h-index fixpoint on the symmetrized deduped graph
    s2 = np.concatenate([src, dst]); d2 = np.concatenate([dst, src])
    keep = s2 != d2
    pairs = np.unique(np.stack([s2[keep], d2[keep]], axis=1), axis=0)
    s2, d2 = pairs[:, 0], pairs[:, 1]
    ov = np.unique(s2)
    si = np.searchsorted(ov, s2); di = np.searchsorted(ov, d2)
    n = ov.size
    indptr = np.searchsorted(si, np.arange(n + 1))
    c = np.bincount(si, minlength=n).astype(np.int64)
    while True:
        new = np.empty(n, np.int64)
        for v in range(n):
            vals = np.sort(c[di[indptr[v]:indptr[v + 1]]])[::-1]
            h = 0
            for i, x in enumerate(vals, 1):
                if x >= i:
                    h = i
                else:
                    break
            new[v] = h
        if np.array_equal(new, c):
            break
        c = new
    assert np.array_equal(vids, ov)
    assert np.array_equal(core, c)
    assert res.converged


def test_coreness_partition_invariance():
    from drone_ray.pipelines.analytics import coreness

    src, dst = ba_powerlaw(n=400, m=3, seed=19)
    base = None
    for P in (1, 2, 5):
        res = coreness(lambda: _edges_ds(src, dst), f"coreness_pi_{P}", num_partitions=P)
        vids, core = _sorted(res.to_table(), "coreness")
        if base is None:
            base = (vids, core)
        else:
            assert np.array_equal(vids, base[0])
            assert np.array_equal(core, base[1])


# ---------------------------------------------------------------------------
# SCC (forward-max coloring + backward marking on dualview actors)


def _scc_brute(src, dst):
    """Closure-based SCC labels (max member vid) for small graphs."""
    vids = np.unique(np.concatenate([src, dst]))
    n = vids.size
    si = np.searchsorted(vids, src)
    di = np.searchsorted(vids, dst)
    R = np.eye(n, dtype=bool)
    A = np.zeros((n, n), dtype=bool)
    A[si, di] = True
    while True:
        R2 = R | (R @ A)
        if (R2 == R).all():
            break
        R = R2
    M = R & R.T
    return vids, np.array([vids[np.flatnonzero(M[i])].max() for i in range(n)])


@pytest.mark.parametrize("name", ["chain", "cycle", "two_cliques", "star", "dangling"])
def test_scc_matches_closure_oracle(name):
    from drone_ray.pipelines.analytics import scc
    from tests.graphs import NAMED as _N

    src, dst = _N[name]()
    res = scc(lambda: _edges_ds(src, dst), f"scc_{name}", num_partitions=2, max_steps=400)
    vids, lab = _sorted(res.to_table(), "scc")
    ovids, olab = _scc_brute(src, dst)
    assert np.array_equal(vids, ovids)
    assert np.array_equal(lab, olab)
    assert res.converged


def test_scc_random_partition_invariance():
    from drone_ray.pipelines.analytics import scc

    rng = np.random.default_rng(23)
    s = rng.integers(0, 120, 700)
    d = rng.integers(0, 120, 700)
    keep = s != d
    src, dst = s[keep].astype(np.int64), d[keep].astype(np.int64)
    ovids, olab = _scc_brute(src, dst)
    for P in (1, 4):
        res = scc(lambda: _edges_ds(src, dst), f"scc_rand_{P}", num_partitions=P, max_steps=400)
        vids, lab = _sorted(res.to_table(), "scc")
        assert np.array_equal(vids, ovids)
        assert np.array_equal(lab, olab)


def test_scc_converges_on_dag_like_graph():
    """Preferential-attachment graphs are DAGs (every SCC a singleton) —
    the coloring algorithm without trimming degenerates to O(n) rounds
    here; with the trim phase it must converge quickly and exactly."""
    from drone_ray.pipelines.analytics import scc

    src, dst = ba_powerlaw(n=1500, m=3, seed=29)
    res = scc(lambda: _edges_ds(src, dst), "scc_dag", num_partitions=3, max_steps=120)
    assert res.converged
    assert res.steps < 100
    vids, lab = _sorted(res.to_table(), "scc")
    # a DAG: every vertex is its own SCC
    assert np.array_equal(lab, vids)


def test_incremental_pagerank_matches_cold_and_is_cheaper():
    """IncEval parity: warm-start on base+added equals a cold run on the
    updated graph (unique fixpoint) at a fraction of the traversals."""
    from drone_ray.pipelines.analytics import pagerank, pagerank_incremental

    src, dst = ba_powerlaw(n=2000, m=4, seed=43)
    P31 = np.uint64(2**31 - 1)
    h = (
        (src.astype(np.uint64) % P31) * np.uint64(1103515245)
        + (dst.astype(np.uint64) % P31) * np.uint64(12345)
    ) % P31 % np.uint64(100)
    addm = h < 1
    bs, bd = src[~addm], dst[~addm]
    as_, ad = src[addm], dst[addm]
    assert as_.size > 10

    _, r2 = pagerank_incremental(
        lambda: _edges_ds(bs, bd),
        lambda: _edges_ds(src, dst),
        as_,
        ad,
        "incpr_t_base",
        "incpr_t_full",
        num_partitions=3,
        eps=1e-12,
    )
    cold = pagerank(lambda: _edges_ds(src, dst), "incpr_t_full", 3, eps=1e-12)
    wv, ws = _sorted(r2.to_table(), "score")
    cv, cs = _sorted(cold.to_table(), "score")
    assert np.array_equal(wv, cv)
    assert np.abs(ws - cs).max() < 1e-8
    assert r2.edges_traversed < cold.edges_traversed * 0.6


def test_katz_safe_default_and_divergence_guard():
    """ADVICE r4: a bare KatzCentrality() must not inherit PageRank's 0.85
    damping as the attenuation alpha; a diverging alpha must raise rather
    than silently emit exponentially-growing scores."""
    import warnings as _w

    from drone_ray.graph.programs import KatzCentrality
    from drone_ray.pipelines.analytics import katz_centrality
    from tests.graphs import cycle

    assert KatzCentrality().damping == 0.01  # conservative default
    assert KatzCentrality(alpha=0.003).damping == 0.003

    # a cycle alone has the all-ones vector as an exact fixpoint of the
    # iteration for ANY alpha; add a chord so lambda_max > 1 and the
    # alpha=2.0 run genuinely diverges: it must raise, not emit garbage
    src, dst = cycle(12)
    src = np.concatenate([src, [0]])
    dst = np.concatenate([dst, [2]])
    with _w.catch_warnings():
        _w.simplefilter("ignore")  # the init_state bound warning is expected
        with pytest.raises(Exception, match="diverged"):
            katz_centrality(
                lambda: _edges_ds(src, dst), "katz_diverge_chord", num_partitions=2,
                alpha=2.0, max_steps=500,
            )


def _hash_split_edges(n=2000, m=4, seed=47, pct=2):
    """Deterministic (base, added) split of a power-law graph by edge hash."""
    src, dst = ba_powerlaw(n=n, m=m, seed=seed)
    P31 = np.uint64(2**31 - 1)
    h = (
        (src.astype(np.uint64) % P31) * np.uint64(1103515245)
        + (dst.astype(np.uint64) % P31) * np.uint64(12345)
    ) % P31 % np.uint64(100)
    addm = h < pct
    return (src[~addm], dst[~addm]), (src[addm], dst[addm]), (src, dst)


def test_incremental_wcc_matches_cold_and_is_cheaper():
    """IncEval parity for WCC: warm-start on base+added equals a cold run
    (unique min-label fixpoint) at a fraction of the traversals."""
    from drone_ray.pipelines.analytics import connected_components, wcc_incremental

    (bs, bd), (as_, ad), (src, dst) = _hash_split_edges(seed=47)
    assert as_.size > 10

    _, r2 = wcc_incremental(
        lambda: _edges_ds(bs, bd),
        lambda: _edges_ds(src, dst),
        as_,
        ad,
        "incwcc_t_base",
        "incwcc_t_full",
        num_partitions=3,
    )
    cold = connected_components(lambda: _edges_ds(src, dst), "incwcc_t_full", 3)
    wv, wl = _sorted(r2.to_table(), "component")
    cv, cl = _sorted(cold.to_table(), "component")
    assert np.array_equal(wv, cv)
    assert np.array_equal(wl, cl)
    assert r2.edges_traversed < cold.edges_traversed * 0.6


def test_incremental_sssp_matches_cold_and_is_cheaper():
    """IncEval parity for SSSP: warm distances equal the cold run on the
    updated graph, relaxing only the improved regions."""
    from drone_ray.pipelines.analytics import sssp, sssp_incremental

    (bs, bd), (as_, ad), (src, dst) = _hash_split_edges(seed=53)
    assert as_.size > 10
    source = int(src.min())

    _, r2 = sssp_incremental(
        lambda: _edges_ds(bs, bd),
        lambda: _edges_ds(src, dst),
        as_,
        ad,
        "incsssp_t_base",
        "incsssp_t_full",
        source,
        num_partitions=3,
    )
    cold = sssp(lambda: _edges_ds(src, dst), "incsssp_t_full", source, 3)
    wt, ct = r2.to_table(), cold.to_table()
    wmap = dict(zip(wt["vid"].to_numpy().tolist(), wt["dist"].to_numpy().tolist()))
    cmap = dict(zip(ct["vid"].to_numpy().tolist(), ct["dist"].to_numpy().tolist()))
    assert wmap == cmap
    assert r2.edges_traversed < cold.edges_traversed


def test_seed_bfs_matches_multi_source_oracle():
    """Multi-source BFS dist == min over per-seed BFS oracles."""
    from drone_ray.pipelines.analytics import seed_bfs

    src, dst = ba_powerlaw(n=600, m=3, seed=21)
    mod = 50
    res = seed_bfs(lambda: _edges_ds(src, dst), "seedbfs_pl600", mod,
                   num_partitions=3)
    t = res.to_table()
    got = dict(zip(t["vid"].to_numpy().tolist(), t["dist"].to_numpy().tolist()))

    vs = np.unique(np.concatenate([src, dst]))
    expect: dict[int, float] = {}
    for s0 in vs[vs % mod == 0]:
        for v, d in bfs_oracle(src, dst, int(s0)).items():
            if v not in expect or d < expect[v]:
                expect[v] = d
    assert got == expect


@pytest.mark.parametrize("name", ["chain", "cycle", "two_cliques", "star"])
def test_eigenvector_matches_oracle(name):
    from drone_ray.oracles import eigenvector_oracle
    from drone_ray.pipelines.analytics import eigenvector_centrality
    from tests.graphs import NAMED as _N

    src, dst = _N[name]()
    res = eigenvector_centrality(
        lambda: _edges_ds(src, dst), f"eig_{name}", num_partitions=2, iters=12
    )
    t = res.to_table()
    vids, x = _sorted(t, "x")
    ovids, ox = eigenvector_oracle(src, dst, iters=12)
    assert np.array_equal(vids, ovids)
    assert np.abs(x - ox).max() < 1e-12
    assert res.converged


def test_eigenvector_powerlaw_partition_invariance():
    from drone_ray.oracles import eigenvector_oracle
    from drone_ray.pipelines.analytics import eigenvector_centrality

    src, dst = ba_powerlaw(n=600, m=3, seed=5)
    ovids, ox = eigenvector_oracle(src, dst, iters=20)
    for P in (1, 4):
        res = eigenvector_centrality(
            lambda: _edges_ds(src, dst), f"eig_pl_{P}", num_partitions=P, iters=20
        )
        t = res.to_table()
        vids, x = _sorted(t, "x")
        assert np.array_equal(vids, ovids)
        assert np.abs(x - ox).max() < 1e-12
