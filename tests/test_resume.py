"""Checkpoint/resume: kill after superstep k, resume, identical results
(FIXTURES.md §6; north rule 'resumable from checkpoint')."""

import numpy as np
import pyarrow as pa

from drone_ray.graph.harness import run_vertex_program
from drone_ray.graph.programs import ConnectedComponents, PageRank
from drone_ray.oracles import components_oracle, pagerank_oracle
from drone_ray.pipelines.analytics import graph_for
from tests.graphs import ba_powerlaw


def _edges_ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


def _sorted(t, col):
    o = np.argsort(t["vid"].to_numpy())
    return t["vid"].to_numpy()[o], t[col].to_numpy()[o]


def test_pagerank_resume_identical(tmp_path):
    src, dst = ba_powerlaw(n=400, m=3, seed=11)
    man = graph_for(lambda: _edges_ds(src, dst), "resume_pr", 2, symmetrize=False)
    ck = str(tmp_path / "ck")

    interrupted = run_vertex_program(
        man, PageRank, {"eps": 1e-10}, checkpoint_dir=ck, checkpoint_every=2, max_steps=5
    )
    assert not interrupted.converged  # we really did stop early

    resumed = run_vertex_program(
        man, PageRank, {"eps": 1e-10}, checkpoint_dir=ck, resume=True
    )
    assert resumed.converged
    vids, scores = _sorted(resumed.to_table(), "score")
    ovids, opr = pagerank_oracle(src, dst)
    assert np.array_equal(vids, ovids)
    assert np.abs(scores - opr).max() < 1e-6

    # uninterrupted run for bit-equality of the final state
    clean = run_vertex_program(man, PageRank, {"eps": 1e-10})
    _, clean_scores = _sorted(clean.to_table(), "score")
    assert np.array_equal(scores, clean_scores)


def test_cc_resume_identical(tmp_path):
    src, dst = ba_powerlaw(n=400, m=3, seed=12)
    man = graph_for(lambda: _edges_ds(src, dst), "resume_cc", 4, symmetrize=True)
    ck = str(tmp_path / "ck")
    run_vertex_program(
        man, ConnectedComponents, {}, checkpoint_dir=ck, checkpoint_every=1, max_steps=1
    )
    resumed = run_vertex_program(man, ConnectedComponents, {}, checkpoint_dir=ck, resume=True)
    vids, comp = _sorted(resumed.to_table(), "component")
    ovids, ocomp = components_oracle(src, dst)
    assert np.array_equal(vids, ovids)
    assert np.array_equal(comp, ocomp)


def test_resume_refuses_mismatched_program(tmp_path):
    # a checkpoint dir written by PageRank must not silently restore into a
    # ConnectedComponents run (mismatched state arrays → wrong results)
    import pytest

    src, dst = ba_powerlaw(n=300, m=3, seed=13)
    man = graph_for(lambda: _edges_ds(src, dst), "resume_mismatch", 2)
    ck = str(tmp_path / "ck")
    run_vertex_program(man, PageRank, {"eps": 1e-10}, max_steps=6,
                       checkpoint_dir=ck, checkpoint_every=2)
    with pytest.raises(ValueError, match="checkpoint"):
        run_vertex_program(man, ConnectedComponents, {}, checkpoint_dir=ck,
                           resume=True, direction="both")


def test_lpa_resume_identical(tmp_path):
    """LPA's ragged count map must survive checkpoints (extra_state)."""
    from drone_ray.graph.programs import LabelPropagation
    from drone_ray.oracles import lpa_oracle

    src, dst = ba_powerlaw(n=400, m=3, seed=13)
    man = graph_for(lambda: _edges_ds(src, dst), "resume_lpa", 2, symmetrize=True)
    ck = str(tmp_path / "ck")
    run_vertex_program(
        man, LabelPropagation, {"max_rounds": 8}, checkpoint_dir=ck,
        checkpoint_every=2, max_steps=3,
    )
    resumed = run_vertex_program(
        man, LabelPropagation, {"max_rounds": 8}, checkpoint_dir=ck, resume=True
    )
    vids, labels = _sorted(resumed.to_table(), "label")
    ovids, olab, _ = lpa_oracle(src, dst, max_rounds=8)
    assert np.array_equal(vids, ovids)
    assert np.array_equal(labels, olab)

    clean = run_vertex_program(man, LabelPropagation, {"max_rounds": 8})
    cvids, clab = _sorted(clean.to_table(), "label")
    assert np.array_equal(labels, clab)


def test_lpa_delta_message_volume(tmp_path):
    """Round-3 delta LPA: after the seeding round, per-round message volume
    tracks changed vertices, not Θ(E) re-broadcast."""
    from drone_ray.graph.programs import LabelPropagation

    src, dst = ba_powerlaw(n=600, m=3, seed=14)
    man = graph_for(lambda: _edges_ds(src, dst), "lpa_delta_vol", 2, symmetrize=True)
    res = run_vertex_program(man, LabelPropagation, {"max_rounds": 10})
    by_step = {}
    for m in res.metrics:
        s = m["step"]
        by_step.setdefault(s, {"msgs": 0, "changed": 0})
        by_step[s]["msgs"] += m.get("msgs_out", 0) + m.get("msgs_self", 0) + m.get("hub_out", 0)
        by_step[s]["changed"] += m.get("n_changed", 0)
    steps = sorted(by_step)
    seed_vol = by_step[steps[0]]["msgs"]
    later = [by_step[s] for s in steps[2:] if by_step[s]["changed"] > 0]
    # every post-seed round with few changes ships far less than the seed
    # broadcast, and volume shrinks as fewer vertices change
    assert any(x["msgs"] < seed_vol / 2 for x in later)
    tail = [by_step[s]["msgs"] for s in steps[2:]]
    assert tail == sorted(tail, reverse=True) or min(tail) < seed_vol / 4


def test_checkpoint_chunked_state_resume(tmp_path):
    """Round-3 checkpoint chunking: multi-row-group state files must resume
    to identical results (forced with a tiny chunk size)."""
    import glob

    import pyarrow.parquet as pq

    src, dst = ba_powerlaw(n=300, m=3, seed=15)
    man = graph_for(lambda: _edges_ds(src, dst), "resume_chunked", 2, symmetrize=False)
    ck = str(tmp_path / "ck")
    run_vertex_program(
        man, PageRank, {"eps": 1e-10}, checkpoint_dir=ck, checkpoint_every=2,
        max_steps=5, checkpoint_chunk_rows=17,
    )
    state_files = glob.glob(f"{ck}/step=*/state-*.parquet")
    assert state_files
    assert all(pq.ParquetFile(f).num_row_groups > 1 for f in state_files)

    resumed = run_vertex_program(
        man, PageRank, {"eps": 1e-10}, checkpoint_dir=ck, resume=True
    )
    assert resumed.converged
    clean = run_vertex_program(man, PageRank, {"eps": 1e-10})
    _, rs = _sorted(resumed.to_table(), "score")
    _, cs = _sorted(clean.to_table(), "score")
    assert np.array_equal(rs, cs)


def test_weighted_sssp_resume_identical(tmp_path):
    """Weighted distances must survive a mid-run checkpoint: the pending
    inbound min-messages carry float dists and the weight lanes reload
    from the layout on resume."""
    from drone_ray.graph.programs import WeightedSSSP
    from drone_ray.oracles import dijkstra_oracle

    rng = np.random.default_rng(9)
    src, dst = ba_powerlaw(n=400, m=3, seed=13)
    w = rng.integers(1, 8, src.size).astype(np.float64)

    def wds():
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"src": src, "dst": dst, "w": pa.array(w, pa.float64())})
        )

    source = int(src.min())
    man = graph_for(lambda: wds(), "resume_wsssp_v1", 3, weight_col="w")
    ck = str(tmp_path / "ck")

    interrupted = run_vertex_program(
        man, WeightedSSSP, {"source": source},
        checkpoint_dir=ck, checkpoint_every=1, max_steps=1,
    )
    assert not interrupted.converged

    resumed = run_vertex_program(
        man, WeightedSSSP, {"source": source}, checkpoint_dir=ck, resume=True
    )
    assert resumed.converged
    t = resumed.to_table()
    got = dict(zip(t["vid"].to_pylist(), t["dist"].to_pylist()))
    exp = dijkstra_oracle(src, dst, w, source)
    assert set(got) == set(exp)
    for v, dexp in exp.items():
        assert got[v] == dexp, f"vid {v}"

    clean = run_vertex_program(man, WeightedSSSP, {"source": source})
    tc = clean.to_table()
    gclean = dict(zip(tc["vid"].to_pylist(), tc["dist"].to_pylist()))
    assert gclean == got


def test_betweenness_resume_identical(tmp_path):
    """Feedback programs checkpoint too (round 4): the driver's reduced
    feedback persists in the checkpoint manifest and restores on resume,
    so the layered phase machine continues exactly where it stopped."""
    from drone_ray.graph.programs import BetweennessCentrality
    from drone_ray.oracles import betweenness_oracle

    src, dst = ba_powerlaw(n=250, m=3, seed=21)
    sources = [0, 3, 9]
    man = graph_for(lambda: _edges_ds(src, dst), "resume_bc_v1", 3)
    ck = str(tmp_path / "ck")

    interrupted = run_vertex_program(
        man, BetweennessCentrality, {"sources": sources},
        direction="dualview", checkpoint_dir=ck, checkpoint_every=1, max_steps=5,
    )
    assert not interrupted.converged

    resumed = run_vertex_program(
        man, BetweennessCentrality, {"sources": sources},
        direction="dualview", checkpoint_dir=ck, resume=True,
    )
    assert resumed.converged
    t = resumed.to_table()
    got = dict(zip(t["vid"].to_pylist(), t["bc"].to_pylist()))
    exp = betweenness_oracle(src, dst, sources)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9, f"vid {v}"

    clean = run_vertex_program(
        man, BetweennessCentrality, {"sources": sources}, direction="dualview"
    )
    tc = clean.to_table()
    gclean = dict(zip(tc["vid"].to_pylist(), tc["bc"].to_pylist()))
    assert gclean == got  # bit-equal to the uninterrupted run


def test_hits_resume_identical(tmp_path):
    """HITS (global L1 normalizer through feedback) resumes exactly."""
    from drone_ray.graph.programs import HITS
    from drone_ray.oracles import hits_oracle

    src, dst = ba_powerlaw(n=200, m=3, seed=29)
    man = graph_for(lambda: _edges_ds(src, dst), "resume_hits_v1", 2)
    ck = str(tmp_path / "ck")

    interrupted = run_vertex_program(
        man, HITS, {"iters": 8}, direction="dualview",
        checkpoint_dir=ck, checkpoint_every=3, max_steps=7,
    )
    assert not interrupted.converged
    resumed = run_vertex_program(
        man, HITS, {"iters": 8}, direction="dualview",
        checkpoint_dir=ck, resume=True,
    )
    assert resumed.converged
    t = resumed.to_table()
    o = np.argsort(t["vid"].to_numpy())
    vids = t["vid"].to_numpy()[o]
    auth = t["auth"].to_numpy()[o]
    hub = t["hub"].to_numpy()[o]
    ovids, oauth, ohub = hits_oracle(src, dst, iters=8)
    assert np.array_equal(vids, ovids)
    assert np.abs(auth - oauth).max() < 1e-12
    assert np.abs(hub - ohub).max() < 1e-12


def test_salsa_resume_identical(tmp_path):
    """SALSA (pipelined dualview, no feedback) resumes bit-exactly."""
    from drone_ray.graph.programs import SALSA

    src, dst = ba_powerlaw(n=200, m=3, seed=31)
    man = graph_for(lambda: _edges_ds(src, dst), "resume_salsa", 2)
    ck = str(tmp_path / "ck")

    interrupted = run_vertex_program(
        man, SALSA, {"iters": 6}, direction="dualview",
        checkpoint_dir=ck, checkpoint_every=3, max_steps=7,
    )
    assert not interrupted.converged
    resumed = run_vertex_program(
        man, SALSA, {"iters": 6}, direction="dualview",
        checkpoint_dir=ck, resume=True,
    )
    assert resumed.converged
    clean = run_vertex_program(man, SALSA, {"iters": 6}, direction="dualview")
    for col in ("auth", "hub"):
        _, a = _sorted(resumed.to_table(), col)
        _, b = _sorted(clean.to_table(), col)
        assert np.array_equal(a, b)


def test_hyperanf_resume_identical(tmp_path):
    """HyperANF's 2-D uint8 register state survives the list-column
    checkpoint round-trip (reloads int64, coerced) bit-exactly."""
    from drone_ray.graph.programs import HyperANF

    src, dst = ba_powerlaw(n=300, m=3, seed=32)
    man = graph_for(lambda: _edges_ds(src, dst), "resume_hanf", 2)
    ck = str(tmp_path / "ck")

    interrupted = run_vertex_program(
        man, HyperANF, {"p": 6}, direction="rev",
        checkpoint_dir=ck, checkpoint_every=2, max_steps=3,
    )
    assert not interrupted.converged
    resumed = run_vertex_program(
        man, HyperANF, {"p": 6}, direction="rev", checkpoint_dir=ck, resume=True
    )
    assert resumed.converged
    clean = run_vertex_program(man, HyperANF, {"p": 6}, direction="rev")
    _, a = _sorted(resumed.to_table(), "reach_est")
    _, b = _sorted(clean.to_table(), "reach_est")
    assert np.array_equal(a, b)


def test_mis_resume_identical(tmp_path):
    """MIS resumes mid-round to the identical set."""
    from drone_ray.graph.programs import MIS

    src, dst = ba_powerlaw(n=300, m=3, seed=33)
    man = graph_for(lambda: _edges_ds(src, dst), "resume_mis", 2, symmetrize=True)
    ck = str(tmp_path / "ck")

    interrupted = run_vertex_program(
        man, MIS, {}, direction="both",
        checkpoint_dir=ck, checkpoint_every=1, max_steps=2,
    )
    assert not interrupted.converged
    resumed = run_vertex_program(man, MIS, {}, direction="both",
                                 checkpoint_dir=ck, resume=True)
    assert resumed.converged
    clean = run_vertex_program(man, MIS, {}, direction="both")
    _, a = _sorted(resumed.to_table(), "in_mis")
    _, b = _sorted(clean.to_table(), "in_mis")
    assert np.array_equal(a, b)
