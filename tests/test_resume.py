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
