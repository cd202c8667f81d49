"""CLI job entry: build-pages-graph → pagerank → sssp over real files."""

import glob
import os

import numpy as np
import pyarrow.parquet as pq

from drone_ray.cli import main
from drone_ray.oracles import pagerank_oracle
from drone_ray.sources.pages import write_pages


def test_cli_end_to_end(tmp_path):
    pages = write_pages(str(tmp_path / "pages"), 300, seed=42)
    edges = str(tmp_path / "edges")
    out = main(["build-pages-graph", "--pages", pages, "--out", edges, "--num-cpus", "4"])
    assert out["n_edges"] > 0

    pr_out = str(tmp_path / "pr")
    res = main(
        ["pagerank", "--edges", edges, "--out", pr_out, "--partitions", "2", "--num-cpus", "4"]
    )
    assert res["converged"]
    files = glob.glob(os.path.join(pr_out, "part-*.parquet"))
    assert len(files) == 2
    t = pq.read_table(pr_out)
    e = pq.read_table(edges)
    ovids, opr = pagerank_oracle(
        e["src"].to_numpy(zero_copy_only=False), e["dst"].to_numpy(zero_copy_only=False)
    )
    got = t.to_pandas().sort_values("vid")
    assert np.array_equal(got["vid"].to_numpy(), ovids)
    assert np.abs(got["score"].to_numpy() - opr).max() < 1e-6

    tri_out = str(tmp_path / "tri")
    main(["triangles", "--edges", edges, "--out", tri_out, "--partitions", "2", "--num-cpus", "4"])
    assert glob.glob(os.path.join(tri_out, "*.parquet"))
