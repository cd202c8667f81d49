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


def test_cli_sssp_negative(tmp_path):
    import pyarrow as pa

    from drone_ray.oracles import bellman_ford_oracle

    rng = np.random.default_rng(9)
    a = rng.integers(0, 80, 400).astype(np.int64)
    b = rng.integers(0, 80, 400).astype(np.int64)
    src, dst = np.minimum(a, b), np.maximum(a, b)
    keep = src != dst
    src, dst = src[keep], dst[keep]  # DAG: no cycle of any sign
    w = rng.integers(-3, 8, src.size).astype(np.float64)
    edges = str(tmp_path / "edges")
    os.makedirs(edges)
    pq.write_table(
        pa.table({"src": src, "dst": dst, "w": w}),
        os.path.join(edges, "e.parquet"),
    )
    out = str(tmp_path / "bf")
    res = main([
        "sssp-negative", "--edges", edges, "--out", out,
        "--partitions", "2", "--num-cpus", "4",
    ])
    assert res["converged"]
    t = pq.read_table(out)
    got = dict(zip(t["vid"].to_pylist(), t["dist"].to_pylist()))
    exp = bellman_ford_oracle(src, dst, w, int(src.min()))
    assert got == exp


def test_cli_new_graph_commands(tmp_path):
    pages = write_pages(str(tmp_path / "pages"), 200, seed=43)
    edges = str(tmp_path / "edges2")
    main(["build-pages-graph", "--pages", pages, "--out", edges, "--num-cpus", "4"])

    kt = str(tmp_path / "kt")
    res = main(["ktruss", "--edges", edges, "--out", kt, "--k", "3",
                "--partitions", "2", "--num-cpus", "4"])
    assert res["k"] == 3 and res["n_edges"] >= 0
    assert glob.glob(os.path.join(kt, "*.parquet"))

    bt = str(tmp_path / "bt")
    res = main(["bowtie", "--edges", edges, "--out", bt,
                "--partitions", "2", "--num-cpus", "4"])
    assert res["n_vertices"] > 0
    t = pq.read_table(bt)
    assert set(t.column_names) == {"vid", "bowtie_class"}

    rw = str(tmp_path / "rw")
    res = main(["random-walks", "--edges", edges, "--out", rw,
                "--walk-length", "3", "--partitions", "2", "--num-cpus", "4"])
    assert res["steps"] >= 1
    t = pq.read_table(rw)
    assert set(t.column_names) == {"walk_id", "step", "vid"}
    assert t.num_rows > 0


def test_cli_fourth_wave_commands(tmp_path):
    pages = write_pages(str(tmp_path / "pages4"), 150, seed=43)
    edges = str(tmp_path / "edges4")
    main(["build-pages-graph", "--pages", pages, "--out", edges, "--num-cpus", "4"])

    sa = str(tmp_path / "salsa")
    res = main(["salsa", "--edges", edges, "--out", sa, "--iters", "4",
                "--partitions", "2", "--num-cpus", "4"])
    assert res["converged"] and res["steps"] >= 8
    t = pq.read_table(sa)
    assert set(t.column_names) == {"vid", "auth", "hub"}

    hf = str(tmp_path / "hanf")
    res = main(["hyperanf", "--edges", edges, "--out", hf,
                "--partitions", "2", "--num-cpus", "4"])
    assert res["nf_steps"] >= 1 and res["effective_diameter"] >= 0
    assert pq.read_table(os.path.join(hf, "nf.parquet")).num_rows == res["nf_steps"]

    ms = str(tmp_path / "mis")
    res = main(["mis", "--edges", edges, "--out", ms,
                "--partitions", "2", "--num-cpus", "4"])
    assert res["converged"]
    t = pq.read_table(ms)
    assert set(t.column_names) == {"vid", "in_mis"}

    co = str(tmp_path / "col")
    res = main(["coloring", "--edges", edges, "--out", co,
                "--partitions", "2", "--num-cpus", "4"])
    assert res["converged"]
    t = pq.read_table(co)
    assert set(t.column_names) == {"vid", "color"}
    assert t["color"].to_pandas().min() >= 0


def test_cli_reads_reference_txt_edge_list(tmp_path):
    """S1 parity at the CLI: a reference-style TXT edge list (src dst
    [weight], weight ignored) drives pagerank to the same result as the
    parquet path."""
    rng = np.random.default_rng(13)
    src = rng.integers(0, 40, 150).astype(np.int64)
    dst = rng.integers(0, 40, 150).astype(np.int64)
    txt = tmp_path / "edges.txt"
    with open(txt, "w") as f:
        f.write("# comment line tolerated\n")
        for s, d in zip(src, dst):
            f.write(f"{s} {d} 1.0\n")
    out = str(tmp_path / "pr_txt")
    res = main(["pagerank", "--edges", str(txt), "--out", out,
                "--partitions", "2", "--num-cpus", "4"])
    assert res["converged"]
    t = pq.read_table(out).to_pandas().sort_values("vid")
    ovids, opr = pagerank_oracle(src, dst)
    assert np.array_equal(t["vid"].to_numpy(), ovids)
    assert np.abs(t["score"].to_numpy() - opr).max() < 1e-6


def test_cli_weighted_refuses_txt(tmp_path):
    import pytest

    txt = tmp_path / "edges.txt"
    txt.write_text("0 1 2.5\n")
    with pytest.raises(SystemExit):
        main(["sssp-weighted", "--edges", str(txt),
              "--out", str(tmp_path / "o"), "--num-cpus", "4"])
