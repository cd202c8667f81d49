"""Source readers: edge-list text (S1), synthetic power-law edges."""

import numpy as np

from drone_ray.sources.synthetic_edges import edge_batch, power_law_edges
from drone_ray.sources.text import parse_edge_lines, read_edge_text


def test_parse_edge_lines_ignores_weight_and_junk():
    import pyarrow as pa

    batch = pa.table(
        {"text": ["1 2", "3 4 0.7", "", "# comment", "x y", "5 6 1.0 extra"]}
    )
    out = parse_edge_lines(batch)
    assert out["src"].to_pylist() == [1, 3, 5]
    assert out["dst"].to_pylist() == [2, 4, 6]


def test_read_edge_text(tmp_path):
    p = tmp_path / "G.0"
    p.write_text("0 1 1.0\n1 2 1.0\n2 0\n")
    ds = read_edge_text(str(p))
    df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert df["src"].tolist() == [0, 1, 2]
    assert df["dst"].tolist() == [1, 2, 0]


def test_synthetic_edges_deterministic_any_batching():
    a = edge_batch(np.arange(0, 1000), 10_000, seed=7)
    b1 = edge_batch(np.arange(0, 500), 10_000, seed=7)
    b2 = edge_batch(np.arange(500, 1000), 10_000, seed=7)
    import pyarrow as pa

    joined = pa.concat_tables([b1, b2])
    assert a["src"].to_pylist() == joined["src"].to_pylist()
    assert a["dst"].to_pylist() == joined["dst"].to_pylist()


def test_power_law_edges_skew():
    t = edge_batch(np.arange(200_000), 50_000, seed=42)
    src = np.asarray(t["src"])
    # heavy head: the most popular vertex holds a macroscopic share
    _, counts = np.unique(src, return_counts=True)
    assert counts.max() > 50  # skewed
    assert counts.max() > 20 * np.median(counts)
