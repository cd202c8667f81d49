"""Edge finalization operators (dedup D3, degrees G7, symmetrize) vs pandas."""

import numpy as np
import pandas as pd
import pyarrow as pa

from drone_ray.stages.edges import dedup_edges, in_degrees, out_degrees, symmetrize


def _ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


def _rand(n=2000, v=100, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, v, n).astype(np.int64), rng.integers(0, v, n).astype(np.int64)


def test_dedup_edges():
    src, dst = _rand()
    got = dedup_edges(_ds(src, dst)).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    exp = (
        pd.DataFrame({"src": src, "dst": dst})
        .drop_duplicates()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_out_degrees_and_in_degrees():
    src, dst = _rand(seed=1)
    got = out_degrees(_ds(src, dst)).to_pandas().sort_values("src").reset_index(drop=True)
    exp = (
        pd.DataFrame({"src": src})
        .groupby("src")
        .size()
        .rename("out_degree")
        .reset_index()
    )
    pd.testing.assert_frame_equal(got, exp)

    got_in = in_degrees(_ds(src, dst)).to_pandas().sort_values("dst").reset_index(drop=True)
    exp_in = (
        pd.DataFrame({"dst": dst}).groupby("dst").size().rename("in_degree").reset_index()
    )
    pd.testing.assert_frame_equal(got_in, exp_in)


def test_symmetrize():
    src = np.array([1, 2], dtype=np.int64)
    dst = np.array([2, 3], dtype=np.int64)
    got = symmetrize(_ds(src, dst)).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    exp = pd.DataFrame(
        {"src": [1, 2, 2, 3], "dst": [2, 1, 3, 2]}, dtype=np.int64
    ).sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
