"""Pointer-jumping WCC (large-star/small-star) — O(log n) rounds."""

import numpy as np
import pyarrow as pa
import pytest

from drone_ray.oracles import components_oracle
from drone_ray.pipelines.cc_star import connected_components_star
from tests.graphs import ba_powerlaw


def _ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def _labels_table(ds):
    import pyarrow as pa

    return pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=None)
    )


def _check(src, dst, max_expected_rounds):
    lds, rounds = connected_components_star(_ds(src, dst), num_buckets=8)
    t = _labels_table(lds)
    vids = t["vid"].to_numpy()
    comp = t["component"].to_numpy()
    assert np.unique(vids).size == vids.size  # one label per vertex
    ovids, ocomp = components_oracle(np.asarray(src), np.asarray(dst))
    got = dict(zip(vids.tolist(), comp.tolist()))
    want = dict(zip(ovids.tolist(), ocomp.tolist()))
    assert got == want
    assert rounds <= max_expected_rounds
    return rounds


@pytest.mark.usefixtures("ray_session")
def test_chain_converges_in_log_rounds():
    # a 1024-chain needs ~1024 supersteps under min-label propagation;
    # star contraction must finish in O(log n) rounds
    n = 1024
    src = np.arange(n - 1, dtype=np.int64)
    dst = np.arange(1, n, dtype=np.int64)
    rounds = _check(src, dst, max_expected_rounds=16)
    assert rounds >= 2


@pytest.mark.usefixtures("ray_session")
def test_random_graph_matches_oracle():
    src, dst = ba_powerlaw(n=500, m=3, seed=21)
    _check(src, dst, max_expected_rounds=16)


@pytest.mark.usefixtures("ray_session")
def test_two_components_and_isolated_pair():
    src = np.array([10, 11, 12, 50, 51], dtype=np.int64)
    dst = np.array([11, 12, 10, 51, 52], dtype=np.int64)
    lds, _ = connected_components_star(_ds(src, dst), num_buckets=4)
    t = _labels_table(lds)
    got = dict(zip(t["vid"].to_pylist(), t["component"].to_pylist()))
    assert got == {10: 10, 11: 10, 12: 10, 50: 50, 51: 50, 52: 50}


@pytest.mark.usefixtures("ray_session")
def test_added_slice_skips_empty_schema_blocks():
    """Regression: Ray Data can hand UDFs zero-row blocks whose schema is
    EMPTY (no columns); indexing t['src'] on one raised KeyError inside
    the incremental added-edge slicer at the 1e9-edge scale demo."""
    import pyarrow as pa
    import ray

    from drone_ray.hashing import Ownership
    from drone_ray.pipelines.analytics import _added_slice

    own = Ownership(mode="page").to_dict()
    good = pa.table(
        {"src": pa.array([0, 1], pa.int64()), "dst": pa.array([1, 2], pa.int64())}
    )
    out = ray.get(_added_slice.remote(0, 1, own, False, pa.table({}), good))
    assert out.column("src").to_pylist() == [0, 1]
    assert out.column("dst").to_pylist() == [1, 2]
    # all-empty input still returns a correctly typed empty table
    out = ray.get(_added_slice.remote(0, 1, own, True, pa.table({})))
    assert out.num_rows == 0 and out.schema.names == ["src", "dst"]
