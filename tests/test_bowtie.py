"""Bowtie decomposition vs a hand-planted Broder structure."""

import numpy as np
import pyarrow as pa

from drone_ray.pipelines.analytics import bowtie


def _edges_ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )


# core: 0→1→2→0; in: 11→10→0; out: 2→20→21; tendril off IN: 10→30;
# tube IN→OUT bypassing core: 10→31→20; disconnected: 40→41 and the
# 2-cycle 50↔51 (a smaller SCC in another weak component)
_SRC = [0, 1, 2, 10, 11, 2, 20, 10, 10, 31, 40, 50, 51]
_DST = [1, 2, 0, 0, 10, 20, 21, 30, 31, 20, 41, 51, 50]

_EXPECTED = {
    0: "core", 1: "core", 2: "core",
    10: "in", 11: "in",
    20: "out", 21: "out",
    30: "tendril", 31: "tendril",
    40: "disconnected", 41: "disconnected",
    50: "disconnected", 51: "disconnected",
}


def _classes(num_partitions):
    got = bowtie(
        lambda: _edges_ds(_SRC, _DST),
        f"bowtie_planted_p{num_partitions}",
        num_partitions=num_partitions,
    ).to_pandas()
    return {int(r["vid"]): r["bowtie_class"] for _, r in got.iterrows()}


def test_bowtie_planted():
    assert _classes(2) == _EXPECTED


def test_bowtie_partition_invariance():
    assert _classes(1) == _classes(4) == _EXPECTED
