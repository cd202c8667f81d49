"""Text-format sources matching the reference's on-disk inputs.

S1 — edge-list reader: whitespace-separated ``src dst [weight]`` lines; the
weight column is ignored and forced to 1.0, exactly like the reference's
loader (/root/reference/src/graph/graph.go:335-362, weight := 1.0).

S6 — pattern-graph reader: adjacency lines ``nodeId attr numTargets t1 t2 …``
(/root/reference/src/graph/graph.go:303-329; fixture src/pattern.txt). The
pattern graph is tiny, so it is parsed driver-side and broadcast via ray.put.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def parse_edge_lines(batch: pa.Table) -> pa.Table:
    """map_batches body for ray.data.read_text output (column ``text``)."""
    srcs: list[int] = []
    dsts: list[int] = []
    for line in batch["text"].to_pylist():
        parts = line.split()
        if len(parts) < 2:
            continue  # blank/comment lines tolerated
        try:
            s, d = int(parts[0]), int(parts[1])
        except ValueError:
            continue
        srcs.append(s)
        dsts.append(d)  # parts[2] (weight) deliberately ignored → 1.0
    return pa.table(
        {
            "src": pa.array(np.array(srcs, np.int64)),
            "dst": pa.array(np.array(dsts, np.int64)),
        }
    )


def read_edge_text(paths) -> "ray.data.Dataset":  # noqa: F821
    import ray.data as rd

    return rd.read_text(paths).map_batches(parse_edge_lines, batch_format="pyarrow", batch_size=None)


class PatternGraph:
    """Tiny query graph for graph simulation: node → attr, node → targets."""

    def __init__(self, attrs: dict[int, int], targets: dict[int, list[int]]):
        self.attrs = attrs
        self.targets = targets
        self.nodes = sorted(attrs)

    @property
    def sources(self) -> dict[int, list[int]]:
        rev: dict[int, list[int]] = {n: [] for n in self.nodes}
        for u, ts in self.targets.items():
            for t in ts:
                rev[t].append(u)
        return rev

    @staticmethod
    def parse(lines) -> "PatternGraph":
        attrs: dict[int, int] = {}
        targets: dict[int, list[int]] = {}
        for line in lines:
            parts = line.split()
            if len(parts) < 3:
                continue
            node, attr, n = int(parts[0]), int(parts[1]), int(parts[2])
            attrs[node] = attr
            targets[node] = [int(t) for t in parts[3 : 3 + n]]
        return PatternGraph(attrs, targets)

    @staticmethod
    def read(path: str) -> "PatternGraph":
        with open(path) as f:
            return PatternGraph.parse(f)
