"""Graph build: hash-partitioned Parquet layout + lineage manifest.

Replaces the reference's offline METIS partitioning into per-worker
``G.<i>/Master.<i>/Mirror.<i>/Degree.<i>`` NFS text files
(/root/reference/src/preprocess.py:2-27, src/graph/graph.go:332-485) with a
single Ray Data pass per table:

    edges    → add ``part = owner(src)``  → write_parquet(partition_cols)
    vertices → per-batch unique vids + ``part = owner(vid)`` → same

The partitioned write *is* the shuffle (each row moves once into its
``part=p/`` directory); there is no groupby. Exact edge dedup happens for
free inside the partition actor (all copies of a (src,dst) pair land in the
same partition because the key is src). The directory layout doubles as the
resumable-output/lineage story: ``graph_manifest.json`` records the layout,
partition count and a content token; downstream checkpoints reference it.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from drone_ray.hashing import owner_partition

MANIFEST_NAME = "graph_manifest.json"


@dataclass
class GraphManifest:
    work_dir: str
    num_partitions: int
    symmetrized: bool
    edges_dir: str
    vertices_dir: str
    source: str = ""
    content_token: str = ""

    def save(self) -> None:
        tmp = os.path.join(self.work_dir, MANIFEST_NAME + ".tmp")
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=1)
        os.replace(tmp, os.path.join(self.work_dir, MANIFEST_NAME))

    @staticmethod
    def load(work_dir: str) -> "GraphManifest":
        with open(os.path.join(work_dir, MANIFEST_NAME)) as f:
            return GraphManifest(**json.load(f))


def _content_token(edges_dir: str) -> str:
    """Cheap lineage token: hash of the sorted (name, size) file listing."""
    h = hashlib.blake2b(digest_size=8)
    for path in sorted(glob.glob(os.path.join(edges_dir, "**", "*.parquet"), recursive=True)):
        h.update(os.path.relpath(path, edges_dir).encode())
        h.update(str(os.path.getsize(path)).encode())
    return h.hexdigest()


def _tag_edges(batch: pa.Table, P: int) -> pa.Table:
    src = batch["src"].to_numpy(zero_copy_only=False)
    part = owner_partition(src, P)
    return pa.table(
        {
            "src": batch["src"],
            "dst": batch["dst"],
            "part": pa.array(part, pa.int32()),
        }
    )


def _tag_vids(batch: pa.Table, P: int) -> pa.Table:
    s = batch["src"].to_numpy(zero_copy_only=False)
    d = batch["dst"].to_numpy(zero_copy_only=False)
    vids = np.unique(np.concatenate([s, d]))
    return pa.table(
        {
            "vid": pa.array(vids, pa.int64()),
            "part": pa.array(owner_partition(vids, P), pa.int32()),
        }
    )


def build_graph(
    edges,
    work_dir: str,
    num_partitions: int,
    symmetrize: bool = False,
    source: str = "",
) -> GraphManifest:
    """Partition an edge Dataset (src:int64, dst:int64) for the superstep engine.

    The pipeline upstream of ``edges`` is executed exactly once (the edges
    write); the vertices table is derived from the *written* edges so
    expensive stages (HTML extraction) are not recomputed.
    """
    import ray.data as rd

    os.makedirs(work_dir, exist_ok=True)
    edges_dir = os.path.join(work_dir, "edges")
    vertices_dir = os.path.join(work_dir, "vertices")

    e = edges
    if symmetrize:
        from drone_ray.stages.edges import symmetrize as _sym

        e = _sym(e)
    e.map_batches(
        lambda b: _tag_edges(b, num_partitions), batch_format="pyarrow"
    ).write_parquet(edges_dir, partition_cols=["part"])

    os.makedirs(edges_dir, exist_ok=True)  # zero-edge input writes no files
    os.makedirs(vertices_dir, exist_ok=True)
    if glob.glob(os.path.join(edges_dir, "**", "*.parquet"), recursive=True):
        rd.read_parquet(edges_dir, columns=["src", "dst"]).map_batches(
            lambda b: _tag_vids(b, num_partitions), batch_format="pyarrow"
        ).write_parquet(vertices_dir, partition_cols=["part"])

    manifest = GraphManifest(
        work_dir=work_dir,
        num_partitions=num_partitions,
        symmetrized=symmetrize,
        edges_dir=edges_dir,
        vertices_dir=vertices_dir,
        source=source,
        content_token=_content_token(edges_dir),
    )
    manifest.save()
    return manifest


def read_partition(dir_: str, p: int, columns: list[str]) -> dict[str, np.ndarray]:
    """Read one partition's files directly with pyarrow (column-pruned)."""
    part_dir = os.path.join(dir_, f"part={p}")
    files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
    if not files:
        return {c: np.empty(0, dtype=np.int64) for c in columns}
    tables = [pq.read_table(f, columns=columns) for f in files]
    t = pa.concat_tables(tables)
    return {c: t[c].to_numpy(zero_copy_only=False) for c in columns}
