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

from drone_ray.hashing import Ownership

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
    hub_threshold: int | None = None
    hubs_path: str | None = None  # parquet (vid, out_degree | deg_*) of split hubs
    # dual layout: every edge is stored twice — (src,dst,dir=0) under
    # owner(src) and (dst,src,dir=1) under owner(dst) — so ONE build serves
    # the directed (dir=0), reversed (dir=1) and symmetrized (all rows,
    # CSR dedups reciprocal pairs) graph views. PR/SSSP read fwd, graph
    # simulation reads rev, WCC/LPA read both; the reference builds a
    # separate adjacency per direction flag instead
    # (/root/reference/src/graph/graph.go:103-122 useTargets).
    dual: bool = False
    # vertex-ownership function (Ownership.to_dict()): None/absent = page
    # hash; mode "host" co-locates same-site pages (see hashing.Ownership)
    ownership: dict | None = None
    # edge rows carry a float64 "w" column (weighted SSSP); an extension —
    # the reference forces weight 1.0 at load (src/graph/graph.go:357-362)
    weighted: bool = False

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


def _spill_vid_candidates(
    src: np.ndarray, dst: np.ndarray, P: int, vertices_dir: str, own: Ownership
) -> None:
    """Side-write this batch's distinct vid candidates per partition (the
    vertices table forms in the same pass as the edge write; duplicates are
    np.unique()d by the actor at load)."""
    vids = np.unique(np.concatenate([src, dst]))
    vpart = own.of(vids, P)
    order = np.argsort(vpart, kind="stable")
    sv, sp = vids[order], vpart[order]
    bounds = np.searchsorted(sp, np.arange(P + 1))
    token = os.urandom(8).hex()
    for p in range(P):
        lo, hi = bounds[p], bounds[p + 1]
        if lo == hi:
            continue
        pdir = os.path.join(vertices_dir, f"part={p}")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(
            pa.table({"vid": pa.array(sv[lo:hi], pa.int64())}),
            os.path.join(pdir, f"cand-{token}.parquet"),
        )


def _check_weights(w: np.ndarray, allow_negative: bool = False) -> None:
    """Weighted programs assume nonnegative finite weights: the monotone
    frontier relaxation (WeightedSSSP) does not terminate/stay-correct with
    negative edges, and w/W transitions (WeightedPageRank) need W > 0.
    Reject at BUILD time — a wrong answer later would be silent.

    ``allow_negative``: opt-in for layouts built for BellmanFordSSSP (the
    negative-weight variant with cycle detection); non-finite weights are
    still rejected (±inf/NaN poison every relaxation)."""
    if not w.size:
        return
    if not np.isfinite(w).all():
        bad = w[~np.isfinite(w)][:3]
        raise ValueError(f"edge weights must be finite; found {bad.tolist()}")
    if not allow_negative and (w < 0).any():
        bad = w[w < 0][:3]
        raise ValueError(
            f"edge weights must be >= 0; found {bad.tolist()} — "
            "negative-weight shortest paths need Bellman-Ford with cycle "
            "detection (programs.BellmanFordSSSP; build the layout with "
            "allow_negative_weights=True), not the monotone relaxation"
        )


def _tag_edges_dual(
    batch: pa.Table,
    P: int,
    vertices_dir: str,
    hub_ref=None,
    own: Ownership | None = None,
    wcol: str | None = None,
    allow_negative_w: bool = False,
) -> pa.Table:
    """Dual layout: each input edge (s, d) emits (s, d, dir=0)@owner(s) and
    (d, s, dir=1)@owner(d). Hub rows (u in hubs) route by owner(v) and are
    marked delegate, exactly like the single-direction path.

    No vertex-candidate side files (the single-direction path's small-file
    hot spot): in a dual layout every endpoint appears as the u of some row
    in its owner's partition — fwd row if it has out-edges, rev row if
    in-edges — except split hubs, which the actor recovers from the global
    hubs table instead."""
    own = own or Ownership()
    s = batch["src"].to_numpy(zero_copy_only=False)
    d = batch["dst"].to_numpy(zero_copy_only=False)
    u = np.concatenate([s, d])
    v = np.concatenate([d, s])
    dirc = np.concatenate([np.zeros(s.size, np.int8), np.ones(s.size, np.int8)])
    part = own.of(u, P)
    delegate = np.zeros(u.size, dtype=bool)
    if hub_ref is not None:
        import ray

        hub_vids = ray.get(hub_ref)
        delegate = np.isin(u, hub_vids)
        part = np.where(delegate, own.of(v, P), part).astype(np.int32)
    cols = {
        "src": pa.array(u, pa.int64()),
        "dst": pa.array(v, pa.int64()),
        "dir": pa.array(dirc, pa.int8()),
        "delegate": pa.array(delegate),
        "part": pa.array(part, pa.int32()),
    }
    if wcol is not None:
        w = batch[wcol].to_numpy(zero_copy_only=False).astype(np.float64)
        _check_weights(w, allow_negative=allow_negative_w)
        cols["w"] = pa.array(np.concatenate([w, w]), pa.float64())
    return pa.table(cols)


def _tag_edges_spill_vids(
    batch: pa.Table,
    P: int,
    vertices_dir: str,
    hub_ref=None,
    own: Ownership | None = None,
    wcol: str | None = None,
    allow_negative_w: bool = False,
) -> pa.Table:
    """Tag each edge with its owner partition AND side-write this batch's
    distinct vid candidates into per-partition files. The side output makes
    the vertices table in the same pass as the edges write (no second job);
    duplicate candidates — across batches or from task retries — are
    harmless because the partition actor np.unique()s them at load."""
    own = own or Ownership()
    src = batch["src"].to_numpy(zero_copy_only=False)
    dst = batch["dst"].to_numpy(zero_copy_only=False)
    part = own.of(src, P)
    delegate = np.zeros(len(src), dtype=bool)
    if hub_ref is not None:
        import ray

        hub_vids = ray.get(hub_ref)
        # high-degree split: a hub's out-edges are routed by owner(dst) and
        # marked delegate — its adjacency spreads across all partitions
        delegate = np.isin(src, hub_vids)
        part = np.where(delegate, own.of(dst, P), part).astype(np.int32)

    _spill_vid_candidates(src, dst, P, vertices_dir, own)
    cols = {
        "src": batch["src"],
        "dst": batch["dst"],
        "delegate": pa.array(delegate),
        "part": pa.array(part, pa.int32()),
    }
    if wcol is not None:
        _check_weights(
            batch[wcol].to_numpy(zero_copy_only=False).astype(np.float64),
            allow_negative=allow_negative_w,
        )
        cols["w"] = batch[wcol].cast(pa.float64())
    return pa.table(cols)


def build_graph(
    edges,
    work_dir: str,
    num_partitions: int,
    symmetrize: bool = False,
    source: str = "",
    hub_threshold: int | None = None,
    dual: bool = False,
    ownership: Ownership | None = None,
    weight_col: str | None = None,
    allow_negative_weights: bool = False,
) -> GraphManifest:
    """Partition an edge Dataset (src:int64, dst:int64) for the superstep engine.

    The pipeline upstream of ``edges`` executes exactly once when
    ``hub_threshold`` is None: the single pass writes the partitioned edges
    AND side-writes per-partition vertex-id candidates, so expensive stages
    (HTML extraction) are never recomputed.

    With ``hub_threshold`` set (the north rule's explicit skew handling),
    out-degrees are computed first (a second pass over ``edges`` — pass a
    persisted edge table when upstream is expensive) and vertices whose
    out-degree exceeds the threshold are SPLIT: their adjacency is
    partitioned by owner(dst) instead of owner(src), so no single partition
    holds a power-law hub's whole edge list, and at runtime the hub owner
    ships one (vid, value) pair per superstep to each partition instead of
    one message per out-edge (salted repartition + final combine).
    """
    import pyarrow.compute as pc_
    import ray

    os.makedirs(work_dir, exist_ok=True)
    edges_dir = os.path.join(work_dir, "edges")
    vertices_dir = os.path.join(work_dir, "vertices")

    e = edges
    if dual and symmetrize:
        raise ValueError("dual layout already serves the symmetrized view")
    if weight_col is not None and symmetrize:
        raise NotImplementedError(
            "weighted + explicit symmetrize not supported; use the dual "
            "layout (rev rows carry the same weight) or pre-symmetrize with "
            "the weight column attached"
        )
    if symmetrize:
        from drone_ray.stages.edges import symmetrize as _sym

        e = _sym(e)

    hub_ref = None
    hubs_path = None
    if hub_threshold is not None:
        # Two-phase hub detection. Patched hub degrees must come from
        # DEDUPED edges (the CSR/delegate adjacency exact-dedups (src,dst);
        # raw counts would inflate the degree and skew PageRank's
        # pr/outdeg pushes) — but full-table pair dedup only to find a
        # handful of hubs is the dominant build cost. So: one cheap RAW
        # count pass gives an upper bound (raw ≥ deduped always) that
        # selects candidates, and the exact deduped degrees run on the
        # candidate-touching edge rows only.
        from drone_ray.stages.edges import raw_count_slack, raw_endpoint_counts

        hubs_path = os.path.join(work_dir, "hubs.parquet")
        # pigeonhole pre-filter: per-block, drop vids that cannot reach the
        # hub threshold (see raw_endpoint_counts) — shrinks the candidate
        # shuffle from O(blocks·distinct_vids) rows to the power-law tail.
        # The filtered sums undercount by < raw_count_slack, so the
        # candidate test widens by exactly that slack (still a superset;
        # exact deduped degrees are re-derived on candidate rows below).
        raw = raw_endpoint_counts(e, min_total=hub_threshold)
        slack = raw_count_slack(hub_threshold)
        bound = (
            pc_.add(pc_.field("n_src"), pc_.field("n_dst"))
            if dual
            else pc_.field("n_src")
        )
        cand_parts = [
            b.filter(pc_.greater(bound, hub_threshold - slack))
            for b in raw.iter_batches(batch_format="pyarrow", batch_size=None)
        ]
        cand = (
            np.sort(pa.concat_tables(cand_parts)["vid"].to_numpy(zero_copy_only=False))
            if cand_parts
            else np.empty(0, np.int64)
        )
        cand_ref = ray.put(cand)

        def _cand_edges(b: pa.Table) -> pa.Table:
            cv = ray.get(cand_ref)
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            keep = np.isin(s, cv) | (np.isin(d, cv) if dual else False)
            return b.filter(pa.array(keep))

        sub = e.map_batches(_cand_edges, batch_format="pyarrow", batch_size=None)
        if cand.size == 0:
            empty_cols = (
                {"vid": [], "deg_fwd": [], "deg_rev": [], "deg_both": []}
                if dual
                else {"vid": [], "out_degree": []}
            )
            pq.write_table(
                pa.table({k: pa.array(v, pa.int64()) for k, v in empty_cols.items()}),
                hubs_path,
            )
            hub_vids = np.empty(0, np.int64)
        elif dual:
            from drone_ray.stages.edges import dual_degrees

            # a vertex is split when its largest view degree (deg_both)
            # exceeds the threshold; per-view degrees ride along so each
            # view patches its own hub out-degree at load
            deg = dual_degrees(sub)
            hubs_tbl = pa.concat_tables(
                [
                    b.filter(
                        pc_.greater(pc_.field("deg_both"), hub_threshold)
                        & pc_.is_in(pc_.field("vid"), value_set=pa.array(cand))
                    )
                    for b in deg.iter_batches(batch_format="pyarrow", batch_size=None)
                ]
            )
            pq.write_table(hubs_tbl, hubs_path)
            hub_vids = hubs_tbl["vid"].to_numpy(zero_copy_only=False)
        else:
            from drone_ray.stages.edges import dedup_edges, out_degrees

            deg = out_degrees(dedup_edges(sub))
            hubs_tbl = pa.concat_tables(
                [
                    b.filter(pc_.greater(b["out_degree"], hub_threshold))
                    for b in deg.iter_batches(batch_format="pyarrow", batch_size=None)
                ]
            )
            pq.write_table(
                pa.table(
                    {
                        "vid": hubs_tbl["src"].cast(pa.int64()),
                        "out_degree": hubs_tbl["out_degree"].cast(pa.int64()),
                    }
                ),
                hubs_path,
            )
            hub_vids = hubs_tbl["src"].to_numpy(zero_copy_only=False)
        hub_ref = ray.put(np.sort(hub_vids))

    os.makedirs(edges_dir, exist_ok=True)  # zero-edge input writes no files
    os.makedirs(vertices_dir, exist_ok=True)
    own = ownership or Ownership()
    tag = _tag_edges_dual if dual else _tag_edges_spill_vids
    e.map_batches(
        lambda b: tag(
            b, num_partitions, vertices_dir, hub_ref, own, weight_col,
            allow_negative_weights,
        ),
        batch_format="pyarrow",
    ).write_parquet(edges_dir, partition_cols=["part"])

    manifest = GraphManifest(
        work_dir=work_dir,
        num_partitions=num_partitions,
        symmetrized=symmetrize or dual,
        edges_dir=edges_dir,
        vertices_dir=vertices_dir,
        source=source,
        content_token=_content_token(edges_dir),
        hub_threshold=hub_threshold,
        hubs_path=hubs_path,
        dual=dual,
        ownership=own.to_dict() if own.mode != "page" else None,
        weighted=weight_col is not None,
    )
    manifest.save()
    return manifest


def detect_mega_hosts(
    edges,
    num_partitions: int,
    host_bits: int = 18,
    guard: float = 1.5,
    place_top: int | None = None,
) -> Ownership:
    """Build a host-mode :class:`Ownership` with its mega-site salt set AND
    a greedy placement of the heaviest remaining hosts.

    A host prefix is SALTED (its vertices fall back to the uniform page
    hash) when its endpoint count exceeds ``guard × total / P`` — a site
    that big would overload its single owner partition. Below that, the
    top ``place_top`` (default 32·P) heaviest prefixes are PLACED greedily
    onto the least-loaded partitions (classic balanced partitioning):
    hash placement of a few hundred weighted sites leaves ~1.4× max/mean
    partition load — enough to gate every superstep barrier at full
    parallelism — while greedy packing of just the heavy head flattens it
    with zero locality loss. The long tail stays hash-placed (uniform by
    law of large numbers) and forms the per-bin base load estimate.

    The count pass is fully distributed: per-batch (prefix, count)
    partials reduce through one hash-bucketed shuffle; the driver sees
    only the salted survivors and the top-K rows, never the host table.
    """
    import pyarrow.compute as pc_

    base = Ownership("host", host_bits)
    B = 32

    def partial(b: pa.Table) -> pa.Table:
        u = np.concatenate(
            [
                b["src"].to_numpy(zero_copy_only=False),
                b["dst"].to_numpy(zero_copy_only=False),
            ]
        )
        pref, cnt = np.unique(base.prefix_of(u), return_counts=True)
        return pa.table(
            {
                "prefix": pa.array(pref.astype(np.int64), pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "bucket": pa.array(pref % np.uint64(B), pa.int64()),
            }
        )

    def reduce_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        agg = g.groupby("prefix", sort=False)["cnt"].sum().reset_index()
        return agg

    counts = (
        edges.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(reduce_bucket)
        .materialize()  # consumed twice (total + filter); O(n_hosts) rows
    )
    total = counts.sum("cnt") or 0
    if total == 0:
        return base
    thresh = int(guard * total / num_partitions)

    def over(b: pa.Table) -> pa.Table:
        return b.filter(pc_.greater(b["cnt"], thresh))

    # only mega-prefixes survive the filter — the driver never sees the
    # host table, just the handful of sites too big for one partition
    survivors = counts.map_batches(over, batch_format="pyarrow", batch_size=None).take_all()
    salted = [np.uint64(r["prefix"]) for r in survivors]
    salted_set = {int(r["prefix"]) for r in survivors}
    salted_cnt = sum(int(r["cnt"]) for r in survivors)

    K = place_top if place_top is not None else 32 * num_partitions
    placed: dict[int, int] = {}
    if K > 0:
        top = counts.sort("cnt", descending=True).limit(K + len(salted)).take_all()
        head = [r for r in top if int(r["prefix"]) not in salted_set][:K]
        head_cnt = sum(int(r["cnt"]) for r in head)
        # base load per bin: the hash-placed long tail, assumed uniform
        loads = np.full(
            num_partitions, (total - salted_cnt - head_cnt) / num_partitions
        )
        for r in head:  # already count-descending
            p = int(np.argmin(loads))
            placed[int(r["prefix"])] = p
            loads[p] += int(r["cnt"])
    return Ownership("host", host_bits, salted, placed)


def read_partition(dir_: str, p: int, columns: list[str]) -> dict[str, np.ndarray]:
    """Read one partition's files directly with pyarrow (column-pruned)."""
    part_dir = os.path.join(dir_, f"part={p}")
    files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
    if not files:
        return {c: np.empty(0, dtype=np.int64) for c in columns}
    tables = [pq.read_table(f, columns=columns) for f in files]
    t = pa.concat_tables(tables)
    return {c: t[c].to_numpy(zero_copy_only=False) for c in columns}
