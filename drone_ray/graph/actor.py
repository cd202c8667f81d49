"""The long-lived partition actor: CSR + vertex state across supersteps.

The reference's worker process loads its subgraph once in the constructor
and then reacts to master RPCs (PEval/IncEval/ExchangeMessage/Assemble,
/root/reference/src/worker/PRWorker.go:293-418). The actor below is the Ray
equivalent: state must persist across iterations, which per-call map_batches
actors don't guarantee, so this is one of the few places the engine drops to
a raw ``@ray.remote`` class (SURVEY.md §2.4 A1).

``superstep`` returns ``(metrics, payload_for_part_0, …, payload_for_P-1)``
via ``num_returns=P+1`` so each outbound payload ships through the object
store exactly once, to exactly its destination actor — the Ray-native form
of the reference's per-destination chunked RPC fan-out.

Checkpoints are Parquet per partition (vertex state + the pending inbound
messages for the next superstep) so a resumed run continues mid-iteration
with identical results (north rule; the reference has no fault tolerance —
any RPC error is log.Fatal, /root/reference/src/worker/PRWorker.go:65-67).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from drone_ray.graph.csr import PartitionGraph
from drone_ray.graph.messages import combine_inbound, combine_inbound_local, route
from drone_ray.graph.partition import read_partition


@ray.remote
class GraphPartitionActor:
    def __init__(self, manifest: dict, p: int, program_cls, program_kwargs: dict | None):
        self.p = p
        self.P = int(manifest["num_partitions"])
        from drone_ray.hashing import Ownership

        self.ownership = Ownership.from_dict(manifest.get("ownership"))
        self.g = self._load_graph(manifest, p)
        self.program = program_cls(**(program_kwargs or {}))
        self.state = self.program.init_state(self.g)
        self._pending: list | None = None  # inbound restored from checkpoint
        # the payload this partition routed to ITSELF last superstep: kept
        # in-process instead of round-tripping through the object store (on
        # host-partitioned web graphs the self share is the majority of all
        # message volume; on random graphs it is 1/P plus one object per
        # actor per step off the plasma floor)
        self._self_stash = None

    def _load_graph(self, manifest: dict, p: int) -> PartitionGraph:
        hubs_path = manifest.get("hubs_path")
        # None | "fwd" | "rev" | "both" | "dualview" (both directions as two
        # separate views in one actor — two-direction programs, e.g. HITS)
        direction = manifest.get("direction")
        dual = bool(manifest.get("dual"))
        if direction == "dualview":
            return self._load_dualview(manifest, p)
        cached = self._try_cached_graph(manifest, p, direction)
        if cached is not None:
            return cached
        weighted = bool(manifest.get("weighted"))
        cols = (
            ["src", "dst"]
            + (["dir"] if dual else [])
            + (["delegate"] if hubs_path else [])
            + (["w"] if weighted else [])
        )
        ed = read_partition(manifest["edges_dir"], p, cols)
        if dual:
            # owned set from the UNFILTERED rows (a vertex with only
            # in-edges has only a rev row) + this partition's split hubs,
            # whose rows all live in delegate slices elsewhere
            if hubs_path:
                nd = ~ed["delegate"].astype(bool)
                owned = ed["src"][nd]
            else:
                owned = ed["src"]
            owned = np.unique(owned)
            if hubs_path:
                hv_all = pq.read_table(hubs_path)["vid"].to_numpy(zero_copy_only=False)
                mine = hv_all[self.ownership.of(hv_all, self.P) == p]
                owned = np.unique(np.concatenate([owned, mine]))
        else:
            vd = read_partition(manifest["vertices_dir"], p, ["vid"])
            owned = np.unique(vd["vid"])
        if dual and direction != "both":
            keep = ed["dir"] == (0 if direction == "fwd" else 1)
            ed = {
                c: ed[c][keep]
                for c in (
                    "src",
                    "dst",
                    *(["delegate"] if hubs_path else []),
                    *(["w"] if weighted else []),
                )
            }
        if hubs_path:
            dmask = ed["delegate"].astype(bool)
            ht = pq.read_table(hubs_path)
            hv = ht["vid"].to_numpy(zero_copy_only=False)
            # per-view hub out-degree: the dual hubs table carries one
            # column per view; the legacy single-direction table one column
            deg_col = {
                "fwd": "deg_fwd",
                "rev": "deg_rev",
                "both": "deg_both",
            }.get(direction, "out_degree") if dual else "out_degree"
            hd = ht[deg_col].to_numpy(zero_copy_only=False)
            horder = np.argsort(hv)
            g = PartitionGraph(
                p,
                self.P,
                owned,
                ed["src"][~dmask],
                ed["dst"][~dmask],
                delegate_src=ed["src"][dmask],
                delegate_dst=ed["dst"][dmask],
                hub_vids=hv[horder],
                hub_degrees=hd[horder],
                ownership=self.ownership,
                w=ed["w"][~dmask] if weighted else None,
                delegate_w=ed["w"][dmask] if weighted else None,
            )
        else:
            g = PartitionGraph(
                p, self.P, owned, ed["src"], ed["dst"], ownership=self.ownership,
                w=ed.get("w") if weighted else None,
            )
        self._save_cached_graph(manifest, p, direction, g)
        return g

    def _load_dualview(self, manifest: dict, p: int) -> PartitionGraph:
        """Both directions of a dual layout as two PartitionGraphs in one
        actor: the primary (fwd) view plus ``g.rev_view`` over the same
        owned set. Two-direction programs (HITS) push on either via the
        generic route() path; the compact static-boundary channels are
        registered for the primary view only, so such programs must declare
        ``channels = ()``."""
        if not manifest.get("dual"):
            raise ValueError("direction='dualview' requires a dual graph layout")
        if manifest.get("hubs_path"):
            raise NotImplementedError(
                "dualview does not support split hubs yet — rebuild the graph "
                "with hub_threshold=None for two-direction programs"
            )
        gf = self._try_cached_graph(manifest, p, "dualf")
        gr = self._try_cached_graph(manifest, p, "dualr")
        if gf is None or gr is None:
            ed = read_partition(manifest["edges_dir"], p, ["src", "dst", "dir"])
            owned = np.unique(ed["src"])
            fwd = ed["dir"] == 0
            gf = PartitionGraph(
                p, self.P, owned, ed["src"][fwd], ed["dst"][fwd], ownership=self.ownership
            )
            gr = PartitionGraph(
                p, self.P, owned, ed["src"][~fwd], ed["dst"][~fwd], ownership=self.ownership
            )
            self._save_cached_graph(manifest, p, "dualf", gf)
            self._save_cached_graph(manifest, p, "dualr", gr)
        gf.rev_view = gr
        return gf

    # ------------------------------------------------------------------
    # Per-(partition, view) CSR cache: the constructor's sort/dedup over the
    # partition's edge rows dominates reload time; repeated analytics on the
    # same built graph (the engine's normal usage — PR then WCC then
    # triangles) skip it by memory-mapping the derived arrays. Keyed by the
    # layout's content token; written once, atomically, at first load.
    _CACHE_FIELDS = (
        "owned",
        "indptr",
        "adj",
        "adj_src_local",
        "out_degree",
        "hub_vids",
        "owned_is_hub",
        "del_vids",
        "del_indptr",
        "del_adj",
    )

    def _cache_path(self, manifest: dict, p: int, direction) -> str | None:
        token = manifest.get("content_token")
        work_dir = manifest.get("work_dir")
        if not token or not work_dir:
            return None
        # derived boundary indexes depend on the ownership function too
        return os.path.join(
            work_dir,
            "csr_cache",
            f"p{p}_{direction or 'na'}_{self.ownership.token()}_{token}.npz",
        )

    def _try_cached_graph(self, manifest: dict, p: int, direction) -> PartitionGraph | None:
        path = self._cache_path(manifest, p, direction)
        if not path or not os.path.exists(path):
            return None
        try:
            z = np.load(path, allow_pickle=False)
            if manifest.get("weighted") and "w" not in z.files:
                return None  # cache predates the weight lanes — rebuild
            g = PartitionGraph.__new__(PartitionGraph)
            g.p = p
            g.P = self.P
            g.ownership = self.ownership
            for f in self._CACHE_FIELDS:
                setattr(g, f, z[f])
            # weight lanes are optional (npz cannot store None)
            g.w = z["w"] if "w" in z.files else None
            g.del_w = z["del_w"] if "del_w" in z.files else None
            g.n = int(g.owned.size)
            g.m = int(g.adj.size)
            g.pending_hub = []
            return g
        except Exception:  # corrupt/partial cache → rebuild
            return None

    def _save_cached_graph(self, manifest: dict, p: int, direction, g: PartitionGraph) -> None:
        path = self._cache_path(manifest, p, direction)
        if not path:
            return
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp-{os.getpid()}.npz"  # .npz suffix: savez keeps it
            arrs = {f: getattr(g, f) for f in self._CACHE_FIELDS}
            for f in ("w", "del_w"):  # optional weight lanes
                if getattr(g, f, None) is not None:
                    arrs[f] = getattr(g, f)
            np.savez(tmp[:-4], **arrs)
            os.replace(tmp, path)
        except OSError:  # read-only work dir etc. — cache is best-effort
            pass

    def ready(self) -> dict:
        return {"part": self.p, "n_vertices": self.g.n, "n_edges": self.g.m}

    # ------------------------------------------------------------------
    # static-boundary handshake (once per run): every sender's possible
    # destination set per owner is fixed by the graph, so receivers
    # precompute the local row of each boundary slot and supersteps ship
    # positions/values instead of (vid, val) rows — see csr.push_combined.
    def outbound_boundaries(self):
        """2P arrays: full boundaries for owners 0..P-1, then remote-only
        boundaries — split via num_returns so each receiver pulls only its
        own slices. Only the channels the program pushes on are built (the
        dense index per side is lazy and costs a sort over the adjacency);
        unused sides ship empty arrays."""
        ch = getattr(self.program, "channels", ("full", "remote"))
        empty = np.empty(0, np.int64)
        out = [
            self.g.outbound_boundary(q, remote_only=False) if "full" in ch else empty
            for q in range(self.P)
        ]
        out += [
            self.g.outbound_boundary(q, remote_only=True) if "remote" in ch else empty
            for q in range(self.P)
        ]
        return tuple(out)

    def register_inbound(self, *arrs) -> bool:
        """args: P full-boundary vid arrays (sender order) + P remote ones;
        stores receiver-local row maps on the graph for the combine."""
        self.g._in_idx_full = [self.g.local_index(a) for a in arrs[: self.P]]
        self.g._in_idx_rem = [self.g.local_index(a) for a in arrs[self.P :]]
        return True

    @staticmethod
    def _payload_rows(m) -> int:
        if m is None:
            return 0
        if "n" in m:
            return int(m["n"])
        return int(m["vid"].size)

    def _to_global(self, payloads) -> list:
        """Compact payloads → self-contained {"vid", "val"} dicts (used by
        checkpoints, which must be readable without the boundary maps)."""
        out = []
        for s, m in enumerate(payloads):
            if m is None:
                continue
            if "d" in m or "p" in m:
                imap = (self.g._in_idx_rem if m["r"] else self.g._in_idx_full)[s]
                if "d" in m:
                    vals = m["d"]
                    if vals.dtype.kind == "f":
                        keep = (
                            np.isfinite(vals)
                            if self.program.combine_op == "min"
                            else vals != 0.0
                        )
                    else:
                        sentinel = (
                            np.iinfo(vals.dtype).max
                            if self.program.combine_op == "min"
                            else 0
                        )
                        keep = vals != sentinel
                    li = imap[keep]
                    vv = vals[keep]
                else:
                    li = imap[m["p"]]
                    vv = m["v"]
                if li.size:
                    out.append({"vid": self.g.owned[li], "val": vv})
            elif m["vid"].size:
                out.append(m)
        return out

    # ------------------------------------------------------------------
    def superstep(self, step: int, *inbound, feedback=None):
        """``inbound``: P regular message payloads followed by P hub
        broadcast payloads (or nothing for PEval / a resumed step). Returns
        (metrics, msgs_for_0..P-1, hub_broadcast) via num_returns=P+2.

        ``feedback``: driver-reduced global scalars from the previous step
        (programs with ``wants_feedback`` — the harness computes it via
        ``program.reduce_feedback`` and serializes the barrier). Exposed to
        the program as ``state["aux"]["feedback"]``."""
        t0 = time.perf_counter()
        if feedback is not None:
            self.state.setdefault("aux", {})["feedback"] = feedback
        if self._pending is not None:
            payloads = self._pending
            self._pending = None
        else:
            payloads = list(inbound[: self.P])
            if self._self_stash is not None:
                # sender index p must stay positional — compact payloads
                # resolve against the registered boundary map of sender p
                payloads[self.p] = self._self_stash
                self._self_stash = None
            # expand hub broadcasts along this partition's delegate slices:
            # identical rows (and timing) to what an unsplit hub would have
            # pushed, but materialized at the receiver
            hub_w = getattr(self.program, "hub_edge_weights", False)
            for hub in inbound[self.P :]:
                if hub is None or hub["vid"].size == 0:
                    continue
                dsts, vals = self.g.delegate_expand(
                    hub["vid"], hub["val"], add_edge_weights=hub_w
                )
                if dsts.size:
                    payloads.append(self.program.expand_hub(dsts, vals))
        if step == 0:
            msgs, info = self.program.peval(self.g, self.state)
        else:
            if self.program.extra_key is None:
                inb = combine_inbound_local(self.g, payloads, self.program.combine_op)
            else:
                inb = combine_inbound(payloads, self.program.combine_op, self.program.extra_key)
            msgs, info = self.program.inceval(self.g, self.state, inb)
        if isinstance(msgs, list):
            # program returned per-owner payloads (push_combined fast path)
            routed = msgs
        else:
            routed = route(
                msgs,
                self.P,
                self.program.combine_op,
                self.program.extra_key,
                precombine=self.program.sender_precombine,
                ownership=self.ownership,
            )
        # keep own payload in-process for the next step (see _self_stash)
        n_self = 0
        if routed[self.p] is not None:
            self._self_stash = routed[self.p]
            n_self = self._payload_rows(self._self_stash)
            routed = list(routed)
            routed[self.p] = None
        hub_out = self.g.drain_pending_hub()
        n_out = sum(self._payload_rows(r) for r in routed)
        n_hub = hub_out["vid"].size if hub_out else 0
        metrics = {
            "step": step,
            "part": self.p,
            "seconds": time.perf_counter() - t0,
            "msgs_out": int(n_out),
            "msgs_self": int(n_self),
            "hub_out": int(n_hub),
            # a partition whose only pending work is its own stashed payload
            # must NOT report convergence — the stash is next step's inbound
            "has_msgs": n_out > 0 or n_hub > 0 or n_self > 0,
            **info,
        }
        return (metrics, *routed, hub_out)

    # ------------------------------------------------------------------
    def emit(self) -> pa.Table:
        return self.program.emit(self.g, self.state)

    def emit_write(self, out_dir: str) -> int:
        """Per-partition result file — the reference's Assemble layout
        (/root/reference/src/worker/PRWorker.go:249-267), resumable."""
        os.makedirs(out_dir, exist_ok=True)
        t = self.program.emit(self.g, self.state)
        tmp = os.path.join(out_dir, f".part-{self.p}.parquet.tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(out_dir, f"part-{self.p}.parquet"))
        return t.num_rows

    # ------------------------------------------------------------------
    def checkpoint(
        self,
        ckpt_dir: str,
        step: int,
        n_msg: int,
        *inbound_for_next,
        chunk_rows: int = 4 << 20,
    ) -> bool:
        """First ``n_msg`` payloads are regular messages; the rest are hub
        broadcasts, which are expanded along the delegate slices NOW so the
        stored pending-inbound file is self-contained for resume.

        State writes are CHUNKED: the file is produced row-group by
        row-group (``chunk_rows`` rows each), so the encode buffer — and the
        Python list materialization for 2-D state — is bounded regardless of
        partition size (>10^9-vertex partitions stream through)."""
        step_dir = os.path.join(ckpt_dir, f"step={step}")
        os.makedirs(step_dir, exist_ok=True)
        meta = {b"aux": json.dumps(self.state.get("aux", {})).encode()}

        def chunk_table(off: int, cnt: int) -> pa.Table:
            cols = {"vid": pa.array(self.g.owned[off : off + cnt], pa.int64())}
            for k, v in self.state.items():
                if k != "aux":
                    s = v[off : off + cnt]
                    # 2-D state (simulation matrices, HyperANF registers,
                    # coloring seen-masks) → list column with the element
                    # dtype PINNED: python-int inference would pick int64
                    # for a block whose uint64 values happen to stay low,
                    # making the restored dtype depend on the data
                    cols[k] = (
                        pa.array(s.tolist(), type=pa.list_(pa.from_numpy_dtype(v.dtype)))
                        if v.ndim == 2
                        else pa.array(s)
                    )
            return pa.table(cols).replace_schema_metadata(meta)

        tmp = os.path.join(step_dir, f".state-{self.p}.tmp")
        n = int(self.g.n)
        chunk_rows = max(1, int(chunk_rows))
        if n == 0:
            pq.write_table(chunk_table(0, 0), tmp)
        else:
            writer = None
            for off in range(0, n, chunk_rows):
                t = chunk_table(off, min(chunk_rows, n - off))
                if writer is None:
                    writer = pq.ParquetWriter(tmp, t.schema)
                writer.write_table(t)
            writer.close()
        os.replace(tmp, os.path.join(step_dir, f"state-{self.p}.parquet"))
        if hasattr(self.program, "extra_state"):
            # ragged program-managed state (e.g. LPA's neighbor-label count
            # map) can't ride the length-n state columns
            et = self.program.extra_state()
            tmp = os.path.join(step_dir, f".extra-{self.p}.tmp")
            pq.write_table(et, tmp)
            os.replace(tmp, os.path.join(step_dir, f"extra-{self.p}.parquet"))

        inc = list(inbound_for_next[:n_msg])
        if self._self_stash is not None:
            # the self-routed payload never entered the object store; splice
            # it back at its sender slot (NOT consumed — the next superstep,
            # already queued behind this task, still reads it). Actor tasks
            # run in submission order, so the stash here is exactly the
            # post-step-s payload the manifest claims.
            inc[self.p] = self._self_stash
        payloads = self._to_global(inc)
        hub_w = getattr(self.program, "hub_edge_weights", False)
        for hub in inbound_for_next[n_msg:]:
            if hub is None or hub["vid"].size == 0:
                continue
            dsts, vals = self.g.delegate_expand(
                hub["vid"], hub["val"], add_edge_weights=hub_w
            )
            if dsts.size:
                payloads.append(self.program.expand_hub(dsts, vals))
        live = [m for m in payloads if m is not None and m["vid"].size > 0]
        if live:
            mcols = {}
            for k in live[0]:
                cat = np.concatenate([m[k] for m in live])
                # 2-D payload lanes (HyperANF register rows) → list column,
                # mirroring the 2-D state handling above (element dtype pinned)
                mcols[k] = (
                    pa.array(cat.tolist(), type=pa.list_(pa.from_numpy_dtype(cat.dtype)))
                    if cat.ndim == 2
                    else pa.array(cat)
                )
            mt = pa.table(mcols)
            tmp = os.path.join(step_dir, f".msgs-{self.p}.tmp")
            pq.write_table(mt, tmp)
            os.replace(tmp, os.path.join(step_dir, f"msgs-{self.p}.parquet"))
        return True

    def load_checkpoint(self, ckpt_dir: str, step: int) -> bool:
        step_dir = os.path.join(ckpt_dir, f"step={step}")
        t = pq.read_table(os.path.join(step_dir, f"state-{self.p}.parquet"))
        state: dict = {}
        for name in t.column_names:
            if name != "vid":
                col = t[name]
                if pa.types.is_list(col.type):
                    # restore with the saved element dtype (uint64 masks,
                    # uint8 registers): a flat int64 restore would both
                    # break unsigned bit ops and overflow on bit-63 values
                    vt = np.dtype(col.type.value_type.to_pandas_dtype())
                    state[name] = np.array(col.to_pylist(), dtype=vt)
                else:
                    # copy: Arrow-backed numpy views are read-only, state mutates
                    state[name] = np.array(col.to_numpy(zero_copy_only=False))
        meta = t.schema.metadata or {}
        state["aux"] = json.loads(meta.get(b"aux", b"{}").decode())
        self.state = state
        if hasattr(self.program, "load_extra_state"):
            extra_path = os.path.join(step_dir, f"extra-{self.p}.parquet")
            if not os.path.exists(extra_path):
                # a checkpoint from an engine version without the ragged
                # extra-state files would resume with an empty count map and
                # converge to WRONG labels silently — refuse instead
                raise ValueError(
                    f"checkpoint step dir {step_dir} lacks extra-{self.p}.parquet "
                    f"required by {type(self.program).__name__}; it was written "
                    "by an incompatible engine version — pass resume=False or a "
                    "fresh checkpoint_dir"
                )
            self.program.load_extra_state(pq.read_table(extra_path))
        msgs_path = os.path.join(step_dir, f"msgs-{self.p}.parquet")
        if os.path.exists(msgs_path):
            mt = pq.read_table(msgs_path)
            self._pending = [
                {
                    c: (
                        np.array(
                            mt[c].to_pylist(),
                            dtype=np.dtype(mt[c].type.value_type.to_pandas_dtype()),
                        )
                        if pa.types.is_list(mt[c].type)
                        else mt[c].to_numpy(zero_copy_only=False)
                    )
                    for c in mt.column_names
                }
            ]
        else:
            self._pending = [None]
        return True
