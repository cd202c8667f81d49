"""Graph (pattern) simulation — the reference's fourth algorithm
(/root/reference/src/algorithm/Sim.go; SURVEY.md §2.12). This is *graph
simulation* (Henzinger/Henzinger/Kopke style), not SimRank.

Semantics matched to the reference:
  * data-vertex attribute attr(v) = v % 100 (GraphSimulationTypeModel,
    /root/reference/src/tools/Settings.go:20, graph.go:367)
  * sim(v) init = {pattern u : attr(u) == attr(v)} (Sim.go:45-58)
  * u stays in sim(v) iff every pattern-successor u' of u has some data
    successor w of v with u' ∈ sim(w); per-(v, u') counts cascade removals
    (postMap, Sim.go:60-66,103-172)
  * output: (pattern_node, vid) match pairs (SimWorker.go:314-322)

Distribution: the engine graph is built over REVERSED data edges, so each
owned vertex's adjacency slice is its predecessor list. Because the initial
sim set is a pure function of the vertex id, the initial per-predecessor
counts are seeded by one push along the reversed adjacency (no replicated
sim state at all — the reference needs master/mirror copies for this).
Messages are (pred_vid, pattern_node, ±count) with sum-combine; removals
cascade to a local fixpoint inside each partition before crossing the
boundary (subgraph-centric, like CC).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from drone_ray.graph.csr import PartitionGraph
from drone_ray.graph.programs import VertexProgram

ATTR_MOD = 100  # reference GraphSimulationTypeModel


class GraphSimulation(VertexProgram):
    combine_op = "sum"
    extra_key = "pnode"
    default_direction = "rev"
    channels = ()  # generic (vid, pnode, val) route() path
    sender_precombine = True

    def __init__(self, pattern_attrs: dict[int, int], pattern_targets: dict[int, list[int]], attr_mod: int = ATTR_MOD):
        self.pnodes = sorted(pattern_attrs)  # pattern node ids, column order
        self.pattr = np.array([pattern_attrs[u] for u in self.pnodes], dtype=np.int64)
        self.psucc = [
            np.array(
                [self.pnodes.index(t) for t in pattern_targets.get(u, [])], dtype=np.int64
            )
            for u in self.pnodes
        ]
        self.attr_mod = attr_mod

    # ------------------------------------------------------------------
    def init_state(self, g: PartitionGraph) -> dict:
        k = len(self.pnodes)
        attr = g.owned % self.attr_mod
        sim = attr[:, None] == self.pattr[None, :]  # (n, k) bool
        # local reversed-edge list (w → pred with pred owned here)
        local_mask = g.ownership.of(g.adj, g.P) == g.p
        self._l_src = g.adj_src_local[local_mask]  # w (local row)
        self._l_dst = np.searchsorted(g.owned, g.adj[local_mask])  # pred (local row)
        return {
            "sim": sim.astype(np.int8),
            "post": np.zeros((g.n, k), dtype=np.int64),
            "aux": {},
        }

    # ------------------------------------------------------------------
    def expand_hub(self, dsts, values):
        """The scalar hub broadcast carries (pnode, delta) packed as
        ±(pnode+1); unpack into the (vid, pnode, val) message shape."""
        v = values.astype(np.int64)
        return {"vid": dsts, "val": np.sign(v), "pnode": np.abs(v) - 1}

    def _push_counts(self, g, rows_per_p: list[np.ndarray]):
        """Remote messages (pred, pnode, delta) for the given per-pattern-node
        row sets; delta=+1 for peval seeding, -1 for removals. Split-hub rows
        travel through the broadcast channel with (pnode, delta) packed into
        the scalar value (see expand_hub)."""
        vids_all, pn_all, val_all = [], [], []
        for col, (rows, delta) in enumerate(rows_per_p):
            if rows.size == 0:
                continue
            packed = np.full(rows.size, (col + 1) * delta, np.int64)
            dsts, _ = g.push(rows, packed, remote_only=True)
            vids_all.append(dsts)
            pn_all.append(np.full(dsts.size, col, np.int64))
            val_all.append(np.full(dsts.size, delta, np.int64))
        if not vids_all:
            return None, 0
        vid = np.concatenate(vids_all)
        return (
            {"vid": vid, "pnode": np.concatenate(pn_all), "val": np.concatenate(val_all)},
            int(vid.size),
        )

    def _apply_local(self, st, rows, col, delta):
        """Apply ±delta to post[pred, col] for local reversed edges from rows."""
        if rows.size == 0 or self._l_src.size == 0:
            return
        mask = np.isin(self._l_src, rows)
        if mask.any():
            np.add.at(st["post"][:, col], self._l_dst[mask], delta)

    def _removal_fixpoint(self, g, st):
        """Cascade removals locally; returns per-column removed row lists."""
        k = len(self.pnodes)
        removed_cols: list[np.ndarray] = [np.empty(0, dtype=np.int64)] * k
        scanned = 0
        changed = True
        while changed:
            changed = False
            for col in range(k):
                succ = self.psucc[col]
                if succ.size == 0:
                    continue
                holders = st["sim"][:, col].astype(bool)
                if not holders.any():
                    continue
                ok = (st["post"][:, succ] > 0).all(axis=1)
                rem = np.flatnonzero(holders & ~ok)
                scanned += int(holders.sum()) * succ.size
                if rem.size == 0:
                    continue
                changed = True
                st["sim"][rem, col] = 0
                removed_cols[col] = np.concatenate([removed_cols[col], rem])
                self._apply_local(st, rem, col, -1)
        return removed_cols, scanned

    # ------------------------------------------------------------------
    def peval(self, g, st):
        k = len(self.pnodes)
        seed_rows = []
        for col in range(k):
            rows = np.flatnonzero(st["sim"][:, col])
            self._apply_local(st, rows, col, +1)
            seed_rows.append((rows, +1))
        msgs, sent = self._push_counts(g, seed_rows)
        return msgs, {"edges": sent, "phase": "seed"}

    def inceval(self, g, st, inbound):
        if inbound is not None:
            li = g.local_index(inbound["vid"])
            np.add.at(st["post"], (li, inbound["pnode"]), inbound["val"])
        elif st["aux"].get("evaluated"):
            return None, {"edges": 0, "n_removed": 0}
        st["aux"]["evaluated"] = True
        removed_cols, scanned = self._removal_fixpoint(g, st)
        msgs, sent = self._push_counts(g, [(rows, -1) for rows in removed_cols])
        n_removed = int(sum(r.size for r in removed_cols))
        return msgs, {"edges": scanned + sent, "n_removed": n_removed}

    @classmethod
    def should_stop(cls, step_metrics, step):
        # peval only SEEDS counts; the first removal evaluation happens at
        # step 1 even when no seed crossed a partition boundary (P=1)
        if step == 0:
            return False
        return not any(m.get("has_msgs") for m in step_metrics)

    def emit(self, g, st) -> pa.Table:
        vids, pns = [], []
        for col, u in enumerate(self.pnodes):
            rows = np.flatnonzero(st["sim"][:, col])
            vids.append(g.owned[rows])
            pns.append(np.full(rows.size, u, np.int64))
        return pa.table(
            {
                "pattern_node": pa.array(np.concatenate(pns) if pns else [], pa.int64()),
                "vid": pa.array(np.concatenate(vids) if vids else [], pa.int64()),
            }
        )
