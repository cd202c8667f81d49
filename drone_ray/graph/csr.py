"""Zero-copy-friendly CSR subgraph partition (SURVEY.md §1.3).

Replaces the reference's per-worker nested adjacency hash maps
(/root/reference/src/graph/graph.go:103-122, ≫100 B/edge) with contiguous
int64 numpy arrays (~16 B/edge) built once per partition actor from that
partition's hash-partitioned edge slice.

Ownership model: vertex v is owned by partition ``owner_partition(v, P)``;
because edges are partitioned by ``owner(src)``, *all* out-edges of an owned
vertex are local, so the global out-degree (the reference's offline
``Degree.<i>`` files, /root/reference/src/graph/graph.go:462-485) is just
``diff(indptr)`` — no extra shuffle. There is no master/mirror replication
(/root/reference/src/graph/graph.go:199-211); cross-partition effects travel
as combined messages instead.
"""

from __future__ import annotations

import numpy as np

from drone_ray.hashing import Ownership


class PartitionGraph:
    """One partition's CSR + local/remote edge split + owned-vertex index."""

    def __init__(
        self,
        p: int,
        num_partitions: int,
        owned_vids: np.ndarray,
        src: np.ndarray,
        dst: np.ndarray,
        delegate_src: np.ndarray | None = None,
        delegate_dst: np.ndarray | None = None,
        hub_vids: np.ndarray | None = None,
        hub_degrees: np.ndarray | None = None,
        ownership: Ownership | None = None,
        w: np.ndarray | None = None,
        delegate_w: np.ndarray | None = None,
    ) -> None:
        self.p = p
        self.P = num_partitions
        self.ownership = ownership or Ownership()
        self.owned = np.asarray(owned_vids, dtype=np.int64)  # sorted unique
        self.n = int(self.owned.size)

        # sort + exact dedup of (src, dst): duplicate edges collapse, matching
        # the reference's last-wins AddEdge with weight forced to 1.0
        # (/root/reference/src/graph/graph.go:213-243,357-362). With a weight
        # column (an extension — the reference has no weighted path), the
        # surviving edge keeps the MIN weight of its duplicates: well-defined
        # under any arrival order, and the only weight shortest paths can use.
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        order = np.lexsort((dst, src))
        s, d = src[order], dst[order]
        ww = np.asarray(w, dtype=np.float64)[order] if w is not None else None
        if s.size:
            keep = np.empty(s.size, dtype=bool)
            keep[0] = True
            keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
            if ww is not None:
                ww = np.minimum.reduceat(ww, np.flatnonzero(keep))
            s, d = s[keep], d[keep]
        self.w = ww  # per-edge weight aligned with self.adj; None = unweighted
        self.m = int(s.size)

        # CSR over owned vertices (rows in `owned` order)
        src_local = np.searchsorted(self.owned, s)
        counts = np.bincount(src_local, minlength=self.n) if self.m else np.zeros(self.n, np.int64)
        self.indptr = np.zeros(self.n + 1, dtype=np.int64)
        np.cumsum(counts, out=self.indptr[1:])
        self.adj = d                      # global dst vids, grouped by src
        self.adj_src_local = src_local    # local row of each edge's src
        self.out_degree = np.diff(self.indptr)  # == global out-degree (see above)

        # --- high-degree split hubs (SURVEY.md §4 skew row) -------------
        # hub_vids/hub_degrees: ALL split hubs in the graph (small table).
        # delegate_src/dst: this partition's slice of hub adjacency (every
        # dst here is owned by p — edges were routed by owner(dst)). Owned
        # hubs have no rows in the local CSR, so their global out-degree is
        # patched in from the hub table.
        self.hub_vids = (
            np.asarray(hub_vids, dtype=np.int64) if hub_vids is not None else np.empty(0, np.int64)
        )
        self.owned_is_hub = np.zeros(self.n, dtype=bool)
        # n == 0 guard: a partition can own zero vertices while hubs exist
        # globally — owned[idx-1] style indexing would raise on the empty array
        if self.hub_vids.size and self.n:
            idx = np.searchsorted(self.owned, self.hub_vids)
            ok = (idx < self.n) & (self.owned[np.minimum(idx, self.n - 1)] == self.hub_vids)
            self.owned_is_hub[idx[ok]] = True
            hd = np.asarray(hub_degrees, dtype=np.int64)
            self.out_degree = self.out_degree.copy()
            self.out_degree[idx[ok]] = hd[ok]
        if delegate_src is not None and len(delegate_src):
            ds_ = np.asarray(delegate_src, dtype=np.int64)
            dd_ = np.asarray(delegate_dst, dtype=np.int64)
            order2 = np.lexsort((dd_, ds_))
            dw_ = (
                np.asarray(delegate_w, dtype=np.float64)[order2]
                if delegate_w is not None
                else None
            )
            ds_, dd_ = ds_[order2], dd_[order2]
            keep2 = np.empty(ds_.size, dtype=bool)
            keep2[0] = True
            keep2[1:] = (ds_[1:] != ds_[:-1]) | (dd_[1:] != dd_[:-1])
            if dw_ is not None:
                dw_ = np.minimum.reduceat(dw_, np.flatnonzero(keep2))
            ds_, dd_ = ds_[keep2], dd_[keep2]
            self.del_vids, del_counts = np.unique(ds_, return_counts=True)
            self.del_indptr = np.zeros(self.del_vids.size + 1, dtype=np.int64)
            np.cumsum(del_counts, out=self.del_indptr[1:])
            self.del_adj = dd_
            self.del_w = dw_
        else:
            self.del_vids = np.empty(0, dtype=np.int64)
            self.del_indptr = np.zeros(1, dtype=np.int64)
            self.del_adj = np.empty(0, dtype=np.int64)
            self.del_w = np.empty(0, np.float64) if w is not None else None
        # (hub_vid, pushed_value) pairs buffered by push(); the actor drains
        # them into the per-superstep hub broadcast channel
        self.pending_hub: list[tuple[np.ndarray, np.ndarray]] = []

    # ------------------------------------------------------------------
    # Lazy derived structures. Each program touches only a subset — PageRank
    # needs the full-adjacency dense index, CC/SSSP the local/remote split +
    # remote index, simulation neither — so they build on first access and
    # actor startup pays only for what the program will use (graph load was
    # the dominant cost of short jobs).
    _LAZY_BUILDERS = {
        "lin_src": "_build_local_remote",
        "lin_starts": "_build_local_remote",
        "lin_dsts": "_build_local_remote",
        "m_local": "_build_local_remote",
        "r_indptr": "_build_local_remote",
        "r_adj": "_build_local_remote",
        "lin_w": "_build_local_remote",
        "r_w": "_build_local_remote",
        "adj_uniq": "_build_full_index",
        "adj_uniq_bounds": "_build_full_index",
        "adj_idx": "_build_full_index",
        "r_uniq": "_build_rem_index",
        "r_uniq_bounds": "_build_rem_index",
        "r_idx": "_build_rem_index",
        "lin_indptr": "_build_lin_by_src",
        "lin_by_src_indptr": "_build_lin_by_src",
        "lin_by_src_pos": "_build_lin_by_src",
        "trans_w": "_build_trans",
        "w_out": "_build_trans",
        "w_has_negative": "_build_w_flags",
    }

    def _build_w_flags(self) -> None:
        """Negative weight lane present? Monotone-frontier programs
        (WeightedSSSP/WeightedPageRank) must refuse such layouts — only
        BellmanFordSSSP (cycle-detecting) may relax negative edges. Lazy so
        the actor's npz CSR cache (which bypasses __init__) gets it too."""
        self.w_has_negative = bool(
            (self.w is not None and self.w.size and float(self.w.min()) < 0)
            or (
                self.del_w is not None
                and self.del_w.size
                and float(self.del_w.min()) < 0
            )
        )

    def __getattr__(self, name):
        builder = PartitionGraph._LAZY_BUILDERS.get(name)
        if builder is None:
            raise AttributeError(name)
        getattr(self, builder)()
        return self.__dict__[name]

    def _build_local_remote(self) -> None:
        """Local/remote edge split: local edges grouped by *destination* for
        reduceat-based in-partition propagation (the subgraph-centric
        local-fixpoint speedup, /root/reference/src/algorithm/CC.go:28-45),
        plus the remote-only CSR for boundary sends."""
        d = self.adj
        adj_owner = self.ownership.of(d, self.P)
        local_mask = adj_owner == self.p
        l_dst = np.searchsorted(self.owned, d[local_mask])
        l_src = self.adj_src_local[local_mask]
        o2 = np.argsort(l_dst, kind="stable")
        self.lin_src = l_src[o2]  # local src row, grouped by dst
        ld_sorted = l_dst[o2]
        if ld_sorted.size:
            ng = np.empty(ld_sorted.size, dtype=bool)
            ng[0] = True
            ng[1:] = ld_sorted[1:] != ld_sorted[:-1]
            self.lin_starts = np.flatnonzero(ng)
            self.lin_dsts = ld_sorted[self.lin_starts]
        else:
            self.lin_starts = np.empty(0, dtype=np.int64)
            self.lin_dsts = np.empty(0, dtype=np.int64)
        self.m_local = int(ld_sorted.size)
        if self.w is not None:
            self.lin_w = self.w[local_mask][o2]  # aligned with lin_src
        else:
            self.lin_w = None
        r_mask = ~local_mask
        r_counts = (
            np.bincount(self.adj_src_local[r_mask], minlength=self.n)
            if r_mask.any()
            else np.zeros(self.n, np.int64)
        )
        self.r_indptr = np.zeros(self.n + 1, dtype=np.int64)
        np.cumsum(r_counts, out=self.r_indptr[1:])
        # stable: within src, remote edges keep (src,dst) order
        self.r_adj = d[r_mask]
        self.r_w = self.w[r_mask] if self.w is not None else None

    def _build_lin_by_src(self) -> None:
        """Reverse index over the local (dst-grouped) edge list: positions
        grouped by SOURCE row, for frontier-sliced min-propagation (only
        dst groups fed by a changed source get recomputed)."""
        self.lin_indptr = np.append(self.lin_starts, self.m_local)
        order = np.argsort(self.lin_src, kind="stable")
        self.lin_by_src_pos = order
        counts = (
            np.bincount(self.lin_src, minlength=self.n)
            if self.m_local
            else np.zeros(self.n, np.int64)
        )
        self.lin_by_src_indptr = np.zeros(self.n + 1, dtype=np.int64)
        np.cumsum(counts, out=self.lin_by_src_indptr[1:])

    def _build_trans(self) -> None:
        """Weight-proportional transition factors over the FULL adjacency:
        t_e = w_e / W_u with W_u = Σ w over u's (deduped) out-edges — the
        weighted analog of 1/outdeg. Valid because ownership routes ALL
        out-edges of an owned vertex here (same argument as out_degree);
        split hubs break that and weighted programs must reject them.
        W_u = 0 (no edges, or all-zero weights) leaves t undefined — such
        vertices never push, the weighted dangling case."""
        if self.w is None:
            self.trans_w = None
            self.w_out = None
            return
        wsum = (
            np.bincount(self.adj_src_local, weights=self.w, minlength=self.n)
            if self.m
            else np.zeros(self.n)
        )
        t = np.zeros(self.m)
        denom = wsum[self.adj_src_local] if self.m else np.empty(0)
        np.divide(self.w, denom, out=t, where=denom > 0)
        self.trans_w = t
        self.w_out = wsum

    # --- dense outbound-boundary index (built once per used side) --------
    # The per-superstep sender combine used to be a lexsort over every
    # outbound message row (O(E log E), DRAM-bound — the measured scaling
    # ceiling). Instead, precompute the partition's distinct destination
    # set grouped by owner plus an int index per edge into it; the combine
    # becomes an O(E + |boundary|) bincount/minimum.at into that dense
    # domain, and the per-owner split is a precomputed slice — no sort, no
    # hash, no masks in the superstep. Costs one index array per used
    # adjacency side (8 B/edge).
    def _build_full_index(self) -> None:
        self.adj_uniq, self.adj_uniq_bounds, self.adj_idx = self._dense_dst_index(self.adj)

    def _build_rem_index(self) -> None:
        self.r_uniq, self.r_uniq_bounds, self.r_idx = self._dense_dst_index(self.r_adj)

    def _dense_dst_index(self, adj: np.ndarray):
        """(uniq_vids grouped by owner, per-owner bounds, per-edge index)."""
        if adj.size == 0:
            return (
                np.empty(0, np.int64),
                np.zeros(self.P + 1, np.int64),
                np.empty(0, np.int64),
            )
        uniq = np.unique(adj)  # sorted by vid
        own = self.ownership.of(uniq, self.P)
        perm = np.lexsort((uniq, own))  # grouped by owner, vid asc within
        grouped = uniq[perm]
        bounds = np.searchsorted(own[perm], np.arange(self.P + 1))
        inv = np.empty(perm.size, np.int64)
        inv[perm] = np.arange(perm.size)
        idx = inv[np.searchsorted(uniq, adj)]
        return grouped, bounds, idx

    # ------------------------------------------------------------------
    def local_index(self, vids: np.ndarray) -> np.ndarray:
        """Global vid → local row (vids must be owned by this partition)."""
        return np.searchsorted(self.owned, vids)

    @staticmethod
    def _gather_slices(indptr: np.ndarray, adj: np.ndarray, rows: np.ndarray):
        """Concatenated adjacency slices for the given rows (fully vectorized).

        Callers pass ``rows`` sorted ascending and unique (frontiers come
        from flatnonzero/unique/searchsorted over sorted sets), which makes
        two identity fast paths exact: when the rows are ALL rows, or when
        their slices cover every edge (every nonzero-degree row is active —
        the dense early supersteps), the concatenated slices ARE ``adj`` in
        storage order, so the offs construction (three full-size temporaries
        + a fancy gather per superstep) is skipped entirely."""
        starts = indptr[rows]
        lens = indptr[rows + 1] - starts
        total = int(lens.sum())
        if total == 0:
            return np.empty(0, dtype=adj.dtype), lens
        # strictly-increasing is required in BOTH branches: duplicate rows
        # (e.g. delegate_expand with the same hub vid twice — LPA's ±delta
        # pair) can satisfy total == adj.size while needing a replicated
        # gather, so sorted-unique must be verified, never assumed
        if total == adj.size and bool(np.all(np.diff(rows) > 0)):
            return adj, lens
        offs = np.repeat(starts, lens) + (
            np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        )
        return adj[offs], lens

    @staticmethod
    def _gather_slices2(indptr: np.ndarray, a1: np.ndarray, a2: np.ndarray, rows: np.ndarray):
        """:meth:`_gather_slices` over TWO arrays aligned to the same edge
        order (adjacency + per-edge weight), sharing one offsets pass."""
        starts = indptr[rows]
        lens = indptr[rows + 1] - starts
        total = int(lens.sum())
        if total == 0:
            return np.empty(0, dtype=a1.dtype), np.empty(0, dtype=a2.dtype), lens
        if total == a1.size and bool(np.all(np.diff(rows) > 0)):
            return a1, a2, lens
        offs = np.repeat(starts, lens) + (
            np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        )
        return a1[offs], a2[offs], lens

    def push(
        self, rows: np.ndarray, values: np.ndarray, remote_only: bool = False
    ):
        """Replicate per-source ``values`` along out-edges of ``rows``.

        Returns (dst_vids, vals) — the raw outbound message columns before
        pre-combine. ``remote_only`` pushes only along edges whose dst is
        owned elsewhere (used after an in-partition fixpoint already applied
        the local edges).

        Pushed rows that are SPLIT HUBS have no adjacency here (it lives in
        delegate slices across partitions); their (vid, value) pairs are
        buffered in ``pending_hub`` for the actor's broadcast channel, so
        the hub owner emits O(P) bytes instead of O(degree).
        """
        rows = np.asarray(rows)
        values = np.asarray(values)
        if self.hub_vids.size:
            hub_mask = self.owned_is_hub[rows]
            if hub_mask.any():
                self.pending_hub.append((self.owned[rows[hub_mask]], values[hub_mask]))
        indptr = self.r_indptr if remote_only else self.indptr
        adj = self.r_adj if remote_only else self.adj
        dsts, lens = self._gather_slices(indptr, adj, rows)
        vals = np.repeat(values, lens)
        return dsts, vals

    def push_combined(
        self,
        rows: np.ndarray,
        values: np.ndarray,
        op: str = "sum",
        remote_only: bool = False,
        edge_weights: bool | str = False,
    ):
        """Like :meth:`push`, but returns per-owner payloads already combined
        per destination vid — ``(routed, edges_traversed)`` where ``routed``
        is a length-P list of ``{"vid", "val"}`` dicts (or None).

        The combine runs in the dense boundary domain built at load time
        (``_dense_dst_index``): replicate values along adjacency index
        slices, reduce with bincount (sum) / minimum.at (min), then cut the
        accumulator at the precomputed per-owner bounds. Replaces the
        sender-side lexsort pre-combine — same shipped rows, ~30× less
        superstep CPU on large message volumes.
        """
        rows = np.asarray(rows)
        values = np.asarray(values)
        out: list[dict | None] = [None] * self.P
        if self.hub_vids.size:
            hub_mask = self.owned_is_hub[rows]
            if hub_mask.any():
                self.pending_hub.append((self.owned[rows[hub_mask]], values[hub_mask]))
        indptr = self.r_indptr if remote_only else self.indptr
        idx_arr = self.r_idx if remote_only else self.adj_idx
        bounds = self.r_uniq_bounds if remote_only else self.adj_uniq_bounds
        if edge_weights:
            # per-EDGE message value. edge_weights=True/"add": value(src) +
            # w(src, dst) — weighted relaxation pushes (SSSP); hub values are
            # buffered RAW above, the delegate owner adds its slice's weights
            # (delegate_expand). edge_weights="mul": value(src) × t(src, dst)
            # with t = w/W_src — weight-proportional transitions (weighted
            # PageRank); full side only, and incompatible with split hubs
            # (W_src needs every out-edge local — callers must reject hubs).
            if edge_weights == "mul":
                if remote_only:
                    raise ValueError('edge_weights="mul" pushes on the full side only')
                w_arr = self.trans_w
            else:
                w_arr = self.r_w if remote_only else self.w
            if w_arr is None:
                raise ValueError("edge_weights on an unweighted graph layout")
            idx, wsl, lens = self._gather_slices2(indptr, idx_arr, w_arr, rows)
            if idx.size == 0:
                return out, 0
            rep = np.repeat(values, lens)
            vals = rep * wsl if edge_weights == "mul" else rep + wsl
        else:
            idx, lens = self._gather_slices(indptr, idx_arr, rows)
            if idx.size == 0:
                return out, 0
            vals = np.repeat(values, lens)
        m = int(bounds[-1])
        # Touched slots are read off the accumulator itself (non-identity
        # values) instead of a second counting bincount over all E rows. A
        # slot whose combined value IS the identity (a sum cancelling to
        # exactly 0.0, a min that stayed at inf) is dropped — receiving the
        # identity is indistinguishable from receiving nothing for sum/min,
        # and every program treats untouched rows as a no-op.
        if op == "sum":
            if vals.dtype.kind in "iu":
                # bincount's float64 weights would silently round integer
                # values beyond 2^53 — accumulate in the integer domain
                acc = np.zeros(m, dtype=vals.dtype)
                np.add.at(acc, idx, vals)
            else:
                acc = np.bincount(idx, weights=vals, minlength=m)
            touched = acc != 0
        elif op == "min":
            if vals.dtype.kind == "f":
                acc = np.full(m, np.inf)
                np.minimum.at(acc, idx, vals)
                touched = np.isfinite(acc)
            else:
                sentinel = np.iinfo(vals.dtype).max
                acc = np.full(m, sentinel, dtype=vals.dtype)
                np.minimum.at(acc, idx, vals)
                touched = acc != sentinel
        else:  # pragma: no cover - max unused by built-ins
            acc = np.full(m, -np.inf)
            np.maximum.at(acc, idx, vals)
            touched = np.isfinite(acc)
        # Compact payloads against the STATIC boundary the receiver
        # registered at startup (actor.register_inbound): dense form ships
        # just the value lane (identity slots are no-ops for sum/min),
        # sparse form ships int32 positions + values. Either is a fraction
        # of the (vid int64, val) rows the generic channel ships.
        remote_flag = bool(remote_only)
        for q in range(self.P):
            lo, hi = int(bounds[q]), int(bounds[q + 1])
            if lo == hi:
                continue
            tsl = touched[lo:hi]
            n_touched = int(np.count_nonzero(tsl))
            if n_touched == 0:
                continue
            if n_touched * 3 >= (hi - lo):  # sparse rows cost ~12B vs 8B dense
                out[q] = {"d": acc[lo:hi].copy(), "r": remote_flag, "n": n_touched}
            else:
                sel = np.flatnonzero(tsl)
                out[q] = {
                    "p": sel.astype(np.int32),
                    "v": acc[lo + sel],
                    "r": remote_flag,
                    "n": n_touched,
                }
        return out, int(vals.size)

    def outbound_boundary(self, q: int, remote_only: bool) -> np.ndarray:
        """The static sorted destination-vid set this partition can ever
        send to owner q (global vids)."""
        uniq = self.r_uniq if remote_only else self.adj_uniq
        bounds = self.r_uniq_bounds if remote_only else self.adj_uniq_bounds
        return uniq[int(bounds[q]) : int(bounds[q + 1])]

    def delegate_expand(
        self, hub_vids: np.ndarray, values: np.ndarray, add_edge_weights: bool = False
    ):
        """Replicate broadcast (hub, value) pairs along this partition's
        delegate slices → (dst_vids, vals); dsts are all owned locally.
        ``add_edge_weights``: hub broadcasts carry the RAW source value
        (weights live with the delegate slice, not the sender) — add this
        partition's per-delegate-edge weight after replication."""
        idx = np.searchsorted(self.del_vids, hub_vids)
        if self.del_vids.size == 0:
            return np.empty(0, np.int64), np.empty(0, values.dtype if values.size else np.float64)
        ok = (idx < self.del_vids.size) & (
            self.del_vids[np.minimum(idx, self.del_vids.size - 1)] == hub_vids
        )
        rows = idx[ok]
        if add_edge_weights:
            if self.del_w is None:
                raise ValueError("add_edge_weights=True on an unweighted graph layout")
            dsts, wsl, lens = self._gather_slices2(self.del_indptr, self.del_adj, self.del_w, rows)
            vals = np.repeat(values[ok], lens) + wsl
        else:
            dsts, lens = self._gather_slices(self.del_indptr, self.del_adj, rows)
            vals = np.repeat(values[ok], lens)
        return dsts, vals

    def drain_pending_hub(self):
        if not self.pending_hub:
            return None
        vids = np.concatenate([v for v, _ in self.pending_hub])
        vals = np.concatenate([x for _, x in self.pending_hub])
        self.pending_hub = []
        return {"vid": vids, "val": vals}
