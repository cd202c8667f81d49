"""VertexProgram protocol + the four built-in programs (SURVEY.md §2.11-2.12).

The reference's de-facto plugin API is the (PEval, IncEval, Assemble) triple
per algorithm wired into a gRPC worker (/root/reference/src/protobuf/
worker_service.proto:11-22). Here a program is a plain Python class executed
inside every partition actor:

    init_state(g)            -> dict of numpy arrays (length g.n) + "aux" scalars
    peval(g, st)             -> (Messages|None, info)   # full first pass
    inceval(g, st, inbound)  -> (Messages|None, info)   # consume combined msgs
    emit(g, st)              -> pyarrow.Table           # the Assemble writer

``inbound`` is already owner-combined (sum/min per key); outbound Messages
are pre-combined per destination partition by the actor. All numeric work is
vectorized numpy over the CSR arrays — no per-row Python in supersteps.
"""

from __future__ import annotations

import warnings

import numpy as np
import pyarrow as pa

from drone_ray.graph.csr import PartitionGraph
from drone_ray.graph.messages import Messages

INF = float("inf")


class VertexProgram:
    combine_op: str = "sum"
    extra_key: str | None = None
    needs_symmetrized: bool = False
    # graph view on a dual layout when the caller passes no direction:
    # "fwd" (directed), "rev" (reversed), "both" (symmetrized)
    default_direction: str = "both"
    # compact message channels this program pushes on via push_combined
    # ("full" and/or "remote"); drives which dense boundary indexes are
    # built and exchanged at startup. Programs on the generic (vid, val)
    # route() path declare none.
    channels: tuple = ("full", "remote")
    # sender-side per-(dest, key) combine before the exchange: on skewed
    # graphs duplicate destination keys dominate, so the lexsort pays for
    # itself many times over in shipped volume (measured 3-4× per-step wall
    # on a 12M-edge power-law graph). The owner-side combine is a linear
    # bincount either way, so disabling this is safe but rarely faster.
    sender_precombine: bool = True

    def init_state(self, g: PartitionGraph) -> dict:
        raise NotImplementedError

    def peval(self, g: PartitionGraph, st: dict):
        raise NotImplementedError

    def inceval(self, g: PartitionGraph, st: dict, inbound: Messages | None):
        raise NotImplementedError

    def emit(self, g: PartitionGraph, st: dict) -> pa.Table:
        raise NotImplementedError

    @classmethod
    def should_stop(cls, step_metrics: list[dict], step: int) -> bool:
        """Default: stop when no partition produced messages — the master's
        OR-reduce over MessageToSend (/root/reference/src/master.go:267-271)."""
        return not any(m.get("has_msgs") for m in step_metrics)

    def expand_hub(self, dsts: np.ndarray, values: np.ndarray) -> Messages:
        """Rebuild message rows from a split hub's broadcast value replicated
        along a delegate adjacency slice. Default matches the plain
        (vid, val) message shape; programs with extra key columns override."""
        return {"vid": dsts, "val": values}


def _gather_neighbors(indptr: np.ndarray, adj: np.ndarray, rows: np.ndarray):
    """(kept_rows, lens, dsts): the adjacency entries of ``rows``, gathered
    row-major with the repeat/cumsum device — the shared kernel behind
    MIS/coloring/HyperANF sends. ``dsts[i]`` belongs to the kept row
    ``np.repeat(kept_rows, lens)[i]``."""
    lens = indptr[rows + 1] - indptr[rows]
    keep = lens > 0
    rows, lens = rows[keep], lens[keep]
    if rows.size == 0:
        return rows, lens, np.empty(0, dtype=adj.dtype)
    total = int(lens.sum())
    pos = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    return rows, lens, adj[np.repeat(indptr[rows], lens) + pos]


def _ilog2(v: np.ndarray) -> np.ndarray:
    """Exact integer floor(log2) for uint64 (0 → 0): float64 log2 misplaces
    the leading bit of values near 2^53, so shift in 6 halving steps."""
    out = np.zeros(v.size, dtype=np.int64)
    v = v.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        out[big] += s
        v[big] >>= np.uint64(s)
    return out


def _msgs(vid: np.ndarray, val: np.ndarray, **extra) -> Messages | None:
    if vid.size == 0:
        return None
    return {"vid": vid, "val": val, **extra}


# ---------------------------------------------------------------------------
class PageRank(VertexProgram):
    """Delta-propagation PageRank, exact reference recurrence (SURVEY §2.12).

    ``pr = 0.85·acc + 0.15`` with acc = Σ_in pr(u)/outdeg(u) — un-normalized
    Pregel-style PR, init 1.0, damping 0.85, additive (1-α) not (1-α)/N
    (/root/reference/src/algorithm/PageRank.go:10-11,19-23,74). A vertex
    re-sends only when its pr moved more than ``eps`` since its last send;
    the unsent residual stays pending against ``last_sent`` so no mass is
    lost (reference diff/acc dance, PageRank.go:56-88). Dangling vertices
    (outdeg 0) never push — no dangling-mass redistribution, matching
    PageRank.go:29-31. eps is the reference's 0.01 knob, default tightened
    to 1e-10 so converged scores are allclose(1e-6) to the dense fixpoint.
    """

    default_direction = "fwd"
    channels = ("full",)

    def __init__(
        self, eps: float = 1e-10, damping: float = 0.85, teleport_mod: int | None = None
    ):
        self.eps = eps
        self.damping = damping
        # personalized PageRank: restrict the additive teleport term to the
        # deterministic source set {v : v % teleport_mod == 0} (SQL-expressible,
        # so the oracle can mirror it). None = uniform teleport (classic PR).
        self.teleport_mod = teleport_mod

    def init_state(self, g):
        if self.teleport_mod is None:
            base = np.full(g.n, 1.0 - self.damping)
        else:
            base = np.where(g.owned % self.teleport_mod == 0, 1.0 - self.damping, 0.0)
        return {
            "pr": np.ones(g.n),
            "acc": np.zeros(g.n),
            "last_sent": np.ones(g.n),
            "base": base,
            "aux": {"dense_done": False},
        }

    def peval(self, g, st):
        rows = np.flatnonzero(g.out_degree > 0)
        share = st["pr"][rows] / g.out_degree[rows]  # = 1/outdeg at init
        routed, edges = g.push_combined(rows, share)
        return routed, {"edges": edges, "max_delta": 1.0}

    def inceval(self, g, st, inbound):
        if inbound is not None:
            recv = inbound["li"] if "li" in inbound else g.local_index(inbound["vid"])
            st["acc"][recv] += inbound["val"]
        else:
            recv = np.empty(0, dtype=np.int64)
        if not st["aux"]["dense_done"]:
            # first IncEval applies the recurrence to every vertex so
            # zero-in-degree vertices settle at 0.15 (dense fixpoint oracle)
            targets = np.arange(g.n)
            st["aux"]["dense_done"] = True
        else:
            targets = recv
        if targets.size == 0:
            return None, {"edges": 0, "max_delta": 0.0, "active": 0}
        new_pr = self.damping * st["acc"][targets] + st["base"][targets]
        max_delta = float(np.abs(new_pr - st["pr"][targets]).max())
        st["pr"][targets] = new_pr
        delta = new_pr - st["last_sent"][targets]
        send = (np.abs(delta) > self.eps) & (g.out_degree[targets] > 0)
        rows = targets[send]
        st["last_sent"][rows] = new_pr[send]
        routed, edges = g.push_combined(rows, delta[send] / g.out_degree[rows])
        return routed, {
            "edges": edges,
            "max_delta": max_delta,
            "active": int(rows.size),
        }

    def emit(self, g, st):
        return pa.table(
            {"vid": pa.array(g.owned, pa.int64()), "score": pa.array(st["pr"], pa.float64())}
        )


# ---------------------------------------------------------------------------
class NegativeCycleError(RuntimeError):
    """A negative-weight cycle is reachable from the SSSP source: shortest
    path distances are undefined (−∞). Raised by BellmanFordSSSP — inside a
    partition by the local wave cap (an improving relaxation wave past
    n_local waves can only come from a non-simple walk, i.e. a negative
    local cycle), across partitions by the driver's V-superstep bound
    (synchronous Bellman-Ford converges within V−1 rounds on any
    negative-cycle-free graph; the subgraph-centric engine is never slower
    in rounds)."""


def _local_min_fixpoint(
    g: PartitionGraph,
    vals: np.ndarray,
    add: float = 0.0,
    seeds: np.ndarray | None = None,
    edge_w: np.ndarray | None = None,
    max_waves: int | None = None,
) -> int:
    """In-partition min-propagation to local fixpoint (the subgraph-centric
    speedup vs one-hop-per-superstep, /root/reference/src/algorithm/CC.go:28-45).
    Mutates ``vals``; returns edges scanned.

    FRONTIER-SLICED: after the first pass (full, or restricted to the edges
    out of ``seeds`` when given — IncEval passes the rows that just received
    smaller values), each inner round recomputes only the dst groups fed by
    a vertex that changed in the previous round, so long-diameter graphs
    cost O(edges touched) instead of O(rounds × local edges). Min-propagation
    is monotone, so chaotic (frontier-ordered) iteration reaches the same
    fixpoint as repeated full passes.

    ``edge_w``: per-edge additive weight aligned with ``g.lin_w``'s layout
    (dst-grouped local edges) — weighted relaxation (asynchronous
    Bellman-Ford over the local subgraph; nonnegative weights keep the
    chaotic iteration terminating at the same fixpoint). Mutually exclusive
    with scalar ``add``.

    ``max_waves``: negative-cycle guard (BellmanFordSSSP passes g.n + 1).
    Each inner wave extends the improving walks by one local hop; on a
    negative-cycle-free subgraph every improving walk is simple (a cycle on
    it would have weight ≥ 0 and de-cycling would improve at least as much),
    so ≤ n_local waves suffice — a still-improving wave past the cap proves
    a negative local cycle and raises NegativeCycleError."""
    if g.lin_starts.size == 0:
        return 0
    # `+ add` must not promote int64 labels to float64: above 2^53 (any
    # hash-derived vid space) the promotion silently rounds label values and
    # min-propagation corrupts. Skip the addition entirely when add == 0
    # (CC); SSSP passes float dists where + 1.0 is exact.
    if add == 0.0:
        _add = lambda x: x  # noqa: E731
    else:
        _add = lambda x: x + add  # noqa: E731
    scanned = 0
    if seeds is None:
        srcv = vals[g.lin_src] + edge_w if edge_w is not None else _add(vals[g.lin_src])
        mins = np.minimum.reduceat(srcv, g.lin_starts)
        scanned += g.m_local
        upd = mins < vals[g.lin_dsts]
        changed = g.lin_dsts[upd]
        vals[changed] = mins[upd]  # lin_dsts are unique per group
    else:
        changed = np.asarray(seeds)
    waves = 0
    while changed.size:
        waves += 1
        if max_waves is not None and waves > max_waves:
            raise NegativeCycleError(
                f"local relaxation still improving after {max_waves} waves "
                f"(n_local={g.n}) — negative-weight cycle in partition {g.p}"
            )
        # edge positions whose source changed → affected dst groups
        pos, _ = g._gather_slices(g.lin_by_src_indptr, g.lin_by_src_pos, changed)
        if pos.size == 0:
            break
        grp = np.unique(np.searchsorted(g.lin_starts, pos, side="right") - 1)
        if edge_w is not None:
            gsrc, gw, glens = g._gather_slices2(g.lin_indptr, g.lin_src, edge_w, grp)
            gsrcv = vals[gsrc] + gw
        else:
            gsrc, glens = g._gather_slices(g.lin_indptr, g.lin_src, grp)
            gsrcv = _add(vals[gsrc])
        new_starts = np.concatenate(([0], np.cumsum(glens)[:-1]))
        mins = np.minimum.reduceat(gsrcv, new_starts)
        scanned += int(gsrcv.size)
        dsts = g.lin_dsts[grp]
        upd = mins < vals[dsts]
        changed = dsts[upd]
        vals[changed] = mins[upd]
    return scanned


class ConnectedComponents(VertexProgram):
    """Min-label propagation to fixpoint over *symmetrized* edges → WCC.

    The reference propagates min labels through out-edges only and relies on
    its preprocessing to double undirected edges
    (/root/reference/src/algorithm/CC.go:28-45,94-100;
    src/generate_subgraph_json.py:44); we symmetrize explicitly at graph
    build. Component id = min vid in the component, init cc[v]=v (CC.go:51-54).
    """

    combine_op = "min"
    needs_symmetrized = True
    default_direction = "both"
    channels = ("remote",)

    def init_state(self, g):
        return {"label": g.owned.copy(), "aux": {}}

    def _boundary(self, g, st, rows):
        rdeg = g.r_indptr[rows + 1] - g.r_indptr[rows]
        # split hubs have no local remote edges but must still broadcast
        rows = rows[(rdeg > 0) | g.owned_is_hub[rows]]
        return g.push_combined(rows, st["label"][rows], op="min", remote_only=True)

    def peval(self, g, st):
        scanned = _local_min_fixpoint(g, st["label"])
        msgs, sent = self._boundary(g, st, np.arange(g.n))
        return msgs, {"edges": scanned + sent}

    def inceval(self, g, st, inbound):
        if inbound is None:
            return None, {"edges": 0, "n_changed": 0}
        l = inbound["li"] if "li" in inbound else g.local_index(inbound["vid"])
        smaller = inbound["val"] < st["label"][l]
        if not smaller.any():
            return None, {"edges": 0, "n_changed": 0}
        before = st["label"].copy()
        st["label"][l[smaller]] = inbound["val"][smaller]
        # the partition was at local fixpoint; only rows the inbound lowered
        # can invalidate it → frontier-seeded propagation
        scanned = _local_min_fixpoint(g, st["label"], seeds=l[smaller])
        changed = np.flatnonzero(st["label"] < before)
        msgs, sent = self._boundary(g, st, changed)
        return msgs, {"edges": scanned + sent, "n_changed": int(changed.size)}

    def emit(self, g, st):
        return pa.table(
            {"vid": pa.array(g.owned, pa.int64()), "component": pa.array(st["label"], pa.int64())}
        )


# ---------------------------------------------------------------------------
class LabelPropagation(VertexProgram):
    """Synchronous LPA (north-rule addition; absent in the reference —
    SURVEY.md §2.12). Labels init to vid over symmetrized edges; each round
    every vertex takes the most frequent neighbor label, ties broken by the
    lowest label; stops when no label changed or after ``max_rounds``.

    DELTA MESSAGES (round 3): round 0 broadcasts every label once to seed a
    per-owner neighbor-label count map; every later round sends
    (dst, old_label, −1) / (dst, new_label, +1) only along the out-edges of
    vertices whose label CHANGED — the reference's Sim ±count pattern
    (/root/reference/src/algorithm/Sim.go:117-134). Per-round message volume
    is ∝ Σ deg(changed) instead of Θ(E); winners are recomputed only for
    rows whose counts moved, so results are bit-identical to the full
    re-broadcast formulation (the count map always equals the current
    neighbor-label multiset). Hub broadcasts pack (label, sign) as
    ±(label+1) in the scalar channel."""

    combine_op = "sum"
    extra_key = "label"
    needs_symmetrized = True
    channels = ()
    sender_precombine = True  # (vid, label) count rows compress at the sender

    def __init__(self, max_rounds: int = 10):
        self.max_rounds = max_rounds

    def init_state(self, g):
        # neighbor-label count map: parallel arrays sorted by (row, lab).
        # Ragged (not length n) ⇒ lives on the program instance and rides
        # checkpoints through extra_state()/load_extra_state().
        self._mrow = np.empty(0, np.int64)
        self._mlab = np.empty(0, np.int64)
        self._mcnt = np.empty(0, np.int64)
        return {"label": g.owned.copy(), "aux": {"round": 0}}

    def expand_hub(self, dsts, values):
        # scalar channel carries ±(label+1): sign = count delta, |v|-1 = label
        v = values.astype(np.int64)
        return {"vid": dsts, "val": np.sign(v), "label": np.abs(v) - 1}

    def _push_packed(self, g, rows, packed):
        """Push ±(label+1) along out-edges → (vid, val=±1, label) rows;
        split-hub rows ride the scalar broadcast channel as-is."""
        dst, v = g.push(rows, packed)
        return dst, np.sign(v), np.abs(v) - 1

    def peval(self, g, st):
        rows = np.flatnonzero(g.out_degree > 0)
        dst, val, lab = self._push_packed(g, rows, st["label"][rows] + 1)
        return _msgs(dst, val, label=lab), {"edges": int(dst.size), "n_changed": g.n}

    def _merge(self, li, lab, cnt):
        """Fold (row, lab, cnt) deltas into the sorted count map.

        Deliberate O(map) local cost per round: the concat+radix-lexsort
        touches the whole map even for tiny deltas, but that is a linear
        in-memory pass over a few MB per partition — the delta design's
        target is the per-round MESSAGE volume (network/object store),
        which is ∝ changed vertices. A two-way sorted merge would make the
        local pass ∝ delta too if it ever shows in profiles."""
        row = np.concatenate([self._mrow, li])
        lb = np.concatenate([self._mlab, lab])
        ct = np.concatenate([self._mcnt, cnt])
        order = np.lexsort((lb, row))
        row, lb, ct = row[order], lb[order], ct[order]
        new = np.empty(row.size, dtype=bool)
        new[0] = True
        new[1:] = (row[1:] != row[:-1]) | (lb[1:] != lb[:-1])
        starts = np.flatnonzero(new)
        ct = np.add.reduceat(ct, starts)
        keep = ct != 0
        self._mrow = row[starts][keep]
        self._mlab = lb[starts][keep]
        self._mcnt = ct[keep]

    def _winners(self, rows_t):
        """(rows, winner_label) for the touched rows, from their map slices:
        highest count, tie → lowest label (deterministic)."""
        lo = np.searchsorted(self._mrow, rows_t, side="left")
        hi = np.searchsorted(self._mrow, rows_t, side="right")
        lens = hi - lo
        total = int(lens.sum())
        if total == 0:
            return rows_t[:0], rows_t[:0]
        pos = np.repeat(lo, lens) + (
            np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        )
        rr, ll, cc = self._mrow[pos], self._mlab[pos], self._mcnt[pos]
        order = np.lexsort((ll, -cc, rr))
        rs = rr[order]
        first = np.empty(rs.size, dtype=bool)
        first[0] = True
        first[1:] = rs[1:] != rs[:-1]
        return rs[first], ll[order][first]

    def inceval(self, g, st, inbound):
        st["aux"]["round"] += 1
        n_changed = 0
        sent = 0
        msgs = None
        if inbound is not None:
            li = g.local_index(inbound["vid"])
            self._merge(li, inbound["label"].astype(np.int64), inbound["val"].astype(np.int64))
            win_rows, win_lab = self._winners(np.unique(li))
            cur = st["label"][win_rows]
            chg = win_lab != cur
            n_changed = int(chg.sum())
            if n_changed and st["aux"]["round"] < self.max_rounds:
                rows = win_rows[chg]
                old, new = cur[chg], win_lab[chg]
                st["label"][rows] = new
                d1, v1, l1 = self._push_packed(g, rows, -(old + 1))
                d2, v2, l2 = self._push_packed(g, rows, new + 1)
                dst = np.concatenate([d1, d2])
                msgs = _msgs(dst, np.concatenate([v1, v2]), label=np.concatenate([l1, l2]))
                sent = int(dst.size)
            elif n_changed:
                st["label"][win_rows[chg]] = win_lab[chg]
        return msgs, {"edges": sent, "n_changed": n_changed}

    def extra_state(self) -> pa.Table:
        """Checkpoint the ragged count map (see actor.checkpoint)."""
        return pa.table(
            {
                "row": pa.array(self._mrow, pa.int64()),
                "lab": pa.array(self._mlab, pa.int64()),
                "cnt": pa.array(self._mcnt, pa.int64()),
            }
        )

    def load_extra_state(self, t: pa.Table) -> None:
        self._mrow = np.array(t["row"].to_numpy(zero_copy_only=False))
        self._mlab = np.array(t["lab"].to_numpy(zero_copy_only=False))
        self._mcnt = np.array(t["cnt"].to_numpy(zero_copy_only=False))

    @classmethod
    def should_stop(cls, step_metrics, step):
        if not any(m.get("has_msgs") for m in step_metrics):
            return True
        return step >= 1 and sum(m.get("n_changed", 0) for m in step_metrics) == 0

    def emit(self, g, st):
        return pa.table(
            {"vid": pa.array(g.owned, pa.int64()), "label": pa.array(st["label"], pa.int64())}
        )


# ---------------------------------------------------------------------------
class SSSP(VertexProgram):
    """Single-source shortest paths: local relax-to-fixpoint per superstep +
    min-combine on boundaries (/root/reference/src/algorithm/SSSP.go:63-106,
    145-150). All edge weights are 1.0 — the reference forces this at load
    (/root/reference/src/graph/graph.go:357-362) — so distances are BFS hop
    counts. The source is a parameter (the reference hard-codes 73723936,
    src/worker/SSSPworker.go:160)."""

    combine_op = "min"
    default_direction = "fwd"
    channels = ("remote",)

    def __init__(self, source: int):
        self.source = int(source)

    def init_state(self, g):
        return {"dist": np.full(g.n, INF), "aux": {}}

    def _boundary(self, g, st, rows):
        rdeg = g.r_indptr[rows + 1] - g.r_indptr[rows]
        rows = rows[(rdeg > 0) | g.owned_is_hub[rows]]
        return g.push_combined(rows, st["dist"][rows] + 1.0, op="min", remote_only=True)

    def peval(self, g, st):
        idx = np.searchsorted(g.owned, self.source)
        if idx >= g.n or g.owned[idx] != self.source:
            return None, {"edges": 0}
        st["dist"][idx] = 0.0
        scanned = _local_min_fixpoint(g, st["dist"], add=1.0)
        changed = np.flatnonzero(np.isfinite(st["dist"]))
        msgs, sent = self._boundary(g, st, changed)
        return msgs, {"edges": scanned + sent}

    def inceval(self, g, st, inbound):
        if inbound is None:
            return None, {"edges": 0}
        l = inbound["li"] if "li" in inbound else g.local_index(inbound["vid"])
        smaller = inbound["val"] < st["dist"][l]
        if not smaller.any():
            return None, {"edges": 0}
        before = st["dist"].copy()
        np.minimum.at(st["dist"], l[smaller], inbound["val"][smaller])
        scanned = _local_min_fixpoint(g, st["dist"], add=1.0, seeds=l[smaller])
        changed = np.flatnonzero(st["dist"] < before)
        msgs, sent = self._boundary(g, st, changed)
        return msgs, {"edges": scanned + sent, "n_changed": int(changed.size)}

    def emit(self, g, st):
        # unreachable rows omitted, matching the reference's Assemble filter
        # (/root/reference/src/worker/SSSPworker.go:269-273)
        ok = np.isfinite(st["dist"])
        return pa.table(
            {
                "vid": pa.array(g.owned[ok], pa.int64()),
                "dist": pa.array(st["dist"][ok], pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
class MultiSourceBFS(SSSP):
    """Multi-source BFS: dist(v) = min hop count from ANY seed, seeds the
    deterministic SQL-expressible set {v : v % seed_mod == 0} (the PPR_MOD
    device). The crawl-frontier depth report — "how far is every page from
    the seed list" — and the building block of landmark/hub distance
    labeling. Identical machinery to SSSP (local relax fixpoint, boundary
    min-combine); only the seeding differs: every owned seed starts at 0,
    so the virtual super-source never materializes anywhere."""

    def __init__(self, seed_mod: int):
        self.seed_mod = int(seed_mod)

    def peval(self, g, st):
        seeds = np.flatnonzero(g.owned % self.seed_mod == 0)
        if seeds.size == 0:
            return None, {"edges": 0}
        st["dist"][seeds] = 0.0
        scanned = _local_min_fixpoint(g, st["dist"], add=1.0)
        changed = np.flatnonzero(np.isfinite(st["dist"]))
        msgs, sent = self._boundary(g, st, changed)
        return msgs, {"edges": scanned + sent}


# ---------------------------------------------------------------------------
class KatzCentrality(PageRank):
    """Katz centrality by the same delta-propagation scheme as PageRank:
    ``x = α·Σ_in x(u) + β`` — the attenuation recurrence WITHOUT the
    1/outdeg division (each in-edge contributes the full upstream score).
    α must satisfy α < 1/λ_max(A) to converge; callers on unknown graphs
    should bound α by 1/max_degree (an upper bound on λ_max, so an α
    below its reciprocal is guaranteed-safe). β = 1-α here so the
    damping/base plumbing is shared verbatim. Extension beyond the
    reference, same plugin surface
    (/root/reference/src/protobuf/worker_service.proto:11-22).

    Unlike PageRank (whose 0.85 damping is always contractive), a bare
    α=0.85 diverges on virtually any real graph, so this class has its
    own conservative default (α=0.01) and a hard divergence guard:
    scores leaving ±`DIVERGENCE_BOUND` (or going non-finite) raise
    RuntimeError instead of silently emitting exponential garbage."""

    DIVERGENCE_BOUND = 1e100

    def __init__(self, eps: float = 1e-12, damping: float = 0.01, alpha: float | None = None):
        # `alpha` is the natural Katz name; `damping` kept for the shared
        # harness kwarg plumbing (analytics.katz_centrality passes damping=α).
        super().__init__(eps=eps, damping=alpha if alpha is not None else damping)

    def init_state(self, g):
        if g.n and g.out_degree.size and self.damping * float(g.out_degree.max()) >= 1.0:
            warnings.warn(
                f"KatzCentrality alpha={self.damping} × max out-degree "
                f"{int(g.out_degree.max())} ≥ 1: the guaranteed-convergence "
                "bound α < 1/max_degree is violated; the run may diverge "
                "(it will raise rather than emit garbage if it does)."
            )
        return super().init_state(g)

    def peval(self, g, st):
        rows = np.flatnonzero(g.out_degree > 0)
        routed, edges = g.push_combined(rows, st["pr"][rows])
        return routed, {"edges": edges, "max_delta": 1.0}

    def inceval(self, g, st, inbound):
        if inbound is not None:
            recv = inbound["li"] if "li" in inbound else g.local_index(inbound["vid"])
            st["acc"][recv] += inbound["val"]
        else:
            recv = np.empty(0, dtype=np.int64)
        if not st["aux"]["dense_done"]:
            targets = np.arange(g.n)
            st["aux"]["dense_done"] = True
        else:
            targets = recv
        if targets.size == 0:
            return None, {"edges": 0, "max_delta": 0.0, "active": 0}
        new_pr = self.damping * st["acc"][targets] + st["base"][targets]
        max_delta = float(np.abs(new_pr - st["pr"][targets]).max())
        if not np.isfinite(max_delta) or np.abs(new_pr).max() > self.DIVERGENCE_BOUND:
            raise RuntimeError(
                f"Katz centrality diverged (|x| > {self.DIVERGENCE_BOUND:g}): "
                f"alpha={self.damping} exceeds 1/λ_max for this graph — "
                "pick α < 1/max_degree"
            )
        st["pr"][targets] = new_pr
        delta = new_pr - st["last_sent"][targets]
        send = (np.abs(delta) > self.eps) & (g.out_degree[targets] > 0)
        rows = targets[send]
        st["last_sent"][rows] = new_pr[send]
        routed, edges = g.push_combined(rows, delta[send])
        return routed, {
            "edges": edges,
            "max_delta": max_delta,
            "active": int(rows.size),
        }


# ---------------------------------------------------------------------------
class WeightedPageRank(PageRank):
    """PageRank with weight-proportional transitions: each source pushes
    value × w(u,v)/W(u) per edge (W(u) = Σ w over u's deduped out-edges)
    instead of value/outdeg — same delta scheme, recurrence
    ``pr = 0.85·Σ_in pr(u)·w/W(u) + 0.15``. Extension beyond the reference
    (weights forced to 1.0, /root/reference/src/graph/graph.go:357-362 —
    with unit weights this IS PageRank). Weighted-dangling vertices
    (W(u) = 0) never push, mirroring the outdeg-0 rule.

    Requires a weighted layout; rejects split hubs (W(u) needs every
    out-edge of u local, which delegate slices break)."""

    def _check(self, g):
        if g.m and g.trans_w is None:
            raise ValueError(
                "WeightedPageRank needs a weighted layout — build_graph(weight_col=...)"
            )
        if g.m and g.w_has_negative:
            raise ValueError(
                "WeightedPageRank is undefined on negative edge weights "
                "(w/W transitions must be a probability distribution)"
            )
        if g.hub_vids.size:
            raise ValueError(
                "WeightedPageRank does not support split hubs (W(u) must see "
                "every out-edge locally); rebuild with hub_threshold=None"
            )

    def peval(self, g, st):
        self._check(g)
        rows = np.flatnonzero(g.w_out > 0) if g.m else np.empty(0, np.int64)
        routed, edges = g.push_combined(rows, st["pr"][rows], edge_weights="mul")
        return routed, {"edges": edges, "max_delta": 1.0}

    def inceval(self, g, st, inbound):
        if inbound is not None:
            recv = inbound["li"] if "li" in inbound else g.local_index(inbound["vid"])
            st["acc"][recv] += inbound["val"]
        else:
            recv = np.empty(0, dtype=np.int64)
        if not st["aux"]["dense_done"]:
            targets = np.arange(g.n)
            st["aux"]["dense_done"] = True
        else:
            targets = recv
        if targets.size == 0:
            return None, {"edges": 0, "max_delta": 0.0, "active": 0}
        new_pr = self.damping * st["acc"][targets] + st["base"][targets]
        max_delta = float(np.abs(new_pr - st["pr"][targets]).max())
        st["pr"][targets] = new_pr
        delta = new_pr - st["last_sent"][targets]
        w_out = g.w_out if g.m else np.zeros(g.n)
        send = (np.abs(delta) > self.eps) & (w_out[targets] > 0)
        rows = targets[send]
        st["last_sent"][rows] = new_pr[send]
        routed, edges = g.push_combined(rows, delta[send], edge_weights="mul")
        return routed, {
            "edges": edges,
            "max_delta": max_delta,
            "active": int(rows.size),
        }


# ---------------------------------------------------------------------------
class WeightedSSSP(SSSP):
    """SSSP over a weighted graph layout (``build_graph(weight_col=...)``):
    distributed asynchronous Bellman-Ford — local weighted relax-to-fixpoint
    per superstep, min-combine on boundaries with the edge weight added
    per-EDGE at the sender (``push_combined(edge_weights=True)``), and hub
    broadcasts carrying the raw source distance (each delegate partition
    adds its slice's weights — ``hub_edge_weights``).

    Extension beyond the reference, which forces every weight to 1.0 at load
    (/root/reference/src/graph/graph.go:357-362) and then runs Dijkstra
    locally (/root/reference/src/algorithm/SSSP.go:21-44); the frontier-
    sliced monotone relaxation reaches the identical fixpoint for
    nonnegative weights and vectorizes, where a heap cannot. Duplicate
    (src, dst) edges keep their MINIMUM weight (csr.PartitionGraph dedup).
    """

    hub_edge_weights = True
    # negative weight lanes break the termination argument of the monotone
    # relaxation; only the cycle-detecting subclass may accept them
    allow_negative = False

    def _waves(self, g) -> int | None:
        """Inner-wave cap for _local_min_fixpoint (negative-cycle guard);
        None disables it (nonnegative weights terminate unaided)."""
        return None

    def _boundary(self, g, st, rows):
        rdeg = g.r_indptr[rows + 1] - g.r_indptr[rows]
        rows = rows[(rdeg > 0) | g.owned_is_hub[rows]]
        # raw dist per source row; push_combined adds w(src,dst) per edge
        return g.push_combined(
            rows, st["dist"][rows], op="min", remote_only=True, edge_weights=True
        )

    def peval(self, g, st):
        if g.m and g.lin_w is None:
            raise ValueError(
                "WeightedSSSP needs a weighted layout — build_graph(weight_col=...)"
            )
        if g.w_has_negative and not self.allow_negative:
            raise ValueError(
                "layout carries negative edge weights — monotone relaxation "
                "is undefined on them; run BellmanFordSSSP instead"
            )
        idx = np.searchsorted(g.owned, self.source)
        if idx >= g.n or g.owned[idx] != self.source:
            return None, {"edges": 0}
        st["dist"][idx] = 0.0
        scanned = _local_min_fixpoint(
            g, st["dist"], edge_w=g.lin_w, max_waves=self._waves(g)
        )
        changed = np.flatnonzero(np.isfinite(st["dist"]))
        msgs, sent = self._boundary(g, st, changed)
        return msgs, {"edges": scanned + sent}

    def inceval(self, g, st, inbound):
        if inbound is None:
            return None, {"edges": 0}
        l = inbound["li"] if "li" in inbound else g.local_index(inbound["vid"])
        smaller = inbound["val"] < st["dist"][l]
        if not smaller.any():
            return None, {"edges": 0}
        before = st["dist"].copy()
        np.minimum.at(st["dist"], l[smaller], inbound["val"][smaller])
        scanned = _local_min_fixpoint(
            g, st["dist"], seeds=l[smaller], edge_w=g.lin_w, max_waves=self._waves(g)
        )
        changed = np.flatnonzero(st["dist"] < before)
        msgs, sent = self._boundary(g, st, changed)
        return msgs, {"edges": scanned + sent, "n_changed": int(changed.size)}


# ---------------------------------------------------------------------------
class BellmanFordSSSP(WeightedSSSP):
    """Weighted SSSP that accepts NEGATIVE edge weights, with negative-cycle
    detection — the variant the nonnegative engine's build-time weight check
    points at (partition._check_weights). Same distributed asynchronous
    relaxation as WeightedSSSP (local relax-to-fixpoint, min-combine on
    boundaries, hub broadcasts with receiver-side weight add): the
    Bellman-Ford fixpoint equals shortest-path distances on any graph with
    no negative cycle reachable from the source, so only the TERMINATION
    argument changes. Two guards make non-termination a loud error instead
    of a hang:

    - **local wave cap** (``_waves`` → n_local + 1): a negative cycle lying
      inside one partition raises NegativeCycleError in that superstep (an
      improving wave past n_local hops can only be a non-simple walk);
    - **global superstep bound**: a cross-partition negative cycle keeps
      messages flowing forever; synchronous Bellman-Ford converges within
      V − 1 rounds otherwise, and the subgraph-centric engine needs no more
      rounds than the synchronous schedule. Run with
      ``max_steps = n_vertices + 2`` and treat a non-converged result as a
      negative cycle — ``analytics.bellman_ford_sssp`` does exactly that.

    Layouts must be built with ``allow_negative_weights=True``; non-finite
    weights stay rejected. Extension beyond the reference (its loader forces
    weight 1.0, /root/reference/src/graph/graph.go:357-362); the detection
    bounds are the textbook SPFA/Bellman-Ford ones (Cormen et al. §24.1).
    """

    allow_negative = True

    def _waves(self, g) -> int | None:
        return g.n + 1


# ---------------------------------------------------------------------------
class HITS(VertexProgram):
    """Hubs & authorities (Kleinberg's HITS), K synchronous iterations with
    L1 normalization per phase:

        auth_k = normalize1(Aᵀ · hub_{k-1});   hub_k = normalize1(A · auth_k)

    A single iteration pushes along BOTH adjacency directions (hub scores
    flow down out-edges, authority scores flow back up in-edges), so the
    program runs on the dual layout with ``direction="dualview"`` — the
    actor attaches the reversed view as ``g.rev_view`` and the program
    alternates which view it pushes on. Both pushes use the generic
    (vid, val) route() path (``channels = ()``), since the static compact
    boundaries are registered for one view only.

    The L1 normalizer is a *global* scalar, so the program declares
    ``wants_feedback``: every superstep reports its partition-local sum in
    ``part_sum``, the driver reduces the partials via ``reduce_feedback``
    and feeds the total into the next superstep (``aux["feedback"]``).
    Feedback serializes the BSP barrier — the harness forces
    ``pipeline_depth=1`` — which is inherent to normalized HITS (every
    implementation synchronizes on the norm), not an engine limitation.

    Superstep schedule, 2K+2 steps total for ``iters`` = K:

      step 0 (PEval)      every vertex pushes hub=1 along fwd edges
      odd step s = 2k-1   finalize hub_{k-1} = raw/Σraw; raw auth sums
                          arrive, divide by the same Σ; push raw auth
                          along rev edges; report Σ_local auth
      even step s = 2k    finalize auth_k; raw hub sums arrive, divide
                          by Σauth; push raw hub along fwd (skipped on
                          the last even step); report Σ_local hub
      step 2K+1           apply the final hub normalizer; report done

    Fixed-iteration semantics (no eps): the driver-gate oracle is a
    recursive CTE running the identical K normalized iterations — see
    queries._HITS_SQL. The reference engine has no HITS; this extends the
    same (PEval, IncEval, Assemble) plugin surface its algorithms use
    (/root/reference/src/protobuf/worker_service.proto:11-22).
    """

    default_direction = "dualview"
    channels = ()  # generic route() on both views
    sender_precombine = False  # scalar sums: owner-side bincount absorbs dups
    wants_feedback = True
    # the driver persists the reduced feedback in each checkpoint manifest
    # and restores it on resume (harness ck_feedback), so feedback programs
    # checkpoint like any other: state arrays + aux json + pending inbound
    checkpointable = True

    def __init__(self, iters: int = 40):
        self.K = int(iters)

    @classmethod
    def reduce_feedback(cls, step_metrics: list[dict]) -> dict:
        return {"norm": float(sum(m.get("part_sum", 0.0) for m in step_metrics))}

    @classmethod
    def should_stop(cls, step_metrics: list[dict], step: int) -> bool:
        # unlike the message-driven programs, HITS's final step only applies
        # the last normalizer (no messages in flight) — stop on its marker
        return any(m.get("done") for m in step_metrics)

    def init_state(self, g):
        if not hasattr(g, "rev_view"):
            raise ValueError(
                "HITS needs both adjacency directions in one actor — run on a "
                "dual layout with direction='dualview'"
            )
        return {
            "auth": np.zeros(g.n),
            "hub": np.ones(g.n),
            "raw": np.zeros(g.n),  # unnormalized sums of the current phase
            "aux": {"step": 0},
        }

    def peval(self, g, st):
        rows = np.flatnonzero(g.out_degree > 0)
        dsts, vals = g.push(rows, st["hub"][rows])
        return _msgs(dsts, vals), {"edges": int(vals.size), "part_sum": 0.0}

    def inceval(self, g, st, inbound):
        st["aux"]["step"] += 1
        s = st["aux"]["step"]
        fb = st["aux"].get("feedback") or {}
        norm = float(fb.get("norm", 1.0)) or 1.0
        dense = np.zeros(g.n)
        if inbound is not None:
            li = inbound["li"] if "li" in inbound else g.local_index(inbound["vid"])
            dense[li] = inbound["val"] / norm
        if s % 2 == 1:  # auth phase (iteration k = (s+1)//2)
            if s > 1:  # s=1 receives exact hub=1 pushes — no normalizer yet
                st["hub"] = st["raw"] / norm
            if (s + 1) // 2 > self.K:  # step 2K+1: final normalizer only
                return None, {"edges": 0, "part_sum": 0.0, "done": True}
            st["raw"] = dense
            rows = np.flatnonzero(dense)
            dsts, vals = g.rev_view.push(rows, dense[rows])
        else:  # hub phase
            st["auth"] = st["raw"] / norm
            st["raw"] = dense
            if s == 2 * self.K:  # last hub phase: normalize next step, no push
                return None, {
                    "edges": 0,
                    "part_sum": float(dense.sum()),
                    "done": False,
                }
            rows = np.flatnonzero(dense)
            dsts, vals = g.push(rows, dense[rows])
        return _msgs(dsts, vals), {
            "edges": int(vals.size),
            "part_sum": float(dense.sum()),
            "done": False,
        }

    def emit(self, g, st):
        return pa.table(
            {
                "vid": pa.array(g.owned, pa.int64()),
                "auth": pa.array(st["auth"], pa.float64()),
                "hub": pa.array(st["hub"], pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
class EigenvectorCentrality(VertexProgram):
    """Eigenvector centrality by K fixed L1-normalized power iterations of
    the in-edge sum (Bonacich 1972; the single-phase half of HITS):

        x_k = (Aᵀ · x_{k-1}) / ‖Aᵀ · x_{k-1}‖₁,   x_0 = 1

    Runs on the forward view (push along out-edges ⇒ receivers sum their
    in-neighbors); the L1 normalizer is a global scalar riding the
    driver-feedback channel exactly like HITS' (pipeline_depth=1 is
    inherent to normalized power iteration). Vertices with no in-edges
    score 0 from iteration 1 — the standard eigenvector-centrality trait
    (use Katz when a baseline score is wanted); on a cycle-free graph the
    whole vector decays to 0, faithfully in both engine and oracle.

    Superstep schedule, K+2 steps: step 0 pushes x_0 = 1; step s ∈ [1, K)
    lands raw iterate s and pushes it; step K lands the last raw iterate
    and reports its partial sum; step K+1 applies the final normalizer.
    Fixed-iteration semantics → the driver-gate oracle is a recursive CTE
    running the identical K normalized iterations (queries._EIGEN_SQL).
    The reference ships no eigenvector centrality; this extends the same
    plugin surface (/root/reference/src/protobuf/worker_service.proto:11-22)."""

    default_direction = "fwd"
    channels = ()  # generic route()
    sender_precombine = False  # scalar sums: owner-side bincount absorbs dups
    wants_feedback = True
    checkpointable = True

    def __init__(self, iters: int = 20):
        self.K = int(iters)

    @classmethod
    def reduce_feedback(cls, step_metrics: list[dict]) -> dict:
        return {"norm": float(sum(m.get("part_sum", 0.0) for m in step_metrics))}

    @classmethod
    def should_stop(cls, step_metrics: list[dict], step: int) -> bool:
        return any(m.get("done") for m in step_metrics)

    def init_state(self, g):
        return {"x": np.ones(g.n), "raw": np.zeros(g.n), "aux": {"step": 0}}

    def peval(self, g, st):
        rows = np.flatnonzero(g.out_degree > 0)
        dsts, vals = g.push(rows, st["x"][rows])
        return _msgs(dsts, vals), {"edges": int(vals.size), "part_sum": 0.0}

    def inceval(self, g, st, inbound):
        st["aux"]["step"] += 1
        s = st["aux"]["step"]
        fb = st["aux"].get("feedback") or {}
        norm = float(fb.get("norm", 1.0)) or 1.0
        dense = np.zeros(g.n)
        if inbound is not None:
            li = inbound["li"] if "li" in inbound else g.local_index(inbound["vid"])
            dense[li] = inbound["val"] / norm
        if s > 1:
            st["x"] = st["raw"] / norm
        if s > self.K:  # final normalizer only
            return None, {"edges": 0, "part_sum": 0.0, "done": True}
        st["raw"] = dense
        part = float(dense.sum())
        if s == self.K:  # last iterate: normalize next step, no push
            return None, {"edges": 0, "part_sum": part, "done": False}
        rows = np.flatnonzero(dense)
        dsts, vals = g.push(rows, dense[rows])
        return _msgs(dsts, vals), {"edges": int(vals.size), "part_sum": part, "done": False}

    def emit(self, g, st):
        return pa.table(
            {
                "vid": pa.array(g.owned, pa.int64()),
                "x": pa.array(st["x"], pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
class BetweennessCentrality(VertexProgram):
    """Betweenness centrality over ``sources`` (exact when sources = all
    vertices; the standard sampled approximation otherwise) — Brandes'
    algorithm (public: Brandes 2001) expressed as layered supersteps on the
    dualview layout:

      forward  (per source)  BFS layers settle distance d and shortest-path
                             counts σ: one superstep per layer, new settlers
                             push σ along FWD edges, sum-combine delivers
                             σ(v) = Σ_{u→v, d(u)=d(v)-1} σ(u). Strictly
                             one-hop (no local fixpoint) — layer synchrony
                             is what makes the σ sums exact.
      backward (per source)  dependencies δ(v) = Σ_{v→w, d(w)=d(v)+1}
                             (σ(v)/σ(w))·(1+δ(w)) accumulate layer by
                             layer from L_max down: the layer-L settlers
                             push (1+δ)/σ along REV edges; a receiver
                             applies σ(v)·msg only when d(v) = L-1 (the
                             layer check drops non-tree edges, which the
                             sum-combine necessarily carried).
      bc(v) += δ(v) after each source; sources run sequentially inside ONE
      program run so the accumulator never leaves the actors.

    Global coordination (forward-frontier death, frozen L_max) rides the
    driver-feedback channel, like HITS' normalizer and SCC's phases. Every
    actor advances the same deterministic state machine from the same
    feedback, so phase transitions are globally synchronous. Emits raw
    directed pair-dependency sums (no normalization) — rescale by
    n/len(sources) for the sampled estimator. Extension beyond the
    reference, same plugin surface
    (/root/reference/src/protobuf/worker_service.proto:11-22)."""

    default_direction = "dualview"
    channels = ()  # generic route() on both views
    sender_precombine = False
    wants_feedback = True
    checkpointable = True  # aux machine is plain json; feedback persists in the manifest

    def __init__(self, sources: list[int]):
        self.sources = [int(s) for s in sources]
        if not self.sources:
            raise ValueError("BetweennessCentrality needs at least one source")

    @classmethod
    def reduce_feedback(cls, step_metrics: list[dict]) -> dict:
        return {
            "any_new": int(sum(m.get("new_settled", 0) for m in step_metrics)),
            "Lmax": int(max((m.get("max_layer", -1) for m in step_metrics), default=-1)),
        }

    @classmethod
    def should_stop(cls, step_metrics, step) -> bool:
        return any(m.get("done") for m in step_metrics)

    def init_state(self, g):
        if not hasattr(g, "rev_view"):
            raise ValueError(
                "BetweennessCentrality needs both adjacency directions — run "
                "on a dual layout with direction='dualview'"
            )
        return {
            "bc": np.zeros(g.n),
            "d": np.full(g.n, -1, np.int64),
            "sigma": np.zeros(g.n),
            "delta": np.zeros(g.n),
            "aux": {"sidx": 0, "phase": "fwd", "flayer": 0, "Lmax": -1, "push_layer": -1},
        }

    # -- helpers ------------------------------------------------------------
    def _seed(self, g, st) -> Messages:
        """Settle the current source at layer 0 and push σ=1 one hop."""
        a = st["aux"]
        s = self.sources[a["sidx"]]
        a["phase"] = "fwd"
        a["flayer"] = 0
        a["Lmax"] = -1
        a["push_layer"] = -1
        st["d"].fill(-1)
        st["sigma"].fill(0.0)
        st["delta"].fill(0.0)
        idx = np.searchsorted(g.owned, s)
        if idx < g.n and g.owned[idx] == s:
            st["d"][idx] = 0
            st["sigma"][idx] = 1.0
            dsts, vals = g.push(np.array([idx]), st["sigma"][idx : idx + 1])
            return _msgs(dsts, vals)
        return None

    def _finish_source(self, g, st):
        """bc += δ for every settled non-source vertex, then advance."""
        a = st["aux"]
        settled = st["d"] >= 1  # excludes the source (layer 0) and unreached
        st["bc"][settled] += st["delta"][settled]
        a["sidx"] += 1

    def peval(self, g, st):
        msgs = self._seed(g, st)
        n_local = int(np.count_nonzero(st["d"] == 0))
        # max_layer is the actor's RUNNING max settled layer: feedback only
        # carries the last step's metrics, and the frozen global L_max at
        # the phase transition must cover the whole forward phase
        return msgs, {
            "new_settled": n_local,
            "max_layer": int(st["d"].max()) if g.n else -1,
            "edges": 0,
            "done": False,
        }

    def inceval(self, g, st, inbound):
        a = st["aux"]
        fb = a.get("feedback") or {}  # injected by the actor each step
        li = vals = None
        if inbound is not None:
            li = inbound["li"] if "li" in inbound else g.local_index(inbound["vid"])
            vals = inbound["val"]

        if a["phase"] == "fwd":
            if int(fb.get("any_new", 1)) == 0:
                # frontier died globally last step → backward phase begins
                a["phase"] = "bwd"
                a["Lmax"] = int(fb.get("Lmax", 0))
                a["push_layer"] = a["Lmax"]
                return self._bwd_push_or_finish(g, st)
            a["flayer"] += 1
            new = np.empty(0, np.int64)
            if li is not None:
                fresh = st["d"][li] < 0
                new = li[fresh]
                st["d"][new] = a["flayer"]
                st["sigma"][new] = vals[fresh]
            msgs = None
            sent = 0
            if new.size:
                dsts, v = g.push(new, st["sigma"][new])
                msgs = _msgs(dsts, v)
                sent = int(v.size)
            return msgs, {
                "new_settled": int(new.size),
                "max_layer": int(st["d"].max()) if g.n else -1,
                "edges": sent,
                "done": False,
            }

        # backward phase: inbound carries Σ (1+δ(w))/σ(w) from layer
        # push_layer+1 pushers (recorded before decrement last step)
        if li is not None:
            accept = st["d"][li] == a["push_layer"]  # receivers one layer down
            tgt = li[accept]
            st["delta"][tgt] += st["sigma"][tgt] * vals[accept]
        return self._bwd_push_or_finish(g, st)

    def _bwd_push_or_finish(self, g, st):
        a = st["aux"]
        layer = a["push_layer"]
        if layer >= 1:
            rows = np.flatnonzero(st["d"] == layer)
            msgs = None
            sent = 0
            if rows.size:
                contrib = (1.0 + st["delta"][rows]) / st["sigma"][rows]
                dsts, v = g.rev_view.push(rows, contrib)
                msgs = _msgs(dsts, v)
                sent = int(v.size)
            a["push_layer"] = layer - 1
            return msgs, {"new_settled": 0, "max_layer": -1, "edges": sent, "done": False}
        # push_layer < 1: source done (layer-1 pushes were applied above)
        self._finish_source(g, st)
        if a["sidx"] >= len(self.sources):
            return None, {"new_settled": 0, "max_layer": -1, "edges": 0, "done": True}
        msgs = self._seed(g, st)
        n_local = int(np.count_nonzero(st["d"] == 0))
        return msgs, {
            "new_settled": n_local,
            "max_layer": int(st["d"].max()) if g.n else -1,
            "edges": 0,
            "done": False,
        }

    def emit(self, g, st):
        return pa.table(
            {"vid": pa.array(g.owned, pa.int64()), "bc": pa.array(st["bc"], pa.float64())}
        )


# ---------------------------------------------------------------------------
class HarmonicCentrality(VertexProgram):
    """Sampled harmonic centrality: H(v) = Σ_{s ∈ sources, d(s,v) ≥ 1}
    1/d(s,v) — the forward (layered BFS) half of the Brandes machinery
    with no σ bookkeeping: each source's frontier settles one layer per
    superstep, the driver-feedback channel signals global frontier death,
    the accumulator adds the reciprocal distances and the next source
    seeds. Exact when sources = all vertices; n/|sources| rescales the
    sample. Extension beyond the reference, same plugin surface."""

    default_direction = "fwd"
    channels = ()  # generic route(): one-hop pushes, no local fixpoint
    sender_precombine = False
    wants_feedback = True
    checkpointable = True

    def __init__(self, sources: list[int]):
        self.sources = [int(s) for s in sources]
        if not self.sources:
            raise ValueError("HarmonicCentrality needs at least one source")

    @classmethod
    def reduce_feedback(cls, step_metrics: list[dict]) -> dict:
        return {"any_new": int(sum(m.get("new_settled", 0) for m in step_metrics))}

    @classmethod
    def should_stop(cls, step_metrics, step) -> bool:
        return any(m.get("done") for m in step_metrics)

    def init_state(self, g):
        return {
            "harm": np.zeros(g.n),
            "d": np.full(g.n, -1, np.int64),
            "aux": {"sidx": 0, "flayer": 0},
        }

    def _seed(self, g, st):
        a = st["aux"]
        s = self.sources[a["sidx"]]
        a["flayer"] = 0
        st["d"].fill(-1)
        idx = np.searchsorted(g.owned, s)
        n_local = 0
        msgs = None
        if idx < g.n and g.owned[idx] == s:
            st["d"][idx] = 0
            n_local = 1
            dsts, vals = g.push(np.array([idx]), np.ones(1))
            msgs = _msgs(dsts, vals)
        return msgs, {"new_settled": n_local, "edges": 0, "done": False}

    def peval(self, g, st):
        return self._seed(g, st)

    def inceval(self, g, st, inbound):
        a = st["aux"]
        fb = a.get("feedback") or {}
        if int(fb.get("any_new", 1)) == 0:
            # frontier died globally: accumulate this source, next source
            self._accumulate(st)
            a["sidx"] += 1
            if a["sidx"] >= len(self.sources):
                return None, {"new_settled": 0, "edges": 0, "done": True}
            return self._seed(g, st)
        a["flayer"] += 1
        new = np.empty(0, np.int64)
        if inbound is not None:
            li = inbound["li"] if "li" in inbound else g.local_index(inbound["vid"])
            new = li[st["d"][li] < 0]
            st["d"][new] = a["flayer"]
        msgs = None
        sent = 0
        if new.size:
            dsts, v = g.push(new, np.ones(new.size))
            msgs = _msgs(dsts, v)
            sent = int(v.size)
        return msgs, {"new_settled": int(new.size), "edges": sent, "done": False}

    def _accumulate(self, st):
        """Fold the finished source's distance layer into the running
        accumulator(s). Subclass hook — closeness overrides it."""
        settled = st["d"] >= 1
        st["harm"][settled] += 1.0 / st["d"][settled]

    def emit(self, g, st):
        return pa.table(
            {
                "vid": pa.array(g.owned, pa.int64()),
                "harmonic": pa.array(st["harm"], pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
class ClosenessCentrality(HarmonicCentrality):
    """Sampled closeness centrality over a fixed source set: per vertex v,
    ``sum_d`` = Σ_{s : d(s,v) ≥ 1} d(s,v) and ``reach`` = |{s : d(s,v) ≥ 1}|
    — the raw, mergeable moments of the reach-normalized closeness
    C(v) = reach / sum_d (the disconnected-graph form; exact when
    sources = all vertices, per Wasserman & Faust's reachable-set
    variant). Shares the layered-BFS engine with
    :class:`HarmonicCentrality` verbatim — only the accumulate step and
    the emitted columns differ. Both moments are plain sums over
    sources, so per-source-batch partials merge by addition
    (``_exact_all_sources`` sums both columns). Extension beyond the
    reference, same plugin surface."""

    def init_state(self, g):
        return {
            "sum_d": np.zeros(g.n),
            "reach": np.zeros(g.n),
            "d": np.full(g.n, -1, np.int64),
            "aux": {"sidx": 0, "flayer": 0},
        }

    def _accumulate(self, st):
        settled = st["d"] >= 1
        st["sum_d"][settled] += st["d"][settled]
        st["reach"][settled] += 1.0

    def emit(self, g, st):
        return pa.table(
            {
                "vid": pa.array(g.owned, pa.int64()),
                "sum_d": pa.array(st["sum_d"], pa.float64()),
                "reach": pa.array(st["reach"], pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
class KCore(VertexProgram):
    """k-core membership by synchronous peeling over the symmetrized view.

    Round semantics: alive' = {v : |N(v) ∩ alive| ≥ k}, starting from all
    vertices. Membership of v depends only on its NEIGHBORS' liveness (no
    self-loops survive the loader dedup), so the set shrinks monotonically
    and converges to the k-core — the same fixpoint as classic sequential
    peeling, independent of removal order. The engine runs it as removal
    cascades: a dying vertex pushes one decrement to each neighbor
    (sum-combine on the compact full channel), and a vertex whose decremented
    degree drops below k dies on the following superstep. Supersteps =
    cascade depth; messages ∝ removed vertices' degrees, so quiet rounds
    cost nothing. At the fixpoint ``deg`` equals |N(v) ∩ core| (each removed
    neighbor decremented exactly once), emitted as ``core_deg``.

    ``k`` may be fixed, or derived from the data as global_min_degree +
    ``offset`` (SQL-expressible, so the oracle stays in lockstep at every
    scale factor): PEval reports each partition's min degree, the driver
    min-reduces them through the feedback channel, and peeling starts at
    step 1 with the global k. Feedback forces pipeline_depth=1, which costs
    nothing here — peeling converges in a handful of cascade rounds.

    Matches queries._KCORE_SQL (fixed-round survivor recursion, same unique
    fixpoint). Extends the reference's plugin surface
    (/root/reference/src/protobuf/worker_service.proto:11-22) — it ships no
    k-core algorithm.
    """

    combine_op = "sum"
    needs_symmetrized = True
    default_direction = "both"
    channels = ("full",)
    wants_feedback = True
    checkpointable = False

    def __init__(self, k: int | None = None, offset: int = 5):
        self.k = None if k is None else int(k)
        self.offset = int(offset)

    @classmethod
    def reduce_feedback(cls, step_metrics: list[dict]) -> dict:
        mins = [m["part_min_deg"] for m in step_metrics if "part_min_deg" in m]
        return {"min_deg": int(min(mins))} if mins else {}

    @classmethod
    def should_stop(cls, step_metrics: list[dict], step: int) -> bool:
        # PEval only reports degrees (never pushes) — convergence means a
        # peeling step that removed nothing anywhere
        return step > 0 and not any(m.get("has_msgs") for m in step_metrics)

    def init_state(self, g):
        return {
            "deg": g.out_degree.astype(np.int64).copy(),
            "alive": np.ones(g.n, dtype=bool),
            "aux": {"k": self.k},
        }

    def _die(self, g, st):
        k = st["aux"]["k"]
        dead = np.flatnonzero(st["alive"] & (st["deg"] < k))
        if dead.size == 0:
            return None, {"edges": 0, "removed": 0}
        st["alive"][dead] = False
        routed, edges = g.push_combined(dead, np.ones(dead.size, dtype=np.int64))
        return routed, {"edges": edges, "removed": int(dead.size)}

    def peval(self, g, st):
        md = int(st["deg"].min()) if g.n else np.iinfo(np.int64).max
        return None, {"edges": 0, "part_min_deg": md}

    def inceval(self, g, st, inbound):
        if st["aux"]["k"] is None:
            st["aux"]["k"] = int(st["aux"]["feedback"]["min_deg"]) + self.offset
        if inbound is not None:
            li = inbound["li"] if "li" in inbound else g.local_index(inbound["vid"])
            st["deg"][li] -= inbound["val"].astype(np.int64)
        return self._die(g, st)

    def emit(self, g, st):
        ok = st["alive"]
        return pa.table(
            {
                "vid": pa.array(g.owned[ok], pa.int64()),
                "core_deg": pa.array(st["deg"][ok], pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
class Coreness(VertexProgram):
    """Full k-core decomposition (coreness of every vertex) by distributed
    h-index iteration (Montresor, De Pellegrini & Miorandi, "Distributed
    k-core decomposition", 2011): init core(v) = degree(v) on the
    symmetrized view, then repeat

        core(v) ← H({core(u) : u ∈ N(v)})

    where H is the h-index (max h with ≥h neighbors valued ≥h). The
    operator is monotone and starts above the fixpoint, so chaotic
    (delta-driven) iteration converges to the same unique result as the
    synchronous oracle recursion (queries._CORENESS_SQL).

    Unlike the scalar-combine programs, each receiver must know WHICH
    neighbor's estimate changed — messages carry the sender id as the extra
    key, and the actor keeps a per-adjacency-slot array of latest neighbor
    estimates (O(local edges) memory, the same order as the CSR itself).
    Slot lookup is one vectorized searchsorted against a composite
    (local_row, neighbor_rank) key, exploiting the loader's (src, dst)
    lexsort. Messages per round ∝ changed vertices × degree and the
    estimates are non-increasing ints, so total traffic is bounded by the
    initial degree sum.

    PEval floods each vertex's degree to its neighbors (filling every
    slot); each IncEval applies the deltas and recomputes the h-index of
    touched vertices only, fully vectorized (per-segment descending sort +
    min(rank, value) reduceat — the same identity the SQL oracle's window
    expresses).
    """

    combine_op = "min"  # identity combine: (dst, sender) keys are unique per step
    extra_key = "snd"
    needs_symmetrized = True
    default_direction = "both"
    channels = ()  # generic route path (extra-key rows)
    sender_precombine = False

    def init_state(self, g):
        if g.hub_vids.size:
            raise NotImplementedError(
                "Coreness messages carry sender identity, which the hub "
                "broadcast channel collapses — rebuild with hub_threshold=None"
            )
        self._uniq = np.unique(g.adj)
        U = int(self._uniq.size)
        if U and g.n > (1 << 62) // max(U, 1):
            raise OverflowError(
                "composite slot key n_local × distinct_neighbors exceeds "
                "int64 — shrink partitions (raise num_partitions)"
            )
        self._slot_key = g.adj_src_local * U + np.searchsorted(self._uniq, g.adj)
        # loader lexsorts (src, dst), so slots are strictly increasing in
        # (local row, neighbor vid) — required for direct positional lookup
        if self._slot_key.size > 1:
            assert bool(np.all(np.diff(self._slot_key) > 0))
        self._nbrcore = np.zeros(g.adj.size, dtype=np.int64)
        return {"core": g.out_degree.astype(np.int64).copy(), "aux": {}}

    def _send(self, g, st, rows):
        """(dst, value, sender) rows for every edge out of ``rows``."""
        dsts, lens = g._gather_slices(g.indptr, g.adj, rows)
        if dsts.size == 0:
            return None, 0
        vals = np.repeat(st["core"][rows], lens)
        snds = np.repeat(g.owned[rows], lens)
        return _msgs(dsts, vals, snd=snds), int(dsts.size)

    def _h_index(self, g, rows):
        vals, lens = g._gather_slices(g.indptr, self._nbrcore, rows)
        seg = np.repeat(np.arange(rows.size), lens)
        order = np.lexsort((-vals, seg))
        sv = vals[order]
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        rn = np.arange(sv.size, dtype=np.int64) - np.repeat(starts, lens) + 1
        return np.maximum.reduceat(np.minimum(rn, sv), starts)

    def peval(self, g, st):
        rows = np.flatnonzero(g.out_degree > 0)
        msgs, edges = self._send(g, st, rows)
        return msgs, {"edges": edges}

    def inceval(self, g, st, inbound):
        if inbound is None:
            return None, {"edges": 0, "changed": 0}
        l = g.local_index(inbound["vid"])
        r = np.searchsorted(self._uniq, inbound["snd"])
        comp = l * int(self._uniq.size) + r
        pos = np.searchsorted(self._slot_key, comp)
        if pos.size and not bool(
            np.all((pos < self._slot_key.size) & (self._slot_key[np.minimum(pos, self._slot_key.size - 1)] == comp))
        ):
            raise ValueError("coreness message from a non-neighbor sender")
        self._nbrcore[pos] = inbound["val"]
        touched = np.unique(l)  # sorted — _gather_slices requires it
        touched = touched[g.out_degree[touched] > 0]
        hx = self._h_index(g, touched)
        lower = hx < st["core"][touched]
        changed = touched[lower]
        st["core"][changed] = hx[lower]
        msgs, edges = self._send(g, st, changed)
        return msgs, {"edges": edges, "changed": int(changed.size)}

    def emit(self, g, st):
        return pa.table(
            {
                "vid": pa.array(g.owned, pa.int64()),
                "coreness": pa.array(st["core"], pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
class SCC(VertexProgram):
    """Strongly connected components by trim + forward-max coloring +
    backward marking (the classic FW-BW-Trim / Orzan scheme for
    distributed-memory SCC):

      outer round:
        trim phase   unassigned vertices with residual in-degree 0 or
                     out-degree 0 are singleton SCCs (a multi-vertex SCC
                     needs an in- AND out-edge inside itself); removal
                     decrements neighbors' residual degrees, cascading to
                     a fixpoint. Without this, DAG-like regions assign
                     only a few color roots per round and the round count
                     degenerates to O(n) — measured 400+ stalled steps on
                     a 10M-edge preferential-attachment graph, vs
                     convergence with trimming.
        color phase  remaining vertices propagate the MAX vid forward to
                     a fixpoint: color(v) = max vid reaching v in the
                     residual graph
        mark phase   roots (color == own vid) claim scc = vid; the mark
                     flows along REVERSE edges, accepted only by
                     unassigned same-colored vertices — provably exactly
                     the root's SCC (label = max member vid)
      assigned vertices leave the residual graph; repeat until none
      remain.

    Runs on dualview actors (forward pushes on the primary view, marks on
    ``g.rev_view``). Phase transitions ride the feedback channel: every
    actor applies the same deterministic switch when the global per-step
    message count hits zero; with the forced depth-1 barrier a zero-send
    step also means no inbound is in flight, so transitions are clean.

    One message stream carries three row kinds, distinguished by ``val``:
    colors/marks (val ≥ 0, extra key = the value, so two different mark
    colors at one vertex can never max-merge into a lost update) and
    residual-degree decrements (val = −1 in-degree, −2 out-degree, extra
    key = the sender vid — unique per receiver, because a sender adjacent
    in BOTH directions would share the receiver's SCC and never be
    assigned first). Receivers split rows by sign and reduce each kind
    vectorized.

    Oracle: queries._SCC_SQL (mutual reachability from a transitive-
    closure CTE — feasible at driver-gate scale, which is the point of
    the fixed small-sf gate). Extends the reference's plugin surface
    (/root/reference/src/protobuf/worker_service.proto:11-22).
    """

    combine_op = "max"
    extra_key = "k"
    default_direction = "dualview"
    channels = ()
    sender_precombine = True
    wants_feedback = True
    checkpointable = False

    @classmethod
    def reduce_feedback(cls, step_metrics: list[dict]) -> dict:
        return {
            "msgs": int(sum(m.get("sent", 0) for m in step_metrics)),
            "unassigned": int(sum(m.get("unassigned", 0) for m in step_metrics)),
        }

    @classmethod
    def should_stop(cls, step_metrics: list[dict], step: int) -> bool:
        return any(m.get("done") for m in step_metrics)

    def init_state(self, g):
        if not hasattr(g, "rev_view"):
            raise ValueError(
                "SCC needs both adjacency directions in one actor — run on a "
                "dual layout with direction='dualview'"
            )
        return {
            "scc": np.full(g.n, -1, dtype=np.int64),
            "color": g.owned.copy(),
            # residual degrees in the unassigned subgraph
            "rout": g.out_degree.astype(np.int64).copy(),
            "rin": g.rev_view.out_degree.astype(np.int64).copy(),
            "aux": {"phase": "trim"},
        }

    @staticmethod
    def _push(view, rows, vals):
        dsts, lens = view._gather_slices(view.indptr, view.adj, rows)
        return dsts, np.repeat(vals, lens)

    def _info(self, st, sent):
        return {
            "edges": int(sent),
            "sent": int(sent),
            "unassigned": int((st["scc"] < 0).sum()),
            "done": False,
        }

    def _removal_msgs(self, g, st, rows):
        """Decrements broadcast by newly assigned ``rows``: −1 along fwd
        (receivers lose an in-edge), −2 along rev (an out-edge). The extra
        key is −sender−1: the NEGATIVE key space keeps decrement rows
        disjoint from mark/color rows (k = value ≥ 0) under the owner's
        (vid, k) max-combine — a root marking its own rev-neighbor would
        otherwise share (vid, k=root) between the mark and the decrement
        and silently max-away the decrement. A −1/−2 pair from one sender
        can still share a key, but only when sender and receiver are
        mutually adjacent — same SCC, so the receiver is assigned by the
        very mark wave that carries the collision and its residual counts
        stop mattering."""
        fd, fs = self._push(g, rows, g.owned[rows])
        rd_, rs = self._push(g.rev_view, rows, g.owned[rows])
        vid = np.concatenate([fd, rd_])
        val = np.concatenate(
            [np.full(fd.size, -1, np.int64), np.full(rd_.size, -2, np.int64)]
        )
        k = -np.concatenate([fs, rs]) - 1
        return vid, val, k

    def _trim(self, g, st):
        """Cascade singleton removal to the LOCAL fixpoint per superstep:
        every newly assigned vertex ships decrements; in-partition effects
        still travel through the (owner-combined) message stream next step,
        which keeps the logic uniform — trim rounds are cheap."""
        un = st["scc"] < 0
        newly = np.flatnonzero(un & ((st["rin"] == 0) | (st["rout"] == 0)))
        if newly.size == 0:
            return None, self._info(st, 0)
        st["scc"][newly] = g.owned[newly]
        vid, val, k = self._removal_msgs(g, st, newly)
        return _msgs(vid, val, k=k), self._info(st, vid.size)

    def _apply_decrements(self, g, st, l, val):
        dec = val < 0
        if dec.any():
            ld, vd = l[dec], val[dec]
            np.subtract.at(st["rin"], ld[vd == -1], 1)
            np.subtract.at(st["rout"], ld[vd == -2], 1)
        return dec

    def peval(self, g, st):
        return self._trim(g, st)

    def inceval(self, g, st, inbound):
        fb = st["aux"].get("feedback") or {}
        phase = st["aux"]["phase"]
        if fb.get("msgs", 1) == 0:
            # global phase fixpoint — deterministic transition on every actor
            if phase == "trim":
                if fb.get("unassigned", 0) == 0:
                    return None, {**self._info(st, 0), "done": True}
                st["aux"]["phase"] = "color"
                un = np.flatnonzero(st["scc"] < 0)
                st["color"][un] = g.owned[un]
                rows = un[g.out_degree[un] > 0]
                dsts, vals = self._push(g, rows, st["color"][rows])
                return _msgs(dsts, vals, k=vals), self._info(st, dsts.size)
            if phase == "color":
                st["aux"]["phase"] = "mark"
                un = st["scc"] < 0
                roots = np.flatnonzero(un & (st["color"] == g.owned))
                st["scc"][roots] = g.owned[roots]
                md, mv = self._push(g.rev_view, roots, g.owned[roots])
                rv, rl, rk = self._removal_msgs(g, st, roots)
                vid = np.concatenate([md, rv])
                val = np.concatenate([mv, rl])
                k = np.concatenate([mv, rk])
                return _msgs(vid, val, k=k), self._info(st, vid.size)
            # mark phase drained → next outer round starts with a trim pass
            st["aux"]["phase"] = "trim"
            return self._trim(g, st)

        if inbound is None:
            return None, self._info(st, 0)
        l = g.local_index(inbound["vid"])
        val = inbound["val"]
        dec = self._apply_decrements(g, st, l, val)
        l, val = l[~dec], val[~dec]
        un = st["scc"] < 0
        if phase == "color":
            acc = np.full(g.n, np.iinfo(np.int64).min, dtype=np.int64)
            np.maximum.at(acc, l, val)
            cand = np.flatnonzero(un & (acc > st["color"]))
            st["color"][cand] = acc[cand]
            rows = cand[g.out_degree[cand] > 0]
            dsts, vals = self._push(g, rows, st["color"][rows])
            return _msgs(dsts, vals, k=vals), self._info(st, dsts.size)
        if phase == "mark":
            ok = un[l] & (st["color"][l] == val)
            newly = np.unique(l[ok])
            st["scc"][newly] = st["color"][newly]
            md, mv = self._push(g.rev_view, newly, st["scc"][newly])
            rv, rl, rk = self._removal_msgs(g, st, newly)
            vid = np.concatenate([md, rv])
            valout = np.concatenate([mv, rl])
            k = np.concatenate([mv, rk])
            return _msgs(vid, valout, k=k), self._info(st, vid.size)
        # trim phase with decrements just applied: cascade further removals
        return self._trim(g, st)

    def emit(self, g, st):
        return pa.table(
            {
                "vid": pa.array(g.owned, pa.int64()),
                "scc": pa.array(st["scc"], pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
class IncrementalPageRank(PageRank):
    """Incremental re-evaluation after edge ADDITIONS — the reference's
    namesake capability (IncEval over a changed graph,
    /root/reference/src/protobuf/worker_service.proto:11-22): instead of
    recomputing from scratch, warm-start from the converged base scores
    and push only the flow CORRECTIONS the new edges cause; the
    delta-propagation engine then converges in a fraction of the
    supersteps/messages of a cold run (fixpoint is unique, so results
    match the cold run on the updated graph).

    Warm state: each actor reads the base run's per-partition Assemble
    file (``warm_dir/part-<p>.parquet`` — ownership and P must match, so
    slot p's vids are a subset of slot p's owned set on the updated
    graph); vertices absent from the base (introduced by the new edges)
    start cold at pr = base term. ``acc`` is reconstructed as
    (pr − base)/damping so the inherited IncEval recurrence is consistent,
    and the dense first pass is skipped.

    PEval pushes corrections from each changed source u (old out-degree
    d1, new d2):
      * pr_u·(1/d2 − 1/d1) along ALL current out-edges (the old neighbors'
        share shrank; added neighbors get the same base amount), and
      * pr_u/d1 extra along each ADDED edge (total pr_u/d2 for new
        neighbors);
      * d1 = 0 (u had no out-edges / is new): just pr_u/d2 along the
        added edges.
    Receivers fold these through the ordinary sum-combine + recurrence.
    """

    def __init__(
        self,
        warm_dir: str,
        added_slices: dict,
        base_edges_dir: str,
        eps: float = 1e-12,
        damping: float = 0.85,
    ):
        """``added_slices`` maps partition id → the added-edge rows whose
        src that partition owns, as a pa.Table (src, dst) or an ObjectRef
        of one — each actor fetches ONLY its own slice, so the driver
        never materializes the update batch (it holds P refs).
        ``base_edges_dir`` is the BASE layout's partitioned edges dir;
        each actor derives old out-degrees of its changed sources from
        its own part=<p> slice (dir=0 rows), no driver-side count."""
        super().__init__(eps=eps, damping=damping)
        self.warm_dir = warm_dir
        self.added_slices = added_slices
        self.base_edges_dir = base_edges_dir
        self._a_src: np.ndarray | None = None
        self._a_dst: np.ndarray | None = None
        self._odv = np.empty(0, dtype=np.int64)
        self._odd = np.empty(0, dtype=np.int64)

    def _old_deg(self, vids: np.ndarray) -> np.ndarray:
        if self._odv.size == 0:
            return np.zeros(vids.size, dtype=np.int64)
        pos = np.searchsorted(self._odv, vids)
        safe = np.minimum(pos, self._odv.size - 1)
        found = (pos < self._odv.size) & (self._odv[safe] == vids)
        return np.where(found, self._odd[safe], 0)

    def _load_slice(self, g) -> None:
        """Once per actor: fetch this partition's added-edge slice and
        count the old out-degrees of its changed sources from the base
        layout's local part file. O(E_added/P + E_base/P) per actor,
        O(P refs) on the driver."""
        import os

        import pyarrow.parquet as pq

        sl = self.added_slices.get(g.p) if self.added_slices else None
        if sl is not None and not isinstance(sl, pa.Table):
            import ray

            sl = ray.get(sl)
        if sl is None or sl.num_rows == 0:
            self._a_src = np.empty(0, dtype=np.int64)
            self._a_dst = np.empty(0, dtype=np.int64)
            return
        a_src = sl["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        a_dst = sl["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(a_src, kind="stable")
        self._a_src, self._a_dst = a_src[order], a_dst[order]
        changed = np.unique(self._a_src)
        part_dir = os.path.join(self.base_edges_dir, f"part={g.p}")
        if os.path.isdir(part_dir):
            t = pq.read_table(part_dir, columns=["src", "dir", "delegate"])
            s = t["src"].to_numpy(zero_copy_only=False)
            fwd = (t["dir"].to_numpy(zero_copy_only=False) == 0) & ~t[
                "delegate"
            ].to_numpy(zero_copy_only=False)
            s = s[fwd]
            pos = np.searchsorted(changed, s)
            safe = np.minimum(pos, changed.size - 1)
            keep = (pos < changed.size) & (changed[safe] == s)
            self._odv, self._odd = np.unique(s[keep], return_counts=True)
            self._odd = self._odd.astype(np.int64)

    def init_state(self, g):
        if g.hub_vids.size:
            raise NotImplementedError(
                "IncrementalPageRank correction rows bypass the hub broadcast "
                "channel — rebuild with hub_threshold=None"
            )
        self._load_slice(g)
        st = super().init_state(g)
        import os

        import pyarrow.parquet as pq

        path = os.path.join(self.warm_dir, f"part-{g.p}.parquet")
        # vertices not in the base run stay at the cold default, then the
        # whole vector is made recurrence-consistent
        st["pr"][:] = st["base"]
        if os.path.exists(path):
            t = pq.read_table(path)
            wv = t["vid"].to_numpy(zero_copy_only=False)
            ws = t["score"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(g.owned, wv)
            ok = (pos < g.n) & (g.owned[np.minimum(pos, max(g.n - 1, 0))] == wv)
            if not bool(ok.all()):
                raise ValueError(
                    "warm-start partition file contains vids not owned by this "
                    "partition — base and updated graphs must share ownership "
                    "mode and partition count"
                )
            st["pr"][pos] = ws
        st["last_sent"] = st["pr"].copy()
        st["acc"] = (st["pr"] - st["base"]) / self.damping
        st["aux"]["dense_done"] = True  # warm state is already consistent
        return st

    def peval(self, g, st):
        if self._a_src is None:  # resume path: init_state was skipped
            self._load_slice(g)
        changed = np.unique(self._a_src)
        if g.n == 0 or changed.size == 0:
            return None, {"edges": 0, "max_delta": 0.0}
        # slices are keyed by owner(src), so every changed source is owned
        # here; keep the membership check as a guard against stale refs
        pos = np.searchsorted(g.owned, changed)
        safe = np.minimum(pos, g.n - 1)
        mine = changed[(pos < g.n) & (g.owned[safe] == changed)]
        if mine.size == 0:
            return None, {"edges": 0, "max_delta": 0.0}
        l = g.local_index(mine)
        d2 = g.out_degree[l].astype(np.float64)
        d1 = self._old_deg(mine).astype(np.float64)
        pr = st["pr"][l]
        # uniform correction along the full current adjacency (d1 > 0 only)
        hasold = d1 > 0
        rows = l[hasold]
        dsts_u, lens = g._gather_slices(g.indptr, g.adj, rows)
        vals_u = np.repeat(pr[hasold] * (1.0 / d2[hasold] - 1.0 / d1[hasold]), lens)
        # extra along the added edges whose source is owned here
        lo = np.searchsorted(self._a_src, mine)
        hi = np.searchsorted(self._a_src, mine, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        rep = np.repeat(np.arange(mine.size), cnt)
        offs = np.repeat(lo, cnt) + (np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt))
        dsts_a = self._a_dst[offs]
        share = np.where(d1 > 0, 1.0 / np.maximum(d1, 1.0), 1.0 / d2)
        vals_a = pr[rep] * share[rep]
        vid = np.concatenate([dsts_u, dsts_a])
        val = np.concatenate([vals_u, vals_a])
        return _msgs(vid, val), {"edges": int(vid.size), "max_delta": 1.0}


def _fetch_part_table(slices: dict | None, p: int):
    """Resolve a per-partition table handed over as pa.Table or ObjectRef
    (actors fetch ONLY their own slice; the driver holds O(P) refs)."""
    sl = slices.get(p) if slices else None
    if sl is not None and not isinstance(sl, pa.Table):
        import ray

        sl = ray.get(sl)
    return sl


class _WarmStartMixin:
    """Shared warm-start loader: each actor reads its OWN base Assemble
    file (``warm_dir/part-<p>.parquet``) — ownership and P must match, so
    slot p's vids are a subset of slot p's owned set on the updated graph
    (same contract as IncrementalPageRank)."""

    warm_dir: str

    def _warm_load(self, g, arr: np.ndarray, col: str) -> None:
        import os

        import pyarrow.parquet as pq

        path = os.path.join(self.warm_dir, f"part-{g.p}.parquet")
        if not os.path.exists(path):
            return
        t = pq.read_table(path)
        wv = t["vid"].to_numpy(zero_copy_only=False)
        ws = t[col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(g.owned, wv)
        ok = (pos < g.n) & (g.owned[np.minimum(pos, max(g.n - 1, 0))] == wv)
        if not bool(ok.all()):
            raise ValueError(
                "warm-start partition file contains vids not owned by this "
                "partition — base and updated graphs must share ownership "
                "mode and partition count"
            )
        arr[pos] = ws


# ---------------------------------------------------------------------------
class IncrementalConnectedComponents(_WarmStartMixin, ConnectedComponents):
    """Warm-start WCC after edge ADDITIONS — the general form of the
    reference's IncEval contract for CC
    (/root/reference/src/worker/CCworker.go IncEval): min labels are
    monotone non-increasing under edge additions, so propagation
    warm-started from the converged base labels reaches the same unique
    fixpoint as a cold run on the updated graph, touching only the merged
    regions. PEval sends each owned endpoint's warm label as a TARGETED
    message along its added edges only (both orientations arrive via the
    symmetric per-partition slices — O(P) refs on the driver); the
    inherited IncEval then min-combines and propagates only through
    regions the update actually lowered, so traversals scale with the
    merged regions, not with the seeds' full adjacency."""

    def __init__(self, warm_dir: str, added_slices: dict):
        self.warm_dir = warm_dir
        self.added_slices = added_slices

    def init_state(self, g):
        st = super().init_state(g)  # label = vid (new vertices stay cold)
        self._warm_load(g, st["label"], "component")
        return st

    def peval(self, g, st):
        t = _fetch_part_table(self.added_slices, g.p)
        if t is None or t.num_rows == 0 or g.n == 0:
            return None, {"edges": 0, "n_changed": 0}
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(g.owned, a)
        safe = np.minimum(pos, g.n - 1)
        ok = (pos < g.n) & (g.owned[safe] == a)  # guard against stale refs
        la, b = pos[ok], b[ok]
        if la.size == 0:
            return None, {"edges": 0, "n_changed": 0}
        return _msgs(b, st["label"][la]), {"edges": int(la.size), "n_changed": 0}


# ---------------------------------------------------------------------------
class IncrementalSSSP(_WarmStartMixin, SSSP):
    """Warm-start SSSP after edge ADDITIONS — the general form of the
    reference's IncEval contract for SSSP
    (/root/reference/src/worker/SSSPworker.go IncEval): distances are
    monotone non-increasing under edge additions, so relaxation
    warm-started from the converged base distances (same source) reaches
    the cold-run fixpoint. PEval sends dist(u)+1 as a TARGETED message
    along each added edge whose source u is owned and reachable (directed
    slices keyed by owner(src) — O(P) driver refs); the inherited IncEval
    relaxes only the improved regions. If the base graph lacked the
    source (degenerate bases), the source re-seeds a local relax so the
    run still converges to the cold fixpoint."""

    def __init__(self, source: int, warm_dir: str, added_slices: dict):
        super().__init__(source)
        self.warm_dir = warm_dir
        self.added_slices = added_slices

    def init_state(self, g):
        st = super().init_state(g)  # dist = inf
        self._warm_load(g, st["dist"], "dist")
        return st

    def peval(self, g, st):
        tv = np.empty(0, dtype=np.int64)
        vals = np.empty(0, dtype=np.float64)
        idx = np.searchsorted(g.owned, self.source)
        if g.n and idx < g.n and g.owned[idx] == self.source and st["dist"][idx] != 0.0:
            # base run never reached the source (it was absent/new): a
            # (source, 0.0) self-message lowers it next step and the
            # inherited IncEval does the full cold relax from there
            tv, vals = np.array([self.source]), np.array([0.0])
        t = _fetch_part_table(self.added_slices, g.p)
        if t is not None and t.num_rows and g.n:
            a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(g.owned, a)
            safe = np.minimum(pos, g.n - 1)
            ok = (pos < g.n) & (g.owned[safe] == a)
            la, b = pos[ok], b[ok]
            fin = np.isfinite(st["dist"][la])  # unreachable sources relax nothing
            tv = np.concatenate([tv, b[fin]])
            vals = np.concatenate([vals, st["dist"][la[fin]] + 1.0])
        if tv.size == 0:
            return None, {"edges": 0}
        return _msgs(tv, vals), {"edges": int(tv.size)}


# ---------------------------------------------------------------------------
class MIS(VertexProgram):
    """Deterministic maximal independent set over the symmetrized graph —
    parallel greedy by hash priority (the derandomized form of Luby's
    algorithm, Luby SICOMP 1986; a.k.a. the "random-permutation greedy":
    the result equals the sequential greedy MIS over vertices sorted by
    priority, computed in O(log n) expected parallel rounds).

    Priority π(v) = md5(f"mis-{vid}") — the DuckDB-computable md5 primitive
    every deterministic sampler here uses, which is what makes even the
    round structure SQL-attestable (queries._MIS_SQL mirrors the rounds as
    a recursive CTE). Round r: every undecided vertex whose priority beats
    all its undecided neighbors' joins the set; its undecided neighbors
    drop out. Two supersteps per round on the generic min-combine route:

      even step   every undecided vertex pushes π to its neighbors
                  (peval = step 0), after first marking OUT any undecided
                  receiver of an IN-announcement
      odd step    undecided v with π(v) < min inbound π (or no inbound —
                  no undecided neighbors left) turns IN and announces

    Ties are impossible in practice (64-bit md5 halves; adjacent equal
    priorities would livelock until max_steps raises loudly). Self-loops
    are excluded at the sender, matching the MIS definition. Split hubs
    are refused (gate builds have none); the scalar broadcast channel
    could carry both phases but is untested for them."""

    combine_op = "min"
    needs_symmetrized = True
    default_direction = "both"
    channels = ()  # generic route path
    sender_precombine = True  # min over duplicate (dest) rows is correct

    def init_state(self, g):
        if g.hub_vids.size:
            raise NotImplementedError(
                "MIS on split hubs is untested — rebuild with hub_threshold=None"
            )
        from drone_ray.functions.minhash import md5_lower64

        pri = np.fromiter(
            (md5_lower64(f"mis-{v}") for v in g.owned), np.uint64, g.n
        )
        return {"status": np.zeros(g.n, np.int8), "pri": pri, "aux": {"step": 0}}

    def _send(self, g, st, rows):
        """(rows' π) to every non-self neighbor along the symmetrized view."""
        rows, lens, dsts = _gather_neighbors(g.indptr, g.adj, rows)
        if rows.size == 0:
            return None, 0
        vals = np.repeat(st["pri"][rows], lens)
        srcs = np.repeat(g.owned[rows], lens)
        m = dsts != srcs  # self-loops are not neighbors for MIS purposes
        if not m.all():
            dsts, vals = dsts[m], vals[m]
        return _msgs(dsts, vals), int(dsts.size)

    def peval(self, g, st):
        msgs, sent = self._send(g, st, np.arange(g.n, dtype=np.int64))
        return msgs, {"edges": sent}

    def inceval(self, g, st, inbound):
        st["aux"]["step"] += 1
        s = st["aux"]["step"]
        status = st["status"]
        li = None
        if inbound is not None:
            li = inbound["li"] if "li" in inbound else g.local_index(inbound["vid"])
        if s % 2 == 1:  # decide phase: inbound = min undecided-neighbor π
            minr = np.full(g.n, np.iinfo(np.uint64).max, np.uint64)
            if li is not None:
                minr[li] = inbound["val"].astype(np.uint64)
            newin = (status == 0) & (st["pri"] < minr)
            status[newin] = 1
            rows = np.flatnonzero(newin)
            msgs, sent = self._send(g, st, rows)  # IN announcements
            return msgs, {"edges": sent, "n_in": int(rows.size)}
        # out + repush phase: inbound = IN announcements
        if li is not None:
            drop = li[status[li] == 0]
            status[drop] = 2
        rows = np.flatnonzero(status == 0)
        msgs, sent = self._send(g, st, rows)
        return msgs, {"edges": sent, "n_undecided": int(rows.size)}

    def emit(self, g, st):
        return pa.table(
            {
                "vid": pa.array(g.owned, pa.int64()),
                "in_mis": pa.array((st["status"] == 1).astype(np.int64)),
            }
        )


# ---------------------------------------------------------------------------
class GreedyColoring(VertexProgram):
    """Deterministic Jones–Plassmann greedy coloring over the symmetrized
    graph (Jones & Plassmann, "A parallel graph coloring heuristic", SIAM
    JSC 1993, derandomized with hash priorities): vertex v colors itself
    with the smallest color unused by its already-colored
    HIGHER-priority neighbors, as soon as all of those are colored — the
    parallel-round evaluation of the sequential greedy coloring in
    (md5(vid), vid) order, so the result is a pure function of the graph.

    Engine shape: at init each partition hashes its adjacency once and
    compacts, per owned vertex, the LOWER-priority neighbor list
    (larger (p, vid) key — the only targets it will ever message) plus a
    wait-counter of uncolored higher-priority neighbors. Colored vertices
    announce (vid → color) rows on the generic extra-key route
    (``extra_key="color"``, count-sum combine), so a receiver gets one
    (color, count) row per inbound color: counts drain the wait-counter,
    colors fill a multi-word seen-mask (``max_colors``/64 uint64 lanes,
    default 256 colors), and mex = the lowest zero bit across lanes.
    Greedy colors ≤ degeneracy+1, far under the default on web graphs; a
    denser graph raises loudly rather than mis-coloring — raise
    ``max_colors`` (rounded up to a multiple of 64) to extend.

    Ties are impossible by construction ((p, vid) is a total order).
    Rounds = the longest priority-decreasing path, O(log n) w.h.p. The
    round structure is mirrored exactly by the recursive-CTE oracle
    (queries._COLORING_SQL)."""

    combine_op = "sum"
    extra_key = "color"
    needs_symmetrized = True
    default_direction = "both"
    channels = ()  # generic route path

    def __init__(self, max_colors: int = 256):
        if max_colors <= 0:
            raise ValueError("max_colors must be positive")
        self.W = -(-int(max_colors) // 64)  # uint64 lanes in the seen-mask
        self.max_colors = self.W * 64
        self._l_adj = None  # lower-priority compacted adjacency (per actor)
        self._l_indptr = None

    def _build(self, g):
        """Priority-split adjacency — a pure function of the graph, kept on
        the program instance (NOT in state: its length is O(edges), not n,
        so it must not ride the per-vertex checkpoint columns; resume
        rebuilds it lazily). Returns the initial wait-counters."""
        from drone_ray.functions.minhash import md5_lower64

        own_p = np.fromiter(
            (md5_lower64(f"mis-{v}") for v in g.owned), np.uint64, g.n
        )
        # hash every distinct neighbor id once (priority is a pure function
        # of vid, so remote neighbors need no exchange)
        uniq, inv = np.unique(g.adj, return_inverse=True)
        up = np.fromiter(
            (md5_lower64(f"mis-{v}") for v in uniq), np.uint64, uniq.size
        )
        adj_p = up[inv]
        rows = np.repeat(
            np.arange(g.n, dtype=np.int64), np.diff(g.indptr).astype(np.int64)
        )
        src_v = g.owned[rows]
        src_p = own_p[rows]
        not_self = g.adj != src_v  # self-loops are not neighbors
        # lower-priority neighbor ⇔ larger (p, vid) key
        larger = not_self & (
            (adj_p > src_p) | ((adj_p == src_p) & (g.adj > src_v))
        )
        smaller = not_self & ~larger
        l_indptr = np.zeros(g.n + 1, dtype=np.int64)
        np.cumsum(np.bincount(rows[larger], minlength=g.n), out=l_indptr[1:])
        self._l_adj = g.adj[larger].copy()
        self._l_indptr = l_indptr
        return np.bincount(rows[smaller], minlength=g.n).astype(np.int64)

    def init_state(self, g):
        if g.hub_vids.size:
            raise NotImplementedError(
                "coloring on split hubs is untested — rebuild with "
                "hub_threshold=None"
            )
        wait = self._build(g)
        return {
            "color": np.full(g.n, -1, dtype=np.int64),
            "wait": wait,
            "used": np.zeros((g.n, self.W), dtype=np.uint64),
            "aux": {},
        }

    def _mex_color(self, st, rows: np.ndarray) -> None:
        """color[rows] = lowest color absent from each row's seen-mask."""
        x = ~st["used"][rows]  # (R, W); a set bit of x == a free color
        free = x != 0
        ok = free.any(axis=1)
        if not ok.all():
            # every lane saturated ⇒ no free bit: without this test the
            # isolated-bit log2 would silently yield color 0 (improper!)
            raise OverflowError(
                f"greedy coloring needs ≥{self.max_colors} colors — raise "
                "max_colors (the seen-mask cannot represent this graph's "
                "degeneracy)"
            )
        widx = np.argmax(free, axis=1)  # first lane with a free bit
        xw = x[np.arange(rows.size), widx]
        low = xw & (~xw + np.uint64(1))
        st["color"][rows] = widx.astype(np.int64) * 64 + _ilog2(low)

    @staticmethod
    def _mark_used(st, li: np.ndarray, cols: np.ndarray) -> None:
        c = cols.astype(np.uint64)
        np.bitwise_or.at(
            st["used"],
            (li, (c >> np.uint64(6)).astype(np.int64)),
            np.uint64(1) << (c & np.uint64(63)),
        )

    def _cascade(self, g, st, rows):
        """Color ``rows`` and chase the readiness cascade to its LOCAL
        fixpoint inside this superstep: announcements to same-partition
        lower-priority neighbors apply immediately and may ready further
        vertices (the _local_min_fixpoint pattern) — supersteps then track
        the CROSS-partition chain depth, not the full priority-chain depth.
        Under hash ownership only ~1/P of chain hops are local (measured
        86 → 62 supersteps going P=16 → P=2 on a 2M-edge power law); the
        real win is host-locality ownership, where intra-site links —
        most of a web graph — cascade inside the superstep.
        Returns (remote announcement msgs, edges touched, n colored)."""
        if self._l_indptr is None:  # resumed actor: state loaded, not init'd
            self._build(g)
        rem_d: list[np.ndarray] = []
        rem_c: list[np.ndarray] = []
        edges = 0
        n_colored = 0
        while rows.size:
            self._mex_color(st, rows)
            n_colored += int(rows.size)
            kept, lens, dsts = _gather_neighbors(self._l_indptr, self._l_adj, rows)
            if kept.size == 0:
                break
            cols = np.repeat(st["color"][kept], lens)
            edges += int(dsts.size)
            lm = g.ownership.of(dsts, g.P) == g.p
            if not lm.all():
                rem_d.append(dsts[~lm])
                rem_c.append(cols[~lm])
            if not lm.any():
                break
            li = g.local_index(dsts[lm])
            self._mark_used(st, li, cols[lm])
            np.add.at(st["wait"], li, -1)
            rows = np.flatnonzero((st["color"] == -1) & (st["wait"] == 0))
        if not rem_d:
            return None, edges, n_colored
        dsts = np.concatenate(rem_d)
        cols = np.concatenate(rem_c)
        return (
            _msgs(dsts, np.ones(dsts.size, dtype=np.int64), color=cols),
            edges,
            n_colored,
        )

    def peval(self, g, st):
        ready = np.flatnonzero(st["wait"] == 0)
        msgs, sent, nc = self._cascade(g, st, ready)
        return msgs, {"edges": sent, "n_colored": nc}

    def inceval(self, g, st, inbound):
        if inbound is None:
            return None, {"edges": 0, "n_colored": 0}
        l = g.local_index(inbound["vid"])
        self._mark_used(st, l, inbound["color"])
        np.subtract.at(st["wait"], l, inbound["val"].astype(np.int64))
        ready = np.flatnonzero((st["color"] == -1) & (st["wait"] == 0))
        msgs, sent, nc = self._cascade(g, st, ready)
        return msgs, {"edges": sent, "n_colored": nc}

    def emit(self, g, st):
        return pa.table(
            {
                "vid": pa.array(g.owned, pa.int64()),
                "color": pa.array(st["color"], pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
class SALSA(VertexProgram):
    """SALSA hubs & authorities (Lempel & Moran, "SALSA: the stochastic
    approach for link-structure analysis", ACM TOIS 2001): HITS with both
    walk steps made stochastic —

        a_k(v) = Σ_{u→v} h_{k-1}(u) / outdeg(u)
        h_k(u) = Σ_{u→v} a_k(v)   / indeg(v)

    i.e. the power iteration of the bipartite back-forward random walk.
    Because every push distributes the sender's FULL score across its
    edges, L1 mass is conserved by construction (up to dangling leakage,
    identically in the oracle), so unlike :class:`HITS` there is NO global
    normalizer: no feedback channel, no driver barrier — the K fixed
    iterations pipeline like any message-driven program (pipeline_depth
    applies). Runs on the dual layout (``direction="dualview"``), hub
    scores flowing down out-edges and authority scores back up in-edges;
    the division happens at the SENDER (h/outdeg along fwd, a/indeg along
    rev), so receivers just sum.

    Superstep schedule, 2K+1 steps for ``iters`` = K: step 0 pushes
    h_0/outdeg = 1/outdeg forward; odd step 2k−1 lands a_k and pushes
    a_k/indeg backward; even step 2k lands h_k and pushes forward (the
    last even step 2K reports done instead). Fixed-iteration semantics →
    the driver-gate oracle is a recursive CTE running the identical K
    unnormalized stochastic iterations (queries._SALSA_SQL).

    The reference engine has no SALSA; this extends the same
    (PEval, IncEval, Assemble) plugin surface its algorithms use
    (/root/reference/src/protobuf/worker_service.proto:11-22)."""

    default_direction = "dualview"
    channels = ()  # generic route() on both views
    sender_precombine = False  # scalar sums: owner-side bincount absorbs dups

    def __init__(self, iters: int = 20):
        self.K = int(iters)

    @classmethod
    def should_stop(cls, step_metrics, step) -> bool:
        return any(m.get("done") for m in step_metrics)

    def init_state(self, g):
        if not hasattr(g, "rev_view"):
            raise ValueError(
                "SALSA needs both adjacency directions in one actor — run on "
                "a dual layout with direction='dualview'"
            )
        return {"auth": np.zeros(g.n), "hub": np.ones(g.n), "aux": {"step": 0}}

    def peval(self, g, st):
        rows = np.flatnonzero(g.out_degree > 0)
        dsts, vals = g.push(rows, st["hub"][rows] / g.out_degree[rows])
        return _msgs(dsts, vals), {"edges": int(vals.size)}

    def inceval(self, g, st, inbound):
        if st["aux"]["step"] >= 2 * self.K:
            # speculative no-op steps past the fixed schedule (the harness
            # pipelines SALSA, unlike feedback-barrier HITS) must not clobber
            # the final a_K/h_K state with their empty inbound
            return None, {"edges": 0, "done": True}
        st["aux"]["step"] += 1
        s = st["aux"]["step"]
        dense = np.zeros(g.n)
        if inbound is not None:
            li = inbound["li"] if "li" in inbound else g.local_index(inbound["vid"])
            dense[li] = inbound["val"]
        if s % 2 == 1:  # authority phase: a_k = raw stochastic in-sums
            st["auth"] = dense
            rows = np.flatnonzero(dense)
            # a vertex that received mass has an in-edge ⇒ indeg ≥ 1
            indeg = g.rev_view.out_degree
            dsts, vals = g.rev_view.push(rows, dense[rows] / indeg[rows])
        else:  # hub phase: h_k lands
            st["hub"] = dense
            if s >= 2 * self.K:
                return None, {"edges": 0, "done": True}
            rows = np.flatnonzero(dense)
            dsts, vals = g.push(rows, dense[rows] / g.out_degree[rows])
        return _msgs(dsts, vals), {"edges": int(vals.size)}

    def emit(self, g, st):
        return pa.table(
            {
                "vid": pa.array(g.owned, pa.int64()),
                "auth": pa.array(st["auth"], pa.float64()),
                "hub": pa.array(st["hub"], pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
class HyperANF(VertexProgram):
    """Approximate neighborhood function via per-vertex HyperLogLog sketches
    (Boldi, Rosa & Vigna, "HyperANF: approximating the neighbourhood
    function of very large graphs on a budget", WWW 2011 — the successor of
    Palmer et al.'s ANF). Every vertex holds a 2^p-register HLL counter of
    its out-reachability ball, seeded with its own id; one superstep merges
    each vertex's counter into its original IN-neighbors' (elementwise
    register max — associative, commutative, idempotent), so after t rounds
    the counter estimates |ball(v, t)| and the per-step metric
    ``nf_sum`` = Σ_v est(v) is the global neighborhood function NF(t). The
    run converges when no register changes anywhere — t ≈ the graph's
    effective diameter (single digits on web graphs).

    Engine shape: runs on the REVERSED dual view so pushing along the
    view's adjacency reaches original in-neighbors. Messages ride the
    generic (vid, val) route with ``val`` a (rows, 2^p) uint8 register
    matrix; route()'s sender precombine and combine_inbound_local reduce
    it with a vectorized elementwise max (identity 0 — see messages.py).
    Delta-frontier like WCC: after the first full exchange only vertices
    whose sketch GREW re-send. Estimates update incrementally (changed
    rows only); per-actor memory is n·2^p bytes. The exact neighborhood
    function is Θ(V·E) — this sketch is the only way the north rule's
    10^12-doc scale gets an effective diameter at all.

    Reference parity: beyond the reference's four algorithms but on its
    plugin surface (PEval/IncEval/Assemble, worker_service.proto:11-22)."""

    combine_op = "max"
    default_direction = "rev"
    channels = ()  # generic route path

    def __init__(self, p: int = 6):
        if not 4 <= int(p) <= 12:
            raise ValueError("p must be in [4, 12] (2^p registers per vertex)")
        self.p = int(p)
        self.m = 1 << self.p

    def init_state(self, g):
        if g.hub_vids.size:
            raise NotImplementedError(
                "HyperANF register rows cannot ride the scalar hub broadcast "
                "channel — rebuild with hub_threshold=None"
            )
        from drone_ray.hashing import mix64

        m = self.m
        reg = np.zeros((g.n, m), dtype=np.uint8)
        if g.n:
            h = mix64(g.owned)
            bucket = (h & np.uint64(m - 1)).astype(np.int64)
            rest = h >> np.uint64(self.p)
            # rest has 64-p > 53 significant bits → exact integer log2
            width = 64 - self.p
            rank = np.where(rest > 0, width - _ilog2(rest), width + 1).astype(np.uint8)
            reg[np.arange(g.n), bucket] = rank
        return {"reg": reg, "est": self._est(reg), "aux": {}}

    @staticmethod
    def _est(reg: np.ndarray) -> np.ndarray:
        """Row-wise HLL estimate with the linear-counting small-range fix
        (the textstats.vocabulary_hll estimator, vectorized over rows)."""
        if reg.shape[0] == 0:
            return np.zeros(0, np.float64)
        m = reg.shape[1]
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / np.power(2.0, -reg.astype(np.float64)).sum(axis=1)
        zeros = (reg == 0).sum(axis=1)
        small = (e <= 2.5 * m) & (zeros > 0)
        if small.any():
            e[small] = m * np.log(m / zeros[small])
        return e

    def _push(self, g, st, rows: np.ndarray):
        """Register rows of ``rows`` along the view adjacency (→ original
        in-neighbors). Vectorized repeat/cumsum gather, no Python loop."""
        rows, lens, dsts = _gather_neighbors(g.indptr, g.adj, rows)
        if rows.size == 0:
            return None, 0
        vals = st["reg"][np.repeat(rows, lens)]
        return _msgs(dsts, vals), int(dsts.size)

    def peval(self, g, st):
        msgs, sent = self._push(g, st, np.arange(g.n, dtype=np.int64))
        return msgs, {"edges": sent, "nf_sum": float(st["est"].sum())}

    def inceval(self, g, st, inbound):
        if st["reg"].dtype != np.uint8:
            # checkpoint-restored 2-D state reloads as int64 list columns
            st["reg"] = st["reg"].astype(np.uint8)
        if inbound is None:
            return None, {"edges": 0, "nf_sum": float(st["est"].sum())}
        li = inbound.get("li")
        if li is None:
            li = g.local_index(inbound["vid"])
        val = inbound["val"]
        if val.dtype != np.uint8:
            val = val.astype(np.uint8)
        old = st["reg"][li]
        new = np.maximum(old, val)
        ch = (new > old).any(axis=1)
        st["reg"][li] = new
        rows = li[ch]
        if rows.size:
            st["est"][rows] = self._est(st["reg"][rows])
        msgs, sent = self._push(g, st, rows)
        return msgs, {"edges": sent, "nf_sum": float(st["est"].sum())}

    def emit(self, g, st):
        return pa.table(
            {
                "vid": pa.array(g.owned, pa.int64()),
                "reach_est": pa.array(st["est"], pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
class RandomWalks(VertexProgram):
    """Deterministic random-walk corpus (DeepWalk / node2vec p=q=1 sampling;
    Perozzi et al. KDD 2014): start ``num_walks`` walks at every vertex and
    advance each one hop per superstep for ``walk_length`` hops along
    out-edges, stopping early at dangling vertices. Output is the walk
    corpus in long form — (walk_id, step, vid) — the sampling stage a
    graph-embedding trainer consumes.

    The next-hop choice is a pure function of (walk_id, step): neighbor
    rank = ``md5_lower64(f"rw-{wid}-{step}") % outdeg`` over the CSR's
    (src, dst)-lexsorted adjacency — the same DuckDB-reproducible md5
    primitive the MinHash chain uses (functions/minhash.py), which is what
    makes even this sampler an oracle-backed query (a recursive CTE joining
    on ``row_number() OVER (PARTITION BY src ORDER BY dst)``) instead of a
    trust-me RNG. No replicated RNG state, no cross-partition coordination:
    a walk is wholly described by the (wid, step, vid) message that carries
    it, so partitioning cannot change the corpus.

    Messages ride the generic extra-key route (one row per walk, keyed
    (vid, wid)); each superstep's traffic is O(active walks), and per-actor
    memory is O(walks seeded here + rows recorded here)."""

    combine_op = "min"  # identity: (vid, wid) keys are unique per step
    extra_key = "wid"
    default_direction = "fwd"
    channels = ()  # generic route path
    sender_precombine = False

    def __init__(self, walk_length: int = 8, num_walks: int = 1):
        if walk_length < 0 or num_walks < 1:
            raise ValueError("walk_length must be >= 0 and num_walks >= 1")
        self.walk_length = int(walk_length)
        self.num_walks = int(num_walks)

    def init_state(self, g):
        if g.hub_vids.size:
            raise NotImplementedError(
                "random-walk messages carry walk identity, which the hub "
                "broadcast channel collapses — rebuild with hub_threshold=None"
            )
        return {"rows": [], "aux": {}}

    def _advance(self, g, st, wid, l, step):
        """One hop for the walks sitting at local rows ``l`` with current
        step ``step`` (per-walk array). Returns messages to the owners of
        the next vertices (self-owned rows ride the in-actor stash)."""
        from drone_ray.functions.minhash import md5_lower64

        od = g.out_degree[l]
        alive = od > 0
        if not alive.any():
            return None, 0
        wid, l, step, od = wid[alive], l[alive], step[alive], od[alive]
        # int(d): md5_lower64 yields full-range uint64 Python ints; a numpy
        # int64 modulus would coerce through float64 and corrupt low bits
        idx = np.fromiter(
            (md5_lower64(f"rw-{w}-{s}") % int(d) for w, s, d in zip(wid, step, od)),
            dtype=np.int64,
            count=wid.size,
        )
        nxt = g.adj[g.indptr[l] + idx]
        return _msgs(nxt, step + 1, wid=wid), int(wid.size)

    def peval(self, g, st):
        nw = self.num_walks
        if g.n and nw > 1 and int(g.owned.max()) > (np.iinfo(np.int64).max - (nw - 1)) // nw:
            raise OverflowError(
                "walk_id = vid * num_walks + k overflows int64 for these "
                "vids (63-bit url-hash ids) — use num_walks=1 or remap vids"
            )
        vids = np.repeat(g.owned, nw)
        wid = vids * nw + np.tile(np.arange(nw, dtype=np.int64), g.n)
        step = np.zeros(wid.size, dtype=np.int64)
        st["rows"].append((wid, step, vids))
        if self.walk_length == 0:
            return None, {"edges": 0}
        l = np.repeat(np.arange(g.n, dtype=np.int64), nw)
        msgs, sent = self._advance(g, st, wid, l, step)
        return msgs, {"edges": sent}

    def inceval(self, g, st, inbound):
        if inbound is None:
            return None, {"edges": 0}
        wid = inbound["wid"].astype(np.int64)
        step = inbound["val"].astype(np.int64)
        vid = inbound["vid"].astype(np.int64)
        st["rows"].append((wid, step, vid))
        cont = step < self.walk_length
        if not cont.any():
            return None, {"edges": 0}
        l = g.local_index(vid[cont])
        msgs, sent = self._advance(g, st, wid[cont], l, step[cont])
        return msgs, {"edges": sent}

    def emit(self, g, st):
        if st["rows"]:
            wid = np.concatenate([r[0] for r in st["rows"]])
            step = np.concatenate([r[1] for r in st["rows"]])
            vid = np.concatenate([r[2] for r in st["rows"]])
        else:  # pragma: no cover - empty partition
            wid = step = vid = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "walk_id": pa.array(wid, pa.int64()),
                "step": pa.array(step, pa.int64()),
                "vid": pa.array(vid, pa.int64()),
            }
        )
