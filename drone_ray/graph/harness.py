"""Superstep driver loop — the reference master rebuilt as driver Python.

Mirrors ``RunJob`` (/root/reference/src/master.go:370-413): PEval on every
partition, barrier on the per-step metrics (== the master's finish-count
barrier, master.go:267-272), message exchange (object-store refs routed by
the driver, each payload shipped once), IncEval loop until the OR-reduce of
``has_msgs`` is false, then Assemble. Adds what the reference lacks:
per-superstep Parquet checkpoints with a lineage manifest (resume
mid-iteration), a structured metrics table, and a teps counter equivalent to
``totalIteration / runTime`` (/root/reference/src/master.go:399-407).
"""

from __future__ import annotations

import glob
import json
import os
import re
import time
from dataclasses import dataclass, field

import pyarrow as pa
import ray

from drone_ray.graph.actor import GraphPartitionActor
from drone_ray.graph.partition import GraphManifest


@dataclass
class ProgramResult:
    metrics: list[dict]
    steps: int
    converged: bool
    wall_seconds: float
    edges_traversed: int
    output_dir: str | None = None
    _tables: list = field(default_factory=list, repr=False)
    _actors: list = field(default_factory=list, repr=False)

    @property
    def teps(self) -> float:
        return self.edges_traversed / self.wall_seconds if self.wall_seconds else 0.0

    def to_table(self) -> pa.Table:
        if self._tables:
            return pa.concat_tables(self._tables)
        import ray.data as rd

        ds = rd.read_parquet(self.output_dir)
        return pa.concat_tables(
            ds.iter_batches(batch_format="pyarrow", batch_size=None)
        )

    def dataset(self):
        import ray.data as rd

        if self.output_dir:
            return rd.read_parquet(self.output_dir)
        return rd.from_arrow(self._tables)

    def metrics_table(self) -> pa.Table:
        keys = sorted({k for m in self.metrics for k in m})
        return pa.table({k: [m.get(k) for m in self.metrics] for k in keys})

    def release(self) -> None:
        for a in self._actors:
            ray.kill(a)
        self._actors = []


def _latest_checkpoint(ckpt_dir: str) -> int | None:
    steps = []
    for p in glob.glob(os.path.join(ckpt_dir, "step=*", "manifest.json")):
        m = re.search(r"step=(\d+)", p)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def run_vertex_program(
    manifest: GraphManifest,
    program_cls,
    program_kwargs: dict | None = None,
    *,
    max_steps: int = 500,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
    actor_cpus: float = 0,
    output_dir: str | None = None,
    direction: str | None = None,
    checkpoint_chunk_rows: int = 4 << 20,
    pipeline_depth: int = 2,
) -> ProgramResult:
    """Run a VertexProgram over a built graph; returns emitted results +
    per-superstep metrics. Does NOT call ray.init (caller owns the session).
    Refuses a directed graph for programs that declare
    ``needs_symmetrized`` (WCC/LPA semantics silently break otherwise).

    ``actor_cpus`` defaults to 0 (no CPU reservation): partition actors are
    barrier-synchronized — all busy or all idle — so reserving P full CPUs
    only risks deadlocking small sessions where P exceeds the CPU count. On
    a real multi-node cluster set ``actor_cpus ≈ cluster_cpus / P`` so the
    scheduler spreads actors across nodes.

    With ``output_dir`` the actors write their result partitions straight to
    Parquet (the scalable sink — the reference's per-worker Assemble files,
    /root/reference/src/worker/PRWorker.go:249-267); otherwise the emitted
    Arrow tables are fetched to the driver (small/test results only). In
    both cases the actor pool is torn down before returning so repeated runs
    never starve the cluster of CPUs.

    ``pipeline_depth``: number of supersteps kept in flight on the actors
    (1 = strict barrier, 2 = one step of driver/actor overlap). Measured on
    the 60k-page bench graph (P=8, ~5 ms/step): depth 2/4/8 are within noise
    of each other (0.48/0.51/0.64 s best-of-3 for 100 steps) while depth 1
    serializes the driver round-trip into every step — the payload data
    dependency, not driver submission, is the BSP critical path, so the
    default stays at 2 (deeper windows only hold more payload refs live)."""
    dual = bool(getattr(manifest, "dual", False))
    if dual and direction is None:
        # each program declares the graph view it computes on (PR/SSSP fwd,
        # WCC/LPA both, Sim rev) — callers may still override explicitly
        direction = getattr(program_cls, "default_direction", "both")
    if not dual and direction is not None:
        raise ValueError("direction is only meaningful on a dual-layout graph")
    if getattr(program_cls, "needs_symmetrized", False):
        symmetric_view = manifest.symmetrized and (not dual or direction == "both")
        if not symmetric_view:
            raise ValueError(
                f"{program_cls.__name__} needs a symmetrized graph view; rebuild "
                "with build_graph(..., symmetrize=True) or run a dual layout "
                "with direction='both'"
            )
    P = manifest.num_partitions
    mdict = {
        "num_partitions": P,
        "edges_dir": manifest.edges_dir,
        "vertices_dir": manifest.vertices_dir,
        "hubs_path": getattr(manifest, "hubs_path", None),
        "dual": dual,
        "direction": direction,
        "work_dir": manifest.work_dir,
        "content_token": manifest.content_token,
        "ownership": getattr(manifest, "ownership", None),
        "weighted": bool(getattr(manifest, "weighted", False)),
    }
    actors = [
        GraphPartitionActor.options(num_cpus=actor_cpus).remote(
            mdict, p, program_cls, program_kwargs
        )
        for p in range(P)
    ]
    ray.get([a.ready.remote() for a in actors])  # graph load barrier (Register)
    # static-boundary handshake: each receiver registers every sender's
    # possible destination set once, so superstep payloads can be compact
    # positions/values instead of (vid, val) rows (csr.push_combined)
    brefs = [a.outbound_boundaries.options(num_returns=2 * P).remote() for a in actors]
    ray.get(
        [
            actors[q].register_inbound.remote(
                *[brefs[p][q] for p in range(P)],
                *[brefs[p][P + q] for p in range(P)],
            )
            for q in range(P)
        ]
    )

    start_step = 0
    resumed = False
    resume_feedback = None
    if checkpoint_dir and resume:
        latest = _latest_checkpoint(checkpoint_dir)
        if latest is not None:
            # refuse checkpoints written by a different program or graph —
            # mismatched state arrays would silently produce wrong results
            with open(os.path.join(checkpoint_dir, f"step={latest}", "manifest.json")) as f:
                ck = json.load(f)
            if (
                ck.get("program") == program_cls.__name__
                and ck.get("graph_token") == manifest.content_token
                and ck.get("direction") == direction
            ):
                if getattr(program_cls, "wants_feedback", False):
                    if "feedback" not in ck:
                        raise ValueError(
                            f"checkpoint step={latest} predates driver-feedback "
                            "persistence; a resumed feedback program would run "
                            "with a stale global scalar — pass resume=False"
                        )
                    # the reduced feedback for step latest+1 (from step
                    # latest's metrics), persisted at checkpoint commit
                    resume_feedback = ck["feedback"]
                ray.get([a.load_checkpoint.remote(checkpoint_dir, latest) for a in actors])
                start_step = latest + 1
                resumed = True
            else:
                raise ValueError(
                    f"checkpoint at {checkpoint_dir} step={latest} was written by "
                    f"program={ck.get('program')} graph={ck.get('graph_token')}, but this run is "
                    f"program={program_cls.__name__} graph={manifest.content_token}; "
                    "pass resume=False or a fresh checkpoint_dir"
                )

    metrics_log: list[dict] = []
    converged = False
    edges_total = 0
    t0 = time.perf_counter()
    step = start_step
    # global-feedback programs (HITS): the driver reduces each step's
    # per-partition partials and feeds the result into the NEXT superstep —
    # a true global barrier, so the speculation window collapses to 1
    # (launching s+1 before step s's metrics exist would ship stale scalars)
    wants_feedback = bool(getattr(program_cls, "wants_feedback", False))
    last_feedback = [resume_feedback]  # boxed so launch() reads the current value
    if wants_feedback:
        pipeline_depth = 1
        if checkpoint_dir and not getattr(program_cls, "checkpointable", True):
            raise ValueError(
                f"{program_cls.__name__} declares checkpointable=False — "
                "run without checkpoint_dir"
            )
    # pipelining: the refs for step s+1 exist as soon as step s is SUBMITTED,
    # so up to ``pipeline_depth`` supersteps are queued on the actors before
    # the driver reads the oldest step's metrics — actors flow from step to
    # step without ever waiting on a driver round-trip (the BSP barrier is
    # the data dependency between payload refs, not the driver). Safe to run
    # up to depth-1 steps past convergence: every program's should_stop fires
    # only on a step that produced ZERO messages, so the speculative steps
    # receive all-None payloads and are state-preserving no-ops (drained
    # before emit). Checkpoints ride the same pipeline: actor tasks execute
    # in submission order, so submitting checkpoint(s) BEFORE superstep(s+1)
    # guarantees the snapshot is exactly post-step-s state while the driver
    # never blocks on the writes.

    def launch(s: int, prev: list | None):
        futs = []
        kw = {"feedback": last_feedback[0]} if wants_feedback else {}
        for p, a in enumerate(actors):
            if prev is None:
                args: tuple = ()
            else:
                # P regular payloads + P hub broadcasts (each hub payload is
                # the same small ref fanned out to every partition)
                args = tuple(prev[q][1 + p] for q in range(P)) + tuple(
                    prev[q][P + 1] for q in range(P)
                )
            futs.append(a.superstep.options(num_returns=P + 2).remote(s, *args, **kw))
        return futs

    def submit_checkpoint(s: int, futs: list):
        return [
            actors[p].checkpoint.remote(
                checkpoint_dir,
                s,
                P,
                *[futs[q][1 + p] for q in range(P)],
                *[futs[q][P + 1] for q in range(P)],
                chunk_rows=checkpoint_chunk_rows,
            )
            for p in range(P)
        ]

    # feedback captured at checkpoint-submit time: for step s it is
    # reduce_feedback(step-s metrics) — exactly what step s+1 consumes —
    # because feedback programs run at pipeline_depth=1, where checkpoint(s)
    # is always submitted after step s's metrics were processed
    ck_feedback: dict[int, object] = {}

    def commit_manifest(s: int):
        step_dir = os.path.join(checkpoint_dir, f"step={s}")
        tmp = os.path.join(step_dir, ".manifest.tmp")
        doc = {
            "step": s,
            "num_partitions": P,
            "program": program_cls.__name__,
            "graph_token": manifest.content_token,
            "graph_dir": manifest.work_dir,
            "direction": direction,
        }
        if wants_feedback:
            doc["feedback"] = ck_feedback.get(s)
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, os.path.join(step_dir, "manifest.json"))

    from collections import deque

    depth = max(1, int(pipeline_depth))
    pending: deque = deque()  # (step, futures) in launch order
    ck_pending: dict[int, list] = {}  # step -> checkpoint futures
    last_futs = launch(step, None)
    pending.append((step, last_futs))
    next_to_launch = step + 1
    hit_max = False
    while True:
        # keep the speculation window full — checkpoint of step s-1 is
        # submitted immediately before superstep s so the actor-ordered
        # snapshot is exactly post-step-(s-1) state
        while len(pending) < depth and next_to_launch < max_steps:
            if checkpoint_dir and checkpoint_every and next_to_launch % checkpoint_every == 0:
                ck_pending[next_to_launch - 1] = submit_checkpoint(
                    next_to_launch - 1, last_futs
                )
                if wants_feedback:
                    ck_feedback[next_to_launch - 1] = last_feedback[0]
            last_futs = launch(next_to_launch, last_futs)
            pending.append((next_to_launch, last_futs))
            next_to_launch += 1
        if not pending:
            hit_max = True  # window drained and max_steps exhausted
            break

        s, futs = pending.popleft()
        mets = ray.get([f[0] for f in futs])  # SuperStepFinish barrier
        metrics_log.extend(mets)
        edges_total += sum(m.get("edges", 0) for m in mets)
        step = s
        if wants_feedback:
            last_feedback[0] = program_cls.reduce_feedback(mets)

        if s in ck_pending:
            ray.get(ck_pending.pop(s))  # all state files durable before the manifest
            commit_manifest(s)

        if program_cls.should_stop(mets, s):
            converged = True
            # drain the speculative no-op steps (and their checkpoints —
            # post-convergence snapshots are the same fixpoint, still valid)
            for s2, f2 in pending:
                ray.get([f[0] for f in f2])
            for s2 in sorted(ck_pending):
                ray.get(ck_pending.pop(s2))
                commit_manifest(s2)
            pending.clear()
            break
    for s2 in sorted(ck_pending):
        ray.get(ck_pending.pop(s2))
        commit_manifest(s2)
    if hit_max and not converged:
        import warnings

        warnings.warn(
            f"{program_cls.__name__} stopped at max_steps={max_steps} without "
            "converging — results are the state after that step, not the "
            "fixpoint (long-diameter graphs propagate ~1 boundary hop per "
            "superstep; raise max_steps). Intentional for fixed-iteration "
            "runs (e.g. PageRank with eps=0).",
            stacklevel=2,
        )

    wall = time.perf_counter() - t0
    tables: list = []
    if output_dir:
        ray.get([a.emit_write.remote(output_dir) for a in actors])
    else:
        tables = ray.get([a.emit.remote() for a in actors])
    for a in actors:
        ray.kill(a)

    if checkpoint_dir and metrics_log:
        # structured per-superstep metrics table — replaces the reference's
        # master-log scraping (/root/reference/sbin/createCSV.py:8-54)
        import pyarrow.parquet as _pq

        keys = sorted({k for m in metrics_log for k in m})
        mt = pa.table({k: [m.get(k) for m in metrics_log] for k in keys})
        tmp = os.path.join(checkpoint_dir, ".metrics.tmp")
        os.makedirs(checkpoint_dir, exist_ok=True)
        _pq.write_table(mt, tmp)
        os.replace(tmp, os.path.join(checkpoint_dir, "metrics.parquet"))
    return ProgramResult(
        metrics=metrics_log,
        steps=step - start_step + 1,
        converged=converged,
        wall_seconds=wall,
        edges_traversed=edges_total,
        output_dir=output_dir,
        _tables=tables,
    )
