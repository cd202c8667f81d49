"""Single-node scale demonstration: build + checkpointed PageRank (with a
real kill/resume) + pointer-jumping WCC on a ~10^9-edge synthetic power-law
graph, under object-store spill.

Each phase is ONE process invocation with a fresh Ray session, so a failed
phase re-runs alone and the measurements are uncontaminated:

    python scripts/scale_demo.py build      --edges 1.0e9 --vertices 1e8
    python scripts/scale_demo.py pagerank   --max-steps 10   # cold; ckpt of step 4
    mv /tmp/scale1b/pr_out /tmp/scale1b/pr_out_cold
    python scripts/scale_demo.py pagerank   --max-steps 10   # resumes at step 5
    python scripts/scale_demo.py verify-resume                # bit-compare outputs
    python scripts/scale_demo.py wcc-star   --edges 1.0e9 --vertices 1e8
    python scripts/scale_demo.py clean-graph                  # free disk

(The harness submits the checkpoint of step s-1 just before launching step
s at every `s % checkpoint_every == 0`, so a run needs max_steps > the
checkpoint boundary for a snapshot to exist — max_steps=10, every=5 writes
exactly one, post-step-4.)

Every phase prints ONE JSON line with wall seconds, peak node memory
(sampled MemTotal-MemAvailable), the DRIVER's own peak RSS (VmHWM — the
no-O(V/E)-driver-state evidence), and Ray object-spill bytes. The edge
stream is a pure function of the row index (sources/synthetic_edges.py),
so the wcc-star phase regenerates the identical graph without re-reading
the build's layout.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _meminfo() -> float:
    """Node memory in use, GiB (total - available)."""
    kv = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            kv[k] = int(v.split()[0])
    return (kv["MemTotal"] - kv["MemAvailable"]) / (1 << 20)


def _spill_bytes() -> int:
    total = 0
    for d in glob.glob("/tmp/ray/session_*/*spill*"):
        for root, _, files in os.walk(d):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    return total


def _driver_vmhwm_gib() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / (1 << 20)
    return 0.0


class Sampler(threading.Thread):
    """2s sampler for peak node memory + peak live spill volume (spill files
    are deleted as refs release, so the live peak needs sampling too)."""

    def __init__(self):
        super().__init__(daemon=True)
        self.stop = threading.Event()
        self.peak_mem = _meminfo()
        self.peak_spill = _spill_bytes()

    def run(self):
        while not self.stop.wait(2.0):
            self.peak_mem = max(self.peak_mem, _meminfo())
            self.peak_spill = max(self.peak_spill, _spill_bytes())


def _session(num_cpus: int):
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                pass
    return total


def main():
    ap = argparse.ArgumentParser(prog="scale_demo")
    ap.add_argument(
        "phase",
        choices=["build", "pagerank", "verify-resume", "wcc-star", "clean-graph"],
    )
    ap.add_argument("--work", default="/tmp/scale1b")
    ap.add_argument("--edges", type=float, default=1.2e9)
    ap.add_argument("--vertices", type=float, default=1e8)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--hub-threshold", type=int, default=1_000_000)
    ap.add_argument("--max-steps", type=int, default=10)
    ap.add_argument("--eps", type=float, default=0.0,
                    help="pagerank convergence threshold; 0 = fixed-iteration "
                         "run of exactly --max-steps steps")
    ap.add_argument("--blocks", type=int, default=256)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    E, V = int(args.edges), int(args.vertices)
    graph_dir = os.path.join(args.work, "graph")
    out = {"phase": args.phase, "edges_param": E, "vertices_param": V,
           "partitions": args.partitions, "num_cpus": args.num_cpus}

    if args.phase == "verify-resume":
        # Bit-exact comparison of the cold 10-step output against the
        # resumed (load ckpt step=4, run 5..9) output — the resume-validity
        # evidence. DuckDB, no Ray session: symmetric EXCEPT must be empty.
        import duckdb

        a = os.path.join(args.work, "pr_out_cold")
        b = os.path.join(args.work, "pr_out")
        t0 = time.perf_counter()
        con = duckdb.connect()
        diff = con.execute(
            f"""
            SELECT count(*) FROM (
              (SELECT * FROM read_parquet('{a}/*.parquet')
               EXCEPT SELECT * FROM read_parquet('{b}/*.parquet'))
              UNION ALL
              (SELECT * FROM read_parquet('{b}/*.parquet')
               EXCEPT SELECT * FROM read_parquet('{a}/*.parquet'))
            )
            """
        ).fetchone()[0]
        rows = con.execute(
            f"SELECT count(*) FROM read_parquet('{a}/*.parquet')"
        ).fetchone()[0]
        out.update(
            rows=rows,
            mismatched_rows=diff,
            identical=diff == 0,
            wall_seconds=round(time.perf_counter() - t0, 1),
        )
        print(json.dumps(out))
        return

    if args.phase == "clean-graph":
        for sub in ("graph", "ckpt", "pr_out"):
            shutil.rmtree(os.path.join(args.work, sub), ignore_errors=True)
        print(json.dumps(out))
        return

    sampler = Sampler()
    sampler.start()
    _session(args.num_cpus)
    t0 = time.perf_counter()

    if args.phase == "build":
        from drone_ray.graph.partition import build_graph
        from drone_ray.sources.synthetic_edges import power_law_edges

        ds = power_law_edges(E, V, seed=args.seed, override_num_blocks=args.blocks)
        m = build_graph(
            ds, graph_dir, args.partitions,
            source=f"scale_demo:{E}:{V}:{args.seed}",
            hub_threshold=args.hub_threshold, dual=True,
        )
        out["layout_bytes"] = _du(graph_dir)
        out["hub_count"] = 0
        if m.hubs_path and os.path.exists(m.hubs_path):
            import pyarrow.parquet as pq

            out["hub_count"] = pq.read_metadata(m.hubs_path).num_rows

    elif args.phase == "pagerank":
        from drone_ray.graph.harness import run_vertex_program
        from drone_ray.graph.partition import GraphManifest
        from drone_ray.graph.programs import PageRank

        m = GraphManifest.load(graph_dir)
        res = run_vertex_program(
            m, PageRank, {"eps": args.eps},  # 0.0 = fixed-iteration run
            max_steps=args.max_steps,
            checkpoint_dir=os.path.join(args.work, "ckpt"),
            checkpoint_every=5,
            resume=True,
            output_dir=os.path.join(args.work, "pr_out"),
            direction="fwd",
        )
        out.update(steps_run=res.steps, converged=res.converged,
                   edges_traversed=res.edges_traversed, teps=int(res.teps))
        # deduped adjacency size = edges traversed in one full superstep
        # (PageRank pushes every fwd edge every step)
        if res.steps:
            out["deduped_edges_per_step"] = res.edges_traversed // res.steps

    elif args.phase == "wcc-star":
        from drone_ray.pipelines.cc_star import connected_components_star
        from drone_ray.sources.synthetic_edges import power_law_edges

        ds = power_law_edges(E, V, seed=args.seed, override_num_blocks=args.blocks)
        labels, rounds = connected_components_star(ds)
        wdir = os.path.join(args.work, "wcc_out")
        shutil.rmtree(wdir, ignore_errors=True)
        labels.write_parquet(wdir)
        import ray.data as rd

        out.update(rounds=rounds, n_vertices=rd.read_parquet(wdir).count())

    out["wall_seconds"] = round(time.perf_counter() - t0, 1)
    import ray

    ray.shutdown()
    sampler.stop.set()
    sampler.join(timeout=5)
    out["peak_node_mem_gib"] = round(sampler.peak_mem, 1)
    out["peak_spill_gib"] = round(sampler.peak_spill / (1 << 30), 2)
    out["driver_peak_rss_gib"] = round(_driver_vmhwm_gib(), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
