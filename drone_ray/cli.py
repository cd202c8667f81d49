"""Job entry point for ``ray job submit`` (north-rule deployment surface):

    ray job submit -- python -m drone_ray.cli pagerank \\
        --edges /data/edges --out /data/pr --partitions 256 \\
        --hub-threshold 100000 --checkpoint-dir /data/ckpt/pr --resume

Subcommands: build-pages-graph (pages parquet → extract → edges parquet),
pagerank, pagerank-weighted, katz, wcc, wcc-star, lpa, sssp, sssp-weighted,
sssp-negative (Bellman-Ford with negative-cycle detection), betweenness,
harmonic, closeness, louvain, simulation, triangles, ktruss (support-peeling cohesion),
bowtie (Broder core/in/out/tendril/disconnected classes), random-walks
(deterministic DeepWalk corpus), salsa (stochastic hubs/authorities),
hyperanf (HLL neighborhood function / effective diameter), mis
(deterministic maximal independent set), coloring (Jones-Plassmann). Results are written as
per-partition parquet (resumable layout); superstep jobs write a
metrics.parquet next to their checkpoints. Owns the Ray session only when
one is not already initialised (so the driver/pytest can embed it).
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(args):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _is_text_edges(path) -> bool:
    """True when ``path`` is a reference-style TXT edge list (``src dst
    [weight]`` lines — S1): a .txt/.tsv file, or a directory of them."""
    import os

    if str(path).endswith((".txt", ".tsv")):
        return True
    if os.path.isdir(path):
        names = os.listdir(path)
        return bool(names) and all(n.endswith((".txt", ".tsv")) for n in names)
    return False


def _edges_factory(path):
    def factory():
        import ray.data as rd

        if _is_text_edges(path):
            from drone_ray.sources.text import read_edge_text

            return read_edge_text(path)
        return rd.read_parquet(path, columns=["src", "dst"])

    return factory


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(prog="drone_ray")
    ap.add_argument("command", choices=[
        "build-pages-graph", "pagerank", "pagerank-weighted", "katz", "eigenvector", "wcc",
        "wcc-star", "lpa", "sssp", "sssp-weighted", "sssp-negative",
        "betweenness", "harmonic", "closeness", "simulation", "triangles", "ktruss",
        "bowtie", "louvain", "random-walks", "salsa", "hyperanf", "mis", "coloring",
    ])
    ap.add_argument("--pages", help="pages parquet dir (build-pages-graph)")
    ap.add_argument("--edges", help="edge-table parquet dir")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument(
        "--partitions", type=int, default=None,
        help="graph partition count; default derives from the live cluster "
             "(CPU count, capped at 64) — pin explicitly for reproducible "
             "layouts across differently-sized clusters",
    )
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--eps", type=float, default=1e-10)
    ap.add_argument("--alpha", type=float, default=0.02,
                    help="katz attenuation (must be < 1/lambda_max)")
    ap.add_argument("--weight-col", default="w",
                    help="edge weight column (pagerank-weighted / sssp-weighted)")
    ap.add_argument("--source", type=int, default=None, help="sssp source vid")
    ap.add_argument("--n-vertices", type=int, default=None,
                    help="vertex-count upper bound for sssp-negative's "
                         "negative-cycle superstep bound; default 2x the "
                         "edge-row count (always an upper bound)")
    ap.add_argument("--sources", default=None,
                    help="comma-separated source vids (betweenness/harmonic), "
                         "or 'all' for the exact Θ(V·E) source-batched schedule")
    ap.add_argument("--max-rounds", type=int, default=10, help="lpa round cap")
    ap.add_argument("--k", type=int, default=4, help="ktruss k (>= 3)")
    ap.add_argument("--walk-length", type=int, default=8,
                    help="random-walks hops per walk")
    ap.add_argument("--num-walks", type=int, default=1,
                    help="random-walks walks started per vertex")
    ap.add_argument("--iters", type=int, default=20, help="salsa iterations")
    ap.add_argument("--hll-p", type=int, default=6,
                    help="hyperanf registers per vertex = 2^p")
    ap.add_argument("--pattern", help="pattern graph file (simulation, S6 format)")
    ap.add_argument("--hub-threshold", type=int, default=None)
    ap.add_argument(
        "--host-bits", type=int, default=0,
        help="host-locality id layout: pack a host hash into the top N vid "
             "bits (build-pages-graph) / route ownership by that prefix with "
             "a mega-site salt guard (graph commands). 0 = uniform page hash.",
    )
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=10)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)
    _session(args)
    if args.partitions is None:
        # derive P from the LIVE cluster (multi-node: ray job submit against
        # a running cluster reports the whole fleet's CPUs) — one partition
        # per ~2 CPUs keeps actors barrier-balanced, capped so tiny test
        # sessions still get parallelism and huge ones don't over-fragment
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        args.partitions = max(4, min(64, cpus // 2))

    if args.command == "build-pages-graph":
        import ray.data as rd

        from drone_ray.stages.canonicalize import links_to_edges_batch
        from drone_ray.stages.edges import dedup_edges
        from drone_ray.stages.extract import extract_batch

        pages = rd.read_parquet(args.pages, columns=["url", "html"])
        links = pages.map_batches(extract_batch, batch_format="pyarrow", batch_size=None)
        hb = args.host_bits
        edges = links.map_batches(
            lambda b: links_to_edges_batch(b, host_bits=hb),
            batch_format="pyarrow",
            batch_size=None,
        ).select_columns(["src", "dst"])
        dedup_edges(edges).write_parquet(args.out)
        import ray.data as rd2

        n = rd2.read_parquet(args.out).count()
        return {"command": args.command, "out": args.out, "n_edges": n}

    if args.command == "wcc-star":
        import ray.data as rd

        from drone_ray.pipelines.cc_star import connected_components_star

        ds, rounds = connected_components_star(
            _edges_factory(args.edges)()
        )
        # streaming, partitioned output — labels never touch the driver
        ds = ds.materialize()
        ds.write_parquet(args.out)
        return {"command": args.command, "out": args.out, "rounds": rounds,
                "n_vertices": ds.count()}

    if args.command == "triangles":
        import ray.data as rd

        from drone_ray.pipelines.triangles import triangles_per_vertex

        tri = triangles_per_vertex(
            _edges_factory(args.edges)(), args.partitions
        )
        tri.write_parquet(args.out)
        return {"command": args.command, "out": args.out}

    if args.command == "ktruss":
        import ray.data as rd

        from drone_ray.pipelines.triangles import ktruss

        out = ktruss(
            _edges_factory(args.edges)(), args.k,
            args.partitions,
        ).materialize()
        out.write_parquet(args.out)
        return {"command": args.command, "out": args.out, "k": args.k,
                "n_edges": out.count()}

    from drone_ray.pipelines import analytics as A

    # fingerprint the input files so re-running after the edge table changed
    # rebuilds the partitioned layout instead of silently reusing stale data
    key = f"cli:{args.edges}:{A.path_fingerprint(args.edges)}"
    hk = dict(
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every if args.checkpoint_dir else 0,
        resume=args.resume,
        output_dir=args.out,
    )
    ef = _edges_factory(args.edges)
    ownership = None
    if args.host_bits:
        # edge table must carry host-layout vids (build-pages-graph with the
        # same --host-bits); the mega-site guard runs one distributed count
        from drone_ray.graph.partition import detect_mega_hosts

        ownership = detect_mega_hosts(ef(), args.partitions, host_bits=args.host_bits)
        key += f":host{args.host_bits}"
    if args.command in ("pagerank-weighted", "sssp-weighted", "sssp-negative"):
        # weighted commands read the weight column alongside src/dst
        wc, path = args.weight_col, args.edges
        if _is_text_edges(path):
            # reference TXT loader forces weight 1.0 (graph.go:335-362) —
            # refusing beats silently running "weighted" on unit weights
            raise SystemExit(
                "weighted commands need a parquet edge table with a weight "
                "column; TXT edge lists carry no usable weights"
            )

        def ef():
            import ray.data as rd

            return rd.read_parquet(path, columns=["src", "dst", wc])

    hk["ownership"] = ownership
    if args.command == "pagerank":
        res = A.pagerank(ef, key, args.partitions, eps=args.eps,
                         hub_threshold=args.hub_threshold, **hk)
    elif args.command == "pagerank-weighted":
        hk.pop("ownership", None)
        res = A.pagerank_weighted(ef, key + ":w", args.partitions, eps=args.eps,
                                  weight_col=args.weight_col, **hk)
    elif args.command == "katz":
        res = A.katz_centrality(ef, key, args.partitions, alpha=args.alpha,
                                hub_threshold=args.hub_threshold,
                                ownership=hk.pop("ownership", None), **hk)
    elif args.command == "eigenvector":
        hk.pop("ownership", None)
        res = A.eigenvector_centrality(ef, key, args.partitions, **hk)
    elif args.command == "sssp-weighted":
        source = args.source
        if source is None:
            source = int(ef().min("src"))
        hk.pop("ownership", None)
        res = A.sssp_weighted(ef, key + ":w", source, args.partitions,
                              weight_col=args.weight_col, **hk)
    elif args.command == "sssp-negative":
        source = args.source
        if source is None:
            source = int(ef().min("src"))
        n = args.n_vertices
        if n is None:
            n = 2 * ef().count()  # distinct vids <= 2 x edge rows, always
        hk.pop("ownership", None)
        res = A.bellman_ford_sssp(ef, key + ":wneg", source, n_vertices=n,
                                  num_partitions=args.partitions,
                                  weight_col=args.weight_col, **hk)
    elif args.command in ("betweenness", "harmonic", "closeness"):
        if args.sources == "all":
            sources = "all"  # exact mode: resumable source-batched schedule
        elif args.sources:
            sources = [int(x) for x in args.sources.split(",")]
        else:
            sources = [int(ef().min("src"))]
        hk.pop("ownership", None)
        fn = {"betweenness": A.betweenness, "harmonic": A.harmonic_centrality,
              "closeness": A.closeness_centrality}[args.command]
        res = fn(ef, key, sources, args.partitions, **hk)
    elif args.command == "wcc":
        res = A.connected_components(ef, key, args.partitions,
                                     hub_threshold=args.hub_threshold, **hk)
    elif args.command == "lpa":
        res = A.label_propagation(ef, key, args.partitions, max_rounds=args.max_rounds,
                                  hub_threshold=args.hub_threshold, **hk)
    elif args.command == "sssp":
        source = args.source
        if source is None:
            source = int(ef().min("src"))
        res = A.sssp(ef, key, source, args.partitions,
                     hub_threshold=args.hub_threshold, **hk)
    elif args.command == "bowtie":
        hk.pop("ownership", None)
        for c in ("checkpoint_dir", "checkpoint_every", "resume", "output_dir"):
            hk.pop(c, None)
        ds = A.bowtie(ef, key, args.partitions, **hk).materialize()
        ds.write_parquet(args.out)
        return {"command": args.command, "out": args.out,
                "n_vertices": ds.count()}
    elif args.command == "louvain":
        # Dataset-composition pipeline (no graph actors): edges in, one
        # (vid, community) parquet out
        from drone_ray.pipelines.louvain import louvain as _louvain

        ds, linfo = _louvain(ef(), max_rounds=args.max_rounds or 6,
                             checkpoint_dir=hk.get("checkpoint_dir"),
                             resume=hk.get("resume", True))
        ds.write_parquet(args.out)
        return {"command": args.command, "out": args.out,
                "n_vertices": ds.count(), **{k: v for k, v in linfo.items()
                                             if k != "history"}}
    elif args.command == "random-walks":
        hk.pop("ownership", None)
        # walks are deterministic — a rerun beats a checkpoint (see
        # analytics.random_walks guard)
        hk.pop("checkpoint_dir", None)
        hk.pop("checkpoint_every", None)
        hk.pop("resume", None)
        res = A.random_walks(ef, key, args.partitions,
                             walk_length=args.walk_length,
                             num_walks=args.num_walks, **hk)
    elif args.command in ("salsa", "mis", "coloring", "hyperanf"):
        # reject rather than silently drop: these programs refuse split
        # hubs, so host-locality ownership never applies
        if hk.pop("ownership", None) is not None:
            raise ValueError(f"--host-bits is unsupported for {args.command}")
        if args.command == "salsa":
            res = A.salsa(ef, key, args.partitions, iters=args.iters, **hk)
        elif args.command == "mis":
            res = A.mis(ef, key, args.partitions, **hk)
        elif args.command == "coloring":
            res = A.coloring(ef, key, args.partitions, **hk)
        else:  # hyperanf — a derived NF table, not a per-vertex program run
            if hk.get("checkpoint_dir") or hk.get("resume"):
                raise ValueError(
                    "hyperanf does not support --checkpoint-dir/--resume from "
                    "the CLI (the run is minutes even at 100M edges; use the "
                    "library API with run_vertex_program for checkpointing)"
                )
            for c in ("checkpoint_dir", "checkpoint_every", "resume", "output_dir"):
                hk.pop(c, None)
            t = A.hyperanf(ef, key, args.partitions, p=args.hll_p, **hk)
            import os as _os

            import pyarrow.parquet as _pq

            _os.makedirs(args.out, exist_ok=True)
            _pq.write_table(t, _os.path.join(args.out, "nf.parquet"))
            return {"command": args.command, "out": args.out,
                    "nf_steps": len(t),
                    "effective_diameter": int(t["effective_diameter"][0].as_py())}
    elif args.command == "simulation":
        from drone_ray.sources.text import PatternGraph

        pg = PatternGraph.read(args.pattern)
        res = A.graph_simulation(ef, key, pg.attrs, pg.targets, args.partitions, **hk)
    return {
        "command": args.command,
        "out": args.out,
        "steps": res.steps,
        "converged": res.converged,
        "teps": int(res.teps),
        "wall_seconds": round(res.wall_seconds, 3),
    }


if __name__ == "__main__":
    print(json.dumps(main(sys.argv[1:])))
