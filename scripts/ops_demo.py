"""New-operator scale demonstration: run one round-5 operator over a
deterministic synthetic power-law graph and print one JSON line.

    python scripts/ops_demo.py <op> [--edges 10000000] [--vertices 2500000]
        [--partitions 16] [--num-cpus 32]

ops: random-walks, bowtie, ktruss, adamic-adar, hyperanf, salsa,
link-jaccard, pack-sequences (synthetic doc lengths), mis, coloring,
eigenvector, closeness (sampled sources), louvain.
Each run is a fresh Ray session over a fresh layout (cache key carries
the size), so timings are end-to-end including the graph/pipeline build.
"""

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("op", choices=["random-walks", "bowtie", "ktruss", "adamic-adar",
                                   "hyperanf", "salsa", "link-jaccard",
                                   "pack-sequences", "mis", "coloring",
                                   "eigenvector", "closeness", "louvain"])
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--vertices", type=int, default=2_500_000)
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--walk-length", type=int, default=5)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--max-source-degree", type=int, default=256)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from drone_ray.sources.synthetic_edges import power_law_edges

    def ef():
        return power_law_edges(args.edges, args.vertices)

    key = f"opsdemo:{args.edges}:{args.vertices}"
    t0 = time.time()
    extra = {}
    if args.op == "random-walks":
        from drone_ray.pipelines.analytics import random_walks

        res = random_walks(ef, key, args.partitions,
                           walk_length=args.walk_length, num_walks=1)
        ds = res.dataset()
        extra = {"steps": res.steps, "corpus_rows": ds.count(),
                 "teps": int(res.teps)}
    elif args.op == "bowtie":
        from ray.data.aggregate import Count

        from drone_ray.pipelines.analytics import bowtie

        ds = bowtie(ef, key, args.partitions).materialize()
        sizes = {
            r["bowtie_class"]: r["n"]
            for r in ds.groupby("bowtie_class").aggregate(Count(alias_name="n")).take_all()
        }
        extra = {"class_sizes": sizes, "n_vertices": ds.count()}
    elif args.op == "ktruss":
        from drone_ray.pipelines.triangles import ktruss

        ds = ktruss(ef(), args.k, args.partitions).materialize()
        extra = {"k": args.k, "truss_edges": ds.count()}
    elif args.op == "adamic-adar":
        from drone_ray.pipelines.graphstats import adamic_adar
        from drone_ray.stages.edges import dedup_edges

        # the generator can repeat an (src, dst) pair; the score definition
        # assumes a simple graph (ktruss/bowtie dedup internally)
        ds = adamic_adar(dedup_edges(ef(), est_rows=args.edges), min_common=3,
                         max_source_degree=args.max_source_degree).materialize()
        extra = {"pairs": ds.count(), "max_source_degree": args.max_source_degree}
    elif args.op == "hyperanf":
        from drone_ray.pipelines.analytics import hyperanf

        t = hyperanf(ef, key, args.partitions, p=6)
        extra = {
            "nf_steps": len(t),
            "effective_diameter": int(t["effective_diameter"][0].as_py()),
            "nf_final": float(t["nf_estimate"][-1].as_py()),
        }
    elif args.op == "mis":
        from ray.data.aggregate import Sum

        from drone_ray.pipelines.analytics import mis

        res = mis(ef, key, args.partitions)
        ds = res.dataset()
        n_in = ds.groupby(None).aggregate(Sum("in_mis")).take_all()[0]["sum(in_mis)"]
        extra = {"steps": res.steps, "mis_size": int(n_in),
                 "converged": res.converged}
    elif args.op == "coloring":
        from ray.data.aggregate import Max

        from drone_ray.pipelines.analytics import coloring

        res = coloring(ef, key, args.partitions)
        ds = res.dataset()
        mx = ds.groupby(None).aggregate(Max("color")).take_all()[0]["max(color)"]
        extra = {"steps": res.steps, "n_colors": int(mx) + 1,
                 "converged": res.converged}
    elif args.op == "eigenvector":
        from drone_ray.pipelines.analytics import eigenvector_centrality

        res = eigenvector_centrality(ef, key, args.partitions, iters=20)
        ds = res.dataset()
        extra = {"steps": res.steps, "n_vertices": ds.count(), "teps": int(res.teps)}
    elif args.op == "closeness":
        from drone_ray.pipelines.analytics import closeness_centrality

        sources = list(range(0, args.vertices, max(1, args.vertices // 8)))[:8]
        res = closeness_centrality(ef, key, sources, args.partitions)
        ds = res.dataset()
        extra = {"steps": res.steps, "n_sources": len(sources),
                 "n_vertices": ds.count()}
    elif args.op == "louvain":
        from drone_ray.pipelines.louvain import louvain

        ds, linfo = louvain(ef(), max_rounds=4, max_levels=2,
                            est_edges=args.edges)
        extra = {"n_vertices": ds.count(), "modularity": linfo["modularity"],
                 "levels": linfo["levels"],
                 "rounds": sum(h["rounds"] for h in linfo["history"])}
    elif args.op == "salsa":
        from drone_ray.pipelines.analytics import salsa

        res = salsa(ef, key, args.partitions, iters=10)
        ds = res.dataset()
        extra = {"steps": res.steps, "n_vertices": ds.count(), "teps": int(res.teps)}
    elif args.op == "link-jaccard":
        from drone_ray.pipelines.graphstats import jaccard_pairs
        from drone_ray.stages.edges import dedup_edges

        ds = jaccard_pairs(dedup_edges(ef(), est_rows=args.edges), min_common=3,
                           max_source_degree=args.max_source_degree).materialize()
        extra = {"pairs": ds.count(), "max_source_degree": args.max_source_degree}
    elif args.op == "pack-sequences":
        import numpy as np
        import pyarrow as pa

        from drone_ray.pipelines.webtext import pack_sequences

        # synthetic corpus: doc_id + a short text whose token count is a
        # deterministic power-law-ish function of the id — the packer only
        # reads lengths, so tiny texts exercise the full pipeline shape
        n_docs = args.edges  # reuse the size knob as the doc count
        import ray.data as rd

        def gen(b):
            ids = b["id"].to_numpy(zero_copy_only=False)
            nt = 1 + (ids * 2654435761 % 997) % 400
            texts = ["w " * int(k) for k in nt]
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())})

        docs = rd.range(n_docs).map_batches(gen, batch_format="pyarrow")
        ds = pack_sequences(docs, budget=2048, est_rows=n_docs).materialize()
        from ray.data.aggregate import Max

        per_bucket = ds.groupby("bucket").aggregate(Max("seq")).take_all()
        extra = {
            "n_docs": ds.count(),
            "n_buckets": len(per_bucket),
            "n_sequences": int(sum(r["max(seq)"] + 1 for r in per_bucket)),
        }
    wall = round(time.time() - t0, 2)
    out = {
        "op": args.op,
        "n_edges": args.edges,
        "n_vertices": args.vertices,
        "partitions": args.partitions,
        "num_cpus": args.num_cpus,
        "wall_sec": wall,
        "driver_vmhwm_gib": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20), 2
        ),
        **extra,
    }
    print(json.dumps(out))
    ray.shutdown()
    return out


if __name__ == "__main__":
    main()
