"""New-operator scale demonstration: run one round-5 operator over a
deterministic synthetic power-law graph and print one JSON line.

    python scripts/ops_demo.py <op> [--edges 10000000] [--vertices 2500000]
        [--partitions 16] [--num-cpus 32]

ops: random-walks, bowtie, ktruss, adamic-adar. Each run is a fresh Ray
session over a fresh layout (cache key carries the size), so timings are
end-to-end including the graph/pipeline build.
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
    ap.add_argument("op", choices=["random-walks", "bowtie", "ktruss", "adamic-adar"])
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
