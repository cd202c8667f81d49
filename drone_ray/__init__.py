"""drone_ray — a Ray-Data-native link-graph & data-processing engine.

A from-scratch reimplementation of the capabilities of the reference
subgraph-centric graph engine (bupt-wenxiaole/DRONE, see SURVEY.md), built
idiomatically on ray.data.Dataset pipelines:

- ``sources``   : deterministic synthetic Common-Crawl-style pages + parquet readers
- ``stages``    : stateless batch transforms (HTML extraction, URL canonicalization,
                  edge build / dedup / degrees)
- ``graph``     : the iterative superstep engine — hash-partitioned zero-copy CSR
                  held in an actor pool, message shuffles with pre-combine,
                  checkpoint/resume with lineage manifests
- ``programs``  : VertexProgram implementations (PageRank, WCC, LPA, SSSP/BFS)
- ``pipelines`` : end-to-end pipelines (link-graph build, triangle counting,
                  dedup family, text analysis, similarity search)
- ``oracles``   : small numpy reference implementations used by tests

Nothing in this package calls ``ray.init()`` — the embedding application
(driver, bench.py, pytest fixture) owns the Ray session.
"""

__version__ = "0.1.0"
