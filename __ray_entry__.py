"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in drone_ray) calls ray.init/ray.shutdown.

- entry():      flagship pipeline on /root/testdata/sf0.001 — lineitem-derived
                link graph → PageRank via the partition-actor superstep engine.
- queries():    one callable per implemented operator/pipeline (SURVEY.md §2
                + training-data ops); each takes sf_dir.
- oracle_sql(): DuckDB-equivalent SQL for every SQL-expressible query,
                including recursive-CTE oracles for the iterative fixpoints
                (PageRank at a fixed iteration count, WCC, SSSP, LPA).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drone_ray.pipelines import queries as _q


def entry():
    return _q.q_pagerank("/root/testdata/sf0.001")


def queries():
    return _q.queries()


def oracle_sql():
    return _q.oracle_sql()
