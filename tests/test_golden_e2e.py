"""End-to-end golden: pages fixture → extract → edges → PageRank top-10.

Guards the whole flagship chain against behavioral drift (generator,
extraction contract, canonicalization, hashing, partitioning, PageRank
semantics). Regenerate the literal values ONLY for a deliberate,
documented semantic change.
"""

import numpy as np

from drone_ray.oracles import pagerank_oracle
from drone_ray.sources.pages import pages_table
from drone_ray.stages.canonicalize import links_to_edges_batch
from drone_ray.stages.extract import extract_batch
from drone_ray.pipelines.analytics import pagerank

GOLDEN_TOP5 = [
    # (vid, score rounded to 6) — pages_table(500, seed=42) flagship output,
    # verified against the dense numpy oracle below when first recorded
    (4623066004911345953, 16.019416),
    (5169000145186443801, 9.35606),
    (8036319967441715038, 5.249098),
    (4003740721572601389, 4.981733),
    (4975997441258273357, 4.024278),
]


def _flagship_scores():
    import ray.data as rd

    pages = rd.from_arrow(pages_table(500, seed=42))
    edges = (
        pages.map_batches(extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(links_to_edges_batch, batch_format="pyarrow", batch_size=None)
        .select_columns(["src", "dst"])
    )
    res = pagerank(lambda: edges, "golden_e2e", num_partitions=3)
    t = res.to_table()
    v = t["vid"].to_numpy()
    s = t["score"].to_numpy()
    order = np.lexsort((v, -s))
    return [(int(v[i]), float(round(s[i], 6))) for i in order[:5]], v, s


def test_flagship_golden_top5():
    top5, vids, scores = _flagship_scores()
    if top5 != GOLDEN_TOP5:  # pragma: no cover - debugging aid
        print("GOT:", top5)
    assert top5 == GOLDEN_TOP5

    # and the engine still matches the dense oracle on the same graph
    import ray.data as rd

    pages = rd.from_arrow(pages_table(500, seed=42))
    edges = (
        pages.map_batches(extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(links_to_edges_batch, batch_format="pyarrow", batch_size=None)
        .select_columns(["src", "dst"])
    ).to_pandas()
    ov, opr = pagerank_oracle(edges["src"].to_numpy(), edges["dst"].to_numpy())
    o = np.argsort(vids)
    assert np.array_equal(vids[o], ov)
    assert np.abs(scores[o] - opr).max() < 1e-6
