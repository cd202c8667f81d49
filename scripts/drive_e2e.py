"""End-to-end drive of the flagship pipeline through the public package API.

pages parquet → read_parquet → extract (M8) → canonicalize+hash (M9) →
edge build → partitioned graph → PageRank/CC superstep engine → results.
Run: python scripts/drive_e2e.py  (owns its own ray session)
"""
import os, shutil, sys, numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
import ray.data as rd
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

from drone_ray.sources.pages import write_pages
from drone_ray.stages.extract import extract_batch
from drone_ray.stages.canonicalize import links_to_edges_batch
from drone_ray.pipelines.analytics import pagerank, connected_components

shutil.rmtree("/tmp/drone_ray_e2e", ignore_errors=True)
pages_dir = write_pages("/tmp/drone_ray_e2e/pages", n_pages=2000, seed=42)
pages = rd.read_parquet(pages_dir, columns=["url", "html"])

extracted = pages.map_batches(extract_batch, batch_format="pyarrow")
edges = extracted.map_batches(links_to_edges_batch, batch_format="pyarrow").select_columns(["src", "dst"])

# extraction invariant: engine text == oracle text column, any parallelism
oracle = rd.read_parquet(pages_dir, columns=["url", "text"]).to_pandas().set_index("url")["text"]
got = extracted.select_columns(["url", "text"]).to_pandas().set_index("url")["text"]
mismatch = int((oracle.sort_index() != got.sort_index()).sum())
print(f"extraction: {len(got)} pages, byte-mismatches={mismatch}")
assert mismatch == 0

res = pagerank(lambda: edges, "e2e_pages_2000", num_partitions=4)
t = res.to_table()
scores = t["score"].to_numpy()
print(f"pagerank: {t.num_rows} vertices, steps={res.steps}, converged={res.converged}, "
      f"teps={int(res.teps)}, top score={scores.max():.4f}, min={scores.min():.4f}")
assert res.converged and t.num_rows > 0

res2 = connected_components(lambda: edges, "e2e_pages_2000", num_partitions=4)
t2 = res2.to_table()
n_comp = len(np.unique(t2["component"].to_numpy()))
print(f"wcc: {t2.num_rows} vertices in {n_comp} components, steps={res2.steps}")
ray.shutdown()
print("E2E OK")
