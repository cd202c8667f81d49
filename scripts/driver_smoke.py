"""Exercise __ray_entry__ exactly as the driver does: ray.init FIRST, then
import the module, then call entry() / sample queries()."""

import os
import sys

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as m

res = m.entry()
import pyarrow as pa

assert isinstance(res, pa.Table), type(res)
print("entry(): rows =", res.num_rows, "schema =", res.schema.names)
assert res.num_rows > 0

qs = m.queries()
sqls = m.oracle_sql()
print(f"queries: {len(qs)}, oracled: {len(sqls)}")
assert set(sqls) <= set(qs)
sim = qs["graph_simulation"]("/root/testdata/sf0.001")
print("graph_simulation rows:", sim.num_rows)
ray.shutdown()
print("DRIVER SMOKE OK")
