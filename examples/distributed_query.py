"""Distributed execution with real data movement (the reference's
examples/distributed_query.rs is an API tour where no data moves)."""
import numpy as np

from _common import show
from query_engine_tpu.columnar.batch import ColumnBatch
from query_engine_tpu.parallel.coordinator import Coordinator
from query_engine_tpu.plan.planner import Planner
from query_engine_tpu.sql.parser import parse_sql
from query_engine_tpu.storage.memory import MemoryDataSource

rng = np.random.default_rng(0)
batch = ColumnBatch.from_pydict({
    "k": rng.integers(0, 8, 10_000).tolist(),
    "v": rng.integers(0, 1000, 10_000).tolist(),
})
coord = Coordinator()
for i in range(4):
    coord.register_worker(f"host{i}:50051")
print("cluster:", coord.cluster_status())
planner = Planner()
planner.register_table("t", batch.schema)
plan = planner.create_logical_plan(
    parse_sql("SELECT k, COUNT(*) AS n, SUM(v) AS total FROM t GROUP BY k"))
result = coord.execute(plan, {"t": MemoryDataSource(batch=batch, name="t")})
show("Distributed partial+final aggregate over 4 workers", result)
