"""Result caching (reference examples/caching_query.rs — real here too)."""
import time

from _common import DATA, show
import os
from query_engine_tpu.engine.session import Session

s = Session(enable_cache=True)
s.register_csv("employees", os.path.join(DATA, "employees.csv"))
sql = "SELECT dept_id, AVG(salary) FROM employees GROUP BY dept_id"
t0 = time.perf_counter(); s.sql(sql); cold = time.perf_counter() - t0
t0 = time.perf_counter(); out = s.sql(sql); warm = time.perf_counter() - t0
show("Cached aggregate", out)
print(f"cold: {cold*1e3:.1f} ms, warm (cache hit): {warm*1e3:.2f} ms")
print("cache stats:", s._cache.stats.snapshot())
