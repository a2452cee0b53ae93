"""Result caching: TTL, LRU, memory caps, and DML invalidation.

Reference parity: examples/caching_query.rs exercises the real cache —
so does this, plus the part the reference never wires: cache
INVALIDATION on DML (its CacheInvalidator trait has no call sites;
here every INSERT/UPDATE/DELETE/CREATE clears stale entries).

Run: JAX_PLATFORMS=cpu python examples/caching_query.py
"""
import os
import time

from _common import DATA, show
from query_engine_tpu.engine.session import Session

s = Session(enable_cache=True)
s.register_csv("employees", os.path.join(DATA, "employees.csv"))
sql = "SELECT dept_id, AVG(salary) FROM employees GROUP BY dept_id"

# ---- cold vs warm ----------------------------------------------------------
t0 = time.perf_counter(); s.sql(sql); cold = time.perf_counter() - t0
t0 = time.perf_counter(); out = s.sql(sql); warm = time.perf_counter() - t0
show("Cached aggregate", out)
print(f"cold: {cold*1e3:.1f} ms, warm (cache hit): {warm*1e3:.2f} ms")
print("cache stats:", s._cache.stats.snapshot())

# ---- parameterized statements key on their bindings ------------------------
q = "SELECT name FROM employees WHERE salary > $1"
a = s.sql(q, params=[80000]).to_pylist()
b = s.sql(q, params=[100000]).to_pylist()
assert a != b, "different params must not share a cache entry"
assert s.sql(q, params=[80000]).to_pylist() == a  # this one IS a hit
print("\nparameterized queries cache per binding ✓")

# ---- DML invalidates -------------------------------------------------------
before = s.sql(sql).to_pylist()
s.sql("INSERT INTO employees (id, name, age, salary, dept_id) "
      "VALUES (99, 'Heidi', 30, 200000, 1)")
after = s.sql(sql).to_pylist()
assert before != after, "stale cache served after INSERT!"
print("INSERT invalidated the cached aggregate ✓")
s.sql("DELETE FROM employees WHERE id = 99")
assert s.sql(sql).to_pylist() == before
print("DELETE invalidated it again ✓")

# ---- the cache primitives directly (TTL / LRU / memory cap) ----------------
from query_engine_tpu.cache.cache import QueryCache  # noqa: E402
from query_engine_tpu.cache.config import CacheConfig  # noqa: E402
from query_engine_tpu.columnar.batch import ColumnBatch  # noqa: E402

tiny = QueryCache(CacheConfig(max_entries=2, ttl_seconds=3600))
for i in range(3):
    tiny.put_sql(f"q{i}", ColumnBatch.from_pydict({"x": [i]}))
assert tiny.get_sql("q0") is None, "LRU should have evicted the oldest"
assert tiny.get_sql("q2") is not None
print("\nLRU capacity 2: q0 evicted, q2 resident ✓")

fleeting = QueryCache(CacheConfig(ttl_seconds=0.01))
fleeting.put_sql("t", ColumnBatch.from_pydict({"x": [1]}))
time.sleep(0.05)
assert fleeting.get_sql("t") is None, "TTL entry should have expired"
print("TTL 10 ms: entry expired ✓")
print("\ncaching walkthrough OK")
