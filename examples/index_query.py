"""Index lifecycle: B-Tree and Hash indexes feeding device gathers.

Reference parity: examples/index_query.rs exercises the index structures
but its IndexScan execution falls back to a full scan with a TODO
(executor.rs:81-88). Here CREATE INDEX builds a native C++ index
(native/qe_native.cpp via ctypes), the planner's best-match picks it for
eligible predicates, and the IndexScan feeds row ids to a device gather.

Run: JAX_PLATFORMS=cpu python examples/index_query.py
"""
from _common import demo_session, show

s = demo_session()

# ---- create both index kinds ----------------------------------------------
s.sql("CREATE INDEX idx_emp_id ON employees (id)")          # B-Tree
s.sql("CREATE UNIQUE INDEX idx_emp_uid ON employees (id) USING HASH")
print("indexes on employees:",
      s.sources["employees"].indexes.list_indexes())

# ---- the planner routes point lookups through the index --------------------
q_point = "SELECT name FROM employees WHERE id = 3"
print("\nEXPLAIN", q_point)
print(s.explain(q_point))           # -> IndexScan, not Scan+Filter
show("point lookup", s.sql(q_point))

# ---- range scans use the B-Tree's ordered keys -----------------------------
q_range = "SELECT id, name FROM employees WHERE id > 3 ORDER BY id"
print("\nEXPLAIN", q_range)
print(s.explain(q_range))
show("range scan", s.sql(q_range))

# ---- composite-key best-match ----------------------------------------------
s.sql("CREATE INDEX idx_dept_age ON employees (dept_id, age)")
q_multi = "SELECT name FROM employees WHERE dept_id = 1 AND age > 25"
print("\nEXPLAIN", q_multi, "(longest-prefix best-match)")
print(s.explain(q_multi))
show("composite lookup + residual filter", s.sql(q_multi))

# ---- indexes stay correct under DML ----------------------------------------
s.sql("INSERT INTO employees (id, name, age, salary, dept_id) "
      "VALUES (7, 'Grace', 41, 99000, 1)")
show("after INSERT, the index sees the new row",
     s.sql("SELECT name FROM employees WHERE id = 7"))
s.sql("DELETE FROM employees WHERE id = 7")
assert s.sql("SELECT name FROM employees WHERE id = 7").num_rows == 0
print("after DELETE, the lookup is empty again ✓")

# ---- unique constraint enforcement -----------------------------------------
try:
    s.sql("INSERT INTO employees (id, name, age, salary, dept_id) "
          "VALUES (3, 'Dup', 1, 1, 1)")
    print("!! duplicate insert was not rejected")
except Exception as e:  # noqa: BLE001
    print(f"unique index rejected duplicate id=3: {type(e).__name__}")

s.sql("DROP INDEX idx_dept_age")
print("indexes after DROP:", s.sources["employees"].indexes.list_indexes())
