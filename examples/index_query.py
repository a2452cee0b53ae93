"""B-Tree / Hash indexes (reference examples/index_query.rs)."""
from _common import demo_session, show

s = demo_session()
s.sql("CREATE INDEX idx_emp_id ON employees (id)")
show("Index-accelerated point lookup", s.sql("SELECT name FROM employees WHERE id = 3"))
show("Index-accelerated range scan", s.sql(
    "SELECT id, name FROM employees WHERE id > 3 ORDER BY id"))
print(s.explain("SELECT name FROM employees WHERE id = 3"))
