"""Grouped aggregation (reference examples/aggregate_query.rs)."""
from _common import demo_session, show

s = demo_session()
show("GROUP BY dept_id",
     s.sql("SELECT dept_id, COUNT(*) AS n, SUM(salary) AS total, "
           "AVG(salary) AS avg, MIN(age), MAX(age) "
           "FROM employees GROUP BY dept_id ORDER BY dept_id"))
show("Global aggregates", s.sql("SELECT COUNT(*), AVG(salary) FROM employees"))
