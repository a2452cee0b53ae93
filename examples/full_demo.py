"""The kitchen sink (reference examples/full_demo.rs)."""
from _common import demo_session, show

s = demo_session()
show("Filter + join + aggregate + window + sort + limit", s.sql(
    "SELECT d.dept_name, e.name, e.salary, "
    "RANK() OVER (PARTITION BY e.dept_id ORDER BY e.salary DESC) AS dept_rank "
    "FROM employees e JOIN departments d ON e.dept_id = d.dept_id "
    "WHERE e.age > 24 ORDER BY d.dept_name, dept_rank LIMIT 10"))
show("UNION + DISTINCT", s.sql(
    "SELECT dept_id FROM employees WHERE dept_id IS NOT NULL "
    "UNION SELECT dept_id FROM departments"))
show("CASE + string functions", s.sql(
    "SELECT UPPER(name) AS who, "
    "CASE WHEN salary >= 85000 THEN 'high' ELSE 'normal' END AS band "
    "FROM employees ORDER BY salary DESC"))
