"""Window functions (reference examples/window_query.rs)."""
from _common import demo_session, show

s = demo_session()
show("ROW_NUMBER / RANK / LAG per department", s.sql(
    "SELECT name, dept_id, salary, "
    "ROW_NUMBER() OVER (PARTITION BY dept_id ORDER BY salary DESC) AS rn, "
    "RANK() OVER (ORDER BY salary DESC) AS overall_rank, "
    "LAG(salary, 1) OVER (ORDER BY salary) AS prev_salary "
    "FROM employees ORDER BY id"))
