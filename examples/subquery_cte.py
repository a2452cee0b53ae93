"""Subqueries + CTEs incl. recursion (reference examples/subquery_cte.rs)."""
from _common import demo_session, show

s = demo_session()
show("Scalar subquery", s.sql(
    "SELECT name FROM employees WHERE salary > (SELECT AVG(salary) FROM employees)"))
show("IN subquery", s.sql(
    "SELECT name FROM employees WHERE dept_id IN "
    "(SELECT dept_id FROM departments WHERE location = 'Building A')"))
show("CTE", s.sql(
    "WITH seniors AS (SELECT * FROM employees WHERE age >= 30) "
    "SELECT name, salary FROM seniors ORDER BY salary DESC"))
show("Recursive CTE (1..5)", s.sql(
    "WITH RECURSIVE nums(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM nums "
    "WHERE n < 5) SELECT n FROM nums ORDER BY n"))
