"""Subqueries and CTEs: scalar / IN / EXISTS / correlated / recursive.

Reference parity: examples/subquery_cte.rs parses and plans; its
executor returns "not yet implemented" for every subquery expression
(operators.rs:34-52). Here each shape executes — correlated subqueries
decorrelate into grouped lookups that run inside the compiled program.

Run: JAX_PLATFORMS=cpu python examples/subquery_cte.py
"""
from _common import demo_session, show

s = demo_session()

# ---- scalar subquery -------------------------------------------------------
show("Scalar subquery: above-average earners", s.sql(
    "SELECT name, salary FROM employees "
    "WHERE salary > (SELECT AVG(salary) FROM employees) ORDER BY salary"))

# ---- IN / NOT IN -----------------------------------------------------------
show("IN subquery", s.sql(
    "SELECT name FROM employees WHERE dept_id IN "
    "(SELECT dept_id FROM departments WHERE location = 'Building A')"))
show("NOT IN subquery", s.sql(
    "SELECT name FROM employees WHERE dept_id NOT IN "
    "(SELECT dept_id FROM departments WHERE location = 'Building A') "
    "ORDER BY name"))

# ---- EXISTS / correlated ---------------------------------------------------
show("EXISTS (correlated): departments with an employee over 30", s.sql(
    "SELECT dept_name FROM departments d WHERE EXISTS "
    "(SELECT 1 FROM employees e WHERE e.dept_id = d.dept_id AND e.age > 30) "
    "ORDER BY dept_name"))
show("Correlated scalar: each employee vs their dept average", s.sql(
    "SELECT e.name, e.salary, "
    "(SELECT AVG(e2.salary) FROM employees e2 "
    " WHERE e2.dept_id = e.dept_id) AS dept_avg "
    "FROM employees e ORDER BY e.id"))

# ---- CTEs ------------------------------------------------------------------
show("CTE", s.sql(
    "WITH seniors AS (SELECT * FROM employees WHERE age >= 30) "
    "SELECT name, salary FROM seniors ORDER BY salary DESC"))
show("Two CTEs composed", s.sql(
    "WITH dept_pay AS (SELECT dept_id, SUM(salary) AS total "
    "                  FROM employees GROUP BY dept_id), "
    "     big AS (SELECT dept_id FROM dept_pay WHERE total > 100000) "
    "SELECT d.dept_name FROM departments d "
    "JOIN big b ON d.dept_id = b.dept_id ORDER BY d.dept_name"))

# ---- recursive CTEs --------------------------------------------------------
# fixed-point iteration with the accumulated result re-registered as a
# temp table each round (backend.rs:221-369 semantics, 1000-iter cap)
show("Recursive CTE: 1..5", s.sql(
    "WITH RECURSIVE nums(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM nums "
    "WHERE n < 5) SELECT n FROM nums ORDER BY n"))
show("Recursive CTE: powers of two under 100", s.sql(
    "WITH RECURSIVE pows(p) AS (SELECT 1 UNION ALL SELECT p * 2 FROM pows "
    "WHERE p * 2 < 100) SELECT p FROM pows ORDER BY p"))

# UNION (not UNION ALL) deduplicates per round and terminates cycles:
show("Recursive CTE with cycle-safe UNION", s.sql(
    "WITH RECURSIVE walk(x) AS (SELECT 0 UNION SELECT (x + 3) % 7 FROM walk) "
    "SELECT x FROM walk ORDER BY x"))
print("\nsubquery/CTE walkthrough OK")
