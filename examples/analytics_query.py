"""Analytics walkthrough: window functions, frames, grouping sets,
correlated subqueries, temporal math, decimals, and full-text search.

Covers the analytic surface of the reference
(examples-package/examples/window_query.rs + aggregate_query.rs print
plans; here every query executes) plus the features the reference's
executor leaves unimplemented: real window evaluation
(executor.rs:76-80), grouped aggregation (executor.rs:157-190), and
aggregate window functions (no aggregate members in its
WindowFunctionType, ast.rs:236-245).

Run: JAX_PLATFORMS=cpu python examples/analytics_query.py
"""

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402

from query_engine_tpu.columnar.batch import ColumnBatch  # noqa: E402
from query_engine_tpu.engine.session import Session  # noqa: E402
from _common import show  # noqa: E402

s = Session()
DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)
s.register_csv("employees", os.path.join(DATA, "employees.csv"))
s.register_csv("departments", os.path.join(DATA, "departments.csv"))

orders = pa.record_batch({
    "id": pa.array([1, 2, 3, 4, 5, 6, 7, 8]),
    "emp_id": pa.array([1, 2, 1, 3, 2, 1, 3, 2]),
    "amount": pa.array([125.50, 89.99, 42.00, 310.25, 15.75, 99.00,
                        180.10, 55.40]),
    "placed": pa.array([
        datetime.date(2024, 1, 15), datetime.date(2024, 1, 31),
        datetime.date(2024, 2, 14), datetime.date(2024, 2, 29),
        datetime.date(2024, 3, 1), datetime.date(2024, 3, 15),
        datetime.date(2024, 3, 20), datetime.date(2024, 4, 2),
    ]),
    "note": pa.array([
        "rush order", "gift wrap", "rush delivery", "bulk discount",
        "gift card", "standard", "rush order priority", "standard",
    ]),
})
s.register_table("orders", ColumnBatch.from_arrow(orders))

# ---- ranking window functions (reference stubs windows entirely) ------
show("ranking: ROW_NUMBER / RANK / DENSE_RANK / NTILE over salary", s.sql(
    "SELECT name, salary, "
    "ROW_NUMBER() OVER (ORDER BY salary DESC) AS row_num, "
    "RANK() OVER (ORDER BY salary DESC) AS rnk, "
    "DENSE_RANK() OVER (ORDER BY salary DESC) AS dense, "
    "NTILE(2) OVER (ORDER BY salary DESC) AS half "
    "FROM employees ORDER BY salary DESC"
))

show("LAG/LEAD: order-over-order amount deltas per employee", s.sql(
    "SELECT emp_id, id, amount, "
    "LAG(amount) OVER (PARTITION BY emp_id ORDER BY id) AS prev_amount, "
    "LEAD(amount) OVER (PARTITION BY emp_id ORDER BY id) AS next_amount "
    "FROM orders ORDER BY emp_id, id"
))

# ---- aggregate window functions with frames ---------------------------
show("running total + 2-row moving average (ROWS frames)", s.sql(
    "SELECT id, amount, "
    "SUM(amount) OVER (ORDER BY id) AS running_total, "
    "AVG(amount) OVER (ORDER BY id "
    "                  ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS mavg2, "
    "MAX(amount) OVER (ORDER BY id "
    "                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS max3 "
    "FROM orders ORDER BY id"
))

show("share of department payroll (window / aggregate mix)", s.sql(
    "SELECT e.name, d.dept_name, e.salary, "
    "SUM(e.salary) OVER (PARTITION BY e.dept_id) AS dept_payroll "
    "FROM employees e JOIN departments d ON e.dept_id = d.dept_id "
    "ORDER BY d.dept_name, e.salary DESC"
))

# ---- grouping sets ----------------------------------------------------
show("ROLLUP(dept, month): subtotals and grand total", s.sql(
    "SELECT e.dept_id, DATE_TRUNC('month', o.placed) AS month, "
    "SUM(o.amount) AS revenue, GROUPING(e.dept_id) AS g_dept "
    "FROM orders o JOIN employees e ON o.emp_id = e.id "
    "GROUP BY ROLLUP(e.dept_id, DATE_TRUNC('month', o.placed)) "
    "ORDER BY g_dept, e.dept_id, month"
))

# ---- correlated subqueries -------------------------------------------
show("employees above their department average (correlated scalar)", s.sql(
    "SELECT e.name, e.salary FROM employees e WHERE e.salary > "
    "(SELECT AVG(e2.salary) FROM employees e2 "
    " WHERE e2.dept_id = e.dept_id) ORDER BY e.name"
))

show("employees with at least 2 orders (correlated EXISTS + HAVING)", s.sql(
    "SELECT e.name, n.cnt FROM employees e JOIN "
    "(SELECT emp_id, COUNT(*) AS cnt FROM orders GROUP BY emp_id "
    " HAVING COUNT(*) >= 2) n ON n.emp_id = e.id ORDER BY n.cnt DESC"
))

# ---- temporal math ----------------------------------------------------
show("monthly revenue (DATE_TRUNC + GROUP BY expression)", s.sql(
    "SELECT DATE_TRUNC('month', placed) AS month, COUNT(*) AS n, "
    "SUM(amount) AS revenue FROM orders "
    "GROUP BY DATE_TRUNC('month', placed) ORDER BY month"
))

show("orders in the 30 days before April (INTERVAL arithmetic)", s.sql(
    "SELECT id, placed FROM orders "
    "WHERE placed + INTERVAL '30 days' >= '2024-04-01' "
    "  AND placed < '2024-04-01' ORDER BY id"
))

show("EXTRACT: quarter and day-of-week breakdown", s.sql(
    "SELECT id, EXTRACT(QUARTER FROM placed) AS q, "
    "EXTRACT(DOW FROM placed) AS dow FROM orders ORDER BY id"
))

# ---- decimals + full text --------------------------------------------
show("exact decimal totals (CAST to DECIMAL(10,2))", s.sql(
    "SELECT emp_id, SUM(CAST(amount AS DECIMAL(10,2))) AS exact_total "
    "FROM orders GROUP BY emp_id ORDER BY emp_id"
))

show("full-text: notes matching 'rush' (@@ tsquery)", s.sql(
    "SELECT id, note FROM orders "
    "WHERE TO_TSVECTOR(note) @@ TO_TSQUERY('rush') ORDER BY id"
))
