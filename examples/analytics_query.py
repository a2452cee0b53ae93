"""Analytics features beyond the reference: aggregate window functions,
correlated subqueries, EXTRACT/DATE_TRUNC, INTERVAL arithmetic, decimals.

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
DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
s.register_csv("employees", os.path.join(DATA, "employees.csv"))

orders = pa.record_batch({
    "id": pa.array([1, 2, 3, 4, 5, 6]),
    "emp_id": pa.array([1, 2, 1, 3, 2, 1]),
    "amount": pa.array([125.50, 89.99, 42.00, 310.25, 15.75, 99.00]),
    "placed": pa.array([
        datetime.date(2024, 1, 15), datetime.date(2024, 1, 31),
        datetime.date(2024, 2, 14), datetime.date(2024, 2, 29),
        datetime.date(2024, 3, 1), datetime.date(2024, 3, 15),
    ]),
})
s.register_table("orders", ColumnBatch.from_arrow(orders))

show("running total per employee (aggregate window function)", s.sql(
    "SELECT id, emp_id, amount, "
    "SUM(amount) OVER (PARTITION BY emp_id ORDER BY id) AS running "
    "FROM orders ORDER BY id"
))

show("monthly revenue (DATE_TRUNC + GROUP BY expression)", s.sql(
    "SELECT DATE_TRUNC('month', placed) AS month, COUNT(*) AS n, "
    "SUM(amount) AS revenue FROM orders GROUP BY DATE_TRUNC('month', placed) "
    "ORDER BY month"
))

show("employees above their department average (correlated)", s.sql(
    "SELECT e.name, e.salary FROM employees e WHERE e.salary > "
    "(SELECT AVG(e2.salary) FROM employees e2 "
    " WHERE e2.dept_id = e.dept_id) ORDER BY e.name"
))

show("orders within 30 days of March 1 (INTERVAL arithmetic)", s.sql(
    "SELECT id, placed FROM orders "
    "WHERE placed >= '2024-03-01' AND "
    "placed < '2024-03-01' OR placed + INTERVAL '30 days' >= '2024-03-01' "
    "ORDER BY id"
))
