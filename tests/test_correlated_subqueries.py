"""Correlated subquery tests (decorrelation into grouped lookups).

The reference errors on every subquery form (query-executor/src/
operators.rs:34-52); uncorrelated subqueries are covered in
test_e2e_queries.py — this file covers the correlated patterns. Expected
values are hand-computed from the employees/departments fixtures:

employees: (1,Alice,25,75000,101) (2,Bob,30,85000,102) (3,Charlie,35,95000,101)
           (4,Diana,28,80000,103) (5,Eve,32,90000,102) (6,Frank,29,78000,NULL)
departments: (101,Engineering) (102,Sales) (103,HR) (104,Marketing)
"""

import os

import pytest

from query_engine_tpu.engine.session import Session

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)


@pytest.fixture()
def sess():
    s = Session()
    s.register_csv("employees", os.path.join(DATA, "employees.csv"))
    s.register_csv("departments", os.path.join(DATA, "departments.csv"))
    return s


def test_correlated_scalar_avg(sess):
    # dept 101 avg = 85000, 102 avg = 87500, 103 avg = 80000
    # above-dept-average earners: Charlie (95000 > 85000), Eve (90000 > 87500)
    out = sess.sql(
        "SELECT e.name FROM employees e WHERE e.salary > "
        "(SELECT AVG(e2.salary) FROM employees e2 WHERE e2.dept_id = e.dept_id) "
        "ORDER BY e.name"
    )
    assert out.to_pylist() == [("Charlie",), ("Eve",)]


def test_correlated_scalar_in_projection(sess):
    out = sess.sql(
        "SELECT e.name, (SELECT MAX(e2.salary) FROM employees e2 "
        "WHERE e2.dept_id = e.dept_id) AS dept_max "
        "FROM employees e ORDER BY e.id"
    )
    assert out.to_pylist() == [
        ("Alice", 95000), ("Bob", 90000), ("Charlie", 95000),
        ("Diana", 80000), ("Eve", 90000),
        ("Frank", None),  # NULL dept correlates with nothing
    ]


def test_correlated_count_miss_is_zero(sess):
    # departments with no employees must get COUNT = 0, not NULL
    out = sess.sql(
        "SELECT d.dept_name, (SELECT COUNT(*) FROM employees e "
        "WHERE e.dept_id = d.dept_id) AS n "
        "FROM departments d ORDER BY d.dept_id"
    )
    assert out.to_pylist() == [
        ("Engineering", 2), ("Sales", 2), ("HR", 1), ("Marketing", 0),
    ]


def test_correlated_exists(sess):
    out = sess.sql(
        "SELECT d.dept_name FROM departments d WHERE EXISTS "
        "(SELECT 1 FROM employees e WHERE e.dept_id = d.dept_id) "
        "ORDER BY d.dept_name"
    )
    assert out.to_pylist() == [("Engineering",), ("HR",), ("Sales",)]


def test_correlated_not_exists(sess):
    out = sess.sql(
        "SELECT d.dept_name FROM departments d WHERE NOT EXISTS "
        "(SELECT 1 FROM employees e WHERE e.dept_id = d.dept_id)"
    )
    assert out.to_pylist() == [("Marketing",)]


def test_correlated_exists_with_inner_filter(sess):
    # departments having an employee older than 30: 101 (Charlie 35),
    # 102 (Eve 32)
    out = sess.sql(
        "SELECT d.dept_name FROM departments d WHERE EXISTS "
        "(SELECT 1 FROM employees e WHERE e.dept_id = d.dept_id "
        "AND e.age > 30) ORDER BY d.dept_name"
    )
    assert out.to_pylist() == [("Engineering",), ("Sales",)]


def test_correlated_scalar_with_inner_filter(sess):
    # max salary among under-30s per dept: 101 -> Alice 75000,
    # 102 -> none, 103 -> Diana 80000
    out = sess.sql(
        "SELECT d.dept_id, (SELECT MAX(e.salary) FROM employees e "
        "WHERE e.dept_id = d.dept_id AND e.age < 30) AS m "
        "FROM departments d ORDER BY d.dept_id"
    )
    assert out.to_pylist() == [
        (101, 75000), (102, None), (103, 80000), (104, None),
    ]


def test_unsupported_correlation_errors(sess):
    from query_engine_tpu.core.errors import PlanError

    with pytest.raises(PlanError):
        # non-equality correlation is rejected, not silently wrong
        sess.sql(
            "SELECT e.name FROM employees e WHERE e.salary > "
            "(SELECT AVG(e2.salary) FROM employees e2 "
            "WHERE e2.age < e.age)"
        )


def test_uncorrelated_still_works(sess):
    out = sess.sql(
        "SELECT name FROM employees WHERE salary > "
        "(SELECT AVG(salary) FROM employees) ORDER BY name"
    )
    assert out.to_pylist() == [("Bob",), ("Charlie",), ("Eve",)]


# ---- expression-over-aggregate scalar subqueries (TPC-H Q17/Q20 shape) ----

def test_correlated_scalar_expression_over_aggregate(sess):
    # dept avgs: 101=85000, 102=87500, 103=80000; threshold 1.1*avg:
    # 101: 93500 -> Charlie 95000 qualifies; 102: 96250 -> none; 103: none
    out = sess.sql(
        "SELECT name FROM employees e WHERE salary > "
        "(SELECT 1.1 * AVG(salary) FROM employees e2 "
        "WHERE e2.dept_id = e.dept_id) ORDER BY name"
    ).to_pydict()
    assert out["name"] == ["Charlie"]


def test_correlated_scalar_two_aggregates(sess):
    # SUM/COUNT == AVG: same rows as the plain above-average test
    out = sess.sql(
        "SELECT name FROM employees e WHERE salary > "
        "(SELECT SUM(salary) / COUNT(*) FROM employees e2 "
        "WHERE e2.dept_id = e.dept_id) ORDER BY name"
    ).to_pydict()
    assert out["name"] == ["Charlie", "Eve"]


def test_correlated_scalar_still_requires_aggregate(sess):
    from query_engine_tpu.core.errors import PlanError

    with pytest.raises(PlanError):
        sess.sql(
            "SELECT name FROM employees e WHERE salary > "
            "(SELECT salary FROM employees e2 WHERE e2.dept_id = e.dept_id)"
        )


# ---- inequality correlation in EXISTS (TPC-H Q21 shape) -------------------

def test_exists_with_neq_correlation(sess):
    # another employee in the same dept with a different id
    out = sess.sql(
        "SELECT name FROM employees e WHERE EXISTS "
        "(SELECT 1 FROM employees e2 WHERE e2.dept_id = e.dept_id "
        "AND e2.id != e.id) ORDER BY name"
    ).to_pydict()
    # 101: Alice+Charlie, 102: Bob+Eve; 103 solo Diana; Frank NULL dept
    assert out["name"] == ["Alice", "Bob", "Charlie", "Eve"]


def test_not_exists_with_neq_correlation(sess):
    # nobody else in the department earns MORE -> department top earners
    out = sess.sql(
        "SELECT name FROM employees e WHERE NOT EXISTS "
        "(SELECT 1 FROM employees e2 WHERE e2.dept_id = e.dept_id "
        "AND e2.salary > e.salary) ORDER BY name"
    ).to_pydict()
    # 101 top: Charlie; 102 top: Eve; 103: Diana; Frank: NULL dept ->
    # empty correlated set -> NOT EXISTS true
    assert out["name"] == ["Charlie", "Diana", "Eve", "Frank"]


def test_exists_with_lt_correlation(sess):
    # someone younger in the same department
    out = sess.sql(
        "SELECT name FROM employees e WHERE EXISTS "
        "(SELECT 1 FROM employees e2 WHERE e2.dept_id = e.dept_id "
        "AND e2.age < e.age) ORDER BY name"
    ).to_pydict()
    assert out["name"] == ["Charlie", "Eve"]


def test_exists_neq_with_inner_filter(sess):
    # a DIFFERENT employee in the same dept earning >= 90000:
    # 101: Charlie 95000 -> Alice yes, Charlie no (only himself)
    # 102: Eve 90000 -> Bob yes, Eve no
    out = sess.sql(
        "SELECT name FROM employees e WHERE EXISTS "
        "(SELECT 1 FROM employees e2 WHERE e2.dept_id = e.dept_id "
        "AND e2.id != e.id AND e2.salary >= 90000) ORDER BY name"
    ).to_pydict()
    assert out["name"] == ["Alice", "Bob"]


def test_two_inequality_correlations_rejected(sess):
    from query_engine_tpu.core.errors import PlanError

    with pytest.raises(PlanError):
        sess.sql(
            "SELECT name FROM employees e WHERE EXISTS "
            "(SELECT 1 FROM employees e2 WHERE e2.dept_id = e.dept_id "
            "AND e2.id != e.id AND e2.salary > e.salary)"
        )
