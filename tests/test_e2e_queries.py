"""End-to-end golden query tests over the reference CSV fixtures.

This is the parity harness SURVEY.md §4 calls for: expected results are
computed independently (hand-checked against data/employees.csv and
data/departments.csv) and asserted exactly, covering the BASELINE.json
config queries.

employees: (1,Alice,25,75000,101) (2,Bob,30,85000,102) (3,Charlie,35,95000,101)
           (4,Diana,28,80000,103) (5,Eve,32,90000,102) (6,Frank,29,78000,NULL)
departments: (101,Engineering,Building A,Sarah) (102,Sales,Building B,Michael)
             (103,HR,Building C,Jennifer) (104,Marketing,Building D,Robert)
"""

import os

import pytest

from query_engine_tpu.engine.session import Session

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


@pytest.fixture()
def sess():
    s = Session()
    s.register_csv("employees", os.path.join(DATA, "employees.csv"))
    s.register_csv("departments", os.path.join(DATA, "departments.csv"))
    return s


def rows(batch):
    return batch.to_pylist()


# ---- BASELINE config #1: filter + project ---------------------------------
def test_filter_project(sess):
    out = sess.sql("SELECT name, age FROM employees WHERE age > 25")
    assert rows(out) == [
        ("Bob", 30), ("Charlie", 35), ("Diana", 28), ("Eve", 32), ("Frank", 29),
    ]
    assert out.schema.names() == ["name", "age"]


def test_filter_compound_predicate(sess):
    out = sess.sql(
        "SELECT name FROM employees WHERE age > 25 AND salary < 90000 OR id = 1"
    )
    assert rows(out) == [("Alice",), ("Bob",), ("Diana",), ("Frank",)]


def test_projection_arithmetic(sess):
    out = sess.sql("SELECT name, salary * 2, salary / 1000 FROM employees WHERE id = 1")
    assert rows(out) == [("Alice", 150000, 75)]


def test_null_filtering(sess):
    out = sess.sql("SELECT name FROM employees WHERE dept_id = 101")
    assert rows(out) == [("Alice",), ("Charlie",)]  # Frank's NULL excluded
    out2 = sess.sql("SELECT name FROM employees WHERE dept_id IS NULL")
    assert rows(out2) == [("Frank",)]
    out3 = sess.sql("SELECT name FROM employees WHERE dept_id IS NOT NULL ORDER BY id")
    assert len(rows(out3)) == 5


# ---- BASELINE config #2: hash aggregate -----------------------------------
def test_global_aggregates(sess):
    out = sess.sql(
        "SELECT COUNT(*), COUNT(dept_id), SUM(salary), AVG(salary), "
        "MIN(age), MAX(age) FROM employees"
    )
    assert rows(out) == [(6, 5, 503000, 503000 / 6, 25, 35)]


def test_group_by_aggregates(sess):
    out = sess.sql(
        "SELECT dept_id, COUNT(*), SUM(salary), AVG(salary) FROM employees "
        "GROUP BY dept_id ORDER BY dept_id"
    )
    # group order: 101, 102, 103, NULL (nulls last in ORDER BY ASC)
    assert rows(out) == [
        (101, 2, 170000, 85000.0),
        (102, 2, 175000, 87500.0),
        (103, 1, 80000, 80000.0),
        (None, 1, 78000, 78000.0),
    ]


def test_group_by_having(sess):
    out = sess.sql(
        "SELECT dept_id, COUNT(*) FROM employees GROUP BY dept_id "
        "HAVING COUNT(*) > 1 ORDER BY dept_id"
    )
    assert rows(out) == [(101, 2), (102, 2)]


def test_count_distinct(sess):
    out = sess.sql("SELECT COUNT(DISTINCT dept_id) FROM employees")
    assert rows(out) == [(3,)]


def test_aggregate_on_empty_and_grouped_empty(sess):
    out = sess.sql("SELECT COUNT(*), SUM(salary) FROM employees WHERE age > 100")
    assert rows(out) == [(0, None)]
    out2 = sess.sql(
        "SELECT dept_id, COUNT(*) FROM employees WHERE age > 100 GROUP BY dept_id"
    )
    assert rows(out2) == []


# ---- BASELINE config #3: sort + limit + window -----------------------------
def test_order_by_desc_limit(sess):
    out = sess.sql("SELECT name, salary FROM employees ORDER BY salary DESC LIMIT 3")
    assert rows(out) == [("Charlie", 95000), ("Eve", 90000), ("Bob", 85000)]


def test_order_by_multi_key_offset(sess):
    out = sess.sql(
        "SELECT name FROM employees ORDER BY dept_id ASC, salary DESC LIMIT 3 OFFSET 1"
    )
    # dept 101: Charlie(95000), Alice(75000); dept 102: Eve, Bob; 103: Diana; NULL last
    assert rows(out) == [("Alice",), ("Eve",), ("Bob",)]


def test_window_row_number_rank(sess):
    out = sess.sql(
        "SELECT name, dept_id, "
        "ROW_NUMBER() OVER (PARTITION BY dept_id ORDER BY salary DESC) AS rn, "
        "RANK() OVER (ORDER BY salary DESC) AS rk "
        "FROM employees ORDER BY id"
    )
    assert rows(out) == [
        ("Alice", 101, 2, 6),
        ("Bob", 102, 2, 3),
        ("Charlie", 101, 1, 1),
        ("Diana", 103, 1, 4),
        ("Eve", 102, 1, 2),
        ("Frank", None, 1, 5),
    ]


def test_window_lag_lead(sess):
    out = sess.sql(
        "SELECT name, LAG(salary, 1) OVER (ORDER BY salary) AS prev, "
        "LEAD(salary, 1) OVER (ORDER BY salary) AS nxt "
        "FROM employees ORDER BY salary"
    )
    assert rows(out) == [
        ("Alice", None, 78000),
        ("Frank", 75000, 80000),
        ("Diana", 78000, 85000),
        ("Bob", 80000, 90000),
        ("Eve", 85000, 95000),
        ("Charlie", 90000, None),
    ]


# ---- BASELINE config #4: joins --------------------------------------------
def test_inner_join(sess):
    out = sess.sql(
        "SELECT e.name, d.dept_name FROM employees e "
        "INNER JOIN departments d ON e.dept_id = d.dept_id ORDER BY e.id"
    )
    assert rows(out) == [
        ("Alice", "Engineering"), ("Bob", "Sales"), ("Charlie", "Engineering"),
        ("Diana", "HR"), ("Eve", "Sales"),
    ]


def test_left_join(sess):
    out = sess.sql(
        "SELECT e.name, d.dept_name FROM employees e "
        "LEFT JOIN departments d ON e.dept_id = d.dept_id ORDER BY e.id"
    )
    assert rows(out) == [
        ("Alice", "Engineering"), ("Bob", "Sales"), ("Charlie", "Engineering"),
        ("Diana", "HR"), ("Eve", "Sales"), ("Frank", None),
    ]


def test_right_join(sess):
    out = sess.sql(
        "SELECT e.name, d.dept_name FROM employees e "
        "RIGHT JOIN departments d ON e.dept_id = d.dept_id "
        "ORDER BY d.dept_id, e.id"
    )
    assert rows(out) == [
        ("Alice", "Engineering"), ("Charlie", "Engineering"),
        ("Bob", "Sales"), ("Eve", "Sales"),
        ("Diana", "HR"), (None, "Marketing"),
    ]


def test_full_join(sess):
    out = sess.sql(
        "SELECT e.name, d.dept_name FROM employees e "
        "FULL JOIN departments d ON e.dept_id = d.dept_id"
    )
    got = sorted(rows(out), key=lambda r: (r[0] is None, str(r)))
    assert len(got) == 7  # 5 matches + Frank + Marketing
    assert ("Frank", None) in got
    assert (None, "Marketing") in got


def test_cross_join(sess):
    out = sess.sql("SELECT e.name, d.dept_name FROM employees e CROSS JOIN departments d")
    assert out.num_rows == 24
    got = rows(out)
    assert got[0] == ("Alice", "Engineering")
    assert got[-1] == ("Frank", "Marketing")


def test_join_then_aggregate(sess):
    out = sess.sql(
        "SELECT d.dept_name, COUNT(*) AS c, AVG(e.salary) FROM employees e "
        "JOIN departments d ON e.dept_id = d.dept_id "
        "GROUP BY d.dept_name ORDER BY d.dept_name"
    )
    assert rows(out) == [
        ("Engineering", 2, 85000.0), ("HR", 1, 80000.0), ("Sales", 2, 87500.0),
    ]


# ---- strings / scalar fns / misc ------------------------------------------
def test_string_functions(sess):
    out = sess.sql(
        "SELECT UPPER(name), LENGTH(name), CONCAT(name, '!') FROM employees "
        "WHERE id <= 2 ORDER BY id"
    )
    assert rows(out) == [("ALICE", 5, "Alice!"), ("BOB", 3, "Bob!")]


def test_string_comparison_and_like(sess):
    out = sess.sql("SELECT name FROM employees WHERE name > 'C' ORDER BY name")
    assert rows(out) == [("Charlie",), ("Diana",), ("Eve",), ("Frank",)]
    out2 = sess.sql("SELECT name FROM employees WHERE name LIKE '%a%' ORDER BY name")
    assert rows(out2) == [("Charlie",), ("Diana",), ("Frank",)]


def test_case_coalesce(sess):
    out = sess.sql(
        "SELECT name, COALESCE(dept_id, -1), "
        "CASE WHEN age >= 30 THEN 'senior' ELSE 'junior' END "
        "FROM employees ORDER BY id"
    )
    assert rows(out) == [
        ("Alice", 101, "junior"), ("Bob", 102, "senior"),
        ("Charlie", 101, "senior"), ("Diana", 103, "junior"),
        ("Eve", 102, "senior"), ("Frank", -1, "junior"),
    ]


def test_distinct_and_union(sess):
    out = sess.sql("SELECT DISTINCT dept_id FROM employees ORDER BY dept_id")
    assert rows(out) == [(101,), (102,), (103,), (None,)]
    out2 = sess.sql(
        "SELECT dept_id FROM employees WHERE dept_id = 101 "
        "UNION ALL SELECT dept_id FROM departments WHERE dept_id = 101"
    )
    assert out2.num_rows == 3
    out3 = sess.sql(
        "SELECT dept_id FROM employees WHERE dept_id = 101 "
        "UNION SELECT dept_id FROM departments WHERE dept_id = 101"
    )
    assert rows(out3) == [(101,)]


def test_in_list_and_between(sess):
    out = sess.sql(
        "SELECT name FROM employees WHERE dept_id IN (101, 103) ORDER BY id"
    )
    assert rows(out) == [("Alice",), ("Charlie",), ("Diana",)]
    out2 = sess.sql(
        "SELECT name FROM employees WHERE age BETWEEN 28 AND 32 ORDER BY id"
    )
    assert rows(out2) == [("Bob",), ("Diana",), ("Eve",), ("Frank",)]


def test_subqueries(sess):
    out = sess.sql(
        "SELECT name FROM employees WHERE salary > "
        "(SELECT AVG(salary) FROM employees) ORDER BY id"
    )
    assert rows(out) == [("Bob",), ("Charlie",), ("Eve",)]
    out2 = sess.sql(
        "SELECT name FROM employees WHERE dept_id IN "
        "(SELECT dept_id FROM departments WHERE location = 'Building A') ORDER BY id"
    )
    assert rows(out2) == [("Alice",), ("Charlie",)]
    out3 = sess.sql(
        "SELECT name FROM employees WHERE EXISTS (SELECT 1 FROM departments) "
        "AND id = 1"
    )
    assert rows(out3) == [("Alice",)]


def test_cte(sess):
    out = sess.sql(
        "WITH seniors AS (SELECT * FROM employees WHERE age >= 30) "
        "SELECT name FROM seniors ORDER BY name"
    )
    assert rows(out) == [("Bob",), ("Charlie",), ("Eve",)]


def test_recursive_cte(sess):
    out = sess.sql(
        "WITH RECURSIVE nums(n) AS ("
        "SELECT 1 UNION ALL SELECT n + 1 FROM nums WHERE n < 5"
        ") SELECT n FROM nums ORDER BY n"
    )
    assert rows(out) == [(1,), (2,), (3,), (4,), (5,)]


def test_subquery_in_from(sess):
    out = sess.sql(
        "SELECT t.name FROM (SELECT name, age FROM employees WHERE age > 30) t "
        "ORDER BY t.name"
    )
    assert rows(out) == [("Charlie",), ("Eve",)]


def test_select_without_from(sess):
    out = sess.sql("SELECT 1 + 2, 'hi'")
    assert rows(out) == [(3, "hi")]


# ---- DDL / DML -------------------------------------------------------------
def test_create_insert_update_delete(sess):
    sess.sql("CREATE TABLE t (id INT, name TEXT)")
    sess.sql("INSERT INTO t (id, name) VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    assert rows(sess.sql("SELECT * FROM t ORDER BY id")) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    sess.sql("UPDATE t SET name = 'z' WHERE id = 2")
    assert rows(sess.sql("SELECT name FROM t WHERE id = 2")) == [("z",)]
    sess.sql("DELETE FROM t WHERE id = 1")
    assert rows(sess.sql("SELECT COUNT(*) FROM t")) == [(2,)]


def test_upsert_on_conflict(sess):
    sess.sql("CREATE TABLE u (id INT, v TEXT)")
    sess.sql("INSERT INTO u (id, v) VALUES (1, 'x')")
    sess.sql("INSERT INTO u (id, v) VALUES (1, 'y') ON CONFLICT (id) DO UPDATE SET v = 'y'")
    assert rows(sess.sql("SELECT * FROM u")) == [(1, "y")]
    sess.sql("INSERT INTO u (id, v) VALUES (1, 'z') ON CONFLICT (id) DO NOTHING")
    assert rows(sess.sql("SELECT * FROM u")) == [(1, "y")]


def test_insert_returning(sess):
    sess.sql("CREATE TABLE r (id INT, v TEXT)")
    out = sess.sql("INSERT INTO r (id, v) VALUES (7, 'q') RETURNING id, v")
    assert rows(out) == [(7, "q")]


def test_create_index_accelerated_lookup(sess):
    sess.sql("CREATE TABLE idx_t (id INT, v INT)")
    sess.sql("INSERT INTO idx_t (id, v) VALUES (1, 10), (2, 20), (3, 30)")
    sess.sql("CREATE INDEX idx_id ON idx_t (id)")
    assert rows(sess.sql("SELECT v FROM idx_t WHERE id = 2")) == [(20,)]
    sess.sql("DROP INDEX idx_id")


def test_date_literal_comparison(sess):
    import datetime

    import pyarrow as pa

    from query_engine_tpu.columnar.batch import ColumnBatch

    rb = pa.record_batch({
        "id": pa.array([1, 2, 3]),
        "d": pa.array([
            datetime.date(2024, 1, 1),
            datetime.date(2024, 6, 15),
            datetime.date(2025, 3, 1),
        ]),
    })
    sess.register_table("ev", ColumnBatch.from_arrow(rb))
    assert sess.sql(
        "SELECT id FROM ev WHERE d > '2024-02-01' ORDER BY id"
    ).to_pylist() == [(2,), (3,)]
    assert sess.sql("SELECT id FROM ev WHERE d = '2024-01-01'").to_pylist() == [(1,)]
    assert sess.sql(
        "SELECT id FROM ev WHERE d BETWEEN '2024-01-01' AND '2024-12-31' ORDER BY id"
    ).to_pylist() == [(1,), (2,)]


def test_explain_returns_plan_rows():
    s = Session()
    s.register_table("t", {"a": [1, 2, 3], "b": [4, 5, 6]})
    out = s.sql("EXPLAIN SELECT a FROM t WHERE b > 4")
    assert out.schema.names() == ["QUERY PLAN"]
    text = "\n".join(r[0] for r in out.to_pylist())
    assert "Filter" in text and "TableScan: t" in text


def test_explain_analyze_runs_and_reports():
    s = Session()
    s.register_table("t", {"a": list(range(50)), "k": [i % 3 for i in range(50)]})
    out = s.sql("EXPLAIN ANALYZE SELECT k, COUNT(*) FROM t GROUP BY k")
    text = "\n".join(r[0] for r in out.to_pylist())
    assert "rows: 3" in text
    assert "timing:" in text
    assert "operator" in text  # per-op profiler table


# ---- PG surface: typed literals, FETCH, POSITION, USING/NATURAL, VALUES ----

def test_typed_temporal_literals():
    import datetime
    s = Session()
    assert s.sql("SELECT DATE '2020-01-02' AS d").to_pylist() == [
        (datetime.date(2020, 1, 2),)
    ]
    assert s.sql(
        "SELECT EXTRACT(YEAR FROM TIMESTAMP '2020-03-01 12:00:00')"
    ).to_pylist() == [(2020,)]


def test_fetch_first_rows_only():
    s = Session()
    s.register_table("t", {"v": [3, 1, 2]})
    assert s.sql(
        "SELECT v FROM t ORDER BY v FETCH FIRST 2 ROWS ONLY"
    ).to_pylist() == [(1,), (2,)]
    # count defaults to 1; NEXT is a synonym; works with OFFSET
    assert s.sql(
        "SELECT v FROM t ORDER BY v OFFSET 1 ROW FETCH NEXT ROW ONLY"
    ).to_pylist() == [(2,)]
    # FETCH after a bare table name must not be eaten as an alias
    assert s.sql("SELECT v FROM t FETCH FIRST 1 ROW ONLY").to_pylist() == [
        (3,)
    ]


def test_position_in():
    s = Session()
    s.register_table("t", {"s": ["abc", "bcd", "xyz"]})
    # PG: 1-based, 0 when absent
    assert s.sql("SELECT POSITION('bc' IN s) FROM t").to_pylist() == [
        (2,), (1,), (0,)
    ]


def test_join_using_and_natural():
    s = Session()
    s.register_table("t", {"g": [1, 1, 2], "v": [1, 2, 3]})
    s.register_table("u", {"g": [1, 2], "w": [10, 20]})
    # USING merges the join column: SELECT * shows it once
    assert s.sql(
        "SELECT * FROM t JOIN u USING (g) ORDER BY v"
    ).to_pylist() == [(1, 1, 10), (1, 2, 10), (2, 3, 20)]
    # bare g resolves unambiguously after the merge
    assert s.sql(
        "SELECT g, v, w FROM t JOIN u USING (g) ORDER BY g, v"
    ).to_pylist() == [(1, 1, 10), (1, 2, 10), (2, 3, 20)]
    assert s.sql(
        "SELECT * FROM t NATURAL JOIN u ORDER BY v"
    ).to_pylist() == [(1, 1, 10), (1, 2, 10), (2, 3, 20)]


def test_join_using_outer_merges():
    s = Session()
    s.register_table("f1", {"k": [1, 2], "a": [1, 2]})
    s.register_table("f2", {"k": [2, 3], "b": [20, 30]})
    # FULL: merged key is COALESCE(left, right) so both unmatched sides
    # keep their key
    assert s.sql(
        "SELECT k, a, b FROM f1 FULL JOIN f2 USING (k) ORDER BY k"
    ).to_pylist() == [(1, 1, None), (2, 2, 20), (3, None, 30)]
    # RIGHT: merged key comes from the right side
    assert s.sql(
        "SELECT k, b FROM f1 RIGHT JOIN f2 USING (k) ORDER BY k"
    ).to_pylist() == [(2, 20), (3, 30)]
    # multi-column USING
    assert s.sql(
        "SELECT * FROM (VALUES (1, 2, 10)) AS a(x, y, p) "
        "JOIN (VALUES (1, 2, 20)) AS b(x, y, q) USING (x, y)"
    ).to_pylist() == [(1, 2, 10, 20)]


def test_values_table():
    s = Session()
    assert s.sql(
        "SELECT a, b FROM (VALUES (1, 'x'), (2, 'y')) AS v(a, b) ORDER BY a"
    ).to_pylist() == [(1, "x"), (2, "y")]
    # standalone VALUES: PG column1.. names, ORDER BY ordinal
    assert s.sql("VALUES (1, 'one'), (2, 'two') ORDER BY 1 DESC"
                 ).to_pylist() == [(2, "two"), (1, "one")]
    # int/float mix coerces to float64 (PG numeric ladder)
    assert s.sql("SELECT * FROM (VALUES (1), (2.5)) AS v(x)"
                 ).to_pylist() == [(1.0,), (2.5,)]
    # NULLs type from the other rows
    assert s.sql(
        "SELECT * FROM (VALUES (1, NULL), (2, 'b')) AS v(a, b) ORDER BY a"
    ).to_pylist() == [(1, None), (2, "b")]
    # VALUES joins like any relation
    s.register_table("t", {"g": [1, 2], "v": [10, 20]})
    assert s.sql(
        "SELECT t.v, m.name FROM t JOIN (VALUES (1, 'one'), (2, 'two')) "
        "AS m(g, name) ON t.g = m.g ORDER BY t.v"
    ).to_pylist() == [(10, "one"), (20, "two")]
