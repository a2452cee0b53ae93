"""Differential tests: compiled pipelines (engine/pipeline.py) vs the eager
executor on the same queries — the eager path is the semantics oracle
(itself golden-tested in test_e2e_queries.py against hand-computed results).

Every query runs twice on identical sessions — once with the compiled
pipeline enabled (the default) and once with it disabled — and must produce
identical rows, schema names, and dtypes. Also asserts the compiled path
actually engaged (compiles/hits > 0) where expected, so a silently-broken
fast path can't pass as a fallback.
"""

import os

import pytest

from query_engine_tpu.engine.session import Session

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)

NULLS = {
    "k": [1, 2, None, 2, 1, None, 3],
    "v": [10.5, None, 3.0, 4.5, None, 6.0, 7.25],
    "s": ["a", "b", None, "b", "a", "c", None],
}

QUERIES = [
    # filter + project (+ scalar exprs)
    "SELECT name, age FROM employees WHERE age > 25",
    "SELECT name, salary * 2, salary / 1000 FROM employees WHERE id = 1",
    "SELECT name FROM employees WHERE age > 25 AND salary < 90000 OR id = 1",
    "SELECT UPPER(name), LENGTH(name) FROM employees WHERE name LIKE '%a%'",
    "SELECT name, CASE WHEN age > 30 THEN 'old' ELSE 'young' END FROM employees",
    "SELECT name FROM employees WHERE dept_id IS NULL",
    "SELECT name FROM employees WHERE dept_id IN (101, 103)",
    # sort / limit / offset
    "SELECT name, salary FROM employees ORDER BY salary DESC",
    "SELECT name FROM employees ORDER BY age LIMIT 3 OFFSET 1",
    "SELECT name FROM employees WHERE age > 25 ORDER BY dept_id, salary DESC",
    "SELECT name FROM employees LIMIT 2",
    # aggregates: global, grouped (int + string keys), HAVING, DISTINCT
    "SELECT COUNT(*), SUM(salary), AVG(age), MIN(age), MAX(age) FROM employees",
    "SELECT dept_id, COUNT(*), SUM(salary), AVG(salary) FROM employees "
    "GROUP BY dept_id ORDER BY dept_id",
    "SELECT dept_id, MIN(name), MAX(salary) FROM employees "
    "GROUP BY dept_id ORDER BY dept_id",
    "SELECT dept_id, COUNT(*) AS c FROM employees GROUP BY dept_id "
    "HAVING COUNT(*) > 1 ORDER BY c DESC, dept_id",
    "SELECT dept_name, COUNT(*) FROM departments GROUP BY dept_name "
    "ORDER BY dept_name",
    "SELECT dept_id, COUNT(DISTINCT age) FROM employees GROUP BY dept_id "
    "ORDER BY dept_id",
    "SELECT age % 3 AS bucket, COUNT(*) FROM employees GROUP BY age % 3 "
    "ORDER BY bucket",
    "SELECT age % 3, COUNT(*) FROM employees GROUP BY age % 3 ORDER BY 1",
    # DISTINCT
    "SELECT DISTINCT dept_id FROM employees ORDER BY dept_id",
    # windows
    "SELECT name, ROW_NUMBER() OVER (PARTITION BY dept_id ORDER BY salary DESC)"
    " AS rn FROM employees ORDER BY name",
    "SELECT name, RANK() OVER (ORDER BY salary DESC) AS rk,"
    " DENSE_RANK() OVER (ORDER BY salary DESC) AS dr FROM employees",
    "SELECT name, LAG(salary, 1) OVER (ORDER BY salary) AS prev,"
    " LEAD(salary, 1) OVER (ORDER BY salary) AS nxt FROM employees",
    # join below a compiled segment (join runs eagerly, fed in as a leaf)
    "SELECT employees.name, departments.dept_name FROM employees "
    "JOIN departments ON employees.dept_id = departments.dept_id "
    "WHERE employees.age > 25 ORDER BY employees.name",
    "SELECT departments.dept_name, COUNT(*) FROM employees "
    "JOIN departments ON employees.dept_id = departments.dept_id "
    "GROUP BY departments.dept_name ORDER BY departments.dept_name",
    # joins with a statically unique side compile in-segment (dept_id is
    # unique in departments); outer joins null-pad in-trace
    "SELECT employees.name, departments.dept_name FROM employees "
    "LEFT JOIN departments ON employees.dept_id = departments.dept_id "
    "ORDER BY employees.id",
    "SELECT employees.name, departments.dept_name FROM employees "
    "RIGHT JOIN departments ON employees.dept_id = departments.dept_id "
    "ORDER BY departments.dept_id, employees.id",
    "SELECT employees.name, departments.dept_name FROM employees "
    "FULL JOIN departments ON employees.dept_id = departments.dept_id "
    "ORDER BY employees.id, departments.dept_id",
    "SELECT departments.dept_name, SUM(employees.salary) AS s FROM employees "
    "JOIN departments ON employees.dept_id = departments.dept_id "
    "WHERE employees.age > 25 GROUP BY departments.dept_name ORDER BY s DESC",
    # mirrored FK fast path: the UNIQUE side is the LEFT table (dim JOIN
    # fact); INNER/RIGHT output rows sit at right (fact) positions
    "SELECT departments.dept_name, employees.name FROM departments "
    "JOIN employees ON departments.dept_id = employees.dept_id "
    "ORDER BY employees.id",
    "SELECT departments.dept_name, employees.name FROM departments "
    "RIGHT JOIN employees ON departments.dept_id = employees.dept_id "
    "ORDER BY employees.id",
    "SELECT departments.dept_name, SUM(employees.salary) AS s "
    "FROM departments JOIN employees "
    "ON departments.dept_id = employees.dept_id "
    "WHERE employees.age > 25 GROUP BY departments.dept_name ORDER BY s DESC",
    # self-join on a non-unique key: demoted to an eager leaf, segment above
    # still compiles
    "SELECT a.name, b.name FROM employees a JOIN employees b "
    "ON a.dept_id = b.dept_id WHERE a.id < b.id ORDER BY a.id, b.id",
    # subquery predicates fall back per-subtree
    "SELECT name FROM employees WHERE salary > "
    "(SELECT AVG(salary) FROM employees)",
    # set ops trace in-segment (UNION concat; INTERSECT/EXCEPT mask-based)
    "SELECT name FROM employees WHERE age > 30 UNION "
    "SELECT name FROM employees WHERE dept_id = 101 ORDER BY name",
    "SELECT name FROM employees WHERE age > 27 UNION ALL "
    "SELECT name FROM employees WHERE salary > 80000 ORDER BY name",
    "SELECT dept_id FROM employees INTERSECT SELECT dept_id FROM departments "
    "ORDER BY dept_id",
    "SELECT dept_id FROM departments EXCEPT SELECT dept_id FROM employees",
    # multi-key join with a unique composite build side (id, dept_id)
    "SELECT a.name, b.salary FROM employees a JOIN employees b "
    "ON a.id = b.id AND a.dept_id = b.dept_id ORDER BY a.id",
    # null semantics on a table with NULL keys and values
    ("nulls", "SELECT k, COUNT(*), SUM(v), AVG(v), MIN(v), MAX(v) FROM nv "
              "GROUP BY k ORDER BY k"),
    ("nulls", "SELECT DISTINCT k FROM nv ORDER BY k"),
    ("nulls", "SELECT s, COUNT(v) FROM nv GROUP BY s ORDER BY s"),
    ("nulls", "SELECT k, v FROM nv WHERE v IS NOT NULL ORDER BY v DESC LIMIT 3"),
    ("nulls", "SELECT k FROM nv ORDER BY k"),
]


def make_session(compiled: bool) -> Session:
    s = Session()
    s.register_csv("employees", os.path.join(DATA, "employees.csv"))
    s.register_csv("departments", os.path.join(DATA, "departments.csv"))
    s.register_table("nv", dict(NULLS))
    s.executor._compiled = compiled
    return s


@pytest.fixture(scope="module")
def sessions():
    return make_session(True), make_session(False)


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: (q[1] if isinstance(q, tuple) else q)[:64])
def test_compiled_matches_eager(sessions, q):
    if isinstance(q, tuple):
        q = q[1]
    fast, slow = sessions
    a = fast.sql(q)
    b = slow.sql(q)
    assert a.schema.names() == b.schema.names()
    assert a.to_pylist() == b.to_pylist()


def test_pipeline_engages(sessions):
    fast, _ = sessions
    stats = fast.executor.pipeline.stats
    # the battery above must actually exercise the compiled path
    assert stats["compiles"] >= 10, stats


def test_pipeline_cache_reuse():
    s = make_session(True)
    s.sql("SELECT name FROM employees WHERE age > 25")
    c0 = dict(s.executor.pipeline.stats)
    out = s.sql("SELECT name FROM employees WHERE age > 25")
    c1 = s.executor.pipeline.stats
    assert c1["compiles"] == c0["compiles"]
    assert c1["hits"] == c0["hits"] + 1
    assert out.to_pylist() == [
        ("Bob",), ("Charlie",), ("Diana",), ("Eve",), ("Frank",),
    ]


def test_pipeline_after_dml():
    """Compiled programs must see updated table contents (num_rows is a
    traced argument; appends within the same capacity bucket reuse the
    executable)."""
    s = make_session(True)
    s.sql("CREATE TABLE t (x INT, y INT)")
    s.sql("INSERT INTO t VALUES (1, 10), (2, 20), (3, 30)")
    assert s.sql("SELECT x FROM t WHERE y >= 20 ORDER BY x DESC").to_pylist() \
        == [(3,), (2,)]
    s.sql("INSERT INTO t VALUES (4, 40)")
    assert s.sql("SELECT x FROM t WHERE y >= 20 ORDER BY x DESC").to_pylist() \
        == [(4,), (3,), (2,)]


@pytest.mark.slow
def test_bounded_dup_join_emit_capacity():
    """Joins with a bounded-duplication (non-unique) side compile with a
    static emit capacity; covers the bounded-LEFT outer-join bound where
    the right side is larger than the left."""
    s = make_session(True)
    # left: small, k duplicated twice; right: bigger, k heavily duplicated
    s.register_table("lt", {
        "k": [1, 1, 2, 2, 3], "a": [10, 11, 20, 21, 30],
    })
    s.register_table("rt", {
        "k": [1, 2, 2, 9] * 60,  # dup 180 on k=2 -> right side unboundable
        "b": list(range(240)),
    })
    e = make_session(False)
    e.register_table("lt", {
        "k": [1, 1, 2, 2, 3], "a": [10, 11, 20, 21, 30],
    })
    e.register_table("rt", {
        "k": [1, 2, 2, 9] * 60, "b": list(range(240)),
    })
    for q in [
        "SELECT lt.a, rt.b FROM rt JOIN lt ON rt.k = lt.k ORDER BY rt.b, lt.a",
        "SELECT lt.a, rt.b FROM lt RIGHT JOIN rt ON lt.k = rt.k "
        "ORDER BY rt.b, lt.a",
        "SELECT lt.a, rt.b FROM rt LEFT JOIN lt ON rt.k = lt.k "
        "ORDER BY rt.b, lt.a",
        "SELECT lt.a, rt.b FROM lt FULL JOIN rt ON lt.k = rt.k "
        "ORDER BY lt.a, rt.b",
    ]:
        assert s.sql(q).to_pylist() == e.sql(q).to_pylist(), q
    assert s.executor.pipeline.stats["compiles"] >= 3


@pytest.mark.slow
def test_counted_join_reuses_count_programs_sort():
    """The emit program of a count->emit join consumes the count program's
    sorted space (sperm/lead/change planes handed across dispatches) and
    skips its own joint sort. Huge-range keys defeat both direct ranks and
    duplication bounds, forcing the sorted count path."""
    big = 10**15
    # both sides heavily duplicated -> no static dup bound on either side
    lt = {"k": [big + 1, big + 1, big + 2, big + 2, big + 3] * 40,
          "a": list(range(200))}
    rt = {"k": [big + 1, big + 2, big + 2, big + 9] * 60,
          "b": list(range(240))}
    s = make_session(True)
    s.register_table("lt", dict(lt))
    s.register_table("rt", dict(rt))
    e = make_session(False)
    e.register_table("lt", dict(lt))
    e.register_table("rt", dict(rt))
    for q in [
        "SELECT lt.a, rt.b FROM rt JOIN lt ON rt.k = lt.k ORDER BY rt.b, lt.a",
        "SELECT lt.a, rt.b FROM lt FULL JOIN rt ON lt.k = rt.k "
        "ORDER BY lt.a, rt.b",
    ]:
        assert s.sql(q).to_pylist() == e.sql(q).to_pylist(), q
        # steady state: count + emit stay 2 cached dispatches
        assert s.sql(q).to_pylist() == e.sql(q).to_pylist(), q
    st = s.executor.pipeline.stats
    assert st["joins_counted"] >= 2, st
    assert st.get("join_sorts_reused", 0) >= 2, st


def test_parameterized_program_reuse():
    """Eligible numeric literals are traced inputs: one compiled program
    serves every parameter value (no recompile per constant)."""
    s = make_session(True)
    c0 = dict(s.executor.pipeline.stats)
    outs = [
        s.sql(f"SELECT name FROM employees WHERE age > {a} ORDER BY name")
        for a in (25, 28, 30)
    ]
    c1 = s.executor.pipeline.stats
    assert c1["compiles"] == c0["compiles"] + 1
    assert c1["hits"] == c0["hits"] + 2
    assert outs[2].to_pylist() == [("Charlie",), ("Eve",)]
    # bound parameters ride the same mechanism
    a = s.sql("SELECT name FROM employees WHERE salary > $1", params=[80000])
    b = s.sql("SELECT name FROM employees WHERE salary > $1", params=[90000])
    assert a.to_pylist() == [("Bob",), ("Charlie",), ("Eve",)]
    assert b.to_pylist() == [("Charlie",)]
    # static-consumer literals (SUBSTRING offsets) stay baked and correct
    out = s.sql("SELECT SUBSTRING(name, 1, 3) FROM employees WHERE id = 1")
    assert out.to_pylist() == [("Ali",)]


def test_joins_compile_in_segment_not_silently_demoted():
    """Regression: device-resident tables once lost their duplication stats
    and every join silently demoted to the eager path while the query still
    returned correct rows. Assert the FK join actually traces in-segment."""
    s = make_session(True)
    q = ("SELECT departments.dept_name, COUNT(*) FROM employees "
         "JOIN departments ON employees.dept_id = departments.dept_id "
         "GROUP BY departments.dept_name ORDER BY departments.dept_name")
    s.sql(q)
    st = s.executor.pipeline.stats
    assert st["joins_inlined"] >= 1, st
    assert st["joins_demoted"] == 0, st


@pytest.mark.slow
def test_group_space_count_emit_for_unbounded_keys():
    """Aggregates on computed/float group keys (no static range) run a
    group-space count->emit: a cached COUNT program returns ng, the emit
    program aggregates at padded(ng) instead of row capacity."""
    import numpy as np

    from query_engine_tpu.engine.session import Session

    rng = np.random.default_rng(31)
    n = 4000
    data = {
        "a": rng.integers(0, 1000, n).tolist(),
        "f": rng.normal(0, 1, n).round(2).tolist(),
        "v": rng.integers(1, 50, n).tolist(),
    }
    s = Session()
    s.register_table("t", data)
    # computed integer key: expressions drop bounds -> count sync
    sql = ("SELECT a % 13 + a % 7 AS g, SUM(v) AS s, COUNT(*) AS c "
           "FROM t GROUP BY a % 13 + a % 7 ORDER BY g")
    before = s.executor.pipeline.stats["joins_counted"]
    r1 = s.sql(sql).to_pylist()
    assert s.executor.pipeline.stats["joins_counted"] > before, (
        "group-space count sync did not engage"
    )
    # float key: same machinery
    sqlf = ("SELECT f, COUNT(*) AS c FROM t GROUP BY f "
            "ORDER BY f LIMIT 20")
    rf1 = s.sql(sqlf).to_pylist()

    s2 = Session()
    s2.register_table("t", data)
    s2.executor._compiled = False
    assert s2.sql(sql).to_pylist() == r1
    assert s2.sql(sqlf).to_pylist() == rf1

    # steady state: same query again = cache hits, no new compiles
    c0 = s.executor.pipeline.stats["compiles"]
    assert s.sql(sql).to_pylist() == r1
    assert s.executor.pipeline.stats["compiles"] == c0
    # the emit program reuses the count program's grouping (no re-sort)
    assert s.executor.pipeline.stats.get("group_sorts_reused", 0) >= 1
