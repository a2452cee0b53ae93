"""Edge cases: empty tables, all-NULL columns, single rows — both executors
must agree and not crash (the compiled pipeline pads every table to >=128
capacity, so zero-row paths exercise all-dead selection masks)."""

import pytest

from query_engine_tpu.engine.session import Session

QUERIES = [
    "SELECT * FROM e",
    "SELECT COUNT(*), SUM(v), MIN(v) FROM e",
    "SELECT k, COUNT(*) FROM e GROUP BY k",
    "SELECT * FROM e WHERE k > 0 ORDER BY v LIMIT 5",
    "SELECT k, SUM(v) FROM nul GROUP BY k",
    "SELECT COUNT(k), COUNT(*) FROM nul",
    "SELECT DISTINCT k FROM nul",
    "SELECT one.k, e.v FROM one LEFT JOIN e ON one.k = e.k",
    "SELECT e.k FROM e JOIN one ON e.k = one.k",
    "SELECT k FROM nul ORDER BY k",
    "SELECT * FROM e UNION SELECT * FROM one",
    "SELECT k, ROW_NUMBER() OVER (ORDER BY v) FROM nul",
    "SELECT AVG(v) OVER (ORDER BY k) FROM e",
    "SELECT k FROM e INTERSECT SELECT k FROM one",
    "SELECT k FROM one EXCEPT SELECT k FROM e",
]


@pytest.fixture(scope="module")
def sess():
    s = Session()
    s.sql("CREATE TABLE e (k INT, v INT)")  # empty
    s.register_table("nul", {"k": [None, None, None], "v": [None, 1, None]})
    s.register_table("one", {"k": [5], "v": [10]})
    return s


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: q[:48])
def test_edge_compiled_matches_eager(sess, q):
    sess.executor._compiled = True
    a = sess.sql(q).to_pylist()
    sess.executor._compiled = False
    try:
        b = sess.sql(q).to_pylist()
    finally:
        sess.executor._compiled = True
    assert a == b, q


def test_fused_filter_cache_keys_on_column_indices():
    """Regression: the eager fused-filter cache keyed on expression NAMES;
    after projection pruning remapped the same column name to different
    indices in two queries, the second reused the first's program and
    filtered the wrong column."""
    from query_engine_tpu.engine.session import Session

    for compiled in (False, True):
        s = Session()
        s.register_table("t", {
            "id": list(range(100)),
            "k": [i % 7 for i in range(100)],
            "v": [i * 3 % 11 for i in range(100)],
        })
        s.executor._compiled = compiled
        # query 1 prunes the scan to [k, v]: k lands at index 0
        s.sql("SELECT k, v FROM t WHERE k < 3 UNION ALL "
              "SELECT k, v FROM t WHERE v = 1")
        # query 2 prunes to [id, k]: k lands at index 1 — same predicate name
        out = s.sql("SELECT id FROM t WHERE k < 3 ORDER BY id").to_pylist()
        want = [(i,) for i in range(100) if i % 7 < 3]
        assert out == want, ("compiled" if compiled else "eager", out[:5])


@pytest.mark.slow
def test_dml_interleaved_with_cached_programs():
    """Stats (bounds, key multiplicity) and compiled programs are cached per
    table version; DML must invalidate them. Interleave INSERT/UPDATE/DELETE
    with repeated queries in both modes and compare."""
    from query_engine_tpu.engine.session import Session

    def fresh(compiled):
        s = Session()
        s.sql("CREATE TABLE t (k INT, v INT)")
        s.sql("CREATE TABLE d (k INT, w INT)")
        s.sql("INSERT INTO d VALUES (1, 100), (2, 200), (3, 300)")
        s.executor._compiled = compiled
        return s

    a, b = fresh(True), fresh(False)
    Q = [
        "SELECT k, COUNT(*), SUM(v) FROM t GROUP BY k ORDER BY k",
        "SELECT t.v, d.w FROM t JOIN d ON t.k = d.k ORDER BY t.v",
        "SELECT MIN(v), MAX(v) FROM t",
    ]
    steps = [
        "INSERT INTO t VALUES (1, 10), (2, 20), (1, 30)",
        "INSERT INTO t VALUES (3, 40), (9, 50)",   # widens k bounds
        "UPDATE t SET v = v + 1 WHERE k = 1",
        "DELETE FROM t WHERE k = 9",
        "INSERT INTO t VALUES (2, 60), (2, 70), (2, 80)",  # raises k dup
        "INSERT INTO d VALUES (1, 101)",  # d.k no longer unique
    ]
    for step in steps:
        a.sql(step)
        b.sql(step)
        for q in Q:
            assert a.sql(q).to_pylist() == b.sql(q).to_pylist(), (step, q)
