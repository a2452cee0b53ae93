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
