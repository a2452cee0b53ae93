"""INSERT INTO ... SELECT (incl. WITH bodies, column lists, ON CONFLICT)."""

import pytest

from query_engine_tpu.core.errors import ExecutionError
from query_engine_tpu.engine.session import Session


@pytest.fixture()
def sess():
    s = Session()
    s.register_table("src", {
        "k": [1, 2, 3, 4], "x": [10.5, 20.5, 30.5, 40.5],
        "nm": ["a", "b", "c", "d"],
    })
    s.sql("CREATE TABLE dst (k INT, x DOUBLE PRECISION, nm TEXT)")
    return s


def test_basic(sess):
    out = sess.sql("INSERT INTO dst SELECT k, x, nm FROM src WHERE k > 1")
    assert out.to_pylist() == [("INSERT 0 3",)]
    assert sess.sql("SELECT k FROM dst ORDER BY k").to_pydict()["k"] == \
        [2, 3, 4]


def test_expressions_and_column_list(sess):
    sess.sql(
        "INSERT INTO dst (k, x, nm) "
        "SELECT k * 10, x, UPPER(nm) FROM src WHERE k = 1"
    )
    assert sess.sql(
        "SELECT k, nm FROM dst ORDER BY k"
    ).to_pylist() == [(10, "A")]


def test_with_body(sess):
    sess.sql("CREATE TABLE agg (g INT, total DOUBLE PRECISION)")
    sess.sql(
        "INSERT INTO agg WITH t AS (SELECT k % 2 AS g, x FROM src) "
        "SELECT g, SUM(x) FROM t GROUP BY g"
    )
    assert sess.sql("SELECT * FROM agg ORDER BY g").to_pylist() == [
        (0, 61.0), (1, 41.0)
    ]


def test_on_conflict_from_select(sess):
    sess.sql("CREATE TABLE u (k INT, v INT)")
    sess.sql("INSERT INTO u VALUES (2, 0), (9, 9)")
    sess.sql(
        "INSERT INTO u SELECT k, k FROM src "
        "ON CONFLICT (k) DO UPDATE SET v = 100"
    )
    assert sess.sql("SELECT * FROM u ORDER BY k").to_pylist() == [
        (1, 1), (2, 100), (3, 3), (4, 4), (9, 9)
    ]


def test_column_count_mismatch(sess):
    with pytest.raises(ExecutionError):
        sess.sql("INSERT INTO dst SELECT k FROM src")
