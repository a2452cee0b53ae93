"""CREATE TABLE AS SELECT: materialize a query result as a new table."""

import pytest

from query_engine_tpu.core.errors import ExecutionError
from query_engine_tpu.engine.session import Session


@pytest.fixture()
def sess():
    s = Session()
    s.register_table("src", {
        "k": [1, 1, 2, 2], "x": [10, 20, 30, 40],
        "nm": ["a", "b", "c", "d"],
    })
    return s


def test_ctas_aggregate(sess):
    sess.sql("CREATE TABLE t2 AS SELECT k, SUM(x) AS total FROM src GROUP BY k")
    assert sess.sql("SELECT * FROM t2 ORDER BY k").to_pylist() == [
        (1, 30), (2, 70)
    ]


def test_ctas_result_is_a_real_table(sess):
    sess.sql("CREATE TABLE t2 AS SELECT k, x FROM src")
    sess.sql("INSERT INTO t2 VALUES (9, 99)")
    sess.sql("UPDATE t2 SET x = 0 WHERE k = 9")
    assert sess.sql(
        "SELECT x FROM t2 WHERE k = 9"
    ).to_pylist() == [(0,)]


def test_ctas_with_body_and_strings(sess):
    sess.sql(
        "CREATE TABLE t3 AS WITH f AS (SELECT nm FROM src WHERE nm != 'a') "
        "SELECT nm FROM f"
    )
    assert sess.sql("SELECT nm FROM t3 ORDER BY nm").to_pydict()["nm"] == \
        ["b", "c", "d"]


def test_ctas_duplicate(sess):
    sess.sql("CREATE TABLE t2 AS SELECT 1 AS a")
    sess.sql("CREATE TABLE IF NOT EXISTS t2 AS SELECT 2 AS a")  # no-op
    assert sess.sql("SELECT a FROM t2").to_pylist() == [(1,)]
    with pytest.raises(ExecutionError):
        sess.sql("CREATE TABLE t2 AS SELECT 3 AS a")


def test_truncate(sess):
    sess.sql("CREATE TABLE tt (a INT)")
    sess.sql("INSERT INTO tt VALUES (1), (2)")
    sess.sql("TRUNCATE TABLE tt")
    assert sess.sql("SELECT COUNT(*) FROM tt").to_pylist() == [(0,)]
    sess.sql("INSERT INTO tt VALUES (9)")  # still usable after truncate
    assert sess.sql("SELECT a FROM tt").to_pylist() == [(9,)]
