"""GENERATE_SERIES table function: int64 arithmetic series as a device
iota — the cheapest possible TPU relation (no reference analog; PG
set-returning function subset: constant integer arguments)."""

import pytest

from query_engine_tpu.core.errors import PlanError
from query_engine_tpu.engine.session import Session


@pytest.fixture(scope="module")
def sess():
    return Session()


def test_basic(sess):
    assert sess.sql("SELECT * FROM GENERATE_SERIES(1, 5)").to_pylist() == [
        (1,), (2,), (3,), (4,), (5,)
    ]


def test_step_and_alias(sess):
    out = sess.sql(
        "SELECT i FROM GENERATE_SERIES(0, 10, 5) AS g(i)"
    ).to_pylist()
    assert out == [(0,), (5,), (10,)]


def test_negative_step(sess):
    out = sess.sql("SELECT * FROM GENERATE_SERIES(5, 1, -2)").to_pylist()
    assert out == [(5,), (3,), (1,)]


def test_empty_when_step_points_away(sess):
    assert sess.sql("SELECT * FROM GENERATE_SERIES(3, 1)").to_pylist() == []
    assert sess.sql(
        "SELECT * FROM GENERATE_SERIES(1, 3, -1)"
    ).to_pylist() == []


def test_negative_bounds(sess):
    out = sess.sql("SELECT * FROM GENERATE_SERIES(-2, 1)").to_pylist()
    assert out == [(-2,), (-1,), (0,), (1,)]


def test_aggregate_over_series(sess):
    assert sess.sql(
        "SELECT SUM(i), COUNT(*) FROM GENERATE_SERIES(1, 100) g(i)"
    ).to_pylist() == [(5050, 100)]


def test_join_and_group(sess):
    out = sess.sql(
        "SELECT i % 3 AS m, COUNT(*) AS c FROM GENERATE_SERIES(1, 999) g(i) "
        "GROUP BY i % 3 ORDER BY m"
    ).to_pylist()
    assert out == [(0, 333), (1, 333), (2, 333)]


def test_series_in_subquery(sess):
    s = Session()
    s.register_table("x", {"a": [2, 4, 5]})
    out = s.sql(
        "SELECT a FROM x WHERE a IN "
        "(SELECT i FROM GENERATE_SERIES(0, 10, 4) g(i)) ORDER BY a"
    ).to_pylist()
    assert out == [(4,)]


def test_zero_step_rejected(sess):
    with pytest.raises(PlanError):
        sess.sql("SELECT * FROM GENERATE_SERIES(1, 5, 0)")


def test_non_constant_rejected(sess):
    s = Session()
    s.register_table("x", {"a": [1]})
    with pytest.raises(PlanError):
        s.sql("SELECT * FROM x, GENERATE_SERIES(1, a)")
