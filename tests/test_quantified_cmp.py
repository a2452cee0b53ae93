"""Quantified subquery comparisons: expr op ANY|SOME|ALL (subquery).

=ANY / <>ALL route to the rank-membership IN machinery; the ordered forms
reduce to MIN/MAX of the subquery column + PG 3-valued logic
(plan/logical.py QuantifiedCmpExpr, expr_eval._eval_quantified_cmp). The
reference parser rejects all subquery expressions (operators.rs:34-52).
"""

import pytest

from query_engine_tpu.engine.session import Session


@pytest.fixture()
def sess():
    s = Session()
    s.register_table("t", {"id": [1, 2, 3, 4, 5],
                           "x": [1.0, 5.0, 10.0, None, 7.0]})
    s.register_table("u", {"y": [5.0, 6.0], "g": [1, 2]})
    s.register_table("n", {"y": [5.0, None]})
    return s


def test_ordered_any_all(sess):
    rows = sess.sql(
        "SELECT id, x > ANY (SELECT y FROM u), x > ALL (SELECT y FROM u), "
        "x < SOME (SELECT y FROM u), x <= ALL (SELECT y FROM u) "
        "FROM t ORDER BY id"
    ).to_pylist()
    assert rows == [
        (1, False, False, True, True),    # 1: < both
        (2, False, False, True, True),    # 5: not > min, <= min
        (3, True, True, False, False),    # 10: > max
        (4, None, None, None, None),      # NULL x, non-empty S
        (5, True, True, False, False),    # 7: > max
    ]


def test_eq_neq_quantified(sess):
    rows = sess.sql(
        "SELECT id, x = ANY (SELECT y FROM u), x <> ALL (SELECT y FROM u), "
        "x = ALL (SELECT y FROM u WHERE g = 1), "
        "x <> ANY (SELECT y FROM u) FROM t ORDER BY id"
    ).to_pylist()
    assert rows == [
        (1, False, True, False, True),
        (2, True, False, True, True),   # 5 in S; = ALL over {5}; exists y<>5
        (3, False, True, False, True),
        (4, None, None, None, None),
        (5, False, True, False, True),
    ]


def test_empty_subquery(sess):
    # PG: ANY over empty is FALSE, ALL over empty is TRUE — even for NULL x
    rows = sess.sql(
        "SELECT id, x > ANY (SELECT y FROM u WHERE g = 0), "
        "x > ALL (SELECT y FROM u WHERE g = 0) FROM t ORDER BY id"
    ).to_pylist()
    assert all(r[1] is False and r[2] is True for r in rows)


def test_null_in_subquery(sess):
    rows = sess.sql(
        "SELECT id, x > ANY (SELECT y FROM n), x > ALL (SELECT y FROM n) "
        "FROM t ORDER BY id"
    ).to_pylist()
    # ANY: definite TRUE when x > 5; else NULL (a NULL y could match)
    # ALL: definite FALSE when x <= 5; else NULL
    assert rows == [(1, None, False), (2, None, False), (3, True, None),
                    (4, None, None), (5, True, None)]


def test_all_null_subquery(sess):
    sess.register_table("an", {"y": [None, None]})
    rows = sess.sql(
        "SELECT id, x > ANY (SELECT y FROM an), x > ALL (SELECT y FROM an) "
        "FROM t WHERE id IN (1, 4) ORDER BY id"
    ).to_pylist()
    assert rows == [(1, None, None), (4, None, None)]


def test_strings_and_where_position(sess):
    sess.register_table("sv", {"w": ["b", "d"]})
    sess.register_table("st", {"c": ["a", "c", "e"]})
    rows = sess.sql(
        "SELECT c FROM st WHERE c > ALL (SELECT w FROM sv) ORDER BY c"
    ).to_pylist()
    assert rows == [("e",)]
    rows = sess.sql(
        "SELECT c, c >= ANY (SELECT w FROM sv) FROM st ORDER BY c"
    ).to_pylist()
    assert rows == [("a", False), ("c", True), ("e", True)]


def test_quantified_errors(sess):
    with pytest.raises(Exception, match="one column"):
        sess.sql("SELECT x > ANY (SELECT y, g FROM u) FROM t")


# ---- IS [NOT] DISTINCT FROM + statement-time constants ---------------------

def test_is_distinct_from():
    s = Session()
    s.register_table("e", {"a": [1, None, 3, None], "b": [1, None, 4, 7]})
    rows = s.sql(
        "SELECT a IS DISTINCT FROM b, a IS NOT DISTINCT FROM b FROM e"
    ).to_pylist()
    # never NULL: null-safe comparison
    assert rows == [(False, True), (False, True), (True, False),
                    (True, False)]
    assert s.sql(
        "SELECT a, b FROM e WHERE a IS DISTINCT FROM b"
    ).to_pylist() == [(3, 4), (None, 7)]


def test_cast_string_to_temporal_and_now():
    import datetime

    s = Session()
    s.register_table("e", {"a": [1]})
    (d, ts) = s.sql(
        "SELECT CAST('1995-01-02' AS DATE), "
        "CAST('1995-01-02 03:04:05' AS TIMESTAMP) FROM e"
    ).to_pylist()[0]
    assert d == datetime.date(1995, 1, 2)
    assert ts == datetime.datetime(1995, 1, 2, 3, 4, 5)
    # malformed strings -> NULL, not an error
    assert s.sql(
        "SELECT CAST('not-a-date' AS DATE) FROM e"
    ).to_pylist() == [(None,)]
    (cd, cts, nw) = s.sql(
        "SELECT CURRENT_DATE, CURRENT_TIMESTAMP, NOW() FROM e"
    ).to_pylist()[0]
    today = datetime.datetime.now(datetime.timezone.utc).date()
    assert abs((cd - today).days) <= 1
    assert isinstance(cts, datetime.datetime) and isinstance(nw, datetime.datetime)
    # usable in predicates against date columns
    s.register_table("d", {"when_": ["2020-01-01", "2099-01-01"]})
    assert s.sql(
        "SELECT COUNT(*) FROM d WHERE CAST(when_ AS DATE) < CURRENT_DATE"
    ).to_pylist() == [(1,)]
