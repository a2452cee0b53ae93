"""Named WINDOW clause: WINDOW w AS (spec), referenced as OVER w.

PG feature the reference's parser lacks entirely. The clause appears
after HAVING, so `OVER name` references parse first and are patched at
the end of the SELECT; sharing one name across several functions also
exercises the shared-sort machinery (specs are the SAME object)."""

import pytest

from query_engine_tpu.core.errors import ParseError
from query_engine_tpu.engine.session import Session


@pytest.fixture(scope="module")
def sess():
    s = Session()
    s.register_table("t", {
        "k": [1, 1, 1, 2, 2, 2],
        "x": [10, 30, 20, 60, 40, 50],
    })
    return s


def test_single_named_window(sess):
    out = sess.sql(
        "SELECT k, x, SUM(x) OVER w AS s, ROW_NUMBER() OVER w AS rn "
        "FROM t WINDOW w AS (PARTITION BY k ORDER BY x) ORDER BY k, x"
    ).to_pylist()
    assert out == [
        (1, 10, 10, 1), (1, 20, 30, 2), (1, 30, 60, 3),
        (2, 40, 40, 1), (2, 50, 90, 2), (2, 60, 150, 3),
    ]


def test_multiple_named_windows(sess):
    out = sess.sql(
        "SELECT x, RANK() OVER w1 AS r, COUNT(*) OVER w2 AS c FROM t "
        "WINDOW w1 AS (ORDER BY x DESC), w2 AS (PARTITION BY k) "
        "ORDER BY x LIMIT 2"
    ).to_pylist()
    assert out == [(10, 6, 3), (20, 5, 3)]


def test_named_window_with_frame(sess):
    out = sess.sql(
        "SELECT x, SUM(x) OVER w AS s FROM t "
        "WINDOW w AS (ORDER BY x ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) "
        "ORDER BY x"
    ).to_pylist()
    assert out == [(10, 10), (20, 30), (30, 50), (40, 70), (50, 90),
                   (60, 110)]


def test_named_window_in_order_by_resolves(sess):
    # windows in ORDER BY are not planned (pre-existing limit, same as the
    # inline form) — but the NAMED reference must resolve first and reach
    # the planner's error, not die as "window not defined"
    from query_engine_tpu.core.errors import PlanError

    with pytest.raises(PlanError, match="window function"):
        sess.sql(
            "SELECT x FROM t WINDOW w AS (ORDER BY x) "
            "ORDER BY ROW_NUMBER() OVER w DESC LIMIT 2"
        )


def test_undefined_window_rejected(sess):
    with pytest.raises(ParseError):
        sess.sql("SELECT SUM(x) OVER nope FROM t")


def test_compiled_matches_eager():
    data = {"k": [1, 1, 2, 2], "x": [10, 20, 30, 40]}
    q = ("SELECT k, x, AVG(x) OVER w AS a, LAG(x) OVER w AS l FROM t "
         "WINDOW w AS (PARTITION BY k ORDER BY x) ORDER BY k, x")
    outs = []
    for compiled in (True, False):
        s = Session()
        s.register_table("t", data)
        s.executor._compiled = compiled
        outs.append(s.sql(q).to_pylist())
    assert outs[0] == outs[1]
