"""STRING_TO_ARRAY / ARRAY_TO_STRING / ARRAY_LENGTH and scalar functions
over aggregate results (ROUND(AVG(x), 2)-class projections)."""

import pytest

from query_engine_tpu.engine.session import Session


@pytest.fixture()
def sess():
    s = Session()
    s.register_table("t", {"csv": ["a,b,c", "x", "", "a,b,c", None]})
    s.register_table("g", {"k": [1, 1, 2], "x": [5, 7, 9]})
    return s


def test_string_to_array_lengths(sess):
    out = sess.sql(
        "SELECT ARRAY_LENGTH(STRING_TO_ARRAY(csv, ',')) AS n FROM t"
    ).to_pydict()
    assert out["n"] == [3, 1, 0, 3, None]


def test_unnest_string_to_array(sess):
    out = sess.sql(
        "SELECT u.e FROM t, UNNEST(STRING_TO_ARRAY(t.csv, ',')) u(e) "
        "ORDER BY u.e"
    ).to_pylist()
    assert out == [("a",), ("a",), ("b",), ("b",), ("c",), ("c",), ("x",)]


def test_array_to_string_roundtrip(sess):
    out = sess.sql(
        "SELECT ARRAY_TO_STRING(STRING_TO_ARRAY(csv, ','), '-') AS j FROM t"
    ).to_pydict()
    assert out["j"] == ["a-b-c", "x", "", "a-b-c", None]


def test_array_to_string_over_array_agg(sess):
    out = sess.sql(
        "SELECT k, ARRAY_TO_STRING(ARRAY_AGG(x ORDER BY x DESC), '|') AS j "
        "FROM g GROUP BY k ORDER BY k"
    ).to_pylist()
    assert out == [(1, "7|5"), (2, "9")]


def test_scalar_fn_over_aggregate(sess):
    out = sess.sql(
        "SELECT k, ROUND(AVG(x), 1) AS a FROM g GROUP BY k ORDER BY k"
    ).to_pylist()
    assert out == [(1, 6.0), (2, 9.0)]


def test_case_over_aggregate(sess):
    out = sess.sql(
        "SELECT k, CASE WHEN SUM(x) > 10 THEN 'big' ELSE 'small' END AS c "
        "FROM g GROUP BY k ORDER BY k"
    ).to_pylist()
    assert out == [(1, "big"), (2, "small")]
