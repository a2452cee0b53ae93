"""Decimal128 arithmetic (scaled-int64 lanes with PG-style scale rules):
add/sub/mod keep max scale, mul adds scales, div and float operands go to
float64; SUM keeps the scale, AVG descales; comparisons align scales."""

import pytest

from query_engine_tpu.engine.session import Session


@pytest.fixture()
def sess():
    s = Session()
    s.sql("CREATE TABLE p (name TEXT, price DECIMAL(10, 2), qty INT)")
    s.sql(
        "INSERT INTO p VALUES ('a', 19.99, 3), ('b', 5.50, 2), "
        "('c', 0.01, 100), ('d', NULL, 1)"
    )
    return s


def test_decimal_storage_roundtrip(sess):
    assert sess.sql("SELECT price FROM p ORDER BY name").to_pylist() == [
        (19.99,), (5.5,), (0.01,), (None,),
    ]


def test_decimal_int_mul(sess):
    out = sess.sql("SELECT name, price * qty FROM p ORDER BY name").to_pylist()
    assert out == [("a", 59.97), ("b", 11.0), ("c", 1.0), ("d", None)]


def test_decimal_decimal_arith(sess):
    out = sess.sql(
        "SELECT price + price, price * price, price - 0.01 FROM p "
        "WHERE name = 'a'"
    ).to_pylist()
    add, mul, sub = out[0]
    assert add == 39.98            # scale 2 exact
    assert mul == 399.6001         # scale 4 exact
    assert sub == pytest.approx(19.98)


def test_decimal_aggregates(sess):
    out = sess.sql(
        "SELECT SUM(price), AVG(price), MIN(price), MAX(price), COUNT(price) "
        "FROM p"
    ).to_pylist()[0]
    assert out[0] == 25.5          # exact scaled-int sum
    assert out[1] == pytest.approx(25.5 / 3)
    assert out[2] == 0.01
    assert out[3] == 19.99
    assert out[4] == 3


def test_decimal_comparison_aligns_scale(sess):
    # 5.50 > 5.5 must be FALSE (scale alignment, not raw scaled-int compare)
    assert sess.sql(
        "SELECT name FROM p WHERE price > 5.5 ORDER BY name"
    ).to_pylist() == [("a",)]
    assert sess.sql(
        "SELECT name FROM p WHERE price = 5.5"
    ).to_pylist() == [("b",)]
    assert sess.sql(
        "SELECT name FROM p WHERE price >= 1"  # int literal vs decimal
    ).to_pylist() == [("a",), ("b",)]


def test_decimal_division(sess):
    out = sess.sql(
        "SELECT price / 2, price / qty FROM p WHERE name = 'b'"
    ).to_pylist()[0]
    assert out == (pytest.approx(2.75), pytest.approx(2.75))


def test_decimal_casts(sess):
    out = sess.sql(
        "SELECT CAST(price AS DOUBLE), CAST(price AS INT), "
        "CAST(qty AS DECIMAL(8, 3)) FROM p WHERE name = 'a'"
    ).to_pylist()[0]
    assert out[0] == pytest.approx(19.99)
    assert out[1] == 20            # rounds half away from zero
    assert out[2] == 3.0


def test_decimal_round_and_group(sess):
    assert sess.sql(
        "SELECT ROUND(price) FROM p WHERE name = 'b'"
    ).to_pylist() == [(6.0,)]
    out = sess.sql(
        "SELECT price, COUNT(*) FROM p GROUP BY price ORDER BY price"
    ).to_pylist()
    assert out == [(0.01, 1), (5.5, 1), (19.99, 1), (None, 1)]


def test_decimal_compiled_matches_eager(sess):
    q = ("SELECT name, price * qty AS total FROM p "
         "WHERE price > 1 ORDER BY total DESC")
    fast = sess.sql(q).to_pylist()
    sess.executor._compiled = False
    assert sess.sql(q).to_pylist() == fast
