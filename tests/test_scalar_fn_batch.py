"""Math + string scalar-function batch and BOOL_AND/BOOL_OR aggregates.

The reference implements 15 scalar functions (operators.rs:64-319); this
batch extends the surface toward PG: EXP/LN/LOG/LOG10/SIGN/MOD/PI/trig/
ATAN2/DEGREES/RADIANS/TRUNC/GREATEST/LEAST (device-vectorized) and LEFT/
RIGHT/LPAD/RPAD/REVERSE/INITCAP/SPLIT_PART/REPEAT/LTRIM/RTRIM/STRPOS/
STARTS_WITH (host per-dictionary-value). Static numeric arguments are read
from the expression nodes (expr_eval._static_num) so these — and the
pre-existing ROUND(x, n)/SUBSTRING — stay inside compiled programs instead
of demoting to the eager path.
"""

import math

import numpy as np
import pytest

from query_engine_tpu.engine.session import Session


@pytest.fixture(scope="module")
def sess():
    s = Session()
    s.register_table("t", {
        "k": [1, 1, 2, 2] * 25,
        "x": [float(i) - 30.0 for i in range(100)],
        "s": ["alpha", "beta one", "  gamma  ", None] * 25,
        "b": [True, False, None, True] * 25,
    })
    return s


def test_math_unary_vs_numpy(sess):
    rows = sess.sql(
        "SELECT x, EXP(x / 50), LN(x), LOG(x), LOG10(x), SIGN(x), "
        "SIN(x), COS(x), ATAN(x), DEGREES(x), RADIANS(x), TRUNC(x / 7) "
        "FROM t ORDER BY x LIMIT 100"
    ).to_pylist()
    for x, ex, ln, lg, lg10, sg, sn, cs, at, dg, rd, tr in rows:
        assert ex == pytest.approx(math.exp(x / 50), rel=1e-12)
        if x > 0:
            assert ln == pytest.approx(math.log(x), rel=1e-12)
            assert lg == pytest.approx(math.log10(x), rel=1e-12)
            assert lg10 == pytest.approx(math.log10(x), rel=1e-12)
        else:  # domain violation -> NULL, not NaN
            assert ln is None and lg is None and lg10 is None
        assert sg == (0.0 if x == 0 else math.copysign(1.0, x))
        assert sn == pytest.approx(math.sin(x), rel=1e-12)
        assert cs == pytest.approx(math.cos(x), rel=1e-12)
        assert at == pytest.approx(math.atan(x), rel=1e-12)
        assert dg == pytest.approx(math.degrees(x), rel=1e-12)
        assert rd == pytest.approx(math.radians(x), rel=1e-12)
        assert tr == float(int(x / 7))  # toward zero


def test_math_two_arg_and_domain(sess):
    (r,) = sess.sql(
        "SELECT LOG(2, 8), ATAN2(1, 1), MOD(7, 3), MOD(-7, 3), PI(), "
        "ASIN(2), ACOS(0.5), TRUNC(1234.567, -2), TRUNC(1.999, 2) FROM t "
        "LIMIT 1"
    ).to_pylist()
    assert r[0] == pytest.approx(3.0)
    assert r[1] == pytest.approx(math.pi / 4)
    assert r[2] == 1 and r[3] == -1  # PG MOD keeps the dividend's sign
    assert r[4] == pytest.approx(math.pi)
    assert r[5] is None  # ASIN out of domain -> NULL
    assert r[6] == pytest.approx(math.acos(0.5))
    assert r[7] == 1200.0 and r[8] == 1.99


def test_greatest_least_null_handling():
    s = Session()
    s.register_table("e", {"a": [1.0, None, None], "b": [0.5, 2.0, None]})
    rows = s.sql(
        "SELECT GREATEST(a, b, 0.75), LEAST(a, b), GREATEST(a, b) FROM e"
    ).to_pylist()
    # PG: NULLs are ignored; NULL only when all args are NULL
    assert rows[0] == (1.0, 0.5, 1.0)
    assert rows[1] == (2.0, 2.0, 2.0)
    assert rows[2] == (0.75, None, None)


def test_string_batch(sess):
    rows = sess.sql(
        "SELECT LEFT(s, 4), RIGHT(s, 3), LPAD(LEFT(s, 2), 5, '*-'), "
        "RPAD(LEFT(s, 2), 4), REVERSE(LEFT(s, 3)), INITCAP(s), "
        "SPLIT_PART(s, ' ', 2), REPEAT(LEFT(s, 1), 2), LTRIM(s), RTRIM(s), "
        "STRPOS(s, 'a'), STARTS_WITH(s, 'be') FROM t LIMIT 4"
    ).to_pylist()
    assert rows[0] == ("alph", "pha", "*-*al", "al  ", "pla", "Alpha", "",
                       "aa", "alpha", "alpha", 1, False)
    assert rows[1] == ("beta", "one", "*-*be", "be  ", "teb", "Beta One",
                       "one", "bb", "beta one", "beta one", 4, True)
    assert rows[2] == ("  ga", "a  ", "*-*  ", "    ", "g  ", "  Gamma  ",
                       "", "  ", "gamma  ", "  gamma", 4, False)
    assert rows[3] == (None,) * 12  # NULL propagates through all of them


def test_left_right_negative_n():
    s = Session()
    s.register_table("e", {"s": ["abcdef"]})
    (r,) = s.sql(
        "SELECT LEFT(s, -2), RIGHT(s, -2), LEFT(s, 0), RIGHT(s, 0) FROM e"
    ).to_pylist()
    assert r == ("abcd", "cdef", "", "")  # PG drops from the other end


def test_compiled_pipeline_keeps_static_args(sess):
    # TRUNC/ROUND/LEFT literal args are static: the whole query compiles
    before = dict(sess.executor.pipeline.stats)
    sess.sql(
        "SELECT k, SUM(TRUNC(x, -1)), SUM(ROUND(x, 1)) FROM t "
        "WHERE EXP(x / 100) > 0.5 GROUP BY k"
    )
    sess.sql("SELECT LEFT(s, 2), COUNT(*) FROM t GROUP BY LEFT(s, 2)")
    after = sess.executor.pipeline.stats
    assert after["fallbacks"] == before.get("fallbacks", 0)


def test_bool_aggregates():
    s = Session()
    s.register_table("e", {
        "k": [1, 1, 1, 2, 2, 3],
        "b": [True, False, None, True, True, None],
    })
    rows = s.sql(
        "SELECT k, BOOL_AND(b), BOOL_OR(b), EVERY(b) FROM e "
        "GROUP BY k ORDER BY k"
    ).to_pylist()
    assert rows == [(1, False, True, False), (2, True, True, True),
                    (3, None, None, None)]
    # over expressions and global
    assert s.sql("SELECT BOOL_AND(k < 4), BOOL_OR(k > 2) FROM e"
                 ).to_pylist() == [(True, True)]
    with pytest.raises(Exception, match="boolean"):
        s.sql("SELECT BOOL_AND(k) FROM e")


def test_bool_aggregates_distribute():
    import jax
    from query_engine_tpu.parallel.mesh import make_mesh

    devs = jax.devices()
    s = Session()
    data = {"k": [i % 5 for i in range(1000)],
            "b": [(i * 7) % 3 == 0 for i in range(1000)]}
    s.register_table("e", data)
    a = s.sql("SELECT k, BOOL_AND(b), BOOL_OR(b) FROM e GROUP BY k "
              "ORDER BY k").to_pylist()
    d = Session(mesh=make_mesh(devs[:8]))
    d.register_table("e", data)
    b = d.sql("SELECT k, BOOL_AND(b), BOOL_OR(b) FROM e GROUP BY k "
              "ORDER BY k").to_pylist()
    assert a == b
    assert d.mesh_pipeline.stats["fallbacks"] == 0
