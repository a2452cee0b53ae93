"""UNNEST(list) in FROM: lateral element explosion, completing the
ARRAY_AGG round-trip (LIST columns are terminal host values, so the
explosion runs on the host and base rows re-align with one take)."""

import pytest

from query_engine_tpu.core.errors import PlanError
from query_engine_tpu.engine.session import Session


@pytest.fixture()
def sess():
    s = Session()
    s.register_table("t", {
        "k": [1, 1, 2, 2, 3], "x": [10, 20, 30, 40, 50],
    })
    s.register_table("w", {
        "g": ["a", "a", "b"], "name": ["x", "y", "z"],
    })
    return s


def test_array_agg_roundtrip(sess):
    out = sess.sql(
        "SELECT d.k, u.e FROM "
        "(SELECT k, ARRAY_AGG(x) AS arr FROM t GROUP BY k) d, "
        "UNNEST(d.arr) AS u(e) ORDER BY d.k, u.e"
    ).to_pylist()
    assert out == [(1, 10), (1, 20), (2, 30), (2, 40), (3, 50)]


def test_unnest_then_reaggregate(sess):
    out = sess.sql(
        "SELECT d.k, SUM(u.e) AS s FROM "
        "(SELECT k, ARRAY_AGG(x) AS arr FROM t GROUP BY k) d, "
        "UNNEST(d.arr) u(e) GROUP BY d.k ORDER BY d.k"
    ).to_pylist()
    assert out == [(1, 30), (2, 70), (3, 50)]


def test_string_elements(sess):
    out = sess.sql(
        "SELECT d.g, u.nm FROM "
        "(SELECT g, ARRAY_AGG(name) AS names FROM w GROUP BY g) d, "
        "UNNEST(d.names) u(nm) ORDER BY d.g, u.nm"
    ).to_pylist()
    assert out == [("a", "x"), ("a", "y"), ("b", "z")]


def test_filtered_lists_explode_fewer_rows(sess):
    out = sess.sql(
        "SELECT u.e FROM "
        "(SELECT k, ARRAY_AGG(x) FILTER (WHERE x > 25) AS arr FROM t "
        "GROUP BY k) d, UNNEST(d.arr) u(e) ORDER BY u.e"
    ).to_pylist()
    # k=1 has no elements > 25 -> NULL list -> zero rows
    assert out == [(30,), (40,), (50,)]


def test_default_column_name(sess):
    out = sess.sql(
        "SELECT unnest FROM (SELECT ARRAY_AGG(x) AS arr FROM t) d, "
        "UNNEST(d.arr) ORDER BY unnest LIMIT 2"
    ).to_pylist()
    assert out == [(10,), (20,)]


def test_non_list_rejected(sess):
    with pytest.raises(PlanError):
        sess.sql("SELECT * FROM t, UNNEST(t.x) u(e)")


def test_outer_join_spelling_rejected(sess):
    with pytest.raises(PlanError):
        sess.sql(
            "SELECT * FROM t LEFT JOIN UNNEST(t.x) u(e) ON TRUE"
        )
