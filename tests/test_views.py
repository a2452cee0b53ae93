"""CREATE [OR REPLACE] VIEW / DROP VIEW / DROP TABLE.

Views bind at creation (PG semantics) and every reference shares one
LogicalPlan object, so a view used twice in a query materializes once
through the shared-CTE machinery — equality predicates against the
view's own aggregates are bit-stable. Neither exists in the reference
(its parser has no VIEW tokens)."""

import pytest

from query_engine_tpu.core.errors import ExecutionError, PlanError
from query_engine_tpu.engine.session import Session


@pytest.fixture()
def sess():
    s = Session()
    s.register_table("t", {"k": [1, 1, 2, 2], "x": [10, 20, 30, 40]})
    return s


def test_create_and_query(sess):
    sess.sql("CREATE VIEW v AS SELECT k, SUM(x) AS s FROM t GROUP BY k")
    assert sess.sql("SELECT * FROM v ORDER BY k").to_pylist() == [
        (1, 30), (2, 70)
    ]


def test_view_over_view_join_shares_materialization(sess):
    sess.sql("CREATE VIEW v AS SELECT k, SUM(x) AS s FROM t GROUP BY k")
    out = sess.sql(
        "SELECT a.k FROM v a JOIN v b ON a.k = b.k "
        "WHERE a.s = (SELECT MAX(s) FROM v) ORDER BY a.k"
    ).to_pylist()
    assert out == [(2,)]


def test_or_replace(sess):
    sess.sql("CREATE VIEW v AS SELECT k FROM t")
    sess.sql("CREATE OR REPLACE VIEW v AS SELECT x FROM t WHERE x > 25")
    assert sess.sql("SELECT COUNT(*) FROM v").to_pylist() == [(2,)]


def test_column_rename_list(sess):
    sess.sql("CREATE VIEW w(a, b) AS SELECT k, x FROM t")
    out = sess.sql("SELECT a, b FROM w ORDER BY b DESC LIMIT 1").to_pylist()
    assert out == [(2, 40)]


def test_view_sees_dml(sess):
    # bound at creation but reads live table data
    sess.sql("CREATE TABLE u (a INT)")
    sess.sql("CREATE VIEW uv AS SELECT SUM(a) AS s FROM u")
    sess.sql("INSERT INTO u VALUES (5), (6)")
    assert sess.sql("SELECT s FROM uv").to_pylist() == [(11,)]


def test_duplicate_rejected(sess):
    sess.sql("CREATE VIEW v AS SELECT 1")
    with pytest.raises(ExecutionError):
        sess.sql("CREATE VIEW v AS SELECT 2")


def test_view_named_like_table_rejected(sess):
    with pytest.raises(ExecutionError):
        sess.sql("CREATE VIEW t AS SELECT 1")


def test_column_count_mismatch(sess):
    with pytest.raises(ExecutionError):
        sess.sql("CREATE VIEW w(a) AS SELECT k, x FROM t")


def test_drop_view(sess):
    sess.sql("CREATE VIEW v AS SELECT k FROM t")
    sess.sql("DROP VIEW v")
    with pytest.raises(PlanError):
        sess.sql("SELECT * FROM v")
    sess.sql("DROP VIEW IF EXISTS v")  # no error
    with pytest.raises(ExecutionError):
        sess.sql("DROP VIEW v")


def test_drop_table(sess):
    sess.sql("CREATE TABLE tmp (a INT)")
    sess.sql("INSERT INTO tmp VALUES (7)")
    sess.sql("DROP TABLE tmp")
    with pytest.raises(PlanError):
        sess.sql("SELECT * FROM tmp")
    sess.sql("DROP TABLE IF EXISTS tmp")
    with pytest.raises(ExecutionError):
        sess.sql("DROP TABLE tmp")


def test_view_with_cte_body(sess):
    sess.sql(
        "CREATE VIEW v AS WITH big AS (SELECT x FROM t WHERE x > 15) "
        "SELECT COUNT(*) AS c FROM big"
    )
    assert sess.sql("SELECT c FROM v").to_pylist() == [(3,)]
