"""ALTER TABLE: ADD/DROP/RENAME COLUMN, RENAME TO."""

import pytest

from query_engine_tpu.core.errors import ExecutionError
from query_engine_tpu.engine.session import Session


@pytest.fixture()
def sess():
    s = Session()
    s.sql("CREATE TABLE t (a INT, b TEXT)")
    s.sql("INSERT INTO t VALUES (1, 'x'), (2, 'y')")
    return s


def test_add_column_null_fill_then_update(sess):
    sess.sql("ALTER TABLE t ADD COLUMN c DOUBLE PRECISION")
    assert sess.sql("SELECT * FROM t ORDER BY a").to_pylist() == [
        (1, "x", None), (2, "y", None)
    ]
    sess.sql("UPDATE t SET c = a * 1.5")
    assert sess.sql("SELECT c FROM t ORDER BY a").to_pydict()["c"] == \
        [1.5, 3.0]


def test_add_not_null_on_nonempty_rejected(sess):
    with pytest.raises(ExecutionError):
        sess.sql("ALTER TABLE t ADD COLUMN c INT NOT NULL")


def test_drop_column(sess):
    sess.sql("ALTER TABLE t DROP COLUMN b")
    assert sess.sql("SELECT * FROM t ORDER BY a").to_pylist() == [
        (1,), (2,)
    ]


def test_drop_column_with_index(sess):
    sess.sql("CREATE INDEX ib ON t (b)")
    sess.sql("ALTER TABLE t DROP COLUMN b")  # dependent index dropped
    sess.sql("INSERT INTO t VALUES (3)")
    assert sess.sql("SELECT COUNT(*) FROM t").to_pylist() == [(3,)]


def test_rename_column(sess):
    sess.sql("ALTER TABLE t RENAME COLUMN b TO label")
    assert sess.sql(
        "SELECT label FROM t WHERE label = 'x'"
    ).to_pylist() == [("x",)]


def test_rename_table(sess):
    sess.sql("ALTER TABLE t RENAME TO t2")
    assert sess.sql("SELECT COUNT(*) FROM t2").to_pylist() == [(2,)]
    from query_engine_tpu.core.errors import PlanError

    with pytest.raises(PlanError):
        sess.sql("SELECT * FROM t")


def test_duplicate_add_rejected(sess):
    with pytest.raises(ExecutionError):
        sess.sql("ALTER TABLE t ADD COLUMN a INT")


# ---- SERIAL auto-increment ------------------------------------------------

def test_serial_fills_and_advances():
    s = Session()
    s.sql("CREATE TABLE sq (id SERIAL, nm TEXT)")
    s.sql("INSERT INTO sq (nm) VALUES ('a'), ('b')")
    assert s.sql("SELECT id FROM sq ORDER BY id").to_pydict()["id"] == [1, 2]
    s.sql("INSERT INTO sq VALUES (10, 'x')")  # explicit value advances
    s.sql("INSERT INTO sq (nm) VALUES ('c')")
    assert s.sql("SELECT id FROM sq ORDER BY id").to_pydict()["id"] == \
        [1, 2, 10, 11]


def test_bigserial_with_returning():
    s = Session()
    s.sql("CREATE TABLE bq (id BIGSERIAL, v INT)")
    out = s.sql("INSERT INTO bq (v) VALUES (7) RETURNING id, v").to_pylist()
    assert out == [(1, 7)]
