"""Transaction semantics: BEGIN/COMMIT/ROLLBACK/SAVEPOINT.

The reference accepts these over pgwire but no-ops them
(crates/query-pgwire/src/backend.rs:807-832); here they carry real
snapshot semantics: BEGIN captures registry + per-table batch references
(batches are immutable — DML replaces, never mutates), ROLLBACK is a
pointer swap + index rebuild.
"""

import pytest

import query_engine_tpu  # noqa: F401
from query_engine_tpu.core.errors import QueryError
from query_engine_tpu.engine.session import Session


@pytest.fixture()
def sess():
    s = Session()
    s.register_table("t", {"id": [1, 2, 3], "v": [10.0, 20.0, 30.0]})
    return s


def rows(batch):
    return batch.to_pylist()


def test_rollback_insert(sess):
    sess.sql("BEGIN")
    sess.sql("INSERT INTO t VALUES (4, 40.0)")
    assert sess.sql("SELECT COUNT(*) FROM t").to_pylist()[0][0] == 4
    sess.sql("ROLLBACK")
    assert sess.sql("SELECT COUNT(*) FROM t").to_pylist()[0][0] == 3


def test_commit_keeps(sess):
    sess.sql("BEGIN")
    sess.sql("INSERT INTO t VALUES (4, 40.0)")
    sess.sql("COMMIT")
    assert sess.sql("SELECT COUNT(*) FROM t").to_pylist()[0][0] == 4


def test_rollback_update_delete(sess):
    sess.sql("BEGIN WORK")
    sess.sql("UPDATE t SET v = 0.0 WHERE id = 1")
    sess.sql("DELETE FROM t WHERE id = 3")
    assert sess.sql("SELECT COUNT(*) FROM t").to_pylist()[0][0] == 2
    sess.sql("ROLLBACK WORK")
    got = sess.sql("SELECT id, v FROM t ORDER BY id").to_pylist()
    assert got == [(1, 10.0), (2, 20.0), (3, 30.0)]


def test_rollback_ddl_create_and_drop(sess):
    sess.sql("BEGIN")
    sess.sql("CREATE TABLE fresh (a INT)")
    sess.sql("INSERT INTO fresh VALUES (1)")
    sess.sql("DROP TABLE t")
    assert "t" not in sess.tables() and "fresh" in sess.tables()
    sess.sql("ROLLBACK")
    assert "fresh" not in sess.tables()
    # dropped table comes back with its data
    assert sess.sql("SELECT COUNT(*) FROM t").to_pylist()[0][0] == 3


def test_rollback_truncate_and_alter(sess):
    sess.sql("BEGIN")
    sess.sql("TRUNCATE TABLE t")
    assert sess.sql("SELECT COUNT(*) FROM t").to_pylist()[0][0] == 0
    sess.sql("ALTER TABLE t ADD COLUMN note TEXT")
    sess.sql("ROLLBACK")
    got = sess.sql("SELECT * FROM t ORDER BY id").to_pylist()
    assert got == [(1, 10.0), (2, 20.0), (3, 30.0)]


def test_failed_statement_aborts_transaction(sess):
    sess.sql("BEGIN")
    with pytest.raises(QueryError):
        sess.sql("SELECT * FROM no_such_table")
    # PG: subsequent commands are refused until transaction end
    with pytest.raises(QueryError, match="aborted"):
        sess.sql("SELECT 1")
    sess.sql("ROLLBACK")
    assert sess.sql("SELECT 1").to_pylist() == [(1,)]


def test_commit_of_failed_txn_is_rollback(sess):
    sess.sql("BEGIN")
    sess.sql("INSERT INTO t VALUES (4, 40.0)")
    with pytest.raises(QueryError):
        sess.sql("SELECT * FROM no_such_table")
    tag = sess.sql("COMMIT").to_pylist()[0][0]
    assert tag == "ROLLBACK"
    assert sess.sql("SELECT COUNT(*) FROM t").to_pylist()[0][0] == 3


def test_savepoints(sess):
    sess.sql("BEGIN")
    sess.sql("INSERT INTO t VALUES (4, 40.0)")
    sess.sql("SAVEPOINT sp1")
    sess.sql("INSERT INTO t VALUES (5, 50.0)")
    sess.sql("SAVEPOINT sp2")
    sess.sql("DELETE FROM t")
    sess.sql("ROLLBACK TO SAVEPOINT sp2")
    assert sess.sql("SELECT COUNT(*) FROM t").to_pylist()[0][0] == 5
    sess.sql("ROLLBACK TO sp1")
    assert sess.sql("SELECT COUNT(*) FROM t").to_pylist()[0][0] == 4
    # savepoint survives the rollback-to (PG semantics)
    sess.sql("ROLLBACK TO sp1")
    sess.sql("RELEASE SAVEPOINT sp1")
    with pytest.raises(QueryError, match="does not exist"):
        sess.sql("ROLLBACK TO sp1")
    sess.sql("COMMIT")
    assert sess.sql("SELECT COUNT(*) FROM t").to_pylist()[0][0] == 4


def test_rollback_to_recovers_failed_txn(sess):
    sess.sql("BEGIN")
    sess.sql("SAVEPOINT sp")
    with pytest.raises(QueryError):
        sess.sql("SELECT * FROM no_such_table")
    sess.sql("ROLLBACK TO sp")  # clears the aborted state
    sess.sql("INSERT INTO t VALUES (4, 40.0)")
    sess.sql("COMMIT")
    assert sess.sql("SELECT COUNT(*) FROM t").to_pylist()[0][0] == 4


def test_savepoint_outside_txn_errors(sess):
    with pytest.raises(QueryError, match="transaction block"):
        sess.sql("SAVEPOINT sp")
    # COMMIT/ROLLBACK outside a txn are PG warnings-as-no-ops
    sess.sql("COMMIT")
    sess.sql("ROLLBACK")


def test_serial_counter_restored():
    s = Session()
    s.sql("CREATE TABLE seq (id SERIAL, x INT)")
    s.sql("INSERT INTO seq (x) VALUES (100)")
    s.sql("BEGIN")
    s.sql("INSERT INTO seq (x) VALUES (101)")
    s.sql("INSERT INTO seq (x) VALUES (102)")
    s.sql("ROLLBACK")
    s.sql("INSERT INTO seq (x) VALUES (103)")
    got = s.sql("SELECT id, x FROM seq ORDER BY id").to_pylist()
    assert got == [(1, 100), (2, 103)]


def test_index_ddl_rollback(sess):
    src = sess.sources["t"]
    sess.sql("CREATE INDEX pre_idx ON t (id)")
    sess.sql("BEGIN")
    sess.sql("CREATE INDEX txn_idx ON t (v)")
    sess.sql("DROP INDEX pre_idx")
    sess.sql("ROLLBACK")
    assert src.indexes.has_index("pre_idx")
    assert not src.indexes.has_index("txn_idx")
    # the restored index still answers lookups
    assert list(src.index_lookup("pre_idx", (2,))) == [1]


def test_index_contents_rebuilt_on_rollback(sess):
    src = sess.sources["t"]
    sess.sql("CREATE INDEX idx ON t (id)")
    sess.sql("BEGIN")
    sess.sql("INSERT INTO t VALUES (9, 90.0)")
    assert list(src.index_lookup("idx", (9,))) == [3]
    sess.sql("ROLLBACK")
    assert list(src.index_lookup("idx", (9,))) == []
    assert list(src.index_lookup("idx", (3,))) == [2]


def test_nested_begin_is_noop(sess):
    sess.sql("BEGIN")
    sess.sql("INSERT INTO t VALUES (4, 40.0)")
    sess.sql("BEGIN")  # PG: warning, keeps the outer transaction
    sess.sql("ROLLBACK")
    assert sess.sql("SELECT COUNT(*) FROM t").to_pylist()[0][0] == 3


def test_transaction_via_sql_script(sess):
    sess.sql_script(
        "BEGIN; INSERT INTO t VALUES (4, 40.0); ROLLBACK;"
        "BEGIN; INSERT INTO t VALUES (5, 50.0); COMMIT;"
    )
    got = sess.sql("SELECT id FROM t ORDER BY id").to_pylist()
    assert got == [(1,), (2,), (3,), (5,)]


def test_start_transaction_end_aliases(sess):
    sess.sql("START TRANSACTION")
    sess.sql("INSERT INTO t VALUES (4, 40.0)")
    sess.sql("END")
    assert sess.sql("SELECT COUNT(*) FROM t").to_pylist()[0][0] == 4
