"""UPDATE ... FROM and DELETE ... USING (PG multi-table DML): the join
runs through the ordinary engine over a row-id-augmented target; the
first match per target row wins."""

import pytest

from query_engine_tpu.engine.session import Session


@pytest.fixture()
def sess():
    s = Session()
    s.sql("CREATE TABLE emp (id INT, dept INT, salary INT)")
    s.sql("INSERT INTO emp VALUES (1, 10, 100), (2, 10, 200), (3, 20, 300)")
    s.sql("CREATE TABLE raises (dept INT, pct INT)")
    s.sql("INSERT INTO raises VALUES (10, 50)")
    return s


def test_update_from(sess):
    out = sess.sql(
        "UPDATE emp SET salary = emp.salary + emp.salary * r.pct / 100 "
        "FROM raises r WHERE emp.dept = r.dept"
    )
    assert out.to_pylist() == [("UPDATE 2",)]
    assert sess.sql(
        "SELECT id, salary FROM emp ORDER BY id"
    ).to_pylist() == [(1, 150), (2, 300), (3, 300)]


def test_update_from_no_match(sess):
    out = sess.sql(
        "UPDATE emp SET salary = 0 FROM raises r WHERE emp.dept = 999"
    )
    assert out.to_pylist() == [("UPDATE 0",)]


def test_update_from_returning(sess):
    out = sess.sql(
        "UPDATE emp SET salary = 0 FROM raises r "
        "WHERE emp.dept = r.dept RETURNING id, salary"
    ).to_pylist()
    assert sorted(out) == [(1, 0), (2, 0)]


def test_delete_using(sess):
    out = sess.sql(
        "DELETE FROM emp USING raises r WHERE emp.dept = r.dept"
    )
    assert out.to_pylist() == [("DELETE 2",)]
    assert sess.sql("SELECT id FROM emp").to_pylist() == [(3,)]


def test_delete_using_subquery(sess):
    sess.sql(
        "DELETE FROM emp USING (SELECT 20 AS d) x WHERE emp.dept = x.d"
    )
    assert sess.sql(
        "SELECT id FROM emp ORDER BY id"
    ).to_pylist() == [(1,), (2,)]


def test_first_match_wins_on_duplicate_join(sess):
    sess.sql("INSERT INTO raises VALUES (10, 900)")  # second match
    sess.sql(
        "UPDATE emp SET salary = r.pct FROM raises r "
        "WHERE emp.dept = r.dept"
    )
    out = dict(sess.sql("SELECT id, salary FROM emp").to_pylist())
    assert out[1] in (50, 900) and out[1] == out[2]
