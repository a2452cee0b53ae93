"""GROUP BY ROLLUP / CUBE / GROUPING SETS (beyond the reference): planner
rewrite into UNION ALL of per-set aggregates with typed-NULL key padding.

employees: (1,Alice,25,75000,101) (2,Bob,30,85000,102) (3,Charlie,35,95000,101)
           (4,Diana,28,80000,103) (5,Eve,32,90000,102) (6,Frank,29,78000,NULL)
"""

import os

import pytest

from query_engine_tpu.engine.session import Session

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)


@pytest.fixture()
def sess():
    s = Session()
    s.register_csv("employees", os.path.join(DATA, "employees.csv"))
    return s


def test_rollup_single_key(sess):
    out = sess.sql(
        "SELECT dept_id, COUNT(*), SUM(salary) FROM employees "
        "GROUP BY ROLLUP(dept_id)"
    ).to_pylist()
    assert out == [
        (101, 2, 170000), (102, 2, 175000), (103, 1, 80000),
        (None, 1, 78000),   # the real NULL-dept group (Frank)
        (None, 6, 503000),  # grand total
    ]


def test_rollup_two_keys_row_count(sess):
    out = sess.sql(
        "SELECT dept_id, age, COUNT(*) FROM employees "
        "GROUP BY ROLLUP(dept_id, age)"
    ).to_pylist()
    # 6 (dept,age) groups + 4 dept subtotals + 1 grand total
    assert len(out) == 11
    assert (None, None, 6) in out


def test_cube_two_keys(sess):
    out = sess.sql(
        "SELECT dept_id, age, COUNT(*) FROM employees "
        "GROUP BY CUBE(dept_id, age)"
    ).to_pylist()
    # 6 + 4 dept + 6 age + 1 total
    assert len(out) == 17


def test_grouping_sets_explicit(sess):
    out = sess.sql(
        "SELECT dept_id, age, COUNT(*) FROM employees "
        "GROUP BY GROUPING SETS ((dept_id), (age), ())"
    ).to_pylist()
    assert len(out) == 11
    # dept-only rows carry NULL age; grand total at the end
    assert (101, None, 2) in out
    assert (None, None, 6) in out


def test_rollup_string_key(sess):
    sess.register_table("t", {"s": ["a", "b", "a"], "v": [1, 2, 3]})
    out = sess.sql(
        "SELECT s, SUM(v) FROM t GROUP BY ROLLUP(s)"
    ).to_pylist()
    assert out == [("a", 4), ("b", 2), (None, 6)]


def test_rollup_compiled_matches_eager(sess):
    q = ("SELECT dept_id, COUNT(*) AS c FROM employees "
         "GROUP BY ROLLUP(dept_id) ORDER BY c, dept_id")
    fast = sess.sql(q).to_pylist()
    sess.executor._compiled = False
    assert sess.sql(q).to_pylist() == fast


def test_grouping_function_disambiguates(sess):
    out = sess.sql(
        "SELECT dept_id, GROUPING(dept_id) AS g, COUNT(*) FROM employees "
        "GROUP BY ROLLUP(dept_id)"
    ).to_pylist()
    # Frank's real NULL dept has g=0; the grand total has g=1
    assert (None, 0, 1) in out
    assert (None, 1, 6) in out


def test_grouping_multi_arg_bitmask(sess):
    out = sess.sql(
        "SELECT GROUPING(dept_id, age) AS g, COUNT(*) FROM employees "
        "GROUP BY ROLLUP(dept_id, age)"
    ).to_pylist()
    masks = sorted(set(r[0] for r in out))
    assert masks == [0, 1, 3]  # (a,b) -> 0, (a) -> 01, () -> 11


def test_grouping_without_sets_errors(sess):
    from query_engine_tpu.core.errors import PlanError

    with pytest.raises(PlanError):
        sess.sql(
            "SELECT dept_id, GROUPING(dept_id) FROM employees "
            "GROUP BY dept_id"
        )
