"""Shared WITH queries materialize exactly once per query (PG semantics).

The planner shares one LogicalPlan object across every reference to a CTE;
lowering marks multiply-referenced subplans (plan/lowering.py
shared_subquery_ids) and the executor memoizes the materialized batch, so
(a) the work runs once, and (b) float aggregates are bit-identical across
references — recomputing a SUM along two paths (mesh partial/final vs
eager) differs in last-ulp rounding and silently breaks equality
predicates like TPC-H Q15's total_revenue = (SELECT MAX(...) ...)."""

import pytest

from query_engine_tpu.engine.session import Session
from query_engine_tpu.plan import physical as pp


@pytest.fixture()
def sess():
    s = Session()
    s.register_table("t", {
        "k": [1, 1, 2, 2, 3, 3],
        "x": [0.1, 0.2, 0.3, 0.4, 0.5, 0.6],
    })
    return s


Q = ("WITH r AS (SELECT k, SUM(x) AS s FROM t GROUP BY k) "
     "SELECT k FROM r WHERE s = (SELECT MAX(s) FROM r) ORDER BY k")


def test_shared_cte_equality_against_own_max(sess):
    # both references must see the SAME floats for = to hit
    assert sess.sql(Q).to_pydict() == {"k": [3]}


def test_shared_cte_executes_once(sess, monkeypatch):
    ex = sess.executor
    shared_execs = []
    orig = ex.execute

    def counting(plan):
        if isinstance(plan, pp.PSubquery) and plan.shared:
            shared_execs.append(id(plan.input))
        return orig(plan)

    monkeypatch.setattr(ex, "execute", counting)
    sess.sql(Q)
    # two references to r -> two PSubquery hits on ONE shared input; the
    # memo makes the second a reuse (the underlying aggregate runs once)
    assert len(shared_execs) == 2
    assert len(set(shared_execs)) == 1


def test_shared_cte_three_references():
    s = Session()
    # dyadic fractions: sums and the mean are exact in float64
    s.register_table("u", {
        "k": [1, 1, 2, 2, 3, 3],
        "x": [0.125, 0.125, 0.25, 0.25, 0.375, 0.375],
    })
    out = s.sql(
        "WITH r AS (SELECT k, SUM(x) AS s FROM u GROUP BY k) "
        "SELECT a.k FROM r a JOIN r b ON a.k = b.k "
        "WHERE a.s >= (SELECT AVG(s) FROM r) ORDER BY a.k"
    ).to_pylist()
    # sums 0.25 / 0.5 / 0.75, mean 0.5 -> k = 2, 3
    assert out == [(2,), (3,)]


def test_single_use_cte_unaffected(sess):
    out = sess.sql(
        "WITH r AS (SELECT k, SUM(x) AS s FROM t GROUP BY k) "
        "SELECT k, s FROM r ORDER BY k"
    ).to_pydict()
    assert out["k"] == [1, 2, 3]
