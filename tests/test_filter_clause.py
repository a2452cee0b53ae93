"""PG aggregate FILTER (WHERE ...) clause.

Desugared at parse time (sql/parser.py _maybe_filter) into CASE masking of
the aggregate argument(s), so every execution path — eager, compiled, mesh,
chunked, distributed — inherits it with no executor changes. The reference
parser has no FILTER support at all (crates/query-parser); this is a
superset verified against hand-computed PG semantics.
"""

import math

import numpy as np
import pytest

import jax

from query_engine_tpu.engine.session import Session
from query_engine_tpu.parallel.mesh import make_mesh

RNG = np.random.default_rng(23)
N = 2000
K = RNG.integers(0, 12, N)
V = RNG.normal(0, 30, N).round(4)
VNULL = RNG.random(N) < 0.08


def make_session(mesh=None):
    s = Session(mesh=mesh)
    s.register_table("t", {
        "k": K.tolist(),
        "v": [None if b else float(x) for x, b in zip(V, VNULL)],
    })
    return s


def approx(a, b, tol=1e-9):
    if a is None or b is None:
        return a is None and b is None
    return a == pytest.approx(b, rel=tol, abs=tol)


def grp(g):
    return np.array([x for x, kk, b in zip(V, K, VNULL)
                     if kk == g and not b])


def test_filter_vs_numpy():
    s = make_session()
    rows = s.sql(
        "SELECT k, COUNT(*) FILTER (WHERE v > 0) AS c, "
        "SUM(v) FILTER (WHERE v > 0) AS sp, "
        "AVG(v) FILTER (WHERE v < 0) AS an, "
        "MIN(v) FILTER (WHERE v > 10) AS m "
        "FROM t GROUP BY k ORDER BY k"
    ).to_pylist()
    for g, c, sp, an, m in rows:
        a = grp(g)
        assert c == (a > 0).sum()
        assert approx(sp, a[a > 0].sum() if (a > 0).any() else None)
        assert approx(an, a[a < 0].mean() if (a < 0).any() else None)
        assert approx(m, a[a > 10].min() if (a > 10).any() else None)


def test_filter_count_star_null_predicate_rows():
    # rows where the predicate is NULL are excluded (PG)
    s = Session()
    s.register_table("e", {"v": [1.0, None, 3.0]})
    assert s.sql(
        "SELECT COUNT(*) FILTER (WHERE v > 0), COUNT(*) FROM e"
    ).to_pylist() == [(2, 3)]


def test_filter_on_statistics_and_percentiles():
    s = make_session()
    rows = s.sql(
        "SELECT k, STDDEV_POP(v) FILTER (WHERE v > 0) AS sd, "
        "MEDIAN(v) FILTER (WHERE v > 0) AS md, "
        "CORR(v, k) FILTER (WHERE v > 0) AS cr "
        "FROM t GROUP BY k ORDER BY k"
    ).to_pylist()
    for g, sd, md, cr in rows:
        a = grp(g)
        p = a[a > 0]
        assert approx(sd, p.std() if len(p) else None, 1e-8)
        assert approx(md, float(np.percentile(p, 50)) if len(p) else None,
                      1e-8)
        # within one group k is constant -> zero X variance -> NULL
        assert cr is None


def test_filter_in_window_aggregate():
    s = Session()
    s.register_table("e", {"k": [1, 1, 1, 2], "v": [1.0, 2.0, 3.0, 4.0]})
    rows = s.sql(
        "SELECT k, v, SUM(v) FILTER (WHERE v > 1) "
        "OVER (PARTITION BY k ORDER BY v) AS r FROM e ORDER BY k, v"
    ).to_pylist()
    assert rows == [(1, 1.0, None), (1, 2.0, 2.0), (1, 3.0, 5.0),
                    (2, 4.0, 4.0)]


def test_filter_distinct_and_having():
    s = Session()
    s.register_table("e", {"k": [1, 1, 1, 2], "v": [5, 5, 7, 9]})
    rows = s.sql(
        "SELECT k, COUNT(DISTINCT v) FILTER (WHERE v < 8) FROM e "
        "GROUP BY k HAVING COUNT(*) FILTER (WHERE v = 5) > 0 ORDER BY k"
    ).to_pylist()
    assert rows == [(1, 2)]


def test_filter_parse_errors():
    s = make_session()
    with pytest.raises(Exception):
        s.sql("SELECT COUNT(*) FILTER (v > 0) FROM t")  # missing WHERE
    with pytest.raises(Exception):
        s.sql("SELECT COUNT(*) FILTER WHERE v > 0 FROM t")  # missing parens


def test_filter_on_mesh_matches_single_device():
    devs = jax.devices()
    assert len(devs) >= 8
    sql = ("SELECT k, SUM(v) FILTER (WHERE v > 0) AS sp, "
           "COUNT(*) FILTER (WHERE v < 0) AS cn FROM t "
           "GROUP BY k ORDER BY k")
    a = make_session().sql(sql).to_pylist()
    dist = make_session(mesh=make_mesh(devs[:8]))
    b = dist.sql(sql).to_pylist()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0] and approx(ra[1], rb[1]) and ra[2] == rb[2]
    assert dist.mesh_pipeline.stats["fallbacks"] == 0


def test_distinct_filter_predicates_do_not_collide():
    # regression: CaseExpr.name() was a bare "CASE", so the planner's
    # aggregate dedup aliased any two aggregates over different CASE
    # expressions (e.g. two FILTER clauses) into one
    s = Session()
    s.register_table("e", {"v": [1.0, 2.0, 30.0, 40.0],
                           "b": [True, False, True, False]})
    assert s.sql(
        "SELECT AVG(v) FILTER (WHERE b), AVG(v) FILTER (WHERE NOT b), "
        "AVG(CASE WHEN b THEN v END), AVG(CASE WHEN NOT b THEN v END) "
        "FROM e"
    ).to_pylist() == [(15.5, 21.0, 15.5, 21.0)]
