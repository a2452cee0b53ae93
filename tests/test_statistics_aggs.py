"""VARIANCE/STDDEV aggregate family. Lowered into (SUM, SUM(x*x), COUNT)
base aggregates plus a formula projection (plan/lowering.py
_lower_aggregate), so the eager engine, compiled pipelines, the mesh
partial/final decomposition, and chunked execution all run it through
their ordinary SUM/COUNT machinery.

The reference has no statistical aggregates at all (its executor supports
COUNT/SUM/AVG/MIN/MAX only) — this is a superset, verified against numpy.
"""

import math
import os

import numpy as np
import pytest

import jax

from query_engine_tpu.core.errors import PlanError
from query_engine_tpu.engine.session import Session
from query_engine_tpu.parallel.mesh import make_mesh

RNG = np.random.default_rng(11)
N = 3000
K = RNG.integers(0, 25, N)
V = RNG.normal(50, 12, N).round(5)
VNULL = RNG.random(N) < 0.07
IV = RNG.integers(-40, 900, N)


def make_session(mesh=None):
    s = Session(mesh=mesh)
    s.register_table("t", {
        "k": K.tolist(),
        "v": [None if b else float(x) for x, b in zip(V, VNULL)],
        "iv": IV.tolist(),
    })
    return s


def np_group_stats(fn):
    out = {}
    for g in sorted(set(K.tolist())):
        vals = np.array([x for x, kk, b in zip(V, K, VNULL)
                         if kk == g and not b])
        out[g] = fn(vals)
    return out


def approx(a, b, tol=1e-9):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and math.isnan(a):
        return isinstance(b, float) and math.isnan(b)
    return a == pytest.approx(b, rel=tol, abs=tol)


def test_variance_family_vs_numpy():
    s = make_session()
    rows = s.sql(
        "SELECT k, VAR_SAMP(v), VAR_POP(v), STDDEV_SAMP(v), STDDEV_POP(v) "
        "FROM t GROUP BY k ORDER BY k"
    ).to_pylist()
    exp_vs = np_group_stats(lambda a: a.var(ddof=1) if len(a) > 1 else None)
    exp_vp = np_group_stats(lambda a: a.var() if len(a) > 0 else None)
    exp_ss = np_group_stats(lambda a: a.std(ddof=1) if len(a) > 1 else None)
    exp_sp = np_group_stats(lambda a: a.std() if len(a) > 0 else None)
    assert len(rows) == len(exp_vs)
    for g, vs, vp, ss, sp in rows:
        assert approx(vs, exp_vs[g]), (g, vs, exp_vs[g])
        assert approx(vp, exp_vp[g]), (g, vp, exp_vp[g])
        assert approx(ss, exp_ss[g]), (g, ss, exp_ss[g])
        assert approx(sp, exp_sp[g]), (g, sp, exp_sp[g])


def test_aliases_and_global():
    s = make_session()
    vals = np.array([x for x, b in zip(V, VNULL) if not b])
    (row,) = s.sql(
        "SELECT VARIANCE(v), STDDEV(v), AVG(v), COUNT(v) FROM t"
    ).to_pylist()
    assert approx(row[0], vals.var(ddof=1))
    assert approx(row[1], vals.std(ddof=1))
    assert approx(row[2], vals.mean())
    assert row[3] == len(vals)


def test_integer_arg_casts():
    s = make_session()
    (row,) = s.sql("SELECT STDDEV_POP(iv), VAR_SAMP(iv) FROM t").to_pylist()
    assert approx(row[0], IV.std(), tol=1e-7)
    assert approx(row[1], IV.var(ddof=1), tol=1e-7)


def test_edge_counts():
    s = Session()
    s.register_table("e", {"k": [1, 2, 2, 3], "v": [5.0, 1.0, 3.0, None]})
    rows = s.sql(
        "SELECT k, VAR_SAMP(v), VAR_POP(v), STDDEV_SAMP(v) FROM e "
        "GROUP BY k ORDER BY k"
    ).to_pylist()
    # single row: samp NULL, pop 0; all-NULL group: everything NULL
    assert rows[0] == (1, None, 0.0, None)
    assert approx(rows[1][1], 2.0) and approx(rows[1][2], 1.0)
    assert rows[2] == (3, None, None, None)
    # empty input
    assert s.sql("SELECT VARIANCE(v) FROM e WHERE v > 99").to_pylist() == [
        (None,)
    ]


def test_having_order_and_expressions_over_stddev():
    s = make_session()
    rows = s.sql(
        "SELECT k, STDDEV(v) * 2 AS d2 FROM t GROUP BY k "
        "HAVING STDDEV(v) > 11 ORDER BY d2 DESC LIMIT 5"
    ).to_pylist()
    exp = sorted(
        ((g, 2 * x) for g, x in np_group_stats(
            lambda a: a.std(ddof=1) if len(a) > 1 else None
        ).items() if x is not None and x > 11),
        key=lambda p: -p[1],
    )[:5]
    assert len(rows) == len(exp)
    for (g, d), (eg, ed) in zip(rows, exp):
        assert g == eg and approx(d, ed)


def test_grouping_sets_with_variance():
    s = make_session()
    rows = s.sql(
        "SELECT k % 3 AS g, VAR_POP(v) FROM t GROUP BY ROLLUP (k % 3) "
        "ORDER BY g"
    ).to_pylist()
    assert len(rows) == 4  # 3 buckets + grand total (NULL key sorts last
    # or first per engine default; just check the total row exists)
    vals = np.array([x for x, b in zip(V, VNULL) if not b])
    totals = [r for r in rows if r[0] is None]
    assert len(totals) == 1 and approx(totals[0][1], vals.var())


def test_unsupported_forms():
    s = make_session()
    with pytest.raises(Exception, match="DISTINCT"):
        s.sql("SELECT VAR_SAMP(DISTINCT v) FROM t")
    with pytest.raises(Exception, match="numeric"):
        s.sql("SELECT STDDEV(CAST(k AS VARCHAR)) FROM t")
    with pytest.raises(Exception, match="window"):
        s.sql("SELECT STDDEV(v) OVER (PARTITION BY k) FROM t")


def test_mesh_partial_final_variance():
    devs = jax.devices()
    assert len(devs) >= 8
    sql = (
        "SELECT k, STDDEV(v) AS sd, VAR_POP(v) AS vp FROM t "
        "GROUP BY k ORDER BY k"
    )
    a = make_session().sql(sql).to_pylist()
    dist = make_session(mesh=make_mesh(devs[:8]))
    b = dist.sql(sql).to_pylist()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0] and approx(ra[1], rb[1]) and approx(ra[2], rb[2])
    st = dist.mesh_pipeline.stats
    assert st.get("agg_partial_final", 0) >= 1, st
    assert st["fallbacks"] == 0, st


def test_chunked_variance():
    sql = "SELECT k, VAR_SAMP(v) AS vs FROM t GROUP BY k ORDER BY k"
    a = make_session().sql(sql).to_pylist()
    os.environ["QE_CHUNK_ENGAGE"] = "1024"
    os.environ["QE_CHUNK_ROWS"] = "512"
    try:
        s = make_session()
        b = s.sql(sql).to_pylist()
        st = s.executor.chunked.stats
        assert st["queries"] >= 1 and st["chunks"] >= 2, st
    finally:
        del os.environ["QE_CHUNK_ENGAGE"]
        del os.environ["QE_CHUNK_ROWS"]
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0] and approx(ra[1], rb[1])


def test_explain_keeps_logical_form():
    # EXPLAIN shows the user's aggregate, not the physical decomposition
    s = make_session()
    out = s.sql("EXPLAIN SELECT VAR_SAMP(v) FROM t").to_pylist()
    text = "\n".join(r[0] for r in out)
    assert "VAR_SAMP" in text and "Aggregate" in text


# ---- ordered-set aggregates (MEDIAN / PERCENTILE_CONT / PERCENTILE_DISC) ---

def test_percentiles_vs_numpy():
    s = make_session()
    rows = s.sql(
        "SELECT k, MEDIAN(v), "
        "PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY v), "
        "PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY v DESC), "
        "PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY v) "
        "FROM t GROUP BY k ORDER BY k"
    ).to_pylist()
    for g, med, q25, q25d, d50 in rows:
        a = np.sort(np.array([x for x, kk, b in zip(V, K, VNULL)
                              if kk == g and not b]))
        assert approx(med, np.percentile(a, 50))
        assert approx(q25, np.percentile(a, 25))
        # DESC quantile mirrors: CONT(f) DESC == CONT(1-f) ASC
        assert approx(q25d, np.percentile(a, 75))
        # PG DISC: first value with cume_dist >= f -> 1-based ceil(f*c)
        assert approx(d50, a[int(np.ceil(0.5 * len(a))) - 1])


def test_percentile_disc_keeps_input_type_and_desc():
    s = Session()
    s.register_table("e", {"g": [1, 1, 1, 1], "x": [10, 20, 30, 40]})
    (r,) = s.sql(
        "SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY x), "
        "PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY x DESC), "
        "PERCENTILE_DISC(0.0) WITHIN GROUP (ORDER BY x), "
        "PERCENTILE_DISC(1.0) WITHIN GROUP (ORDER BY x) FROM e"
    ).to_pylist()
    # ints stay ints; asc 0.5 -> 20 (ceil(2)=2nd), desc 0.5 -> 30,
    # 0.0 -> first, 1.0 -> last
    assert r == (20, 30, 10, 40)


def test_median_edges_and_expressions():
    s = Session()
    s.register_table("e", {"k": [1, 2, 2, 3], "v": [5.0, 1.0, 4.0, None]})
    rows = s.sql(
        "SELECT k, MEDIAN(v), MEDIAN(v) * 10 FROM e GROUP BY k ORDER BY k"
    ).to_pylist()
    assert rows[0] == (1, 5.0, 50.0)       # single row
    assert approx(rows[1][1], 2.5)         # even count interpolates
    assert rows[2] == (3, None, None)      # all-NULL group
    assert s.sql("SELECT MEDIAN(v) FROM e WHERE v > 99").to_pylist() == [
        (None,)
    ]
    # HAVING over a percentile
    rows = s.sql(
        "SELECT k FROM e GROUP BY k HAVING MEDIAN(v) > 3 ORDER BY k"
    ).to_pylist()
    assert rows == [(1,)]


def test_percentile_errors():
    s = make_session()
    with pytest.raises(Exception, match=r"\[0, 1\]"):
        s.sql("SELECT PERCENTILE_CONT(1.5) WITHIN GROUP (ORDER BY v) FROM t")
    with pytest.raises(Exception, match="numeric"):
        s.sql("SELECT MEDIAN(CAST(k AS VARCHAR)) FROM t")
    with pytest.raises(Exception, match="fraction"):
        s.sql("SELECT PERCENTILE_CONT(v) WITHIN GROUP (ORDER BY v) FROM t")


def test_percentile_on_mesh_falls_back_correctly():
    devs = jax.devices()
    sql = ("SELECT k, MEDIAN(v) AS m, COUNT(v) AS c FROM t "
           "GROUP BY k ORDER BY k")
    a = make_session().sql(sql).to_pylist()
    dist = make_session(mesh=make_mesh(devs[:8]))
    b = dist.sql(sql).to_pylist()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0] and approx(ra[1], rb[1]) and ra[2] == rb[2]


def test_percentile_distributed_single_stage():
    from query_engine_tpu.parallel.coordinator import Coordinator
    from query_engine_tpu.parallel.dexecutor import DistributedExecutor
    from query_engine_tpu.plan.planner import Planner
    from query_engine_tpu.sql.parser import parse_sql
    from query_engine_tpu.storage.memory import MemoryDataSource
    from query_engine_tpu.columnar.batch import ColumnBatch

    b = ColumnBatch.from_pydict({
        "k": K.tolist(),
        "v": [None if x else float(y) for y, x in zip(V, VNULL)],
    })
    sql = "SELECT k, MEDIAN(v) FROM t GROUP BY k"
    local = sorted(make_session().sql(
        sql.replace("FROM t", "FROM t") + " ORDER BY k"
    ).to_pylist())
    p = Planner()
    p.register_table("t", b.schema)
    plan = p.create_logical_plan(parse_sql(sql))
    coord = Coordinator()
    for i in range(3):
        coord.register_worker(f"host{i}:500{i}")
    rows = sorted(DistributedExecutor(coord).execute(
        plan, {"t": MemoryDataSource(batch=b, name="t")}
    ).to_pylist())
    assert len(rows) == len(local)
    for got, want in zip(rows, local):
        assert got[0] == want[0] and approx(got[1], want[1])
