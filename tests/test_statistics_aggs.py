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


@pytest.mark.slow
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


# ---- two-argument statistics (COVAR_* / CORR / REGR_*) ---------------------

X2 = RNG.normal(10, 4, N).round(5)
X2NULL = RNG.random(N) < 0.06


def make_session2(mesh=None):
    s = Session(mesh=mesh)
    s.register_table("t2", {
        "k": K.tolist(),
        "y": [None if b else float(v) for v, b in zip(V, VNULL)],
        "x": [None if b else float(v) for v, b in zip(X2, X2NULL)],
    })
    return s


def np_pair_stats(g):
    """Pairs of group g where BOTH are non-null (PG pairwise semantics)."""
    ys, xs = [], []
    for kk, yv, yb, xv, xb in zip(K, V, VNULL, X2, X2NULL):
        if kk == g and not yb and not xb:
            ys.append(yv)
            xs.append(xv)
    return np.array(ys), np.array(xs)


def test_covar_family_vs_numpy():
    s = make_session2()
    rows = s.sql(
        "SELECT k, COVAR_POP(y, x), COVAR_SAMP(y, x), CORR(y, x), "
        "REGR_SLOPE(y, x), REGR_INTERCEPT(y, x), REGR_R2(y, x), "
        "REGR_AVGX(y, x), REGR_AVGY(y, x), REGR_COUNT(y, x), "
        "REGR_SXX(y, x), REGR_SYY(y, x), REGR_SXY(y, x) "
        "FROM t2 GROUP BY k ORDER BY k"
    ).to_pylist()
    for g, cp, cs, corr, sl, ic, r2, ax, ay, rc, sxx, syy, sxy in rows:
        Y, X = np_pair_stats(g)
        c = len(Y)
        Sxx = ((X - X.mean()) ** 2).sum()
        Syy = ((Y - Y.mean()) ** 2).sum()
        Sxy = ((X - X.mean()) * (Y - Y.mean())).sum()
        assert approx(cp, Sxy / c, 1e-8)
        assert approx(cs, Sxy / (c - 1) if c > 1 else None, 1e-8)
        assert approx(corr, Sxy / np.sqrt(Sxx * Syy), 1e-8)
        assert approx(sl, Sxy / Sxx, 1e-8)
        assert approx(ic, Y.mean() - (Sxy / Sxx) * X.mean(), 1e-8)
        assert approx(r2, Sxy ** 2 / (Sxx * Syy), 1e-8)
        assert approx(ax, X.mean(), 1e-8)
        assert approx(ay, Y.mean(), 1e-8)
        assert rc == c
        assert approx(sxx, Sxx, 1e-8)
        assert approx(syy, Syy, 1e-8)
        assert approx(sxy, Sxy, 1e-8)


def test_covar_pair_null_and_degenerate_edges():
    s = Session()
    s.register_table("e", {
        "g": [1, 1, 2, 3, 3],
        "y": [None, 1.0, 5.0, 2.0, 4.0],
        "x": [1.0, None, 7.0, 3.0, 3.0],  # g=3: zero X variance
    })
    rows = s.sql(
        "SELECT g, COVAR_POP(y, x), COVAR_SAMP(y, x), CORR(y, x), "
        "REGR_SLOPE(y, x), REGR_R2(y, x), REGR_COUNT(y, x) "
        "FROM e GROUP BY g ORDER BY g"
    ).to_pylist()
    # g=1: no complete pair -> NULLs, count 0 (not NULL)
    assert rows[0] == (1, None, None, None, None, None, 0)
    # g=2: one pair -> pop covar 0, everything sample/ratio NULL
    assert rows[1] == (2, 0.0, None, None, None, None, 1)
    # g=3: constant x -> slope/corr/r2 NULL per PG; covar 0
    assert rows[2] == (3, 0.0, 0.0, None, None, None, 2)
    # constant y with varying x: r2 = 1 per PG (Syy = 0, Sxx != 0)
    s.register_table("cy", {"y": [3.0, 3.0, 3.0], "x": [1.0, 2.0, 5.0]})
    (r,) = s.sql(
        "SELECT REGR_R2(y, x), REGR_SLOPE(y, x), CORR(y, x) FROM cy"
    ).to_pylist()
    assert r == (1.0, 0.0, None)
    # empty input: count 0, rest NULL
    assert s.sql(
        "SELECT REGR_COUNT(y, x), CORR(y, x) FROM cy WHERE x > 99"
    ).to_pylist() == [(0, None)]


def test_covar_expressions_and_having():
    s = make_session2()
    rows = s.sql(
        "SELECT k, CORR(y + 1, x * 2) AS c2 FROM t2 GROUP BY k "
        "HAVING REGR_COUNT(y, x) > 50 ORDER BY k"
    ).to_pylist()
    for g, c2 in rows:
        Y, X = np_pair_stats(g)
        assert len(Y) > 50
        # CORR is affine-invariant
        Sxx = ((X - X.mean()) ** 2).sum()
        Syy = ((Y - Y.mean()) ** 2).sum()
        Sxy = ((X - X.mean()) * (Y - Y.mean())).sum()
        assert approx(c2, Sxy / np.sqrt(Sxx * Syy), 1e-8)


def test_covar_errors():
    s = make_session2()
    with pytest.raises(Exception, match="numeric"):
        s.sql("SELECT CORR(CAST(k AS VARCHAR), x) FROM t2")
    with pytest.raises(Exception):
        s.sql("SELECT CORR(y) FROM t2")  # missing second argument
    with pytest.raises(Exception):
        s.sql("SELECT COVAR_POP(DISTINCT y, x) FROM t2")


@pytest.mark.slow
def test_covar_mesh_partial_final():
    devs = jax.devices()
    assert len(devs) >= 8
    sql = ("SELECT k, CORR(y, x) AS c, REGR_SLOPE(y, x) AS s, "
           "REGR_COUNT(y, x) AS n FROM t2 GROUP BY k ORDER BY k")
    a = make_session2().sql(sql).to_pylist()
    dist = make_session2(mesh=make_mesh(devs[:8]))
    b = dist.sql(sql).to_pylist()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0] and ra[3] == rb[3]
        assert approx(ra[1], rb[1], 1e-8) and approx(ra[2], rb[2], 1e-8)
    st = dist.mesh_pipeline.stats
    assert st.get("agg_partial_final", 0) >= 1, st
    assert st["fallbacks"] == 0, st


def test_covar_chunked():
    sql = "SELECT k, COVAR_SAMP(y, x) AS cs FROM t2 GROUP BY k ORDER BY k"
    a = make_session2().sql(sql).to_pylist()
    os.environ["QE_CHUNK_ENGAGE"] = "1024"
    os.environ["QE_CHUNK_ROWS"] = "512"
    try:
        s = make_session2()
        b = s.sql(sql).to_pylist()
        st = s.executor.chunked.stats
        assert st["queries"] >= 1 and st["chunks"] >= 2, st
    finally:
        del os.environ["QE_CHUNK_ENGAGE"]
        del os.environ["QE_CHUNK_ROWS"]
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0] and approx(ra[1], rb[1], 1e-8)


def test_covar_explain_keeps_logical_form():
    s = make_session2()
    out = s.sql("EXPLAIN SELECT CORR(y, x) FROM t2 GROUP BY k").to_pylist()
    text = "\n".join(r[0] for r in out)
    assert "CORR(t2.y, t2.x)" in text and "Aggregate" in text


# ---- MODE() WITHIN GROUP ---------------------------------------------------

def test_mode_vs_numpy():
    s = make_session()
    rows = s.sql(
        "SELECT k, MODE() WITHIN GROUP (ORDER BY iv % 10) "
        "FROM t GROUP BY k ORDER BY k"
    ).to_pylist()
    for g, m in rows:
        vals = [int(x % 10) for x, kk in zip(IV, K) if kk == g]
        counts = {}
        for v in vals:
            counts[v] = counts.get(v, 0) + 1
        best = max(counts.values())
        # PG: ties break to the first value in the WITHIN GROUP order (ASC)
        expect = min(v for v, c in counts.items() if c == best)
        assert m == expect, (g, m, expect)


def test_mode_edges_and_desc_ties():
    s = Session()
    s.register_table("e", {"g": [1] * 4 + [2], "v": [1, 1, 2, 2, None]})
    rows = s.sql(
        "SELECT g, MODE() WITHIN GROUP (ORDER BY v), "
        "MODE() WITHIN GROUP (ORDER BY v DESC) FROM e GROUP BY g ORDER BY g"
    ).to_pylist()
    assert rows[0] == (1, 1, 2)   # tie: first in ASC order vs DESC order
    assert rows[1] == (2, None, None)
    assert s.sql(
        "SELECT MODE() WITHIN GROUP (ORDER BY v) FROM e WHERE v > 9"
    ).to_pylist() == [(None,)]


def test_mode_on_mesh_falls_back_correctly():
    devs = jax.devices()
    sql = ("SELECT k, MODE() WITHIN GROUP (ORDER BY iv % 7) AS m "
           "FROM t GROUP BY k ORDER BY k")
    a = make_session().sql(sql).to_pylist()
    b = make_session(mesh=make_mesh(devs[:8])).sql(sql).to_pylist()
    assert a == b


# ---- STRING_AGG ------------------------------------------------------------

def test_string_agg_basic_and_filter():
    s = Session()
    s.register_table("e", {"k": [1, 1, 1, 2, 2, 3],
                           "s": ["a", "b", None, "x", "y", None]})
    assert s.sql(
        "SELECT k, STRING_AGG(s, ', ') FROM e GROUP BY k ORDER BY k"
    ).to_pylist() == [(1, "a, b"), (2, "x, y"), (3, None)]
    assert s.sql("SELECT STRING_AGG(s, '|') FROM e").to_pylist() == [
        ("a|b|x|y",)
    ]
    assert s.sql(
        "SELECT STRING_AGG(s, '-') FILTER (WHERE s > 'a') FROM e"
    ).to_pylist() == [("b-x-y",)]
    assert s.sql(
        "SELECT STRING_AGG(s, ',') FROM e WHERE s = 'zz'"
    ).to_pylist() == [(None,)]


def test_string_agg_errors():
    s = Session()
    s.register_table("e", {"k": [1], "s": ["a"]})
    with pytest.raises(Exception, match="string argument"):
        s.sql("SELECT STRING_AGG(k, ',') FROM e")
    with pytest.raises(Exception, match="delimiter"):
        s.sql("SELECT STRING_AGG(s, k) FROM e")


def test_string_agg_mesh_and_distributed_match():
    devs = jax.devices()
    data = {"k": [i % 4 for i in range(64)],
            "s": [f"v{i:02d}" if i % 5 else None for i in range(64)]}
    sql = "SELECT k, STRING_AGG(s, ',') AS agg FROM e GROUP BY k ORDER BY k"
    a = Session()
    a.register_table("e", data)
    ra = a.sql(sql).to_pylist()
    b = Session(mesh=make_mesh(devs[:8]))
    b.register_table("e", data)
    assert b.sql(sql).to_pylist() == ra


# ---- ARRAY_AGG -------------------------------------------------------------

def test_array_agg():
    s = Session()
    s.register_table("e", {"k": [1, 1, 1, 2, 3],
                           "v": [5, None, 7, 9, None],
                           "s": ["a", "b", None, "c", None]})
    rows = s.sql(
        "SELECT k, ARRAY_AGG(v), ARRAY_AGG(s) FROM e GROUP BY k ORDER BY k"
    ).to_pylist()
    # PG: NULL inputs are KEPT; result NULL only for zero-row groups
    assert rows == [(1, [5, None, 7], ["a", "b", None]),
                    (2, [9], ["c"]), (3, [None], [None])]
    assert s.sql("SELECT ARRAY_AGG(v) FROM e WHERE v > 100").to_pylist() \
        == [(None,)]
    # arrow round-trip produces a real list<item> column
    rb = s.sql("SELECT k, ARRAY_AGG(v) AS arr FROM e GROUP BY k ORDER BY k"
               ).to_arrow()
    assert str(rb.schema.field("arr").type).startswith("list")


def test_array_agg_filter_excludes_rows():
    # FILTER EXCLUDES rows (vs the CASE desugar, which would surface them
    # as NULL elements); a group with every row filtered yields NULL
    s = Session()
    s.register_table("e", {"k": [1, 1, 1, 2, 2],
                           "v": [5, None, 7, 1, 2]})
    assert s.sql(
        "SELECT k, ARRAY_AGG(v) FILTER (WHERE v > 1) AS a "
        "FROM e GROUP BY k ORDER BY k"
    ).to_pylist() == [(1, [5, 7]), (2, [2])]
    assert s.sql(
        "SELECT ARRAY_AGG(v) FILTER (WHERE v > 100) FROM e"
    ).to_pylist() == [(None,)]
    # two FILTERed ARRAY_AGGs over the same argument must not alias
    assert s.sql(
        "SELECT ARRAY_AGG(v) FILTER (WHERE v > 4) AS a, "
        "ARRAY_AGG(v) FILTER (WHERE v < 4) AS b FROM e"
    ).to_pylist() == [([5, 7], [1, 2])]


def test_array_agg_order_by_and_distinct():
    s = Session()
    s.register_table("e", {"k": [1, 1, 1, 2, 2],
                           "v": [3, 1, 2, 5, 4],
                           "s": ["c", "a", "b", "e", "d"]})
    assert s.sql(
        "SELECT k, ARRAY_AGG(v ORDER BY v) AS a FROM e GROUP BY k ORDER BY k"
    ).to_pylist() == [(1, [1, 2, 3]), (2, [4, 5])]
    # order key independent of the argument, DESC
    assert s.sql(
        "SELECT k, ARRAY_AGG(s ORDER BY v DESC) AS a "
        "FROM e GROUP BY k ORDER BY k"
    ).to_pylist() == [(1, ["c", "b", "a"]), (2, ["e", "d"])]
    # ORDER BY composes with FILTER
    assert s.sql(
        "SELECT ARRAY_AGG(v ORDER BY s DESC) FILTER (WHERE v <> 5) FROM e"
    ).to_pylist() == [([4, 3, 2, 1],)]
    # NULL order keys honor NULLS FIRST/LAST (default: LAST for ASC)
    s.register_table("n", {"v": [1, 2, 3], "o": [None, 2, 1]})
    assert s.sql("SELECT ARRAY_AGG(v ORDER BY o) FROM n").to_pylist() \
        == [([3, 2, 1],)]
    assert s.sql(
        "SELECT ARRAY_AGG(v ORDER BY o NULLS FIRST) FROM n"
    ).to_pylist() == [([1, 3, 2],)]
    s.register_table("d", {"v": [2, 2, 1, 1]})
    assert s.sql("SELECT ARRAY_AGG(DISTINCT v ORDER BY v) FROM d"
                 ).to_pylist() == [([1, 2],)]
    # ORDER BY is only meaningful for the order-sensitive aggregates
    with pytest.raises(Exception, match="only"):
        s.sql("SELECT SUM(v ORDER BY v) FROM d")


def test_string_agg_order_by_and_distinct():
    s = Session()
    s.register_table("e", {"k": [1, 1, 1, 2, 2],
                           "v": [3, 1, 2, 5, 4],
                           "s": ["c", "a", "b", "e", "d"]})
    assert s.sql(
        "SELECT k, STRING_AGG(s, ',' ORDER BY v) AS sa "
        "FROM e GROUP BY k ORDER BY k"
    ).to_pylist() == [(1, "a,b,c"), (2, "d,e")]
    assert s.sql(
        "SELECT STRING_AGG(s, '|' ORDER BY s DESC) FROM e"
    ).to_pylist() == [("e|d|c|b|a",)]
    s.register_table("d", {"s": ["b", "a", "b", "a"]})
    assert s.sql("SELECT STRING_AGG(DISTINCT s, ',' ORDER BY s) FROM d"
                 ).to_pylist() == [("a,b",)]


def test_array_agg_mesh_falls_back_correctly():
    devs = jax.devices()
    data = {"k": [i % 4 for i in range(100)], "v": list(range(100))}
    sql = "SELECT k, ARRAY_AGG(v) AS a FROM e GROUP BY k ORDER BY k"
    a = Session()
    a.register_table("e", data)
    b = Session(mesh=make_mesh(devs[:8]))
    b.register_table("e", data)
    assert a.sql(sql).to_pylist() == b.sql(sql).to_pylist()
