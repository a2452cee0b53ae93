"""Generative differential fuzz: random queries over random tables, compiled
pipeline vs eager executor. Shapes cover filters, projections with scalar
exprs, grouped/global aggregates (all functions, DISTINCT), HAVING, sorts
with mixed directions, LIMIT/OFFSET, DISTINCT, unique- and non-unique-side
joins, set operations, and window functions — the full compiled-segment
surface. Results must match exactly (rows as multisets when unordered)."""

import random

import numpy as np
import pytest

# full-battery differential: the fast profile (-m 'not slow') skips it
pytestmark = pytest.mark.slow

import query_engine_tpu  # noqa: F401
from query_engine_tpu.engine.session import Session

N_QUERIES = 120


def make_session(compiled: bool) -> Session:
    rng = np.random.default_rng(42)
    n, m = 700, 50
    s = Session()
    k = [int(x) if ok else None for x, ok in
         zip(rng.integers(0, 20, n), rng.random(n) > 0.08)]
    v = [int(x) if ok else None for x, ok in
         zip(rng.integers(-500, 500, n), rng.random(n) > 0.08)]
    f = [round(float(x), 3) if ok else None for x, ok in
         zip(rng.normal(0, 100, n), rng.random(n) > 0.05)]
    strs = ["alpha", "beta", "gamma", "delta", "epsilon"]
    sv = [strs[i] if ok else None for i, ok in
          zip(rng.integers(0, 5, n), rng.random(n) > 0.1)]
    s.register_table("t1", {
        "id": list(range(n)), "k": k, "v": v, "f": f, "s": sv,
    })
    s.register_table("t2", {
        "k": list(range(20)),  # unique build side
        "w": [int(x) for x in rng.integers(0, 100, 20)],
        "lbl": [strs[i % 5] for i in range(20)],
    })
    s.register_table("t3", {  # non-unique on k
        "k": [int(x) for x in rng.integers(0, 20, m)],
        "u": [int(x) for x in rng.integers(0, 10, m)],
    })
    s.executor._compiled = compiled
    return s


PREDICATES = [
    "v > 0", "k < 10", "f IS NOT NULL", "s = 'alpha'", "v % 3 = 0",
    "k IS NULL", "v BETWEEN -100 AND 250", "s IN ('beta', 'gamma')",
    "ABS(f) < 50", "k > 5 AND v < 100", "v > 200 OR k = 3",
    "s LIKE 'a%'", "CASE WHEN k > 10 THEN v ELSE -v END > 0",
    "STARTS_WITH(s, 'a')", "LN(ABS(v) + 1) < 4", "MOD(v, 7) = 2",
    # regex family (pattern tables built per dictionary value)
    "s ~ '^[abg]'", "s ~* 'GAMMA'", "s !~ 'a$'",
    "s SIMILAR TO '(alpha|beta)'", "s NOT SIMILAR TO '%t%'",
    "REGEXP_LIKE(s, 'l.h')",
]
PROJ = [
    "id", "k", "v", "f", "s", "v + k", "v * 2", "ABS(v)",
    "COALESCE(v, 0)", "CASE WHEN v > 0 THEN 'p' ELSE 'n' END",
    "UPPER(s)", "LENGTH(s)", "v / 10",
    "TRUNC(v / 7)", "SIGN(f)", "GREATEST(v, k)", "LEAST(v, 100)",
    # ROUND(f) not ROUND(f, n): the scaled form's mul+add contracts to an
    # FMA inside one XLA program but not in per-op eager dispatch -> 1-ulp
    # diffs that a bit-exact differential oracle must not chase
    "ROUND(f)", "LEFT(s, 2)", "REVERSE(s)", "STRPOS(s, 'a')",
    "SPLIT_PART(s, 'a', 1)", "EXP(v / 500)",
    "REGEXP_REPLACE(s, '[aeiou]', '*', 'g')", "REGEXP_COUNT(s, 'a')",
    "REGEXP_SUBSTR(s, '[lmn]+')",
]
AGGS = [
    "COUNT(*)", "COUNT(v)", "SUM(v)", "AVG(v)", "MIN(v)", "MAX(v)",
    "MIN(f)", "MAX(f)", "AVG(f)", "COUNT(DISTINCT v)", "MIN(s)", "MAX(s)",
    "VAR_SAMP(v)", "STDDEV_POP(f)", "STDDEV(v)",
    "MEDIAN(v)", "PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY f)",
    "PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY v)",
    "CORR(v, f)", "COVAR_SAMP(v, f)", "REGR_SLOPE(f, v)",
    "REGR_COUNT(v, f)", "REGR_R2(f, v)",
    "COUNT(*) FILTER (WHERE v > 0)", "SUM(v) FILTER (WHERE f IS NOT NULL)",
    "AVG(f) FILTER (WHERE k < 10)",
]
GROUPS = ["k", "s", "k % 4", "v % 5"]
WINDOWS = [
    "ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS w1",
    "RANK() OVER (ORDER BY v DESC) AS w1",
    "LAG(v, 1) OVER (PARTITION BY s ORDER BY id) AS w1",
    "DENSE_RANK() OVER (PARTITION BY k ORDER BY f) AS w1",
    "SUM(v) OVER (PARTITION BY k ORDER BY id) AS w1",
    "AVG(v) OVER (ORDER BY id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS w1",
    "COUNT(v) OVER (PARTITION BY s) AS w1",
    "MAX(v) OVER (PARTITION BY k ORDER BY id) AS w1",
    "MIN(f) OVER (ORDER BY id) AS w1",
    # order-sensitive global (no PARTITION BY) shapes: on the mesh these
    # ride the boundary-halo patches (parallel/mesh_pipeline.py)
    "LAG(v) OVER (ORDER BY id) AS w1",
    "LEAD(v, 2, -1) OVER (ORDER BY id) AS w1",
    "LEAD(s) OVER (ORDER BY id) AS w1",
    "SUM(v) OVER (ORDER BY id ROWS BETWEEN 4 PRECEDING AND 2 FOLLOWING) AS w1",
    "MIN(v) OVER (ORDER BY id ROWS BETWEEN 2 PRECEDING AND UNBOUNDED FOLLOWING) AS w1",
    "COUNT(v) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND 3 FOLLOWING) AS w1",
    "SUM(v) OVER (ORDER BY k ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS w1",
    "SUM(v) OVER (PARTITION BY k ORDER BY v RANGE BETWEEN 50 PRECEDING "
    "AND 20 FOLLOWING) AS w1",
    "COUNT(v) OVER (ORDER BY v RANGE BETWEEN 30 PRECEDING AND 30 "
    "FOLLOWING) AS w1",
    "NTILE(6) OVER (ORDER BY id) AS w1",
    "PERCENT_RANK() OVER (PARTITION BY k ORDER BY v) AS w1",
    "CUME_DIST() OVER (PARTITION BY s ORDER BY v) AS w1",
    "NTH_VALUE(v, 2) OVER (PARTITION BY k ORDER BY id) AS w1",
    "PERCENT_RANK() OVER (ORDER BY v) AS w1",
    "CUME_DIST() OVER (ORDER BY v) AS w1",
    "FIRST_VALUE(v) OVER (ORDER BY id) AS w1",
    "LAST_VALUE(v) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND UNBOUNDED FOLLOWING) AS w1",
]


def gen_query(rnd: random.Random) -> tuple:
    """Returns (sql, ordered: bool)."""
    shape = rnd.random()
    where = f" WHERE {rnd.choice(PREDICATES)}" if rnd.random() < 0.7 else ""
    if shape < 0.30:  # select/filter/sort/limit
        cols = ", ".join(rnd.sample(PROJ, rnd.randint(1, 4)))
        q = f"SELECT {cols} FROM t1{where}"
        ordered = False
        if rnd.random() < 0.7:
            q += " ORDER BY id" if "id" in cols else " ORDER BY 1"
            ordered = True
        if rnd.random() < 0.4:
            q += f" LIMIT {rnd.randint(1, 40)}"
            if rnd.random() < 0.5:
                q += f" OFFSET {rnd.randint(0, 10)}"
        # LIMIT without ORDER BY picks implementation-defined rows -> both
        # engines agree (same input order) so exact compare still holds
        return q, ordered
    if shape < 0.55:  # aggregate
        g = rnd.choice(GROUPS)
        aggs = ", ".join(rnd.sample(AGGS, rnd.randint(1, 3)))
        having = " HAVING COUNT(*) > 1" if rnd.random() < 0.3 else ""
        q = (f"SELECT {g} AS gk, {aggs} FROM t1{where} "
             f"GROUP BY {g}{having}")
        if rnd.random() < 0.6:
            q += " ORDER BY gk"
        return q, False
    if shape < 0.70:  # join (unique or non-unique side)
        tbl = rnd.choice(["t2", "t3"])
        jt = rnd.choice(["JOIN", "LEFT JOIN"])
        cols = "t1.id, t1.v, b.k" + (", b.w" if tbl == "t2" else ", b.u")
        # only predicates over columns that stay unambiguous after the join
        safe = [p for p in PREDICATES if "k" not in p.replace("k =", "k=")
                .split() and " k " not in f" {p} " and not p.startswith("k")]
        jwhere = f" WHERE {rnd.choice(safe)}" if rnd.random() < 0.6 else ""
        # residual ON conditions exercise the INNER post-filter and the
        # outer recompute-unmatched path (executor._exec_outer_join_residual)
        residual = ""
        if rnd.random() < 0.35:
            residual = " AND b.u > 5" if tbl == "t3" else " AND b.w < 50"
        q = f"SELECT {cols} FROM t1 {jt} {tbl} b ON t1.k = b.k{residual}{jwhere}"
        return q, False
    if shape < 0.78:  # join + aggregate
        q = (f"SELECT b.k AS gk, COUNT(*), SUM(t1.v) FROM t1 "
             f"JOIN t2 b ON t1.k = b.k{' WHERE t1.v > 0' if rnd.random() < 0.5 else ''} "
             f"GROUP BY b.k ORDER BY gk")
        return q, False
    if shape < 0.88:  # set ops
        op = rnd.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
        p1, p2 = rnd.sample(PREDICATES[:8], 2)
        q = (f"SELECT k, v FROM t1 WHERE {p1} {op} "
             f"SELECT k, v FROM t1 WHERE {p2}")
        return q, False
    if shape < 0.92:  # window
        w = rnd.choice(WINDOWS)
        q = f"SELECT id, v, {w} FROM t1{where} ORDER BY id"
        return q, True
    if shape < 0.94:  # correlated / uncorrelated subquery predicates
        kind = rnd.randrange(5)
        if kind == 0:
            q = ("SELECT id FROM t1 WHERE v > (SELECT AVG(u) FROM t3) "
                 "ORDER BY id")
        elif kind == 1:
            q = ("SELECT t1.id FROM t1 WHERE EXISTS (SELECT 1 FROM t3 "
                 "WHERE t3.k = t1.k AND t3.u > 5) ORDER BY t1.id")
        elif kind == 2:
            q = ("SELECT t1.id, (SELECT MAX(t3.u) FROM t3 "
                 "WHERE t3.k = t1.k) AS m FROM t1 ORDER BY t1.id LIMIT 50")
        elif kind == 3:
            # expression over aggregates in a correlated scalar (Q17 shape)
            q = ("SELECT t1.id FROM t1 WHERE t1.v < (SELECT 0.5 * AVG(u) "
                 "+ 1 FROM t3 WHERE t3.k = t1.k) ORDER BY t1.id")
        else:
            # inequality correlation via per-group MIN/MAX (Q21 shape)
            neg = rnd.choice(["", "NOT "])
            q = (f"SELECT t1.id FROM t1 WHERE {neg}EXISTS (SELECT 1 FROM t3 "
                 "WHERE t3.k = t1.k AND t3.u != t1.id % 10) ORDER BY t1.id")
        return q, True
    if shape < 0.96:  # grouping sets / rollup
        g1, g2 = rnd.sample(["k", "s"], 2)
        kind = rnd.randrange(3)
        if kind == 0:
            q = (f"SELECT {g1}, COUNT(*), SUM(v) FROM t1{where} "
                 f"GROUP BY ROLLUP({g1})")
        elif kind == 1:
            q = (f"SELECT {g1}, {g2}, COUNT(*) FROM t1{where} "
                 f"GROUP BY CUBE({g1}, {g2})")
        else:
            q = (f"SELECT {g1}, GROUPING({g1}) AS gg, MIN(v) FROM t1{where} "
                 f"GROUP BY ROLLUP({g1})")
        return q, False
    if shape < 0.97:  # CTE / derived-table / subquery shapes
        kind = rnd.randrange(4)
        if kind == 0:
            q = (f"WITH f AS (SELECT k, v FROM t1{where}) "
                 f"SELECT k, COUNT(*), SUM(v) FROM f GROUP BY k")
        elif kind == 1:
            q = (f"SELECT sub.k, sub.m FROM (SELECT k, MAX(v) AS m FROM t1 "
                 f"GROUP BY k) sub WHERE sub.m > 100 ORDER BY sub.k")
        elif kind == 2:
            q = ("SELECT id, v FROM t1 WHERE v > "
                 "(SELECT AVG(v) FROM t1) ORDER BY id LIMIT 20")
        else:
            # shared CTE: both references must see ONE materialization
            q = ("WITH r AS (SELECT k, COUNT(*) AS c FROM t1 GROUP BY k) "
                 "SELECT a.k, a.c FROM r a "
                 "WHERE a.c = (SELECT MAX(c) FROM r) ORDER BY a.k")
        return q, kind == 2
    # distinct
    cols = rnd.choice(["k", "s", "k, s"])
    q = f"SELECT DISTINCT {cols} FROM t1{where}"
    return q, False


def _key(row):
    return tuple(
        (x is None, repr(type(x)), x if x is not None else 0) for x in row
    )


@pytest.fixture(scope="module")
def sessions():
    return make_session(True), make_session(False)


@pytest.mark.parametrize("seed", range(N_QUERIES))
def test_fuzz_compiled_vs_eager(sessions, seed):
    rnd = random.Random(seed)
    q, ordered = gen_query(rnd)
    fast, slow = sessions
    a = fast.sql(q)
    b = slow.sql(q)
    assert a.schema.names() == b.schema.names(), q
    ra, rb = a.to_pylist(), b.to_pylist()
    if not ordered:
        ra, rb = sorted(ra, key=_key), sorted(rb, key=_key)
    assert ra == rb, q
