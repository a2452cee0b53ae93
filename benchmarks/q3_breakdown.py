"""TPC-H Q3 component breakdown: where do the milliseconds go?

Runs Q3 variants at QE_Q3_ROWS lineitem rows (default 2^21) through the
SQL engine and prints per-variant steady-state latency; the deltas
attribute the full query's cost to joins / grouping / the f64 revenue
sum / top-k. One JSON line at the end.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

src = open(os.path.join(REPO, "benchmarks", "tpch_mini.py")).read()
ns = {"__name__": "q3b", "__file__": os.path.join(REPO, "benchmarks", "tpch_mini.py")}
exec(compile(src.split("def main")[0], "tpch_mini.py", "exec"), ns)  # noqa: S102

N_LI = int(os.environ.get("QE_Q3_ROWS", 1 << 21))

VARIANTS = {
    "full_q3": (
        "SELECT l.l_orderkey, "
        "SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue, "
        "o.o_orderdate, o.o_shippriority "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "AND o.o_orderdate < '1995-03-15' AND l.l_shipdate > '1995-03-15' "
        "GROUP BY l.l_orderkey, o.o_orderdate, o.o_shippriority "
        "ORDER BY revenue DESC LIMIT 10"
    ),
    # joins + filters only, no grouping
    "joins_count_only": (
        "SELECT COUNT(*) "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "AND o.o_orderdate < '1995-03-15' AND l.l_shipdate > '1995-03-15'"
    ),
    # grouping but COUNT(*) instead of the f64 revenue sum
    "group_count_star": (
        "SELECT l.l_orderkey, COUNT(*) AS n, "
        "o.o_orderdate, o.o_shippriority "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "AND o.o_orderdate < '1995-03-15' AND l.l_shipdate > '1995-03-15' "
        "GROUP BY l.l_orderkey, o.o_orderdate, o.o_shippriority "
        "ORDER BY n DESC LIMIT 10"
    ),
    # f64 sum of a bare column (no multiply expression)
    "group_sum_bare_f64": (
        "SELECT l.l_orderkey, SUM(l.l_extendedprice) AS s, "
        "o.o_orderdate, o.o_shippriority "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "AND o.o_orderdate < '1995-03-15' AND l.l_shipdate > '1995-03-15' "
        "GROUP BY l.l_orderkey, o.o_orderdate, o.o_shippriority "
        "ORDER BY s DESC LIMIT 10"
    ),
    # two-way join only (drop customer)
    "two_way_join": (
        "SELECT l.l_orderkey, "
        "SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue "
        "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE o.o_orderdate < '1995-03-15' AND l.l_shipdate > '1995-03-15' "
        "GROUP BY l.l_orderkey ORDER BY revenue DESC LIMIT 10"
    ),
    # grouping on lineitem alone (no joins at all)
    "lineitem_group_only": (
        "SELECT l_orderkey, "
        "SUM(l_extendedprice * (1 - l_discount)) AS revenue "
        "FROM lineitem WHERE l_shipdate > '1995-03-15' "
        "GROUP BY l_orderkey ORDER BY revenue DESC LIMIT 10"
    ),
}


def main():
    s = ns["build"](N_LI)
    if isinstance(s, tuple):
        s = s[0]
    out = {}
    for name, sql in VARIANTS.items():
        s.sql(sql)  # warm/compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            s.sql(sql)
            ts.append(time.perf_counter() - t0)
        out[name] = round(min(ts) * 1e3, 1)
        print(f"{name}: {out[name]} ms", file=sys.stderr)
    st = s.executor.pipeline.stats
    print(json.dumps({
        "metric": "q3_breakdown_ms", "lineitem_rows": N_LI,
        "variants": out, "pipeline_stats": st,
    }))


if __name__ == "__main__":
    main()
