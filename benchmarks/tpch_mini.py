"""Mini TPC-H: Q1, Q3, Q4, Q5, Q6, Q12, Q14 over synthetic tables through
the full SQL engine (parse -> plan -> compiled pipeline). Exercises
multi-key string grouping (Q1), 3-way FK joins with group+top-k (Q3),
correlated EXISTS (Q4), a 6-way join through two dimension chains (Q5),
date-range filter aggregation (Q6), conditional CASE aggregation over a
join (Q12), and a promo-revenue ratio (Q14).

    python benchmarks/tpch_mini.py [lineitem_rows]   # default 2^21

At small scale, Q1/Q5/Q6/Q12/Q14 results are cross-checked against pandas.
"""

import datetime
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import query_engine_tpu  # noqa: E402,F401
from query_engine_tpu.core.schema import Field, Schema  # noqa: E402
from query_engine_tpu.core.types import DataType  # noqa: E402
from query_engine_tpu.columnar.batch import ColumnBatch  # noqa: E402
from query_engine_tpu.engine.session import Session  # noqa: E402

EPOCH = datetime.date(1970, 1, 1)


def d(y, m, dd):
    return (datetime.date(y, m, dd) - EPOCH).days


def build(n_li: int):
    rng = np.random.default_rng(19920521)
    n_ord = max(n_li // 4, 64)
    n_cust = max(n_ord // 10, 16)

    n_supp = max(n_ord // 100, 8)
    n_part = max(n_li // 20, 16)
    n_nation, n_region = 25, 5

    region = ColumnBatch.from_pydict({
        "r_regionkey": np.arange(n_region),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    })
    nation = ColumnBatch.from_pydict({
        "n_nationkey": np.arange(n_nation),
        "n_name": [f"NATION{i:02d}" for i in range(n_nation)],
        "n_regionkey": (np.arange(n_nation) % n_region),
    })
    supp = ColumnBatch.from_pydict({
        "s_suppkey": np.arange(n_supp),
        "s_nationkey": rng.integers(0, n_nation, n_supp),
    })
    part_types = [
        "PROMO BURNISHED COPPER", "PROMO PLATED TIN", "STANDARD BRUSHED",
        "ECONOMY ANODIZED STEEL", "MEDIUM POLISHED NICKEL",
        "LARGE BRUSHED BRASS",
    ]
    part = ColumnBatch.from_pydict({
        "p_partkey": np.arange(n_part),
        "p_type": rng.choice(part_types, n_part).tolist(),
    })
    cust = ColumnBatch.from_pydict({
        "c_custkey": np.arange(n_cust),
        "c_nationkey": rng.integers(0, n_nation, n_cust),
        "c_mktsegment": rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"],
            n_cust,
        ).tolist(),
    })
    o_date = rng.integers(d(1992, 1, 1), d(1998, 8, 2), n_ord)
    orders = ColumnBatch.from_pydict({
        "o_orderkey": np.arange(n_ord),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderdate": o_date,
        "o_shippriority": np.zeros(n_ord, dtype=np.int64),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            n_ord,
        ).tolist(),
    }, Schema([
        Field("o_orderkey", DataType.int64()),
        Field("o_custkey", DataType.int64()),
        Field("o_orderdate", DataType.date32()),
        Field("o_shippriority", DataType.int64()),
        Field("o_orderpriority", DataType.utf8()),
    ]))
    okey = rng.integers(0, n_ord, n_li)
    ship = o_date[okey] + rng.integers(1, 122, n_li)
    commit = o_date[okey] + rng.integers(30, 91, n_li)
    receipt = ship + rng.integers(1, 31, n_li)
    li = ColumnBatch.from_pydict({
        "l_orderkey": okey,
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_shipmode": rng.choice(
            ["MAIL", "SHIP", "AIR", "TRUCK", "RAIL", "FOB", "REG AIR"], n_li
        ).tolist(),
        "l_quantity": rng.integers(1, 51, n_li),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.uniform(0.0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, n_li), 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li).tolist(),
        "l_linestatus": rng.choice(["O", "F"], n_li).tolist(),
        "l_shipdate": ship,
        "l_commitdate": commit,
        "l_receiptdate": receipt,
    }, Schema([
        Field("l_orderkey", DataType.int64()),
        Field("l_suppkey", DataType.int64()),
        Field("l_partkey", DataType.int64()),
        Field("l_shipmode", DataType.utf8()),
        Field("l_quantity", DataType.int64()),
        Field("l_extendedprice", DataType.float64()),
        Field("l_discount", DataType.float64()),
        Field("l_tax", DataType.float64()),
        Field("l_returnflag", DataType.utf8()),
        Field("l_linestatus", DataType.utf8()),
        Field("l_shipdate", DataType.date32()),
        Field("l_commitdate", DataType.date32()),
        Field("l_receiptdate", DataType.date32()),
    ]))
    s = Session()
    s.register_table("customer", cust)
    s.register_table("orders", orders)
    s.register_table("lineitem", li)
    s.register_table("supplier", supp)
    s.register_table("nation", nation)
    s.register_table("region", region)
    s.register_table("part", part)
    return s, (cust, orders, li, supp, nation, region, part)


QUERIES = {
    "Q1": (
        "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, "
        "SUM(l_extendedprice) AS sum_base, "
        "SUM(l_extendedprice * (1 - l_discount)) AS sum_disc, "
        "AVG(l_quantity) AS avg_qty, AVG(l_discount) AS avg_disc, "
        "COUNT(*) AS n "
        "FROM lineitem WHERE l_shipdate <= '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus"
    ),
    "Q3": (
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
    "Q4": (
        "SELECT o.o_orderpriority, COUNT(*) AS n FROM orders o "
        "WHERE o.o_orderdate >= '1993-07-01' AND o.o_orderdate < '1993-10-01' "
        "AND EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_commitdate < l.l_receiptdate) "
        "GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"
    ),
    "Q5": (
        "SELECT n.n_name, "
        "SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue "
        "FROM customer c "
        "JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE c.c_nationkey = s.s_nationkey AND r.r_name = 'ASIA' "
        "AND o.o_orderdate >= '1994-01-01' AND o.o_orderdate < '1995-01-01' "
        "GROUP BY n.n_name ORDER BY revenue DESC"
    ),
    "Q6": (
        "SELECT SUM(l_extendedprice * l_discount) AS revenue FROM lineitem "
        "WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1995-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
    "Q12": (
        "SELECT l.l_shipmode, "
        "SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS high_line_count, "
        "SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS low_line_count "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
        "WHERE l.l_shipmode IN ('MAIL', 'SHIP') "
        "AND l.l_commitdate < l.l_receiptdate "
        "AND l.l_shipdate < l.l_commitdate "
        "AND l.l_receiptdate >= '1994-01-01' "
        "AND l.l_receiptdate < '1995-01-01' "
        "GROUP BY l.l_shipmode ORDER BY l.l_shipmode"
    ),
    "Q14": (
        "SELECT 100.00 * SUM(CASE WHEN p.p_type LIKE 'PROMO%' "
        "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) / "
        "SUM(l.l_extendedprice * (1 - l.l_discount)) AS promo_revenue "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE l.l_shipdate >= '1995-09-01' AND l.l_shipdate < '1995-10-01'"
    ),
}


def crosscheck(s, tables):
    import pandas as pd

    cust, orders, li = tables[0], tables[1], tables[2]
    supp, nation, region, part = tables[3], tables[4], tables[5], tables[6]
    df = pd.DataFrame(li.to_pydict())  # temporal columns arrive as dates
    # Q6
    m = (
        (df.l_shipdate >= datetime.date(1994, 1, 1))
        & (df.l_shipdate < datetime.date(1995, 1, 1))
        & (df.l_discount >= 0.05) & (df.l_discount <= 0.07)
        & (df.l_quantity < 24)
    )
    want = float((df[m].l_extendedprice * df[m].l_discount).sum())
    got = s.sql(QUERIES["Q6"]).to_pylist()[0][0]
    assert abs(got - want) < 1e-6 * max(abs(want), 1), (got, want)
    # Q1 group count + one aggregate
    m1 = df.l_shipdate <= datetime.date(1998, 9, 2)
    g = df[m1].groupby(["l_returnflag", "l_linestatus"])
    rows = s.sql(QUERIES["Q1"]).to_pylist()
    assert len(rows) == len(g)
    want_n = {k: len(v) for k, v in g.groups.items()}
    for r in rows:
        assert r[-1] == want_n[(r[0], r[1])]
    # Q5: 6-way join revenue by nation
    do = pd.DataFrame(orders.to_pydict())
    dc = pd.DataFrame(cust.to_pydict())
    ds = pd.DataFrame(supp.to_pydict())
    dn = pd.DataFrame(nation.to_pydict())
    dr = pd.DataFrame(region.to_pydict())
    j = (df.merge(do, left_on="l_orderkey", right_on="o_orderkey")
           .merge(dc, left_on="o_custkey", right_on="c_custkey")
           .merge(ds, left_on="l_suppkey", right_on="s_suppkey")
           .merge(dn, left_on="s_nationkey", right_on="n_nationkey")
           .merge(dr, left_on="n_regionkey", right_on="r_regionkey"))
    j = j[(j.c_nationkey == j.s_nationkey) & (j.r_name == "ASIA")
          & (j.o_orderdate >= datetime.date(1994, 1, 1))
          & (j.o_orderdate < datetime.date(1995, 1, 1))]
    want5 = (j.l_extendedprice * (1 - j.l_discount)).groupby(j.n_name).sum()
    got5 = s.sql(QUERIES["Q5"]).to_pylist()
    assert len(got5) == len(want5), (len(got5), len(want5))
    for name, rev in got5:
        assert abs(rev - want5[name]) < 1e-6 * max(abs(want5[name]), 1)
    # Q12: conditional counts by ship mode
    j12 = df.merge(do, left_on="l_orderkey", right_on="o_orderkey")
    j12 = j12[j12.l_shipmode.isin(["MAIL", "SHIP"])
              & (j12.l_commitdate < j12.l_receiptdate)
              & (j12.l_shipdate < j12.l_commitdate)
              & (j12.l_receiptdate >= datetime.date(1994, 1, 1))
              & (j12.l_receiptdate < datetime.date(1995, 1, 1))]
    hi = j12.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    for mode, h, lo in s.sql(QUERIES["Q12"]).to_pylist():
        m12 = j12.l_shipmode == mode
        assert h == int(hi[m12].sum()) and lo == int((~hi[m12]).sum())
    # Q14: promo ratio
    dp = pd.DataFrame(part.to_pydict())
    j14 = df.merge(dp, left_on="l_partkey", right_on="p_partkey")
    j14 = j14[(j14.l_shipdate >= datetime.date(1995, 9, 1))
              & (j14.l_shipdate < datetime.date(1995, 10, 1))]
    rev = j14.l_extendedprice * (1 - j14.l_discount)
    want14 = 100.0 * rev[j14.p_type.str.startswith("PROMO")].sum() / rev.sum()
    (got14,) = s.sql(QUERIES["Q14"]).to_pylist()[0]
    assert abs(got14 - want14) < 1e-6 * max(abs(want14), 1), (got14, want14)
    print("cross-check vs pandas: OK (Q1/Q5/Q6/Q12/Q14)", file=sys.stderr)


def main():
    n_li = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21
    t0 = time.time()
    s, tables = build(n_li)
    print(f"build: {time.time()-t0:.1f}s  lineitem={n_li}", file=sys.stderr)
    if n_li <= (1 << 18):
        crosscheck(s, tables)
    for name, q in QUERIES.items():
        s.sql(q)  # warm/compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = s.sql(q)
            ts.append(time.perf_counter() - t0)
        print(
            f"{name}: {min(ts)*1e3:8.1f} ms  "
            f"{n_li/min(ts)/1e6:7.2f}M lineitem rows/s  "
            f"({out.num_rows} rows)"
        )


if __name__ == "__main__":
    main()
