"""Mini TPC-H: Q1, Q3, Q4, Q6 over synthetic tables through the full SQL
engine (parse -> plan -> compiled pipeline). Exercises multi-key string
grouping (Q1), 3-way FK joins with group+top-k (Q3), correlated EXISTS
(Q4), and date-range filter aggregation (Q6).

    python benchmarks/tpch_mini.py [lineitem_rows]   # default 2^21

At small scale, Q1/Q6 results are cross-checked against pandas.
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

    cust = ColumnBatch.from_pydict({
        "c_custkey": np.arange(n_cust),
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
    return s, (cust, orders, li)


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
    "Q6": (
        "SELECT SUM(l_extendedprice * l_discount) AS revenue FROM lineitem "
        "WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1995-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
}


def crosscheck(s, tables):
    import pandas as pd

    _, _, li = tables
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
    print("cross-check vs pandas: OK", file=sys.stderr)


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
