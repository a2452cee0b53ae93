"""All 22 TPC-H queries execute through the engine, full results matching
pandas (benchmarks/tpch_mini.py builds the synthetic tables and holds the
query text + the cross-check). The reference has no TPC-H coverage at all;
its executor stubs joins as Cartesian products
(crates/query-executor/src/executor.rs:500-540)."""

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
    ),
)

import datetime  # noqa: E402

import pandas as pd  # noqa: E402
import pytest  # noqa: E402

import tpch_mini  # noqa: E402


@pytest.mark.slow
def test_tpch_all22_crosscheck():
    s, tables = tpch_mini.build(1 << 13)
    tpch_mini.crosscheck(s, tables)


def test_tpch_fast_subset():
    """Fast-profile TPC-H representation: Q1/Q3/Q6/Q13 execute at small
    scale, with a pandas value check on Q6 (the full 22-query cross-check
    is the slow-marked test above)."""
    s, tables = tpch_mini.build(1 << 11)
    li = tables[2]
    df = pd.DataFrame(li.to_pydict())
    m = (
        (df.l_shipdate >= datetime.date(1994, 1, 1))
        & (df.l_shipdate < datetime.date(1995, 1, 1))
        & (df.l_discount >= 0.05) & (df.l_discount <= 0.07)
        & (df.l_quantity < 24)
    )
    want = float((df[m].l_extendedprice * df[m].l_discount).sum())
    got = s.sql(tpch_mini.QUERIES["Q6"]).to_pylist()[0][0]
    assert abs(got - want) < 1e-6 * max(1.0, abs(want))
    for q in ("Q1", "Q3", "Q13"):
        rows = s.sql(tpch_mini.QUERIES[q]).to_pylist()
        assert rows, q
