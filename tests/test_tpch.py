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

import tpch_mini  # noqa: E402


def test_tpch_all22_crosscheck():
    s, tables = tpch_mini.build(1 << 13)
    tpch_mini.crosscheck(s, tables)
