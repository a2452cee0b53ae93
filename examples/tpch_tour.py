"""TPC-H tour: the standard analytics benchmark end-to-end on the engine.

Builds the 8-table TPC-H schema synthetically (reusing the generator in
benchmarks/tpch_mini.py) and walks REPRESENTATIVE queries from the full
22-query battery, each exercising a different part of the engine:

  Q1  multi-key string grouping + 8 aggregates  -> one compiled program
  Q3  3-way FK join chain + top-k               -> rank-lookup joins
  Q13 LEFT JOIN with a residual ON condition    -> recompute-unmatched
  Q15 shared CTE + MAX equality                 -> single materialization
  Q17 correlated scalar 0.2*AVG(x)              -> grouped lookup
  Q21 EXISTS with inequality correlation        -> per-group MIN/MAX bounds

All 22 run (and cross-check against pandas) in tests/test_tpch.py; the
8-device-mesh differential is tests/test_tpch_mesh.py. The reference
cannot run ANY of these: its executor stubs joins as Cartesian products
(crates/query-executor/src/executor.rs:500-540) and errors on every
subquery form (operators.rs:34-52).

Run: JAX_PLATFORMS=cpu python examples/tpch_tour.py [lineitem_rows]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"
))

import query_engine_tpu  # noqa: F401,E402
import tpch_mini  # noqa: E402
from query_engine_tpu.cli.format import format_table  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
t0 = time.time()
s, _tables = tpch_mini.build(n)
print(f"built 8 TPC-H tables, lineitem={n} rows  ({time.time()-t0:.1f}s)\n")

TOUR = [
    ("Q1 — pricing summary (multi-key grouping, 8 aggregates, "
     "one compiled XLA program)", "Q1"),
    ("Q3 — shipping priority (customer⋈orders⋈lineitem, group, top-10)",
     "Q3"),
    ("Q13 — customer order-count distribution (LEFT JOIN with residual "
     "ON: unmatched customers still count as zero)", "Q13"),
    ("Q15 — top supplier (shared CTE materializes ONCE; the MAX lookup "
     "sees bit-identical sums)", "Q15"),
    ("Q17 — small-quantity revenue (correlated scalar subquery "
     "0.2 * AVG per part)", "Q17"),
    ("Q21 — suppliers who alone kept orders waiting (EXISTS / NOT EXISTS "
     "with l2.l_suppkey != l1.l_suppkey inequality correlation)", "Q21"),
]

for title, key in TOUR:
    q = tpch_mini.QUERIES[key]
    s.sql(q)  # warm: compile the program(s) for this shape
    t0 = time.perf_counter()
    out = s.sql(q)
    ms = (time.perf_counter() - t0) * 1e3
    print(f"== {title}")
    print(f"   {ms:7.1f} ms   {out.num_rows} rows")
    head = out.slice(0, min(5, out.num_rows)) if out.num_rows > 5 else out
    print(format_table(head))
    print()

print("EXPLAIN for Q3 (plan the engine compiled):")
for (line,) in s.sql("EXPLAIN " + tpch_mini.QUERIES["Q3"]).to_pylist():
    print("  " + line)
