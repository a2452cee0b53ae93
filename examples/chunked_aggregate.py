"""HBM-bounded execution: capacity-chunked aggregates.

At 100M+ rows a whole-query compiled segment's intermediates exceed a
single chip's HBM. The engine detects the shape

    [LIMIT] [ORDER BY] [HAVING] GROUP BY ... over (filters/projections/
        FK joins on ONE big table)

and runs it CHUNKED: the big table's device planes are sliced into
fixed-capacity chunks, a partial aggregate runs per chunk through the
normal compiled pipeline (ONE compiled program shared by all chunks),
the partial groups concatenate, and a final combine + the group-table
operators produce the answer. Peak memory ≈ resident table + one
chunk's working set. (engine/chunked.py; BASELINE config #5.)

This demo shrinks the engage threshold via env so the path is visible at
laptop scale — production defaults engage at 2^26 rows.

Run: JAX_PLATFORMS=cpu python examples/chunked_aggregate.py
"""

import os
import sys

os.environ["QE_CHUNK_ENGAGE"] = str(1 << 14)   # demo: chunk above 16k rows
os.environ["QE_CHUNK_ROWS"] = str(1 << 13)     # 8k-row chunks

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from query_engine_tpu.engine.session import Session  # noqa: E402
from query_engine_tpu.cli.format import format_table  # noqa: E402

rng = np.random.default_rng(7)
N = 120_000
s = Session()
s.register_table("sales", {
    "store": rng.integers(0, 50, N).tolist(),
    "amount": rng.integers(1, 500, N).tolist(),
    "units": rng.integers(1, 10, N).tolist(),
})
s.register_table("stores", {
    "s_id": list(range(50)),
    "margin": rng.integers(10, 40, 50).tolist(),
})

q = (
    "SELECT st.margin, COUNT(*) AS orders, SUM(sa.amount) AS revenue, "
    "AVG(sa.units) AS avg_units "
    "FROM sales sa JOIN stores st ON sa.store = st.s_id "
    "WHERE sa.amount > 20 "
    "GROUP BY st.margin HAVING COUNT(*) > 100 "
    "ORDER BY revenue DESC LIMIT 8"
)
print("query:", q)
r = s.sql(q)
print(format_table(r))
st = s.executor.chunked.stats
print(f"\nchunked stats: {st}")
assert st["queries"] == 1 and st["chunks"] >= 8, st
print(
    f"-> the 120k-row fact table ran as {st['chunks']} chunks of 8k rows;\n"
    "   each chunk joined the full (small) store table, partially\n"
    "   aggregated, and only the per-chunk GROUP rows were kept.\n"
)

# same answer as the one-shot path:
os.environ["QE_CHUNK_ENGAGE"] = str(1 << 30)
s2 = Session()
s2.register_table("sales", {
    k: v for k, v in s.sources["sales"].scan().to_pydict().items()
})
s2.register_table("stores", {
    k: v for k, v in s.sources["stores"].scan().to_pydict().items()
})
assert s2.sql(q).to_pylist() == r.to_pylist()
print("one-shot path returns the identical result ✓")
