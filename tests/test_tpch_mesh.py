"""TPC-H through the 8-device mesh: every query from the full battery runs
through Session(mesh=...) and returns EXACTLY the single-device rows.

Queries the mesh planner cannot lower (outer-residual joins, correlated
lookups, ...) must fall back transparently — same answers either way; the
fallback path is part of what this certifies. Reference analog: the
distributed executor that only echoes its input
(crates/query-distributed/src/executor.rs:242-251)."""

import os
import sys

import jax
import pytest

# full-battery differential: the fast profile (-m 'not slow') skips it
pytestmark = pytest.mark.slow

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
    ),
)

import tpch_mini  # noqa: E402

from query_engine_tpu.engine.session import Session  # noqa: E402
from query_engine_tpu.parallel.mesh import make_mesh  # noqa: E402


@pytest.fixture(scope="module")
def sessions():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest forces an 8-device CPU mesh"
    single, tables = tpch_mini.build(1 << 13)
    meshed = Session(mesh=make_mesh(devs[:8]))
    for name, batch in zip(
        ("customer", "orders", "lineitem", "supplier", "nation", "region",
         "part", "partsupp"),
        tables,
    ):
        meshed.register_table(name, batch)
    return single, meshed


def _cells_match(x, y):
    if isinstance(x, float) and isinstance(y, float):
        # partial/final mesh aggregation reorders float additions; allow
        # accumulated last-ulp drift, nothing more
        return abs(x - y) <= 1e-9 * max(abs(x), abs(y), 1.0)
    return x == y


@pytest.mark.parametrize("q", sorted(tpch_mini.QUERIES))
def test_mesh_matches_single_device(sessions, q):
    single, meshed = sessions
    a = single.sql(tpch_mini.QUERIES[q])
    mp = meshed.mesh_pipeline
    before = mp.stats["compiles"] + mp.stats["hits"]
    b = meshed.sql(tpch_mini.QUERIES[q])
    # every one of the 22 queries must actually LOWER to a shard_map
    # program (verified census: zero fallbacks, 1-16 all_to_all exchanges
    # per query) — not silently run single-device
    assert mp.stats["compiles"] + mp.stats["hits"] > before, q
    # per-query demotion census: how much of the plan ran sharded vs as
    # single-device eager leaves (printed with pytest -s; -rA shows it too)
    c = mp.last_census or {}
    print(
        f"census {q}: compute={c.get('n_compute')} "
        f"exchanges={c.get('n_exchange')} leaves={c.get('leaves')} "
        f"eager={c.get('eager_leaves')} eager_rows={c.get('eager_rows')} "
        f"kinds={c.get('eager_kinds')}"
    )
    assert a.schema.names() == b.schema.names()
    ra, rb = a.to_pylist(), b.to_pylist()
    assert len(ra) == len(rb), (q, len(ra), len(rb))
    for i, (x, y) in enumerate(zip(ra, rb)):
        assert len(x) == len(y) and all(
            _cells_match(a_, b_) for a_, b_ in zip(x, y)
        ), (q, i, x, y)
