"""Generative differential fuzz for the MESH path: the same random query
surface as test_fuzz_compiled (filters, aggregates, joins incl. counted
unbounded-dup, set ops, windows, subqueries, grouping sets, DISTINCT) run
through Session(mesh=8 virtual devices) vs the single-device engine.

Mesh-ineligible shapes fall back inside Session — every query must still
return identical rows either way, so this certifies both the lowering AND
the fallback routing. Float aggregates compare with a small relative
tolerance: partial->final combining legitimately reassociates float sums.
"""

import math
import random

import pytest

# full-battery differential: the fast profile (-m 'not slow') skips it
pytestmark = pytest.mark.slow

import jax

import query_engine_tpu  # noqa: F401
from query_engine_tpu.engine.session import Session
from query_engine_tpu.parallel.mesh import make_mesh

from tests.test_fuzz_compiled import gen_query, make_session

N_QUERIES = 60


def _mesh_session() -> Session:
    devs = jax.devices()
    assert len(devs) >= 8, "conftest forces an 8-device CPU mesh"
    base = make_session(True)
    s = Session(mesh=make_mesh(devs[:8]))
    for name in ("t1", "t2", "t3"):
        s.register_table(name, base.sources[name].scan())
    return s


@pytest.fixture(scope="module")
def sessions():
    return _mesh_session(), make_session(True)


def _key(row):
    return tuple(
        (x is None, repr(type(x)), x if x is not None else 0) for x in row
    )


def _cells_match(x, y):
    if isinstance(x, float) and isinstance(y, float):
        if math.isnan(x) and math.isnan(y):
            return True
        return x == pytest.approx(y, rel=1e-9, abs=1e-9)
    return x == y


@pytest.mark.parametrize("seed", range(N_QUERIES))
def test_fuzz_mesh_vs_single(sessions, seed):
    rnd = random.Random(seed)
    q, ordered = gen_query(rnd)
    dist, single = sessions
    a = dist.sql(q)
    b = single.sql(q)
    assert a.schema.names() == b.schema.names(), q
    ra, rb = a.to_pylist(), b.to_pylist()
    if not ordered:
        ra, rb = sorted(ra, key=_key), sorted(rb, key=_key)
    assert len(ra) == len(rb), q
    for x, y in zip(ra, rb):
        assert len(x) == len(y) and all(
            _cells_match(cx, cy) for cx, cy in zip(x, y)
        ), f"{q}\n{x}\n{y}"
