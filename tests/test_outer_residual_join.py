"""Outer joins with residual ON conditions: the fused two-program path vs
the step-by-step oracle (both in executor._exec_outer_join_residual), on
randomized inputs across LEFT/RIGHT/FULL."""

import numpy as np
import pytest

from query_engine_tpu.engine.executor import QueryExecutor
from query_engine_tpu.engine.session import Session

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


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("q", QUERIES, ids=lambda q: q[:48])
def test_fused_matches_steps(monkeypatch, seed, q):
    fused = make_session(seed).sql(q).to_pylist()
    steps_sess = make_session(seed)
    monkeypatch.setattr(
        QueryExecutor, "_outer_residual_fused",
        lambda self, *a, **k: None,
    )
    steps = steps_sess.sql(q).to_pylist()
    assert sorted(map(repr, fused)) == sorted(map(repr, steps))
    assert fused == steps  # ORDER BY makes the full rows comparable


def test_fused_path_engages():
    s = make_session(7)
    s.sql(QUERIES[0])
    assert any(
        isinstance(k, tuple) and k and k[0] == "ojresA"
        for k in s.executor._fused_cache
    )
