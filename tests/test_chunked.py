"""Capacity-chunked aggregate execution (engine/chunked.py): partial per
row-chunk -> concat -> final combine, results identical to the one-shot
compiled path. The engage threshold is lowered via env so the path runs
at test sizes."""

import numpy as np
import pytest

from query_engine_tpu.engine.session import Session


@pytest.fixture
def small_chunks(monkeypatch):
    monkeypatch.setenv("QE_CHUNK_ENGAGE", "1024")
    monkeypatch.setenv("QE_CHUNK_ROWS", "512")


RNG = np.random.default_rng(23)
N = 5000
FACT = {
    "k": RNG.integers(0, 40, N).tolist(),
    "v": RNG.integers(1, 1000, N).tolist(),
    "f": RNG.normal(10, 3, N).round(4).tolist(),
}
for i in range(0, N, 77):
    FACT["v"][i] = None
for i in range(0, N, 53):
    FACT["k"][i] = None
DIM = {"d_id": list(range(40)), "w": RNG.integers(0, 100, 40).tolist()}


def run(sql, chunked: bool):
    s = Session()
    s.register_table("fact", FACT)
    s.register_table("dim", DIM)
    r = s.sql(sql).to_pylist()
    st = s.executor.chunked.stats
    if chunked:
        assert st["queries"] >= 1 and st["chunks"] >= 2, (
            f"chunked path did not engage: {st}"
        )
    else:
        assert st["queries"] == 0
    return r


def cmp(sql):
    a = run(sql, False)  # normal engage threshold: one-shot path
    import os

    os.environ["QE_CHUNK_ENGAGE"] = "1024"
    os.environ["QE_CHUNK_ROWS"] = "512"
    try:
        b = run(sql, True)
    finally:
        del os.environ["QE_CHUNK_ENGAGE"]
        del os.environ["QE_CHUNK_ROWS"]
    assert a == b, f"chunked diverges for {sql}\n{a[:4]}\n{b[:4]}"


def test_group_sum_count():
    cmp("SELECT k, COUNT(*) AS c, SUM(v) AS s FROM fact "
        "GROUP BY k ORDER BY k NULLS LAST")


def test_having_and_limit_above():
    cmp("SELECT k, SUM(v) AS s FROM fact GROUP BY k "
        "HAVING COUNT(*) > 10 ORDER BY s DESC LIMIT 7")


@pytest.mark.slow
def test_fk_join_below_aggregate():
    cmp("SELECT f.k, SUM(f.v + d.w) AS s, MIN(d.w) AS mw "
        "FROM fact f JOIN dim d ON f.k = d.d_id "
        "WHERE f.v > 50 GROUP BY f.k ORDER BY f.k")


def test_avg_min_max():
    cmp("SELECT k, AVG(v) AS a, MIN(v) AS lo, MAX(v) AS hi FROM fact "
        "WHERE v IS NOT NULL GROUP BY k ORDER BY k NULLS LAST")


def test_left_join_big_side_outer_ok():
    cmp("SELECT f.k, COUNT(d.w) AS c FROM fact f "
        "LEFT JOIN dim d ON f.k = d.d_id GROUP BY f.k "
        "ORDER BY f.k NULLS LAST")


def test_right_join_small_outer_not_chunked():
    # unmatched DIM rows would be emitted once per chunk: gate must reject
    import os

    os.environ["QE_CHUNK_ENGAGE"] = "1024"
    os.environ["QE_CHUNK_ROWS"] = "512"
    try:
        s = Session()
        s.register_table("fact", FACT)
        s.register_table("dim", {"d_id": [1, 2, 999], "w": [5, 6, 7]})
        r = s.sql(
            "SELECT d.d_id, COUNT(f.v) AS c FROM fact f "
            "RIGHT JOIN dim d ON f.k = d.d_id GROUP BY d.d_id "
            "ORDER BY d.d_id"
        ).to_pylist()
        assert s.executor.chunked.stats["queries"] == 0
        # d_id=999 matches nothing: COUNT(f.v)=0, exactly once
        assert r[-1] == (999, 0)
    finally:
        del os.environ["QE_CHUNK_ENGAGE"]
        del os.environ["QE_CHUNK_ROWS"]


def test_distinct_agg_not_chunked():
    import os

    os.environ["QE_CHUNK_ENGAGE"] = "1024"
    try:
        s = Session()
        s.register_table("fact", FACT)
        s.sql("SELECT k, COUNT(DISTINCT v) FROM fact GROUP BY k")
        assert s.executor.chunked.stats["queries"] == 0
    finally:
        del os.environ["QE_CHUNK_ENGAGE"]
