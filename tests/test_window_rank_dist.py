"""PERCENT_RANK / CUME_DIST / NTH_VALUE window functions.

The reference's window support is a pass-through stub (executor.rs:76-80);
ours computes them from sorted segment/peer boundaries (ops/kernels.py
percent_rank_sorted / cume_dist_sorted; NTH_VALUE via value_at on the
segment start + frame-end validity). PERCENT_RANK and CUME_DIST join
RANK/DENSE_RANK in the shared-sort family: specs with a matching
PARTITION BY + ORDER BY prefix reuse one sort permutation.
"""

import numpy as np
import pandas as pd
import pytest

import jax

from query_engine_tpu.engine.session import Session
from query_engine_tpu.parallel.mesh import make_mesh

RNG = np.random.default_rng(31)
N = 1200
K = RNG.integers(0, 9, N)
V = RNG.integers(0, 25, N)  # heavy ties


def make_session(mesh=None):
    s = Session(mesh=mesh)
    s.register_table("t", {
        "id": list(range(N)),
        "k": [int(x) for x in K],
        "v": [int(x) for x in V],
    })
    return s


def pandas_expect():
    df = pd.DataFrame({"id": range(N), "k": K, "v": V})
    g = df.groupby("k")["v"]
    cnt = g.transform("size").astype(float)
    rmin = g.rank(method="min")
    pr = ((rmin - 1) / (cnt - 1).clip(lower=1)).where(cnt > 1, 0.0)
    cd = g.rank(method="max") / cnt
    return pr, cd


def test_percent_rank_cume_dist_vs_pandas():
    s = make_session()
    rows = s.sql(
        "SELECT id, PERCENT_RANK() OVER (PARTITION BY k ORDER BY v) AS pr, "
        "CUME_DIST() OVER (PARTITION BY k ORDER BY v) AS cd "
        "FROM t ORDER BY id"
    ).to_pylist()
    pr, cd = pandas_expect()
    for i, p, c in rows:
        assert p == pytest.approx(pr[i], abs=1e-12)
        assert c == pytest.approx(cd[i], abs=1e-12)


def test_single_row_partitions_and_global():
    s = Session()
    s.register_table("e", {"k": [1, 2, 3], "v": [9, 5, 7]})
    rows = s.sql(
        "SELECT k, PERCENT_RANK() OVER (PARTITION BY k ORDER BY v) AS pr, "
        "CUME_DIST() OVER (PARTITION BY k ORDER BY v) AS cd FROM e ORDER BY k"
    ).to_pylist()
    assert rows == [(1, 0.0, 1.0), (2, 0.0, 1.0), (3, 0.0, 1.0)]
    rows = s.sql(
        "SELECT v, PERCENT_RANK() OVER (ORDER BY v) AS pr, "
        "CUME_DIST() OVER (ORDER BY v) AS cd FROM e ORDER BY v"
    ).to_pylist()
    assert rows == [(5, 0.0, pytest.approx(1 / 3)),
                    (7, 0.5, pytest.approx(2 / 3)),
                    (9, 1.0, 1.0)]


def test_nth_value_frames_and_nulls():
    s = Session()
    s.register_table("e", {
        "k": [1] * 5 + [2] * 2,
        "v": [10, 20, 20, 30, None, 7, 8],
    })
    rows = s.sql(
        "SELECT k, v, NTH_VALUE(v, 3) OVER (PARTITION BY k ORDER BY v) AS d, "
        "NTH_VALUE(v, 3) OVER (PARTITION BY k ORDER BY v ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS u "
        "FROM e ORDER BY k, v"
    ).to_pylist()
    # k=1 sorted: 10,20,20,30,NULL (nulls last); 3rd = 20
    # default frame: row 1 (10) sees only rows <= its last peer -> pos 3
    # not reached -> NULL; rows at 20 reach it.
    by_v = {(r[0], r[1]): (r[2], r[3]) for r in rows}
    assert by_v[(1, 10)] == (None, 20)
    assert by_v[(1, 20)] == (20, 20)
    assert by_v[(1, 30)] == (20, 20)
    assert by_v[(1, None)] == (20, 20)
    # 2-row partition: 3rd value never exists
    assert by_v[(2, 7)] == (None, None)
    assert by_v[(2, 8)] == (None, None)


def test_nth_value_position_validation():
    s = Session()
    s.register_table("e", {"v": [1, 2]})
    with pytest.raises(Exception, match=">= 1"):
        s.sql("SELECT NTH_VALUE(v, 0) OVER (ORDER BY v) FROM e")


def test_shared_sort_with_rank_family():
    s = make_session()
    s.sql(
        "SELECT RANK() OVER (PARTITION BY k ORDER BY v), "
        "PERCENT_RANK() OVER (PARTITION BY k ORDER BY v), "
        "CUME_DIST() OVER (PARTITION BY k ORDER BY v) FROM t"
    )
    st = s.executor.pipeline.stats
    assert st.get("window_sorts") == 1, st  # 3 specs, ONE sort


def test_mesh_matches_single_device():
    devs = jax.devices()
    assert len(devs) >= 8
    sql = (
        "SELECT id, PERCENT_RANK() OVER (PARTITION BY k ORDER BY v) AS pr, "
        "CUME_DIST() OVER (PARTITION BY k ORDER BY v) AS cd, "
        "NTH_VALUE(v, 2) OVER (PARTITION BY k ORDER BY v) AS nv "
        "FROM t ORDER BY id"
    )
    a = make_session().sql(sql).to_pylist()
    b = make_session(mesh=make_mesh(devs[:8])).sql(sql).to_pylist()
    assert a == b


@pytest.mark.slow
def test_global_rank_dist_lowers_to_mesh():
    # no PARTITION BY: PERCENT_RANK/CUME_DIST ride the ("rank_dist",)
    # patch family — range exchange + prior-shard offset + broadcast total
    devs = jax.devices()
    sql = ("SELECT id, CUME_DIST() OVER (ORDER BY v) AS cd, "
           "PERCENT_RANK() OVER (ORDER BY v) AS pr FROM t ORDER BY id")
    a = make_session().sql(sql).to_pylist()
    dist = make_session(mesh=make_mesh(devs[:8]))
    b = dist.sql(sql).to_pylist()
    assert a == b
    st = dist.mesh_pipeline.stats
    assert st["fallbacks"] == 0 and st["queries"] == 1, st
    # NTH_VALUE stays order-sensitive: correct through halo admission or
    # wholesale fallback
    sql2 = ("SELECT id, NTH_VALUE(v, 3) OVER (ORDER BY v ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nv "
            "FROM t ORDER BY id")
    assert (make_session().sql(sql2).to_pylist()
            == make_session(mesh=make_mesh(devs[:8])).sql(sql2).to_pylist())


# ---- value-distance (RANGE offset) frames ----------------------------------

@pytest.mark.slow
def test_range_offset_frames_vs_python():
    rng = np.random.default_rng(17)
    n = 1500
    k = rng.integers(0, 4, n)
    vn = [None if rng.random() < 0.06 else float(x)
          for x in rng.integers(0, 80, n)]
    s = Session()
    s.register_table("e", {"id": list(range(n)),
                           "k": [int(x) for x in k], "v": vn})
    got = s.sql(
        "SELECT id, "
        "SUM(v) OVER (PARTITION BY k ORDER BY v "
        "RANGE BETWEEN 5 PRECEDING AND 2 FOLLOWING) AS sm, "
        "COUNT(v) OVER (PARTITION BY k ORDER BY v DESC "
        "RANGE BETWEEN 5 PRECEDING AND 2 FOLLOWING) AS cd, "
        "AVG(v) OVER (PARTITION BY k ORDER BY v "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND 3 FOLLOWING) AS au, "
        "MIN(v) OVER (PARTITION BY k ORDER BY v "
        "RANGE BETWEEN 4 PRECEDING AND UNBOUNDED FOLLOWING) AS mu "
        "FROM e ORDER BY id"
    ).to_pylist()
    for i, sm, cd, au, mu in got:
        if vn[i] is None:
            assert sm is None and cd == 0 and au is None and mu is None
            continue
        grp = [x for x, kk in zip(vn, k) if kk == k[i] and x is not None]
        asc = [x for x in grp if vn[i] - 5 <= x <= vn[i] + 2]
        assert (sm is None) == (not asc)
        if asc:
            assert sm == pytest.approx(sum(asc))
        dsc = [x for x in grp if vn[i] - 2 <= x <= vn[i] + 5]
        assert cd == len(dsc)
        un = [x for x in grp if x <= vn[i] + 3]
        assert au == pytest.approx(sum(un) / len(un))
        lo = [x for x in grp if x >= vn[i] - 4]
        assert mu == pytest.approx(min(lo))


@pytest.mark.slow
def test_range_offset_frames_errors_and_mesh():
    s = Session()
    s.register_table("e", {"k": [1, 1], "v": [1.0, 2.0], "w": [1.0, 2.0]})
    with pytest.raises(Exception, match="one ORDER BY key"):
        s.sql("SELECT MAX(v) OVER (ORDER BY v, w RANGE BETWEEN 1 PRECEDING "
              "AND 1 FOLLOWING) FROM e")
    with pytest.raises(Exception, match="bounded RANGE offset"):
        s.sql("SELECT MIN(v) OVER (ORDER BY v RANGE BETWEEN 1 PRECEDING "
              "AND 1 FOLLOWING) FROM e")
    # mesh: partitioned specs run per shard; global falls back wholesale
    devs = jax.devices()
    data = {"id": list(range(400)),
            "k": [i % 3 for i in range(400)],
            "v": [float((i * 13) % 50) for i in range(400)]}
    sql = ("SELECT id, SUM(v) OVER (PARTITION BY k ORDER BY v "
           "RANGE BETWEEN 4 PRECEDING AND 4 FOLLOWING) AS r FROM e2 "
           "ORDER BY id")
    a = Session()
    a.register_table("e2", data)
    b = Session(mesh=make_mesh(devs[:8]))
    b.register_table("e2", data)
    assert a.sql(sql).to_pylist() == b.sql(sql).to_pylist()
    gsql = ("SELECT id, SUM(v) OVER (ORDER BY v RANGE BETWEEN 4 PRECEDING "
            "AND 4 FOLLOWING) AS r FROM e2 ORDER BY id")
    assert a.sql(gsql).to_pylist() == b.sql(gsql).to_pylist()
