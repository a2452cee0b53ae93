"""Pallas kernel correctness tests (interpret mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import query_engine_tpu  # noqa: F401
from query_engine_tpu.ops.pallas.group_agg import (
    grouped_sum_count, grouped_sum_count_i64,
)


@pytest.mark.parametrize("n,G", [(100, 7), (5000, 37), (2048, 1024)])
def test_mxu_grouped_sum_count_exact(n, G):
    rng = np.random.default_rng(n)
    vals = jnp.asarray(rng.integers(-(1 << 40), 1 << 40, n), jnp.int64)
    gid = jnp.asarray(rng.integers(0, G, n, dtype=np.int32))
    ok = jnp.asarray(rng.random(n) > 0.15)
    sums, counts = grouped_sum_count_i64(vals, ok, gid, G)
    ref_s = jax.ops.segment_sum(jnp.where(ok, vals, 0), gid, num_segments=G)
    ref_c = jax.ops.segment_sum(ok.astype(jnp.int64), gid, num_segments=G)
    assert bool(jnp.all(sums == ref_s))
    assert bool(jnp.all(counts == ref_c))


def test_mxu_grouped_sum_empty_groups():
    vals = jnp.asarray([5, 10], jnp.int64)
    gid = jnp.asarray([3, 3], jnp.int32)
    ok = jnp.ones(2, bool)
    sums, counts = grouped_sum_count_i64(vals, ok, gid, 8)
    assert sums[3] == 15 and counts[3] == 2
    assert int(jnp.sum(counts)) == 2


def test_mxu_grouped_sum_big_g_two_level():
    """G > GBLOCK exercises the group-block grid dimension."""
    rng = np.random.default_rng(11)
    n, G = 4000, 6000
    vals = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, n), jnp.int64)
    gid = jnp.asarray(rng.integers(0, G, n, dtype=np.int32))
    ok = jnp.asarray(rng.random(n) > 0.1)
    sums, counts = grouped_sum_count_i64(vals, ok, gid, G)
    ref_s = jax.ops.segment_sum(jnp.where(ok, vals, 0), gid, num_segments=G)
    ref_c = jax.ops.segment_sum(ok.astype(jnp.int64), gid, num_segments=G)
    assert bool(jnp.all(sums == ref_s))
    assert bool(jnp.all(counts == ref_c))


def test_mxu_grouped_sum_f64_fixed_point():
    """Float path: dynamic-scale fixed point, ~2^-40 relative accuracy."""
    rng = np.random.default_rng(7)
    n, G = 3000, 41
    vals = rng.normal(0.0, 1e7, n)
    gid = rng.integers(0, G, n, dtype=np.int32)
    ok = rng.random(n) > 0.2
    sums, counts = grouped_sum_count(
        jnp.asarray(vals), jnp.asarray(ok), jnp.asarray(gid), G
    )
    exp = np.zeros(G)
    cnt = np.zeros(G, np.int64)
    np.add.at(exp, gid[ok], vals[ok])
    np.add.at(cnt, gid[ok], 1)
    assert np.array_equal(np.asarray(counts), cnt)
    np.testing.assert_allclose(np.asarray(sums), exp, rtol=1e-9, atol=1e-3)


def test_mxu_grouped_sum_f64_ieee_semantics():
    """inf/-inf/NaN ride spare MXU lanes; IEEE results per group."""
    vals = jnp.asarray(
        [1.0, np.inf, 2.0, -np.inf, np.inf, -np.inf, np.nan, 5.0],
        jnp.float64,
    )
    gid = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 4], jnp.int32)
    ok = jnp.ones(8, bool)
    sums, counts = grouped_sum_count(vals, ok, gid, 5)
    s = np.asarray(sums)
    assert s[0] == np.inf           # finite + inf
    assert s[1] == -np.inf          # finite + -inf
    assert np.isnan(s[2])           # inf + -inf
    assert np.isnan(s[3])           # nan
    assert s[4] == 5.0
    assert np.asarray(counts).tolist() == [2, 2, 2, 1, 1]


def test_executor_mxu_aggregate_path_floats(monkeypatch):
    """Engine-level float SUM/AVG through the MXU path (interpret mode)."""
    monkeypatch.setenv("QE_FORCE_MXU_AGG", "1")
    from query_engine_tpu.engine.session import Session

    rng = np.random.default_rng(9)
    data = {
        "k": rng.integers(0, 8, 400).tolist(),
        "x": rng.normal(0, 1000, 400).tolist(),
    }
    s = Session()
    s.register_table("t", data)
    sql = "SELECT k, SUM(x), AVG(x), COUNT(x) FROM t GROUP BY k ORDER BY k"
    forced = s.sql(sql).to_pylist()

    monkeypatch.setenv("QE_FORCE_MXU_AGG", "0")
    s2 = Session()
    s2.register_table("t", data)
    default = s2.sql(sql).to_pylist()
    assert len(forced) == len(default)
    for a, b in zip(forced, default):
        assert a[0] == b[0] and a[3] == b[3]
        np.testing.assert_allclose(a[1], b[1], rtol=1e-9)
        np.testing.assert_allclose(a[2], b[2], rtol=1e-9)


def test_executor_mxu_aggregate_path(monkeypatch):
    """Force the MXU aggregate in the engine (interpret mode on CPU) and
    check exact results against the default path."""
    monkeypatch.setenv("QE_FORCE_MXU_AGG", "1")
    from query_engine_tpu.engine.session import Session

    rng = np.random.default_rng(4)
    data = {
        "k": rng.integers(0, 9, 300).tolist(),
        "v": rng.integers(-100, 100, 300).tolist(),
    }
    s = Session()
    s.register_table("t", data)
    sql = "SELECT k, COUNT(*), SUM(v), AVG(v) FROM t GROUP BY k ORDER BY k"
    forced = s.sql(sql).to_pylist()

    monkeypatch.setenv("QE_FORCE_MXU_AGG", "0")
    s2 = Session()
    s2.register_table("t", data)
    default = s2.sql(sql).to_pylist()
    assert forced == default


def test_mxu_small_table_gather():
    """One-hot matmul gather (ops/pallas/small_gather.py) == serial gather
    for small packed tables (interpret mode)."""
    from query_engine_tpu.ops.pallas.small_gather import mxu_gather_words

    rng = np.random.default_rng(3)
    T, n, W = 300, 4000, 3
    table = jnp.asarray(
        rng.integers(0, 2**32, (T, W), dtype=np.uint64).astype(np.uint32)
    )
    idx = rng.integers(-1, T, n).astype(np.int32)  # -1 = unmatched
    out = np.asarray(mxu_gather_words(jnp.asarray(idx), table, W))
    tbl = np.asarray(table)
    for i in range(0, n, 37):
        if idx[i] < 0:
            assert (out[i] == 0).all()
        else:
            assert np.array_equal(out[i], tbl[idx[i]])


def test_gather_columns_packed_mxu_small_route(monkeypatch):
    """Engine-level route: forced MXU small gather matches the serial path
    through a real FK-join query."""
    monkeypatch.setenv("QE_FORCE_MXU_AGG", "1")
    from query_engine_tpu.engine.session import Session

    rng = np.random.default_rng(5)
    fact = {
        "k": rng.integers(0, 50, 500).tolist(),
        "v": rng.integers(0, 100, 500).tolist(),
    }
    dim = {"id": list(range(50)), "w": rng.integers(0, 9, 50).tolist()}
    s = Session()
    s.register_table("f", fact)
    s.register_table("d", dim)
    sql = ("SELECT f.k, f.v, d.w FROM f JOIN d ON f.k = d.id "
           "ORDER BY f.k, f.v, d.w")
    forced = s.sql(sql).to_pylist()
    monkeypatch.setenv("QE_FORCE_MXU_AGG", "0")
    s2 = Session()
    s2.register_table("f", fact)
    s2.register_table("d", dim)
    assert forced == s2.sql(sql).to_pylist()


@pytest.mark.slow
def test_mxu_multi_column_batched_aggregate():
    """Up to 10 aggregate columns share one matmul (grouped_sums_counts_multi)."""
    from query_engine_tpu.ops.pallas.group_agg import grouped_sums_counts_multi

    rng = np.random.default_rng(31)
    n, G = 3000, 77
    gid = jnp.asarray(rng.integers(0, G, n, dtype=np.int32))
    items = []
    expects = []
    for c in range(7):
        if c % 2 == 0:
            v = rng.integers(-(1 << 35), 1 << 35, n)
            vj = jnp.asarray(v, jnp.int64)
        else:
            v = rng.normal(0, 10**c, n)
            vj = jnp.asarray(v)
        ok = rng.random(n) > (0.05 * c)
        items.append((vj, jnp.asarray(ok)))
        es = np.zeros(G, np.float64)
        ec = np.zeros(G, np.int64)
        np.add.at(es, np.asarray(gid)[ok], v[ok])
        np.add.at(ec, np.asarray(gid)[ok], 1)
        expects.append((es, ec))
    outs = grouped_sums_counts_multi(items, gid, G)
    assert len(outs) == 7
    for c, ((s, cnt), (es, ec)) in enumerate(zip(outs, expects)):
        assert np.array_equal(np.asarray(cnt), ec), f"counts col {c}"
        if c % 2 == 0:
            assert np.array_equal(np.asarray(s), es.astype(np.int64)), f"col {c}"
        else:
            np.testing.assert_allclose(np.asarray(s), es, rtol=1e-9,
                                       atol=10**c * 1e-3, err_msg=f"col {c}")
