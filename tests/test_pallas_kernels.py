"""Pallas kernel correctness tests (interpret mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import query_engine_tpu  # noqa: F401
from query_engine_tpu.ops.pallas.group_agg import grouped_sum_count_i64


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
