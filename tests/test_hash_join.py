"""Open-addressing hash-join build/probe tests (ops/hash_join.py).

Semantics parity target: real equi-join matching — the redesign of the
reference's Cartesian join_batches (executor.rs:500-540), restricted to
unique build keys (the engine's FK fast-path contract)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import query_engine_tpu  # noqa: F401
from query_engine_tpu.ops.hash_join import (
    hash_build, hash_join_unique, hash_probe_unique, table_size_for,
)


def _check(bkeys, pkeys, pok=None, dtype=np.int64):
    nb, npr = len(bkeys), len(pkeys)
    bkeys = np.asarray(bkeys, dtype)
    pkeys = np.asarray(pkeys, dtype)
    if pok is None:
        pok = np.ones(npr, bool)
    T = table_size_for(nb)
    ri, m = jax.jit(hash_join_unique, static_argnums=4)(
        jnp.asarray(pkeys), jnp.asarray(pok),
        jnp.asarray(bkeys), jnp.ones(nb, bool), T,
    )
    ri, m = np.asarray(ri), np.asarray(m)
    lookup = {int(k): i for i, k in enumerate(bkeys)}
    for i in range(npr):
        if not pok[i]:
            assert not m[i]
        elif int(pkeys[i]) in lookup:
            assert m[i] and ri[i] == lookup[int(pkeys[i])], i
        else:
            assert not m[i], i
    return ri, m


def test_hash_join_basic_hits_and_misses():
    rng = np.random.default_rng(1)
    bkeys = rng.choice(1 << 40, 2000, replace=False)
    hits = rng.choice(bkeys, 3000)
    misses = rng.integers(1 << 41, 1 << 42, 1000)
    pkeys = np.concatenate([hits, misses])
    rng.shuffle(pkeys)
    _check(bkeys, pkeys)


def test_hash_join_i32_and_negative_keys():
    bkeys = np.array([-5, -1, 0, 3, 7, 2**31 - 1, -(2**31)], np.int32)
    pkeys = np.array([0, -5, 100, 2**31 - 1, -(2**31), 4], np.int32)
    _check(bkeys, pkeys, dtype=np.int32)


def test_hash_join_probe_ok_mask_excludes_rows():
    bkeys = [1, 2, 3]
    pkeys = [1, 2, 3, 1]
    pok = np.array([True, False, True, True])
    ri, m = _check(bkeys, pkeys, pok)
    assert m.tolist() == [True, False, True, True]


def test_hash_join_adversarial_same_slot_cluster():
    """Many keys landing near each other exercises long probe chains."""
    # sequential keys after mixing may still cluster; force high load
    bkeys = np.arange(100, dtype=np.int64) * 4096
    T = 128  # nearly 80% load
    ri, m = jax.jit(hash_join_unique, static_argnums=4)(
        jnp.asarray(bkeys), jnp.ones(100, bool),
        jnp.asarray(bkeys), jnp.ones(100, bool), T,
    )
    assert np.asarray(m).all()
    assert np.array_equal(np.asarray(ri), np.arange(100))


def test_hash_build_then_probe_separately():
    bkeys = jnp.asarray([10, 20, 30, 40], jnp.int64)
    tk, tr = hash_build(bkeys, jnp.ones(4, bool), 128)
    occupied = int(np.sum(np.asarray(tr) != 2147483647))
    assert occupied == 4
    ri, m = hash_probe_unique(
        tk, tr, jnp.asarray([20, 99], jnp.int64), jnp.ones(2, bool)
    )
    assert np.asarray(m).tolist() == [True, False]
    assert int(ri[0]) == 1


def test_table_size_for():
    assert table_size_for(0) == 128
    assert table_size_for(64) == 128
    assert table_size_for(65) == 256
    t = table_size_for(1 << 20)
    assert t == (1 << 21) and (t & (t - 1)) == 0
