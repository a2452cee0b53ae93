"""Probe: do TPU scatters/gathers pay per ROW or per ELEMENT?

TPU_DESIGN #9/#13 models random gather/scatter as element-serial
(~10-12 ns per scattered/gathered WORD). If the serial dimension is the
ROW (indices) and the trailing lanes vectorize, then a [n, k]-lane
segment_sum costs ~the same as [n] — and the chunked-i32 aggregate's
k scatter passes (plus the count pass) collapse into ONE multi-lane
scatter. Same question for gathers: x[idx] with x: [T, k].

Run SOLO on the TPU:  python benchmarks/probe_lane_scatter.py [n_rows]
Prints amortized ms per variant (two-point fori_loop, salt-chained).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import query_engine_tpu  # noqa: F401  (x64)
import jax
import jax.numpy as jnp


def amortized_ms(op, args, k=8, reps=3):
    def digest(out):
        d = jnp.int64(0)
        for leaf in jax.tree_util.tree_leaves(out):
            d = d + leaf.ravel()[0].astype(jnp.int64)
        return d & jnp.int64(1)

    def make(kk):
        def loop(*a):
            return jax.lax.fori_loop(
                0, kk, lambda i, salt: digest(op(salt, *a)), jnp.int64(0)
            )
        return jax.jit(loop)

    def best(f):
        float(np.asarray(f(*args)))  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(*args)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = best(make(k)), best(make(3 * k))
    return (t_hi - t_lo) * 1e3 / (2 * k)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 23
    segs = 1 << 20
    rng = np.random.default_rng(0)
    gid = jnp.asarray(rng.integers(0, segs, n), jnp.int32)
    val = jnp.asarray(rng.integers(0, 1 << 15, n), jnp.int32)
    print(f"n={n} segments={segs}", file=sys.stderr)

    def scat_lanes(k_lanes):
        def op(salt, gid, val):
            v = (val + salt.astype(val.dtype))
            if k_lanes == 1:
                return jax.ops.segment_sum(v, gid, num_segments=segs)
            m = jnp.stack([v + i for i in range(k_lanes)], axis=1)
            return jax.ops.segment_sum(m, gid, num_segments=segs)
        return op

    for k_lanes in (1, 2, 4, 8, 16):
        ms = amortized_ms(scat_lanes(k_lanes), (gid, val))
        print(f"scatter_add [n,{k_lanes:>2}]: {ms:8.2f} ms "
              f"({ms / (n / 1e9):6.2f} ns/row)")

    # gather: table [T, k] vs k separate [T] gathers
    T = 1 << 20
    tbl = jnp.asarray(rng.integers(0, 1 << 30, (T, 16)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, T, n), jnp.int32)

    def gath_lanes(k_lanes):
        def op(salt, tbl, idx):
            i = (idx + salt.astype(idx.dtype)) % T
            if k_lanes == 1:
                return jnp.sum(tbl[i, 0].astype(jnp.int64))
            return jnp.sum(tbl[i, :k_lanes].astype(jnp.int64))
        return op

    for k_lanes in (1, 2, 4, 8, 16):
        ms = amortized_ms(gath_lanes(k_lanes), (tbl, idx))
        print(f"gather [T,{k_lanes:>2}]:      {ms:8.2f} ms "
              f"({ms / (n / 1e9):6.2f} ns/row)")


if __name__ == "__main__":
    main()
