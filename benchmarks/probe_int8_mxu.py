"""Probe: int8 MXU one-hot grouped aggregate vs the bf16 production kernel.

v5e's MXU runs s8 x s8 -> s32 at ~2x the bf16 MAC rate. With 4-bit nibble
chunks (16 lanes/column, values 0..15) the per-step product fits int8 and
the cross-step int32 accumulation stays exact to 15 * n < 2^31 (n <= 2^27)
with NO lo16/hi split — half the accumulator VMEM and no per-step split
ops. HBM traffic matches production: two uint32 word planes per row,
nibbles built in VMEM.

Run SOLO on the TPU:  python benchmarks/probe_int8_mxu.py [n_rows]
Prints correctness vs jax.ops.segment_sum and amortized ms for both kernels.
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import query_engine_tpu  # noqa: F401  (enables x64)
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from query_engine_tpu.ops.pallas.group_agg import grouped_sum_count_i64

SUB = 1024
LANES = 128
G = 1024


def _kernel_s8(gid_ref, vlo_ref, vhi_ref, acc_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g = acc_ref.shape[0]
    giota = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    nib_shift = ((lane & 7) * 4).astype(jnp.uint32)
    acc = jnp.zeros((g, LANES), jnp.int32)
    for s in range(4):
        sl = pl.ds(s * SUB, SUB)
        gid = gid_ref[sl]
        vlo = vlo_ref[sl]
        vhi = vhi_ref[sl]
        one_hot = (gid[:, None] == giota).astype(jnp.int8)
        # lanes 0..7: vlo nibbles, 8..15: vhi nibbles, 16: count
        word = jnp.where(lane < 8, vlo[:, None], vhi[:, None])
        nib = (word >> nib_shift) & 0xF
        cval = jnp.where(lane < 16, nib, jnp.uint32(0))
        cval = jnp.where(lane == 16, jnp.uint32(gid[:, None] >= 0), cval)
        chunks = cval.astype(jnp.int32).astype(jnp.int8)
        acc = acc + jax.lax.dot_general(
            one_hot, chunks,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    acc_ref[...] += acc


@functools.partial(jax.jit, static_argnames=("num_groups",))
def grouped_sum_count_s8(values, ok, gid, num_groups):
    """16 nibble lanes + count lane; s8 matmul; exact to n = 2^27."""
    n = values.shape[0]
    u = jnp.where(ok, values, 0).astype(jnp.uint64)
    vlo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    vhi = (u >> jnp.uint64(32)).astype(jnp.uint32)
    gid_m = jnp.where(ok, gid, -1).astype(jnp.int32)
    blocks = -(-n // 4096)  # 8192-row blocks blow the 16MB VMEM stack at 16 nibble lanes
    n_pad = blocks * 4096
    vlo = jnp.pad(vlo, (0, n_pad - n))
    vhi = jnp.pad(vhi, (0, n_pad - n))
    gid_m = jnp.pad(gid_m, (0, n_pad - n), constant_values=-1)
    interpret = jax.devices()[0].platform == "cpu"
    with jax.enable_x64(False):
        row_spec = pl.BlockSpec((4096,), lambda i: (i,))
        tot = pl.pallas_call(
            _kernel_s8,
            grid=(blocks,),
            in_specs=[row_spec, row_spec, row_spec],
            out_specs=pl.BlockSpec((G, LANES), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((G, LANES), jnp.int32),
            interpret=interpret,
        )(gid_m, vlo, vhi)
    shifts = jnp.uint64(4) * jnp.arange(16, dtype=jnp.uint64)
    sums = jnp.sum(
        tot[:num_groups, :16].astype(jnp.uint64) << shifts[None, :], axis=1
    ).astype(jnp.int64)
    counts = tot[:num_groups, 16].astype(jnp.int64)
    return sums, counts


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 24
    rng = np.random.default_rng(3)
    values = jnp.asarray(rng.integers(0, 1 << 40, n), dtype=jnp.int64)
    ok = jnp.asarray(rng.random(n) < 0.97)
    gid = jnp.asarray(rng.integers(0, G, n), dtype=jnp.int32)

    ref_s = jax.ops.segment_sum(
        jnp.where(ok, values, 0), jnp.where(ok, gid, G), num_segments=G + 1
    )[:G]
    s8_s, s8_c = grouped_sum_count_s8(values, ok, gid, G)
    bf_s, bf_c = grouped_sum_count_i64(values, ok, gid, G)
    print("s8 correct:", bool(jnp.all(s8_s == ref_s)),
          " bf16 correct:", bool(jnp.all(bf_s == ref_s)))
    print("s8 counts correct:", bool(jnp.all(s8_c == bf_c)))

    def bench(f, label):
        def loop(v):
            def body(i, salt):
                s, c = f(v + salt, ok, gid, G)
                return (s[0] + c[0]) & jnp.int64(1)
            return jax.lax.fori_loop(0, 8, body, jnp.int64(0))
        j = jax.jit(loop)
        float(np.asarray(j(values)))  # compile
        t = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(j(values)))
            t.append(time.perf_counter() - t0)
        ms = min(t) * 1e3 / 8
        print(f"{label}: {ms:.2f} ms/iter amortized "
              f"({n / (ms / 1e3) / 1e6:.0f}M rows/s)")

    bench(grouped_sum_count_s8, "s8 nibble kernel ")
    bench(grouped_sum_count_i64, "bf16 byte kernel ")


if __name__ == "__main__":
    main()
