"""Pallas TPU kernel: grouped int64 sum/count as an MXU one-hot matmul.

The TPU-native answer to a hash-aggregate inner loop (pallas_guide.md):
scalar hash-table probing doesn't map to 8x128 lanes, but aggregation is a
matmul — for a block of B rows with dense group ids in [0, G):

    acc[G, C] += one_hot(gid_block)[B, G]^T @ chunks[B, C]

runs on the 128x128 systolic array. int64 values are split into 8x 8-bit
chunks (exact two's-complement recombination, same trick as
kernels._segment_sum_i64); the one-hot and chunks are bf16 (integers
<= 256 are exact in bf16), each block's [G, C] f32 product is exact
(<= 255 * B < 2^24), and cross-block accumulation happens in int32 in VMEM.

Applicability: dense gid (from group_ids/group_ids_direct), G <= ~4096
(VMEM-bounded). Count rides along as a 9th chunk column of ones.

Grid: one program per row block; the accumulator output block maps to the
same tile every step, so it accumulates across the sequential grid
(initialized at step 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 1024
CHUNK_COLS = 128  # lane width; 8 value chunks + 1 count column + padding


def _kernel(gid_ref, chunks_ref, acc_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gid = gid_ref[...]  # [B] int32, -1 for masked rows
    chunks = chunks_ref[...]  # [B, C] bf16
    g = acc_ref.shape[0]
    one_hot = (
        gid[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    ).astype(jnp.bfloat16)  # [B, G]; masked rows match nothing
    block = jax.lax.dot_general(
        one_hot, chunks,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G, C], exact: <= 255 * B < 2^24
    acc_ref[...] += block.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_groups",))
def grouped_sum_count_i64(
    values: jnp.ndarray,   # [n] int64
    ok: jnp.ndarray,       # [n] bool — rows to include
    gid: jnp.ndarray,      # [n] int32 dense group ids in [0, num_groups)
    num_groups: int,
) -> tuple:
    """Returns (sums[num_groups] int64, counts[num_groups] int64)."""
    n = values.shape[0]
    g_pad = max(128, -(-num_groups // 128) * 128)
    blocks = -(-n // BLOCK_ROWS)
    n_pad = blocks * BLOCK_ROWS

    u = jnp.where(ok, values, 0).astype(jnp.uint64)
    cols = []
    for k in range(8):
        cols.append(((u >> jnp.uint64(8 * k)) & jnp.uint64(0xFF)).astype(jnp.bfloat16))
    cols.append(ok.astype(jnp.bfloat16))  # count column
    chunks = jnp.stack(cols, axis=1)  # [n, 9]
    chunks = jnp.pad(chunks, ((0, n_pad - n), (0, CHUNK_COLS - 9)))
    gid_m = jnp.where(ok, gid, -1).astype(jnp.int32)
    gid_m = jnp.pad(gid_m, (0, n_pad - n), constant_values=-1)

    interpret = jax.devices()[0].platform == "cpu"
    # trace the kernel with x64 off: the engine's global jax_enable_x64 makes
    # index-map arithmetic default to i64, which Mosaic refuses to legalize
    with jax.enable_x64(False):
        acc = pl.pallas_call(
            _kernel,
            grid=(blocks,),
            in_specs=[
                pl.BlockSpec((BLOCK_ROWS,), lambda i: (i,)),
                pl.BlockSpec((BLOCK_ROWS, CHUNK_COLS), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((g_pad, CHUNK_COLS), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((g_pad, CHUNK_COLS), jnp.int32),
            interpret=interpret,  # CPU backend: correctness-testing path
        )(gid_m, chunks)

    # recombine chunk totals (mod 2^64 == exact two's complement)
    shifts = jnp.uint64(8) * jnp.arange(8, dtype=jnp.uint64)
    sums = jnp.sum(
        acc[:num_groups, :8].astype(jnp.uint64) << shifts[None, :], axis=1
    ).astype(jnp.int64)
    counts = acc[:num_groups, 8].astype(jnp.int64)
    return sums, counts
