"""Pallas TPU kernel: small-table gather as an MXU one-hot matmul.

Random gathers are ~element-serial on TPU (~12 ns/row, docs/TPU_DESIGN.md
#9) — the single largest cost of FK join emits. When the build side is
small (T <= 4096 rows: dimension tables, dictionaries), gathering row
idx[i] from a packed table is a matmul instead:

    bytes[i, :] = one_hot(idx[i])[1, T] @ table_bytes[T, C]

Each output row selects exactly one table row (one 1 per one-hot row), so
every f32 product is an exact byte value <= 255 — no accumulation error,
no overflow. The table's uint32 words are split into 8-bit byte lanes
outside the kernel (T is small); the kernel emits the gathered byte lanes
and XLA recombines words outside. Measured v5e: the one-hot machinery
sustains ~2e13 MAC/s, so an 8M-row gather from a 1k-row table costs
~50 ms of MXU time vs ~100 ms serial — and scales with T, so tiny tables
are cheaper still.

Used by the compiled pipeline's FK join fast path via
kernels.gather_columns_packed(..., mxu_table=True) when the build
capacity fits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 8192
SUB = 1024
LANES = 128
MAX_TABLE = 4096  # one_hot tile [SUB, T] bf16 must fit VMEM


def _kernel(idx_ref, tbytes_ref, out_ref):
    t = tbytes_ref.shape[0]
    tiota = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    tb = tbytes_ref[...]  # [T, LANES] bf16 byte lanes
    for s in range(BLOCK_ROWS // SUB):
        sl = pl.ds(s * SUB, SUB)
        idx = idx_ref[sl]  # [SUB] int32; -1 rows match nothing -> zeros
        one_hot = (idx[:, None] == tiota).astype(jnp.bfloat16)
        out_ref[sl, :] = jax.lax.dot_general(
            one_hot, tb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_words",))
def mxu_gather_words(
    idx: jnp.ndarray,          # [n] int32 row indices into the table
    table_words: jnp.ndarray,  # [T, W] uint32 packed table rows
    n_words: int,
) -> jnp.ndarray:
    """Gather table_words[idx] via the MXU. Returns [n, W] uint32.
    Out-of-range idx (e.g. -1 for unmatched rows) yields zeros."""
    n = idx.shape[0]
    t = table_words.shape[0]
    t_pad = max(128, -(-t // 128) * 128)
    blocks = -(-n // BLOCK_ROWS)
    n_pad = blocks * BLOCK_ROWS
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, n_pad - n),
                    constant_values=-1)

    # byte lanes: lane 4w+k holds byte k of word w (W*4 <= LANES)
    tw = jnp.pad(table_words, ((0, t_pad - t), (0, 0)))
    cols = [
        ((tw[:, w] >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)).astype(jnp.int32)
        for w in range(n_words) for k in range(4)
    ]
    tb = jnp.pad(jnp.stack(cols, axis=1), ((0, 0), (0, LANES - len(cols))))

    interpret = jax.devices()[0].platform == "cpu"
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel,
            grid=(blocks,),
            in_specs=[
                pl.BlockSpec((BLOCK_ROWS,), lambda i: (i,)),
                pl.BlockSpec((t_pad, LANES), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_pad, LANES), jnp.int32),
            interpret=interpret,
        )(idx_p, tb.astype(jnp.bfloat16))
    # recombine byte lanes -> words
    words = []
    for w in range(n_words):
        v = out[:n, 4 * w].astype(jnp.uint32)
        for k in range(1, 4):
            v = v | (out[:n, 4 * w + k].astype(jnp.uint32)
                     << jnp.uint32(8 * k))
        words.append(v)
    return jnp.stack(words, axis=1)
