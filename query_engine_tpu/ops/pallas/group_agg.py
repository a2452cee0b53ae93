"""Pallas TPU kernel: grouped SUM/COUNT as an MXU one-hot matmul.

The TPU-native answer to a hash-aggregate inner loop (pallas_guide.md):
scalar hash-table probing doesn't map to 8x128 lanes, but aggregation is a
matmul — for a block of B rows with dense group ids in [0, G):

    acc[G, C] += one_hot(gid_block)[B, G]^T @ chunks[B, C]

runs on the 128x128 systolic array. Replaces the reference's row-wise
aggregate reducers (query-executor/src/operators.rs:745-848) and the
grouped path it leaves empty (executor.rs:157-190).

Exactness:
  * int64 values split into 8x 8-bit chunks (two's-complement recombination
    mod 2^64, same trick as kernels._segment_sum_i64). The one-hot and
    chunks are bf16 (integers <= 256 are exact in bf16); each grid step's
    [G, C] f32 product is exact (<= 255 * BLOCK_ROWS < 2^24); cross-step
    accumulation splits each step product into (lo16, hi) int32 planes so
    chunk totals stay exact up to 2^28 rows per kernel call — larger
    inputs are folded in half and the halves' totals added (still exact).
  * float64/float32 via grouped_sum_count: dynamic-scale fixed point —
    q = round(x * 2^k) with k chosen on-device from max|x| so that
    n * max|q| < 2^63, then the exact integer path, then rescale. Error is
    bounded by n * max|x| * 2^-(62 - log2 n), comparable to f64 summation
    round-off; +-inf and NaN inputs ride three spare MXU lanes as counts,
    so IEEE semantics (inf + finite = inf, inf + -inf = nan) are exact.

Grouping capacity: G > 4096 adds a group-block grid dimension (the [4096,
128] accumulator tile is VMEM-bounded); work scales O(n * G), so callers
should prefer this kernel up to G ~ 32k and the scatter path beyond
(executor._MXU_AGG_MAX_GROUPS gates the crossover).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 8192  # rows fetched per grid step (multiple of 1024: T(1024))
SUB = 1024         # rows per inner matmul (one_hot tile height)
GBLOCK = 4096  # group-block tile height (VMEM: 2x [GBLOCK,128] i32 acc)
LANES = 128  # lane width; 8 value chunks + count + 3 IEEE flags + padding
# per-step f32 product <= 255 * BLOCK_ROWS < 2^24 (exact); lo16 plane
# overflows at 65535 * n/BLOCK_ROWS >= 2^31 -> n = 2^28
MAX_EXACT_ROWS = 1 << 28


def _kernel(gid_ref, vlo_ref, vhi_ref, flags_ref, lo_ref, hi_ref):
    gb = pl.program_id(0)
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        lo_ref[...] = jnp.zeros_like(lo_ref)
        hi_ref[...] = jnp.zeros_like(hi_ref)

    g = lo_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    byte_shift = ((lane & 3) * 8).astype(jnp.uint32)
    giota = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)

    # one_hot tiles are [SUB, g]; BLOCK_ROWS rows per grid step amortize
    # the per-step pipeline overhead (the old 1-subblock layout measured
    # 60% slower at 16.7M rows), and the [g, LANES] sub-products stay
    # exact in one f32 accumulator (255 * BLOCK_ROWS < 2^24)
    acc = jnp.zeros((g, LANES), jnp.float32)
    for s in range(BLOCK_ROWS // SUB):
        sl = pl.ds(s * SUB, SUB)
        gid = gid_ref[sl]     # [SUB] int32, -1 for masked rows
        vlo = vlo_ref[sl]     # [SUB] uint32: value bits 0..31
        vhi = vhi_ref[sl]     # [SUB] uint32: value bits 32..63
        fl = flags_ref[sl]    # [SUB] uint32: IEEE flag bits
        local = gid - gb * g
        one_hot = (local[:, None] == giota).astype(jnp.bfloat16)
        # [SUB, LANES] chunk matrix built in VMEM: lanes 0-7 are the
        # 8-bit value chunks ((vlo|vhi) >> 8*(lane&3)), lane 8 the count
        # column, lanes 9-11 the IEEE flags — HBM inputs stay 16 B/row
        word = jnp.where(lane < 4, vlo[:, None], vhi[:, None])
        byte = (word >> byte_shift) & 0xFF
        cval = jnp.where(lane < 8, byte, jnp.uint32(0))
        cval = jnp.where(lane == 8, jnp.uint32(1), cval)
        for b in range(3):
            cval = jnp.where(lane == 9 + b, (fl[:, None] >> b) & 1, cval)
        chunks = cval.astype(jnp.int32).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            one_hot, chunks,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    bi = acc.astype(jnp.int32)
    lo_ref[...] += bi & 0xFFFF
    hi_ref[...] += bi >> 16


def _mxu_chunk_totals(gid_m: jnp.ndarray, vlo: jnp.ndarray,
                      vhi: jnp.ndarray, flags: jnp.ndarray,
                      num_groups: int) -> jnp.ndarray:
    """Core dispatch: per-group per-lane exact totals [g_pad, LANES] int64.

    gid_m: [n] int32 (-1 = excluded row); vlo/vhi: [n] uint32 value words;
    flags: [n] uint32 IEEE flag bits."""
    n = gid_m.shape[0]
    if n > MAX_EXACT_ROWS:
        half = (n + 1) // 2
        return (
            _mxu_chunk_totals(gid_m[:half], vlo[:half], vhi[:half],
                              flags[:half], num_groups)
            + _mxu_chunk_totals(gid_m[half:], vlo[half:], vhi[half:],
                                flags[half:], num_groups)
        )
    g_pad = max(128, -(-num_groups // 128) * 128)
    gblock = min(GBLOCK, g_pad)
    n_gblocks = -(-g_pad // gblock)
    g_pad = n_gblocks * gblock
    blocks = -(-n // BLOCK_ROWS)
    n_pad = blocks * BLOCK_ROWS
    vlo = jnp.pad(vlo, (0, n_pad - n))
    vhi = jnp.pad(vhi, (0, n_pad - n))
    flags = jnp.pad(flags, (0, n_pad - n))
    gid_m = jnp.pad(gid_m, (0, n_pad - n), constant_values=-1)

    interpret = jax.devices()[0].platform == "cpu"
    # trace the kernel with x64 off: the engine's global jax_enable_x64
    # makes index-map arithmetic default to i64, which Mosaic refuses
    with jax.enable_x64(False):
        row_spec = pl.BlockSpec((BLOCK_ROWS,), lambda gb, i: (i,))
        lo, hi = pl.pallas_call(
            _kernel,
            grid=(n_gblocks, blocks),
            in_specs=[row_spec, row_spec, row_spec, row_spec],
            out_specs=(
                pl.BlockSpec((gblock, LANES), lambda gb, i: (gb, 0)),
                pl.BlockSpec((gblock, LANES), lambda gb, i: (gb, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((g_pad, LANES), jnp.int32),
                jax.ShapeDtypeStruct((g_pad, LANES), jnp.int32),
            ),
            interpret=interpret,  # CPU backend: correctness-testing path
        )(gid_m, vlo, vhi, flags)
    return hi.astype(jnp.int64) * 65536 + lo.astype(jnp.int64)


def _value_planes(values_i64: jnp.ndarray, ok: jnp.ndarray):
    """(lo, hi) uint32 word planes of the masked int64 values."""
    u = jnp.where(ok, values_i64, 0).astype(jnp.uint64)
    lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (u >> jnp.uint64(32)).astype(jnp.uint32)
    return lo, hi


def _recombine_sums(totals: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """Chunk totals -> int64 sums (exact mod 2^64 == two's complement)."""
    shifts = jnp.uint64(8) * jnp.arange(8, dtype=jnp.uint64)
    return jnp.sum(
        totals[:num_groups, :8].astype(jnp.uint64) << shifts[None, :], axis=1
    ).astype(jnp.int64)


@functools.partial(jax.jit, static_argnames=("num_groups",))
def grouped_sum_count_i64(
    values: jnp.ndarray,   # [n] int64
    ok: jnp.ndarray,       # [n] bool — rows to include
    gid: jnp.ndarray,      # [n] int32 dense group ids in [0, num_groups)
    num_groups: int,
) -> tuple:
    """Exact integer path. Returns (sums[G] int64, counts[G] int64)."""
    gid_m = jnp.where(ok, gid, -1).astype(jnp.int32)
    vlo, vhi = _value_planes(values, ok)
    totals = _mxu_chunk_totals(
        gid_m, vlo, vhi, jnp.zeros_like(vlo), num_groups
    )
    return _recombine_sums(totals, num_groups), totals[:num_groups, 8]


def _exact_pow2(k: jnp.ndarray) -> jnp.ndarray:
    """Exact float64 2^k for int32 k in [-1000, 1000], via bit-decomposed
    multiplies of exact pow2 constants (every product of pow2s below the
    overflow/denormal edges is exact)."""
    neg = k < 0
    a = jnp.where(neg, -k, k)
    r = jnp.float64(1.0)
    for i in range(10):  # covers |k| < 1024
        bit = (a >> i) & 1
        r = r * jnp.where(bit == 1, jnp.float64(2.0 ** (1 << i)), 1.0)
    return jnp.where(neg, 1.0 / r, r)


@functools.partial(jax.jit, static_argnames=("num_groups",))
def grouped_sum_count_f64(
    values: jnp.ndarray,   # [n] float64/float32
    ok: jnp.ndarray,
    gid: jnp.ndarray,
    num_groups: int,
) -> tuple:
    """Float path: dynamic-scale fixed point + IEEE inf/NaN lanes.
    Returns (sums[G] float64, counts[G] int64)."""
    n = values.shape[0]
    x = values.astype(jnp.float64)
    finite = jnp.isfinite(x)
    pos_inf = ok & jnp.isposinf(x)
    neg_inf = ok & jnp.isneginf(x)
    nan = ok & jnp.isnan(x)
    xf = jnp.where(ok & finite, x, 0.0)
    m = jnp.max(jnp.abs(xf))
    # q = round(x * 2^k), |q| <= 2^frac_bits; sum of n of them <= 2^62.
    # (61 rather than 62: the exponent estimate below may run one low.)
    frac_bits = 61 - max(int(np.ceil(np.log2(max(n, 2)))), 1)
    # exponent of m without frexp (its f64 bitcast doesn't lower on TPU):
    # range-reduce m into f32 territory by exact pow2 factors, then one
    # f32 log2. e >= log2(m) up to 1 ulp of log2 (covered by the 61 above).
    t = jnp.maximum(m, np.finfo(np.float64).tiny)
    adj = jnp.int32(0)
    for _ in range(6):
        big = t >= 2.0**100
        t = jnp.where(big, t * 2.0**-200, t)
        adj = adj + jnp.where(big, jnp.int32(200), 0)
    for _ in range(6):
        small = t < 2.0**-100
        t = jnp.where(small, t * 2.0**200, t)
        adj = adj - jnp.where(small, jnp.int32(200), 0)
    e = (jnp.floor(jnp.log2(t.astype(jnp.float32))).astype(jnp.int32)
         + adj + 1)
    k = jnp.clip(frac_bits - e, -1000, 1000).astype(jnp.int32)
    # 2^k built from exact pow2 factors (jnp.ldexp/exp2 lower through
    # 64-bit bitcasts / transcendentals — neither is exact-and-TPU-safe)
    scale = _exact_pow2(k)
    inv_scale = _exact_pow2(-k)
    q = jnp.round(xf * scale).astype(jnp.int64)

    gid_m = jnp.where(ok, gid, -1).astype(jnp.int32)
    vlo, vhi = _value_planes(q, ok & finite)
    flags = (
        pos_inf.astype(jnp.uint32)
        | (neg_inf.astype(jnp.uint32) << 1)
        | (nan.astype(jnp.uint32) << 2)
    )
    totals = _mxu_chunk_totals(gid_m, vlo, vhi, flags, num_groups)
    # the count lane counts every ok row (masked rows match nothing)
    counts = totals[:num_groups, 8]
    s = _recombine_sums(totals, num_groups).astype(jnp.float64) * inv_scale
    p, ng, nn = (totals[:num_groups, c] > 0 for c in (9, 10, 11))
    s = jnp.where(p & ~ng, jnp.inf, s)
    s = jnp.where(ng & ~p, -jnp.inf, s)
    s = jnp.where(nn | (p & ng), jnp.nan, s)
    return s, counts


def grouped_sum_count(values, ok, gid, num_groups: int) -> tuple:
    """Dtype dispatch: integers exact, floats via fixed-point. Returns
    (sums, counts[int64]); sums int64 for ints, float64 for floats."""
    if jnp.issubdtype(values.dtype, jnp.floating):
        return grouped_sum_count_f64(values, ok, gid, num_groups)
    return grouped_sum_count_i64(values.astype(jnp.int64), ok, gid,
                                 num_groups)
