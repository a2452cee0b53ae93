"""Pallas TPU kernel: grouped SUM/COUNT as an MXU one-hot matmul.

The TPU-native answer to a hash-aggregate inner loop (pallas_guide.md):
scalar hash-table probing doesn't map to 8x128 lanes, but aggregation is a
matmul — for a block of B rows with dense group ids in [0, G):

    acc[G, C] += one_hot(gid_block)[B, G]^T @ chunks[B, C]

runs on the 128x128 systolic array. Replaces the reference's row-wise
aggregate reducers (query-executor/src/operators.rs:745-848) and the
grouped path it leaves empty (executor.rs:157-190).

Lane layout: each aggregate COLUMN occupies a 12-lane band per hi-block
(8x 8-bit value chunks, a count lane, 3 IEEE flag lanes), so the 128
output lanes carry up to 10 columns for small group spaces — a
multi-aggregate GROUP BY costs about the same matmul pass as a single
SUM (grouped_sums_counts_multi / fact_cols_per_pass).

Exactness:
  * int64 values split into 8x 8-bit chunks (two's-complement recombination
    mod 2^64, same trick as kernels._segment_sum_i64). The one-hot and
    chunks are bf16 (integers <= 256 are exact in bf16); each grid step's
    [G, C] f32 product is exact (<= 255 * BLOCK_ROWS < 2^24); cross-step
    accumulation splits each step product into (lo16, hi) int32 planes so
    chunk totals stay exact up to 2^28 rows per kernel call — larger
    inputs are folded in half and the halves' totals added (still exact).
  * float64/float32 via dynamic-scale fixed point — q = round(x * 2^k)
    with k chosen on-device from max|x| so that n * max|q| < 2^62, then
    the exact integer path, then rescale. Error is bounded by
    ~n * max|x| * 2^-40, comparable to f64 summation round-off; +-inf and
    NaN inputs ride the flag lanes as counts, so IEEE semantics
    (inf + finite = inf, inf + -inf = nan) are exact.

Grouping capacity: group superblocks of ceil(G/128)*128 add a grid
dimension (each re-streams the rows), so work scales O(n * G / 1280);
callers prefer this kernel up to G ~ 32k and the scatter path beyond
(executor._MXU_AGG_MAX_GROUPS gates the crossover).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LANES = 128
COL_LANES = 12     # per aggregate column: 8 chunks + count + 3 IEEE flags
# per-step f32 product <= 255 * block_rows < 2^24 (exact); the lo16 plane
# overflows at 65535 * n/block_rows >= 2^31 -> n = 2^25 for 1024-row steps
MAX_EXACT_ROWS = 1 << 25


# ---------------------------------------------------------------------------
# factorized transposed-one-hot kernel (round 4) — the production single-
# column path. Two discoveries over the [SUB, G] full-one-hot kernels:
#   1. Mosaic's lane->sublane relayout (any `x[:, None]` of a 1D input)
#      costs ~1 cycle per SOURCE element; with 3-4 broadcast inputs that
#      alone bounded the old kernels at ~50 ms / 16.7M rows.
#   2. The full one-hot materializes [SUB, G] bf16 (2 KB/row of VMEM
#      traffic at G=1024) and costs G x 128 MACs/row.
# Fix: factorize gid = ghi * 128 + glo and TRANSPOSE the one-hot — groups
# ride SUBLANES, rows ride LANES, so every operand builds from native
# [1, 128] row-slices broadcast down sublanes (zero relayouts). Lane l of
# the chunk matrix carries value-chunk (l % 12) of rows with ghi == l//12,
# and one [128, 128] lane-contraction matmul per 128 rows accumulates
# acc[glo, ghi*12 + k]: 16384 MACs/row, 10x less VMEM traffic. Measured
# 16.7M rows / 1024 groups on v5e: 11.0 ms vs 57.3 ms (5.2x; 1.52B rows/s).
ROWS_PER_STEP = 2048


def _make_kernel_fact(n_hi: int, n_cols: int, r_iters: int):
    """Lane layout: lane l = c*(12*n_hi) + ghi*12 + k — column c's 12-lane
    band for hi-block ghi; k<8 = value chunks, k=8..11 = flag bits 2..5
    (+inf, include/count, -inf, NaN — _prep_* bit positions). ONE matmul
    per 128 rows covers every column."""
    band = COL_LANES * n_hi

    def _kernel(gid_ref, vlo_ref, vhi_ref, fl_ref, lo_ref, hi_ref):
        sb = pl.program_id(0)   # group superblock (n_hi*128 groups each)
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _init():
            lo_ref[...] = jnp.zeros_like(lo_ref)
            hi_ref[...] = jnp.zeros_like(hi_ref)

        sub = jax.lax.broadcasted_iota(jnp.int32, (LANES, 1), 0)
        sub_c = sub // band
        sub_in = sub - sub_c * band
        sub_hi = sub_in // COL_LANES
        sub_k = sub_in - sub_hi * COL_LANES
        shift = ((sub_k & 3) * 8).astype(jnp.uint32)
        fshift = jnp.clip(sub_k - 6, 2, 5).astype(jnp.uint32)
        base = sb * (n_hi * LANES)
        acc = jnp.zeros((LANES, LANES), jnp.float32)
        for j in range(r_iters):
            gid = gid_ref[j:j + 1, :] - base   # [1, 128] rows on lanes
            in_sb = (gid >= 0) & (gid < n_hi * LANES)
            ghi = gid >> 7
            glo = jnp.where(in_sb, gid & 127, -1)
            # excluded rows (glo = -1) match no sublane: their one-hot
            # column is zero, so any chunk_T garbage contributes nothing
            oh_T = (sub == glo).astype(jnp.bfloat16)       # [glo, r]
            cval = jnp.zeros((LANES, LANES), jnp.uint32)
            for c in range(n_cols):
                vlo = vlo_ref[c, j:j + 1, :]
                vhi = vhi_ref[c, j:j + 1, :]
                fl = fl_ref[c, j:j + 1, :]
                word = jnp.where(sub_k < 4, vlo, vhi)      # [sub, r]
                byte = (word >> shift) & 0xFF
                v = jnp.where(sub_k < 8, byte, (fl >> fshift) & 1)
                cval = cval | jnp.where(
                    (sub_c == c) & (ghi == sub_hi), v, jnp.uint32(0)
                )
            chunk_T = cval.astype(jnp.int32).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                oh_T, chunk_T,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        bi = acc.astype(jnp.int32)
        lo_ref[...] += bi & 0xFFFF
        hi_ref[...] += bi >> 16

    return _kernel


def fact_cols_per_pass(num_groups: int) -> int:
    """How many aggregate columns one factorized pass carries: the 128
    output lanes split into per-column bands of 12 * ceil(G/128) (capped
    by the superblock size)."""
    n_hi = min(-(-max(num_groups, 1) // LANES), 128 // COL_LANES)
    return max(1, LANES // (COL_LANES * n_hi))


def _mxu_chunk_totals_fact(gid_m, vlo, vhi, flags, num_groups: int):
    """Factorized kernel dispatch: per-group per-column 12-lane exact
    totals [g_pad, C * COL_LANES] int64 (column c in lanes 12c..12c+11:
    8 value chunks, then flag bits 2..5 -> lanes map (9, 8, 10, 11) =
    count, +inf, -inf, NaN for _finish_col).

    gid_m: [n] int32 (-1 = excluded); vlo/vhi/flags: [C, n] uint32."""
    n = gid_m.shape[0]
    if n > MAX_EXACT_ROWS:
        half = (n + 1) // 2
        return (
            _mxu_chunk_totals_fact(gid_m[:half], vlo[:, :half],
                                   vhi[:, :half], flags[:, :half],
                                   num_groups)
            + _mxu_chunk_totals_fact(gid_m[half:], vlo[:, half:],
                                     vhi[:, half:], flags[:, half:],
                                     num_groups)
        )
    n_cols = vlo.shape[0]
    n_hi = min(-(-max(num_groups, 1) // LANES), 128 // COL_LANES)  # <= 10
    assert COL_LANES * n_hi * n_cols <= LANES, (n_hi, n_cols)
    sb_groups = n_hi * LANES
    n_sb = -(-max(num_groups, 1) // sb_groups)
    blocks = -(-n // ROWS_PER_STEP)
    n_pad = blocks * ROWS_PER_STEP
    vlo = jnp.pad(vlo, ((0, 0), (0, n_pad - n))).reshape(n_cols, -1, LANES)
    vhi = jnp.pad(vhi, ((0, 0), (0, n_pad - n))).reshape(n_cols, -1, LANES)
    flags = jnp.pad(
        flags, ((0, 0), (0, n_pad - n))
    ).reshape(n_cols, -1, LANES)
    gid_m = jnp.pad(gid_m, (0, n_pad - n),
                    constant_values=-1).reshape(-1, LANES)
    r_iters = ROWS_PER_STEP // LANES
    interpret = jax.devices()[0].platform == "cpu"
    gspec = pl.BlockSpec((r_iters, LANES), lambda sb, i: (i, 0))
    cspec = pl.BlockSpec((n_cols, r_iters, LANES), lambda sb, i: (0, i, 0))
    with jax.enable_x64(False):
        lo, hi = pl.pallas_call(
            _make_kernel_fact(n_hi, n_cols, r_iters),
            grid=(n_sb, blocks),
            in_specs=[gspec, cspec, cspec, cspec],
            out_specs=(
                pl.BlockSpec((LANES, LANES), lambda sb, i: (sb, 0)),
                pl.BlockSpec((LANES, LANES), lambda sb, i: (sb, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_sb * LANES, LANES), jnp.int32),
                jax.ShapeDtypeStruct((n_sb * LANES, LANES), jnp.int32),
            ),
            interpret=interpret,
        )(gid_m, vlo, vhi, flags)
    tot = hi.astype(jnp.int64) * 65536 + lo.astype(jnp.int64)
    # tot[sb*128 + glo, c*(12*n_hi) + ghi*12 + k]
    #   -> group sb*sb_groups + ghi*128 + glo, column c, lane k
    band = COL_LANES * n_hi
    t = tot[:, : n_cols * band].reshape(n_sb, LANES, n_cols, n_hi,
                                        COL_LANES)
    # -> [n_sb, n_hi, LANES(glo), n_cols, COL_LANES] -> [g, c*12]
    t = jnp.transpose(t, (0, 3, 1, 2, 4)).reshape(
        n_sb * n_hi * LANES, n_cols * COL_LANES
    )
    return t


def _value_planes(values_i64: jnp.ndarray, ok: jnp.ndarray):
    """(lo, hi) uint32 word planes of the masked int64 values."""
    u = jnp.where(ok, values_i64, 0).astype(jnp.uint64)
    lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (u >> jnp.uint64(32)).astype(jnp.uint32)
    return lo, hi


def _recombine_sums(totals12: jnp.ndarray) -> jnp.ndarray:
    """One column's 12-lane totals -> int64 sums (exact mod 2^64)."""
    shifts = jnp.uint64(8) * jnp.arange(8, dtype=jnp.uint64)
    return jnp.sum(
        totals12[:, :8].astype(jnp.uint64) << shifts[None, :], axis=1
    ).astype(jnp.int64)


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


# flag-plane bits (lane 12c+8+j reads flag bit 2+j; see _kernel fbit):
# bit 2 = +inf, bit 3 = include/count, bit 4 = -inf, bit 5 = NaN
_B_POS, _B_CNT, _B_NEG, _B_NAN = 2, 3, 4, 5


def _prep_int(values, ok):
    vlo, vhi = _value_planes(values.astype(jnp.int64), ok)
    flags = ok.astype(jnp.uint32) << _B_CNT
    return vlo, vhi, flags, None


def _prep_float(values, ok):
    n = values.shape[0]
    x = values.astype(jnp.float64)
    finite = jnp.isfinite(x)
    xf = jnp.where(ok & finite, x, 0.0)
    m = jnp.max(jnp.abs(xf))
    frac_bits = min(61 - max(int(np.ceil(np.log2(max(n, 2)))), 1), 40)
    # exponent of m without frexp (its f64 bitcast doesn't lower on TPU):
    # range-reduce into f32 territory by exact pow2 factors + one f32 log2
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
    q = jnp.round(xf * _exact_pow2(k)).astype(jnp.int64)
    vlo, vhi = _value_planes(q, ok & finite)
    flags = (
        (ok.astype(jnp.uint32) << _B_CNT)
        | ((ok & jnp.isposinf(x)).astype(jnp.uint32) << _B_POS)
        | ((ok & jnp.isneginf(x)).astype(jnp.uint32) << _B_NEG)
        | ((ok & jnp.isnan(x)).astype(jnp.uint32) << _B_NAN)
    )
    return vlo, vhi, flags, _exact_pow2(-k)


def _finish_col(totals12: jnp.ndarray, num_groups: int, inv_scale,
                lanes=(9, 8, 10, 11)):
    """lanes = (count, +inf, -inf, NaN) lane indices within the column."""
    l_cnt, l_pos, l_neg, l_nan = lanes
    counts = totals12[:num_groups, l_cnt]
    if inv_scale is None:
        return _recombine_sums(totals12[:num_groups]), counts
    s = _recombine_sums(totals12[:num_groups]).astype(jnp.float64) * inv_scale
    p = totals12[:num_groups, l_pos] > 0
    ng = totals12[:num_groups, l_neg] > 0
    nn = totals12[:num_groups, l_nan] > 0
    s = jnp.where(p & ~ng, jnp.inf, s)
    s = jnp.where(ng & ~p, -jnp.inf, s)
    s = jnp.where(nn | (p & ng), jnp.nan, s)
    return s, counts


def grouped_sums_counts_multi(items, gid, num_groups: int):
    """Batched grouped SUM/COUNT: `items` is a list of (values, ok) with
    integer or float dtypes; columns share the factorized matmul pass —
    the 128 output lanes split into per-column 12*ceil(G/128)-lane bands,
    so small group spaces carry up to 10 columns per pass and G=1024
    carries one. Returns a list of (sums, counts) — float columns get f64
    sums with IEEE inf/NaN semantics, integer columns exact int64."""
    out = []
    per_pass = fact_cols_per_pass(num_groups)
    gid_m = jnp.where(gid >= 0, gid, -1).astype(jnp.int32)
    for start in range(0, len(items), per_pass):
        chunk = items[start:start + per_pass]
        preps = [
            _prep_float(v, ok)
            if jnp.issubdtype(v.dtype, jnp.floating) else _prep_int(v, ok)
            for v, ok in chunk
        ]
        vlo = jnp.stack([p[0] for p in preps])
        vhi = jnp.stack([p[1] for p in preps])
        flags = jnp.stack([p[2] for p in preps])
        totals = _mxu_chunk_totals_fact(gid_m, vlo, vhi, flags, num_groups)
        lanes = (9, 8, 10, 11)  # count, +inf, -inf, NaN (flag bits 3,2,4,5)
        for c, p in enumerate(preps):
            t12 = totals[:, COL_LANES * c: COL_LANES * (c + 1)]
            out.append(_finish_col(t12, num_groups, p[3], lanes))
    return out


@functools.partial(jax.jit, static_argnames=("num_groups",))
def grouped_sum_count_i64(
    values: jnp.ndarray,   # [n] int64
    ok: jnp.ndarray,       # [n] bool — rows to include
    gid: jnp.ndarray,      # [n] int32 dense group ids in [0, num_groups)
    num_groups: int,
) -> tuple:
    """Exact integer path. Returns (sums[G] int64, counts[G] int64)."""
    gid_m = jnp.where(ok, gid, -1).astype(jnp.int32)
    return grouped_sums_counts_multi(
        [(values, ok)], gid_m, num_groups
    )[0]


@functools.partial(jax.jit, static_argnames=("num_groups",))
def grouped_sum_count_f64(
    values: jnp.ndarray,   # [n] float64/float32
    ok: jnp.ndarray,
    gid: jnp.ndarray,
    num_groups: int,
) -> tuple:
    """Float path: dynamic-scale fixed point + IEEE inf/NaN lanes.
    Returns (sums[G] float64, counts[G] int64)."""
    gid_m = jnp.where(ok, gid, -1).astype(jnp.int32)
    return grouped_sums_counts_multi(
        [(values, ok)], gid_m, num_groups
    )[0]


def grouped_sum_count(values, ok, gid, num_groups: int) -> tuple:
    """Dtype dispatch: integers exact, floats via fixed-point. Returns
    (sums, counts[int64]); sums int64 for ints, float64 for floats."""
    if jnp.issubdtype(values.dtype, jnp.floating):
        return grouped_sum_count_f64(values, ok, gid, num_groups)
    return grouped_sum_count_i64(values.astype(jnp.int64), ok, gid,
                                 num_groups)
