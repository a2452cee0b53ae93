"""Probe: MXU grouped-aggregate kernel variants vs the production bf16
byte kernel (ops/pallas/group_agg.py) — the round-4 hunt for the missing
2.4x to speed-of-light (VERDICT r3 item 3).

Variants:
  v0  production grouped_sum_count_i64 (8x bf16 byte chunks, flag lanes)
  v1  two accumulators — breaks the acc = acc + dot(...) serial chain so
      sub s+1's VPU chunk build can overlap sub s's MXU contraction
  v2  int-path-only lanes — drops the 3 IEEE flag-lane selects (ints
      never set them) and the count lane rides gid>=0
  v3  s8 nibble kernel (probe_int8_mxu.grouped_sum_count_s8): 16 nibble
      lanes, s8 x s8 -> s32 at 2x the bf16 MAC rate, no lo/hi split

Run SOLO on the TPU:  python benchmarks/probe_agg_variants.py [n_rows]
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import query_engine_tpu  # noqa: F401  (x64)
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from query_engine_tpu.ops.pallas.group_agg import grouped_sum_count_i64

SUB = 1024
LANES = 128
G = 1024


def _kernel_v1(gid_ref, vlo_ref, vhi_ref, flags_ref, lo_ref, hi_ref):
    """Production byte kernel with TWO independent f32 accumulators."""
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        lo_ref[...] = jnp.zeros_like(lo_ref)
        hi_ref[...] = jnp.zeros_like(hi_ref)

    g = lo_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    byte_shift = ((lane & 3) * 8).astype(jnp.uint32)
    giota = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)

    accs = [jnp.zeros((g, LANES), jnp.float32) for _ in range(2)]
    for s in range(8):
        sl = pl.ds(s * SUB, SUB)
        gid = gid_ref[sl]
        vlo = vlo_ref[sl]
        vhi = vhi_ref[sl]
        fl = flags_ref[sl]
        one_hot = (gid[:, None] == giota).astype(jnp.bfloat16)
        word = jnp.where(lane < 4, vlo[:, None], vhi[:, None])
        byte = (word >> byte_shift) & 0xFF
        cval = jnp.where(lane < 8, byte, jnp.uint32(0))
        cval = jnp.where(lane == 8, jnp.uint32(1), cval)
        for b in range(3):
            cval = jnp.where(lane == 9 + b, (fl[:, None] >> b) & 1, cval)
        chunks = cval.astype(jnp.int32).astype(jnp.bfloat16)
        accs[s % 2] = accs[s % 2] + jax.lax.dot_general(
            one_hot, chunks,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    bi = (accs[0] + accs[1]).astype(jnp.int32)
    lo_ref[...] += bi & 0xFFFF
    hi_ref[...] += bi >> 16


def _kernel_v2(gid_ref, vlo_ref, vhi_ref, lo_ref, hi_ref):
    """Int-only lanes: 8 byte chunks + count from the one-hot row itself
    (sum of one_hot = included rows), no flag plane at all."""
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        lo_ref[...] = jnp.zeros_like(lo_ref)
        hi_ref[...] = jnp.zeros_like(hi_ref)

    g = lo_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    byte_shift = ((lane & 3) * 8).astype(jnp.uint32)
    giota = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)

    accs = [jnp.zeros((g, LANES), jnp.float32) for _ in range(2)]
    for s in range(8):
        sl = pl.ds(s * SUB, SUB)
        gid = gid_ref[sl]
        vlo = vlo_ref[sl]
        vhi = vhi_ref[sl]
        one_hot = (gid[:, None] == giota).astype(jnp.bfloat16)
        word = jnp.where(lane < 4, vlo[:, None], vhi[:, None])
        byte = (word >> byte_shift) & 0xFF
        cval = jnp.where(lane < 8, byte, jnp.uint32(lane == 8))
        chunks = cval.astype(jnp.int32).astype(jnp.bfloat16)
        accs[s % 2] = accs[s % 2] + jax.lax.dot_general(
            one_hot, chunks,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    bi = (accs[0] + accs[1]).astype(jnp.int32)
    lo_ref[...] += bi & 0xFFFF
    hi_ref[...] += bi >> 16


N_HI = 8  # G = N_HI x 128: hi-block rides the chunk lanes (8 x 12 = 96)


def _kernel_v4(gid_ref, vlo_ref, vhi_ref, lo_ref, hi_ref):
    """Factorized one-hot: gid = ghi*128 + glo. one_hot_lo is [SUB, 128]
    (16x less VMEM traffic than the [SUB, 1024] full one-hot) and the
    ghi selection zeroes the chunk lanes instead: lane l carries value
    chunk (l % 12) of rows whose ghi == l // 12. The MXU contraction is
    [SUB,128]^T @ [SUB,128] -> [128,128]: 16384 MACs/row instead of
    131072. acc[lo, ghi*12 + k] accumulates group (ghi*128+lo)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        lo_ref[...] = jnp.zeros_like(lo_ref)
        hi_ref[...] = jnp.zeros_like(hi_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    lane_hi = lane // 12
    lane_k = lane - lane_hi * 12
    byte_shift = ((lane_k & 3) * 8).astype(jnp.uint32)
    gl_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    acc = jnp.zeros((LANES, LANES), jnp.float32)
    for s in range(8):
        sl = pl.ds(s * SUB, SUB)
        gid = gid_ref[sl]
        vlo = vlo_ref[sl]
        vhi = vhi_ref[sl]
        ghi = gid >> 7
        # fold exclusion into glo (bool [:, None] reshape is unsupported
        # by Mosaic for non-32-bit types)
        glo = jnp.where(gid >= 0, gid & 127, -1)
        one_hot = (glo[:, None] == gl_iota).astype(jnp.bfloat16)
        word = jnp.where(lane_k < 4, vlo[:, None], vhi[:, None])
        byte = (word >> byte_shift) & 0xFF
        v = jnp.where(lane_k < 8, byte, jnp.uint32(lane_k == 8))
        in_hi = (ghi[:, None] == lane_hi) & (lane_hi < N_HI)
        chunks = jnp.where(in_hi, v, jnp.uint32(0)).astype(
            jnp.int32).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            one_hot, chunks,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    bi = acc.astype(jnp.int32)
    lo_ref[...] += bi & 0xFFFF
    hi_ref[...] += bi >> 16


def _run_v4(n_in, values, ok, gid):
    u = jnp.where(ok, values, 0).astype(jnp.uint64)
    vlo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    vhi = (u >> jnp.uint64(32)).astype(jnp.uint32)
    gid_m = jnp.where(ok, gid, -1).astype(jnp.int32)
    n = n_in
    blocks = -(-n // 8192)
    n_pad = blocks * 8192
    vlo = jnp.pad(vlo, (0, n_pad - n))
    vhi = jnp.pad(vhi, (0, n_pad - n))
    gid_m = jnp.pad(gid_m, (0, n_pad - n), constant_values=-1)
    interpret = jax.devices()[0].platform == "cpu"
    row_spec = pl.BlockSpec((8192,), lambda i: (i,))
    with jax.enable_x64(False):
        lo, hi = pl.pallas_call(
            _kernel_v4,
            grid=(blocks,),
            in_specs=[row_spec, row_spec, row_spec],
            out_specs=(
                pl.BlockSpec((LANES, LANES), lambda i: (0, 0)),
                pl.BlockSpec((LANES, LANES), lambda i: (0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((LANES, LANES), jnp.int32),
                jax.ShapeDtypeStruct((LANES, LANES), jnp.int32),
            ),
            interpret=interpret,
        )(gid_m, vlo, vhi)
    tot = hi.astype(jnp.int64) * 65536 + lo.astype(jnp.int64)
    # tot[lo, ghi*12 + k] -> group g = ghi*128 + lo
    t = tot[:, : N_HI * 12].reshape(LANES, N_HI, 12)
    t = jnp.moveaxis(t, 0, 1).reshape(N_HI * LANES, 12)  # [g, 12]
    shifts = jnp.uint64(8) * jnp.arange(8, dtype=jnp.uint64)
    sums = jnp.sum(
        t[:, :8].astype(jnp.uint64) << shifts[None, :], axis=1
    ).astype(jnp.int64)
    return sums[:G], t[:G, 8]


V5_BLOCK = 2048  # [V5_BLOCK, 1] i32 blocks: lanes pad to 128 in VMEM, so
# bigger blocks blow the 16MB stack (2048 sub x 128 lanes x 4B = 1MB/plane)


def _kernel_v5(gid_ref, vlo_ref, vhi_ref, lo_ref, hi_ref):
    """v4 + [n, 1]-shaped inputs: rows arrive in the SUBLANE dimension, so
    the one-hot build is a native lane-broadcast compare instead of the
    lane->sublane relayout that `x[:, None]` forces on a 1D input (the
    suspected per-element cost that kept v0-v4 at ~44-57 ms)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        lo_ref[...] = jnp.zeros_like(lo_ref)
        hi_ref[...] = jnp.zeros_like(hi_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    lane_hi = lane // 12
    lane_k = lane - lane_hi * 12
    byte_shift = ((lane_k & 3) * 8).astype(jnp.uint32)
    gl_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    acc = jnp.zeros((LANES, LANES), jnp.float32)
    for s in range(V5_BLOCK // SUB):
        sl = pl.ds(s * SUB, SUB)
        gid = gid_ref[sl, :]   # [SUB, 1] int32 — rows on sublanes
        vlo = vlo_ref[sl, :]
        vhi = vhi_ref[sl, :]
        ghi = gid >> 7
        glo = jnp.where(gid >= 0, gid & 127, -1)
        one_hot = (glo == gl_iota).astype(jnp.bfloat16)  # [SUB, 128]
        word = jnp.where(lane_k < 4, vlo, vhi)
        byte = (word >> byte_shift) & 0xFF
        v = jnp.where(lane_k < 8, byte, jnp.uint32(lane_k == 8))
        chunks = jnp.where(
            ghi == lane_hi, v, jnp.uint32(0)
        ).astype(jnp.int32).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            one_hot, chunks,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    bi = acc.astype(jnp.int32)
    lo_ref[...] += bi & 0xFFFF
    hi_ref[...] += bi >> 16


def _run_v5(n_in, values, ok, gid):
    u = jnp.where(ok, values, 0).astype(jnp.uint64)
    vlo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    vhi = (u >> jnp.uint64(32)).astype(jnp.uint32)
    gid_m = jnp.where(ok, gid, -1).astype(jnp.int32)
    n = n_in
    blocks = -(-n // V5_BLOCK)
    n_pad = blocks * V5_BLOCK
    vlo = jnp.pad(vlo, (0, n_pad - n))[:, None]
    vhi = jnp.pad(vhi, (0, n_pad - n))[:, None]
    gid_m = jnp.pad(gid_m, (0, n_pad - n), constant_values=-1)[:, None]
    interpret = jax.devices()[0].platform == "cpu"
    row_spec = pl.BlockSpec((V5_BLOCK, 1), lambda i: (i, 0))
    with jax.enable_x64(False):
        lo, hi = pl.pallas_call(
            _kernel_v5,
            grid=(blocks,),
            in_specs=[row_spec, row_spec, row_spec],
            out_specs=(
                pl.BlockSpec((LANES, LANES), lambda i: (0, 0)),
                pl.BlockSpec((LANES, LANES), lambda i: (0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((LANES, LANES), jnp.int32),
                jax.ShapeDtypeStruct((LANES, LANES), jnp.int32),
            ),
            interpret=interpret,
        )(gid_m, vlo, vhi)
    tot = hi.astype(jnp.int64) * 65536 + lo.astype(jnp.int64)
    t = tot[:, : N_HI * 12].reshape(LANES, N_HI, 12)
    t = jnp.moveaxis(t, 0, 1).reshape(N_HI * LANES, 12)
    shifts = jnp.uint64(8) * jnp.arange(8, dtype=jnp.uint64)
    sums = jnp.sum(
        t[:, :8].astype(jnp.uint64) << shifts[None, :], axis=1
    ).astype(jnp.int64)
    return sums[:G], t[:G, 8]


def _run_byte_kernel(kernel, n_in, values, ok, gid, with_flags):
    u = jnp.where(ok, values, 0).astype(jnp.uint64)
    vlo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    vhi = (u >> jnp.uint64(32)).astype(jnp.uint32)
    gid_m = jnp.where(ok, gid, -1).astype(jnp.int32)
    n = n_in
    blocks = -(-n // 8192)
    n_pad = blocks * 8192
    vlo = jnp.pad(vlo, (0, n_pad - n))
    vhi = jnp.pad(vhi, (0, n_pad - n))
    gid_m = jnp.pad(gid_m, (0, n_pad - n), constant_values=-1)
    interpret = jax.devices()[0].platform == "cpu"
    ins = [gid_m, vlo, vhi]
    row_spec = pl.BlockSpec((8192,), lambda gb, i: (i,))
    in_specs = [row_spec, row_spec, row_spec]
    if with_flags:
        flags = ok.astype(jnp.uint32)  # bit0 unused by int path; count=1
        flags = jnp.pad(flags, (0, n_pad - n))
        ins.append(jnp.zeros_like(vlo))  # flag plane (ints: all zero)
        in_specs.append(row_spec)
    with jax.enable_x64(False):
        lo, hi = pl.pallas_call(
            kernel,
            grid=(1, blocks),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((G, LANES), lambda gb, i: (0, 0)),
                pl.BlockSpec((G, LANES), lambda gb, i: (0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((G, LANES), jnp.int32),
                jax.ShapeDtypeStruct((G, LANES), jnp.int32),
            ),
            interpret=interpret,
        )(*ins)
    tot = hi.astype(jnp.int64) * 65536 + lo.astype(jnp.int64)
    shifts = jnp.uint64(8) * jnp.arange(8, dtype=jnp.uint64)
    sums = jnp.sum(
        tot[:, :8].astype(jnp.uint64) << shifts[None, :], axis=1
    ).astype(jnp.int64)
    return sums, tot[:, 8]


@functools.partial(jax.jit, static_argnames=("variant",))
def run_variant(values, ok, gid, variant):
    n = values.shape[0]
    if variant == "v1":
        return _run_byte_kernel(_kernel_v1, n, values, ok, gid, True)
    if variant == "v2":
        # count lane needs gid>=0 masking only (ok folded into gid)
        return _run_byte_kernel(_kernel_v2, n, values, ok, gid, False)
    if variant == "v4":
        return _run_v4(n, values, ok, gid)
    if variant == "v5":
        return _run_v5(n, values, ok, gid)
    raise ValueError(variant)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 24
    rng = np.random.default_rng(3)
    values = jnp.asarray(rng.integers(0, 1 << 40, n), dtype=jnp.int64)
    ok = jnp.asarray(rng.random(n) < 0.97)
    gid = jnp.asarray(rng.integers(0, G, n), dtype=jnp.int32)

    ref_s = jax.ops.segment_sum(
        jnp.where(ok, values, 0), jnp.where(ok, gid, G), num_segments=G + 1
    )[:G]
    ref_c = jax.ops.segment_sum(
        ok.astype(jnp.int64), jnp.where(ok, gid, G), num_segments=G + 1
    )[:G]

    cases = {
        "v0_production": lambda v: grouped_sum_count_i64(v, ok, gid, G),
        "v1_two_acc": lambda v: run_variant(v, ok, gid, "v1"),
        "v2_no_flags": lambda v: run_variant(v, ok, gid, "v2"),
        "v4_factorized": lambda v: run_variant(v, ok, gid, "v4"),
        "v5_sublane_inputs": lambda v: run_variant(v, ok, gid, "v5"),
    }
    try:
        from probe_int8_mxu import grouped_sum_count_s8
        cases["v3_s8_nibble"] = lambda v: grouped_sum_count_s8(v, ok, gid, G)
    except Exception as e:  # noqa: BLE001
        print(f"s8 import failed: {e!r}", file=sys.stderr)

    report = {"metric": "agg_variant_probe", "rows": n, "groups": G,
              "device": str(jax.devices()[0]), "variants": {}}
    dead = set()
    for name, f in cases.items():
        try:
            s, c = f(values)
            okc = bool(jnp.all(s[:G] == ref_s)) and bool(
                jnp.all(c[:G].astype(jnp.int64) == ref_c))
            print(f"{name}: correct={okc}", flush=True)
            report["variants"][name] = {"correct": okc}
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {repr(e)[:160]}", flush=True)
            report["variants"][name] = {"error": repr(e)[:160]}
            dead.add(name)

    def bench(f, label):
        def loop(v):
            def body(i, salt):
                s, c = f(v + salt)
                return (s[0] + c[0].astype(jnp.int64)) & jnp.int64(1)
            return jax.lax.fori_loop(0, 8, body, jnp.int64(0))
        j = jax.jit(loop)
        float(np.asarray(j(values)))  # compile
        t = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(j(values)))
            t.append(time.perf_counter() - t0)
        ms = min(t) * 1e3 / 8
        print(f"{label}: {ms:6.2f} ms/iter amortized "
              f"({n / (ms / 1e3) / 1e6:5.0f}M rows/s)")
        return ms

    for name, f in cases.items():
        if name in dead:
            continue
        try:
            ms = bench(f, name)
            report["variants"][name]["ms_amortized"] = round(ms, 3)
            report["variants"][name]["rows_per_sec"] = round(n / (ms / 1e3),
                                                             1)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: BENCH FAILED {repr(e)[:160]}", flush=True)
            report["variants"][name]["bench_error"] = repr(e)[:160]
    # machine-readable artifact line (VERDICT r4 item 9: kernel-level
    # progress must be auditable without trusting commit messages)
    import json
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
