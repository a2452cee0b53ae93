"""Engine benchmark — prints progressively enriched JSON lines on stdout;
the LAST line is the round's record (the driver parses the last line).

Measures the BASELINE.json operator set (filter, hash aggregate, hash join
build+probe+emit, sort) as one fused jitted pipeline on synthetic tables,
on whatever device JAX picks (the real TPU chip under the driver; CPU when
JAX_PLATFORMS=cpu).

Reliability contract (round-3 lesson: rc=124 recorded NO number at all):
  * a global wall-clock budget (QE_BENCH_BUDGET_S, default 2400 s) gates
    every optional stage; stages skipped on budget grounds are marked
    "skipped_budget" in the JSON instead of silently missing;
  * the headline JSON line is emitted (and flushed) as soon as the first
    real measurement exists, then RE-emitted enriched after each stage —
    a kill at any point still leaves a parseable last line;
  * compiles go through the persistent compilation cache
    (query_engine_tpu.__init__ sets jax_compilation_cache_dir), and
    per-stage compile seconds are recorded in the JSON under "compile_s".

Headline metric: pipeline rows/sec/chip. vs_baseline compares against the
reference's only published join throughput — 813.01 QPS on the 6x4-row
employees/departments join (README.md:693), i.e. 813 * 24 = 19,512 joined
rows/sec (and that join is a Cartesian stub; see BASELINE.md caveat).

Per-operator numbers (filter / aggregate variants / join / sort) land in
the JSON under "per_op", each with raw + dispatch-amortized rows/s,
achieved GB/s vs the v5e HBM roofline (819 GB/s), and sol_frac — the
fraction of the op's primitive-derived speed-of-light. The amortization
harness self-certifies against work elision: the implied fixed dispatch
cost (t(k) - k*per_iter) must land in a plausible tunnel-dispatch window,
else the op is flagged "nonlinear".

TPC-H: per-query ms at QE_BENCH_TPCH_ROWS lineitem rows (default 2^21)
lands under "tpch_ms" so query-level perf is regression-tracked, not just
per-op (budget-gated; skipped queries are marked).

Env knobs: QE_BENCH_ROWS (default 2^24 = 16.7M), QE_BENCH_ITERS (default
3), QE_BENCH_OPS=0 to skip per-operator, QE_BENCH_TPCH=0 to skip TPC-H,
QE_BENCH_BUDGET_S wall-clock budget.
"""

import json
import os
import sys
import time

T_START = time.time()
# Default raised from 900s: the record is emitted progressively after
# every stage, so an external kill at any point keeps everything measured
# so far — a small internal budget only self-truncates. 2400s covers one
# tunnel stall (observed 10-45 min) plus the full warm stage walk.
BUDGET_S = float(os.environ.get("QE_BENCH_BUDGET_S", "2400"))


def remaining() -> float:
    return BUDGET_S - (time.time() - T_START)


def _ensure_device_or_cpu():
    """The driver runs this on a real TPU behind a tunnel; when the tunnel
    is down, backend init hangs forever. Probe in a subprocess with a
    timeout BEFORE any jax-touching import and fall back to CPU — clearly
    labeled in the JSON — so the round still records A number instead of a
    timeout. NOTE the harness exports JAX_PLATFORMS=axon, so "is it set"
    is not a usable skip condition — only an explicit cpu request skips
    the probe."""
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        return
    if os.environ.get("QE_BENCH_PRECOMPILE"):
        return  # parent already validated the device
    import subprocess

    try:
        rc = subprocess.run(
            [sys.executable, "-c",
             "import query_engine_tpu, jax; jax.devices()"],
            timeout=300, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        ).returncode
    except subprocess.TimeoutExpired:
        rc = -1
    if rc != 0:
        print("TPU backend unavailable (tunnel down?); falling back to CPU "
              "— numbers below are NOT TPU numbers", file=sys.stderr)
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault("QE_BENCH_ROWS", str(1 << 21))
        os.environ.setdefault("QE_BENCH_OPS", "0")
        os.environ.setdefault("QE_BENCH_TPCH", "0")


if __name__ == "__main__":
    _ensure_device_or_cpu()

import numpy as np  # noqa: E402

import query_engine_tpu  # noqa: F401,E402  (enables x64 + compile cache)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from query_engine_tpu.ops import kernels as K
from query_engine_tpu.ops.pallas.group_agg import grouped_sum_count_i64

REFERENCE_JOIN_ROWS_PER_SEC = 813.01 * 24  # README.md:678-694 sample output

from query_engine_tpu.utils.profiling import (  # noqa: E402
    TPU_V5E_HBM_BYTES_PER_SEC as HBM_BYTES_PER_SEC,
)


N_GROUPS = 1024  # aggregate cardinality (dept-style grouping)

# The progressively-enriched record. emit() prints the whole thing as one
# line; the driver takes the LAST line, so each emit supersedes the prior.
REPORT = {
    "metric": "fused_filter_agg_join_sort_pipeline",
    "value": 0.0,
    "unit": "rows/sec/chip",
    "vs_baseline": 0.0,
    "sol_hw": "tpu_v5e",  # sol_ms/sol_frac use v5e primitive ceilings;
    # meaningless when the bench runs on CPU
    "compile_s": {},
}


def emit():
    print(json.dumps(REPORT), flush=True)


def _set_headline(metric, rows_per_sec):
    """Adopt (metric, rows_per_sec) as the headline if it is the best REAL
    measurement so far. The quick_filter insurance number never holds the
    headline against a real pipeline/engine number — a bare filter-count
    is not a filter+join+agg+sort workload, it is only the guarantee that
    `value` is never 0.0."""
    quick_holds = REPORT["metric"] == "quick_filter_rows_per_sec"
    if rows_per_sec > REPORT["value"] or quick_holds:
        REPORT["metric"] = metric
        REPORT["value"] = round(rows_per_sec, 1)
        REPORT["vs_baseline"] = round(
            rows_per_sec / REFERENCE_JOIN_ROWS_PER_SEC, 2
        )
    REPORT.pop("in_progress", None)


def build_pipeline(cap: int, bcap: int, use_mxu_agg: bool):
    def pipeline(age, age_v, salary, salary_v, dept, dept_v, grp,
                 bdept, bdept_v, bval, bval_v, n_rows, n_build):
        # --- filter: age > 25 ---
        live = K.live_mask(cap, n_rows)
        keep = (age > 25) & age_v & live

        # --- hash aggregate: GROUP BY grp -> COUNT/SUM/AVG ---
        if use_mxu_agg:
            # Pallas kernel: aggregation as a one-hot matmul on the MXU
            s, c = grouped_sum_count_i64(salary, keep, grp, N_GROUPS)
            sv = c > 0
            ng = jnp.sum(sv.astype(jnp.int32))
        else:
            gid, ng, rep = K.group_ids_direct(grp, keep, n_rows, 0, N_GROUPS)
            gcap = N_GROUPS + 1
            s, sv = K.segment_aggregate("sum", salary, salary_v & keep, gid,
                                        n_rows, gcap)
            c, _ = K.segment_aggregate("count_star", None, None, gid,
                                       n_rows, gcap)
        avg = s.astype(jnp.float64) / jnp.maximum(c, 1)

        # --- hash join: probe (filtered fact) x build (dim, unique keys) ---
        # FK fast path with direct ranks (keys bounded in [0, bcap)):
        # rank = key, then the FUSED rank-space gather (fk_gather_by_rank:
        # build columns pack into rank-indexed words, ONE probe-length
        # access incl. the matched bit) — what the compiled pipeline does.
        iota_l = jnp.arange(cap, dtype=jnp.int32)
        iota_r = jnp.arange(bcap, dtype=jnp.int32)
        lr = jnp.where(dept_v & keep, dept, -(iota_l + 2))
        rr = jnp.where(bdept_v, bdept, -(iota_r + cap + 2))
        fused = K.fk_gather_by_rank(
            [bval], [bval_v], [(0, 1024)], rr, jnp.ones(bcap, bool),
            lr, keep, bcap,
        )
        (jval_col,), (jval_ok,), jvalid = fused
        total = jnp.sum(jvalid.astype(jnp.int64))
        joined_val = jnp.where(jvalid, jval_col + salary, 0)

        # --- sort: ORDER BY salary DESC ---
        perm = K.sort_permutation([salary], [salary_v], [False], [False],
                                  n_rows)
        top = salary[perm[:128]]  # top-k: gather only the fetched window

        return s[:128], c[:128], avg[:128], total, jnp.sum(joined_val), top, ng

    return jax.jit(pipeline)


def _pin(a, lo, hi):
    """Force a generated plane to attain exact (lo, hi) bounds so any
    data-derived program constant downstream is identical across runs and
    processes — stable persistent-compilation-cache keys."""
    return a.at[0].set(lo).at[1].set(hi)


def _build_args(cap, bcap):
    """All planes are GENERATED ON DEVICE (jax.random): the tunnel moves
    host->device data at ~1-2 MB/s, so the old 400MB numpy upload cost
    3-6 MINUTES per process (and every stage subprocess pays it); device
    generation costs milliseconds plus one small compile. The measured
    programs are unchanged — they take the planes as arguments, and the
    distributions (uniform ints in the same ranges, ~2% null dept, unique
    build keys via permutation) match the old numpy draws."""
    import jax.random as jr

    n_rows = cap - 17
    n_build = bcap - 3
    n_keys = bcap  # every probe row matches ~1 build row

    # TPU deployment profile: 32-bit lanes for keys/filters (native width on
    # v5e), 64-bit only where aggregation parity needs it (salary sums).
    # The PRNG keys are ARGUMENTS, not captured constants: a nullary jit
    # would be constant-folded by XLA at compile time — the 16.7M-row
    # generation becomes literal constants baked into the executable,
    # which the compile service then evaluates and ships back through the
    # ~1-2MB/s tunnel (observed: a 26-minute "compile").
    @jax.jit
    def gen(ks):
        return (
            _pin(jr.randint(ks[0], (cap,), 18, 65, jnp.int32), 18, 64),
            _pin(jr.randint(ks[1], (cap,), 50_000, 150_000, jnp.int64),
                 50_000, 149_999),
            _pin(jr.randint(ks[2], (cap,), 0, n_keys, jnp.int32),
                 0, n_keys - 1),
            jr.uniform(ks[3], (cap,)) > 0.02,
            _pin(jr.randint(ks[4], (cap,), 0, 1024, jnp.int32), 0, 1023),
            jr.permutation(ks[5], jnp.arange(bcap, dtype=jnp.int32)),
            _pin(jr.randint(ks[6], (bcap,), 0, 1000, jnp.int64), 0, 999),
            jnp.ones(cap, bool),
            jnp.ones(bcap, bool),
        )

    age, salary, dept, dept_v, grp, bdept, bval, ones_c, ones_b = gen(
        jr.split(jr.PRNGKey(42), 7))
    return (
        age, ones_c, salary, ones_c, dept, dept_v, grp,
        bdept, ones_b, bval, ones_b,
        np.int64(n_rows), np.int64(n_build),
    )


def _fused_measure(cap, bcap, iters):
    """Build args + pipeline, warm (persistent-cache hit), measure. Runs
    inside a measure:fused stage subprocess."""
    args = _build_args(cap, bcap)
    pipeline = build_pipeline(cap, bcap,
                              jax.devices()[0].platform != "cpu")

    def run_once():
        out = pipeline(*args)
        # force full completion: materialize a scalar that depends on
        # every heavy op (block_until_ready alone can return early on
        # remote/tunneled platforms)
        return float(np.asarray(out[4])) + float(
            np.asarray(out[3])) + float(np.asarray(out[5])[0])

    t0 = time.time()
    run_once()
    warm_s = time.time() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    return {
        "rows_per_sec": round(float(int(args[-2])) / min(times), 1),
        "warm_compile_s": round(warm_s, 1),
    }


def main():
    iters = int(os.environ.get("QE_BENCH_ITERS", 3))
    REPORT["in_progress"] = True
    REPORT["device"] = str(jax.devices()[0])
    emit()  # T0 record: a kill at ANY later point leaves parseable JSON

    # 0a) a trivially-compiling filter measurement FIRST: even with a fully
    #     cold compile cache this lands a real TPU number in the first
    #     ~90s, so `value` is never 0.0 (round-4 failure mode: the driver
    #     killed the run inside stage 1's unguarded cold compile and the
    #     record was the T0 zero).
    _quick_stage(iters)
    emit()

    # 0b) the SQL engine path at small rows (2^20): same program shape as
    #     the headline engine stage but quick to run; subprocess-
    #     precompiled with a tight timeout so a cold cache skips instead
    #     of stalling (VERDICT r4 item 1b).
    _engine_stage("engine_small", 1 << 20, iters,
                  min(max(remaining() - 600.0, 90.0), 240.0))
    emit()

    # 1) the full SQL engine path — the headline metric since round 2.
    #    Its warmup compile goes through the same subprocess-precompile +
    #    hard-timeout guard as every other heavy stage (round 4 died on
    #    exactly this compile running unguarded in-process).
    _engine_stage("engine", _engine_rows(), iters,
                  min(max(remaining() - 360.0, 60.0),
                      float(os.environ.get("QE_BENCH_COMPILE_TIMEOUT",
                                           "600"))))
    emit()

    # 2) per-operator roofline rows. ONE bounded subprocess compiles
    #    (persistent-cache-warm) and measures every op, flushing each op's
    #    result progressively; a cold-compile overrun or fetch hang costs
    #    the stage timeout, keeps the flushed ops, and the retry finishes
    #    the remainder warm. QE_WARMED_OPS="*" tells the child to compile
    #    in-process (bounded by ITS timeout) instead of spawning per-op
    #    precompile grandchildren.
    if os.environ.get("QE_BENCH_OPS", "1") != "0" and remaining() > 90:
        t0 = time.time()
        rc_o, s_o, res_o = _measured_stage(
            "measure:ops", max(min(remaining() - 300.0, 1200.0), 90.0),
            {"QE_WARMED_OPS": "*"})
        if rc_o != 0:
            res_o["_stage"] = {"rc": rc_o, "s": round(s_o, 1)}
        REPORT["per_op"] = res_o
        REPORT["compile_s"]["per_op_total_s"] = round(time.time() - t0, 1)
        emit()

    # 3) TPC-H per-query ms, same single-subprocess + retry pattern
    #    (QE_WARMED_TPCH="*": queries compile in-process in the child,
    #    bounded by its timeout, partial results flushed per query).
    if os.environ.get("QE_BENCH_TPCH", "1") != "0" and remaining() > 60:
        t0 = time.time()
        rc_t, s_t, res_t = _measured_stage(
            "measure:tpch",
            max(min(remaining() - 150.0, 1200.0), 60.0),
            {"QE_WARMED_TPCH": "*"})
        if rc_t != 0:
            res_t["_stage"] = {"rc": rc_t, "s": round(s_t, 1)}
        REPORT["tpch_ms"] = res_t
        REPORT["compile_s"]["tpch_total_s"] = round(time.time() - t0, 1)
        emit()
    _baseline_block()
    emit()

    # 4) hand-fused kernel pipeline, LAST: the engine number has been the
    #    headline since round 2, so under a tight driver clock the fused
    #    re-measurement is the right stage to lose. Single bounded
    #    subprocess + retry like the others.
    if remaining() > 60:
        rc_m, s_m, res = _measured_stage(
            "measure:fused", min(max(remaining() - 30.0, 60.0), 700.0))
        if res.get("rows_per_sec"):
            rows_per_sec = res["rows_per_sec"]
            REPORT["compile_s"]["fused_pipeline"] = res.get("warm_compile_s")
            # pipeline reads each input plane once: age 4+1, salary 8+1,
            # dept 4+1, grp 4, dim-side negligible -> 23 B/row min traffic
            REPORT["fused_pipeline_rows_per_sec"] = rows_per_sec
            REPORT["hbm_roofline_frac"] = round(
                rows_per_sec * 23 / HBM_BYTES_PER_SEC, 4
            )
            # Headline = the faster of the hand-fused kernel pipeline and
            # the full SQL engine path on the same workload (the engine
            # overtook the hand pipeline in round 2 — the product's own
            # number is the honest one).
            _set_headline("fused_filter_agg_join_sort_pipeline",
                          rows_per_sec)
            print(f"fused pipeline: {rows_per_sec:,.0f} rows/s "
                  f"(warm compile {res.get('warm_compile_s')}s)",
                  file=sys.stderr)
        else:
            REPORT["fused_pipeline_rows_per_sec"] = (
                res or {"stage_rc": rc_m, "s": round(s_m, 1)})
            print(f"fused pipeline: measure stage rc={rc_m} after "
                  f"{s_m:.0f}s — no number", file=sys.stderr)
        emit()

    _baseline_block()
    REPORT["wall_s"] = round(time.time() - T_START, 1)
    emit()


def _baseline_block():
    """Top-level BASELINE.md compliance verdicts, decidable from this JSON
    alone (VERDICT r4 item 4). The >=70% roofline target is evaluated on
    the compute-bound speed-of-light reading (sol_frac), with the reason
    stated; the raw HBM-bytes reading is reported alongside."""
    per_op = REPORT.get("per_op", {})

    def op_verdict(name):
        r = per_op.get(name, {})
        if not isinstance(r, dict) or r.get("sol_frac") is None:
            return {"status": "not_measured_this_run"}
        return {
            "sol_frac": r["sol_frac"],
            "hbm_roofline_frac": r.get("hbm_roofline_frac"),
            "pass_70pct_sol": bool(r["sol_frac"] >= 0.70),
        }

    scaling = None
    try:
        cands = sorted(
            f for f in os.listdir(os.path.dirname(os.path.abspath(__file__)))
            if f.startswith("SCALING_r") and f.endswith(".json")
        )
        if cands:
            with open(cands[-1]) as fh:
                sc = json.load(fh)
            eff = sc.get("scaling", {}).get("projected_efficiency", {})
            scaling = {
                "artifact": cands[-1],
                "projected_efficiency": eff,
                "pass_80pct_at_n2": bool(
                    eff and min(
                        v for k, v in eff.items() if k.endswith("_n2")
                    ) >= 0.80
                ),
            }
    except Exception as e:  # noqa: BLE001
        scaling = {"error": repr(e)[:120]}
    REPORT["baseline"] = {
        "join_agg_roofline_70pct": {
            "target": "hash join & hash aggregate >= 70% of per-chip "
                      "roofline rows/s (BASELINE.md operative targets)",
            "reading": "compute-bound speed-of-light (sol_frac) per "
                       "docs/TPU_DESIGN.md: grouped aggregation lowers to "
                       "a one-hot matmul on the MXU and join rank-matching "
                       "to lax.sort — both compute-bound. The 819 GB/s HBM "
                       "reading would require ~35B rows/s at 16 B/row, "
                       "unreachable through any matmul/sort formulation; "
                       "hbm_roofline_frac is reported alongside for the "
                       "literal reading.",
            "hash_aggregate_mxu": op_verdict("hash_aggregate_mxu_pallas"),
            "hash_join_fk_gather": op_verdict("hash_join_fk_gather"),
            "join_count_program": op_verdict("join_count_program"),
            "sort_rank_join_count": op_verdict("sort_rank_join_count"),
        },
        "scaling_80pct": scaling or {"status": "no SCALING artifact found"},
        "parity": "bit-exact differentials in tests/: compiled pipeline vs "
                  "eager oracle, mesh SQL vs single-device, TPC-H vs pandas "
                  "oracle (test_tpch_mini.py), reference query set on "
                  "employees/departments CSVs (test_e2e_sql.py)",
    }


def _engine_rows() -> int:
    return min(int(os.environ.get("QE_BENCH_ROWS", 1 << 24)) - 17, 1 << 23)


def _engine_setup(n):
    """Deterministic session + query for the engine stage — shared by the
    subprocess precompile and the in-process measurement so the persistent
    compilation cache sees the identical programs.

    The fact table is DEVICE-GENERATED and registered as a device-backed
    ColumnBatch (Column.data may be a jax.Array; pipeline.py:201 no-ops,
    ensure_bounds reduces on device): the old numpy ingest shipped ~200MB
    through the ~1-2MB/s tunnel per process. Bounds are pinned (_pin) so
    the data-derived program constants — table-stat bounds drive kernel
    selection and static emit capacities — are identical across runs."""
    from query_engine_tpu.core.schema import Field, Schema
    from query_engine_tpu.core.types import DataType
    from query_engine_tpu.columnar.batch import Column, ColumnBatch, \
        padded_capacity
    from query_engine_tpu.engine.session import Session
    import jax.random as jr

    nd = 1024
    cap = padded_capacity(n)

    # keys as ARGUMENTS (see _build_args: nullary jit = constant folding)
    @jax.jit
    def gen(ks):
        return (
            _pin(jr.randint(ks[0], (cap,), 18, 65, jnp.int64), 18, 64),
            _pin(jr.randint(ks[1], (cap,), 50_000, 150_000, jnp.int64),
                 50_000, 149_999),
            _pin(jr.randint(ks[2], (cap,), 0, nd, jnp.int64), 0, nd - 1),
            jnp.ones(cap, bool),
        )

    age, salary, dept, valid = gen(jr.split(jr.PRNGKey(7), 3))
    i64 = DataType.int64()
    fact = ColumnBatch(
        Schema([Field("age", i64), Field("salary", i64),
                Field("dept", i64)]),
        [Column(age, valid, i64), Column(salary, valid, i64),
         Column(dept, valid, i64)],
        n,
    )
    rng = np.random.default_rng(7)
    bonus = rng.integers(0, 1000, nd)
    bonus[0], bonus[1] = 0, 999  # pin bounds (host-side _pin)
    dim = ColumnBatch.from_pydict({
        "dept_id": np.arange(nd), "bonus": bonus,
    })
    s = Session()
    s.register_table("f", fact)
    s.register_table("d", dim)
    q = ("SELECT f.dept, COUNT(*) AS c, SUM(f.salary + d.bonus) AS s "
         "FROM f JOIN d ON f.dept = d.dept_id "
         "WHERE f.age > 25 GROUP BY f.dept ORDER BY s DESC LIMIT 10")
    return s, q


def _engine_stage(name, n, iters, timeout_s):
    """ONE bounded subprocess compiles (persistent-cache-warm or cold) AND
    measures the SQL engine path at n rows, with one retry: a cold
    compile that overruns the timeout still fills the compile cache, so
    the retry measures warm. Bounds both in-process hazards (uninterruptible
    XLA compiles — the round-3/4 killer — and tunnel fetch hangs); a
    successful measurement updates the headline if it is the best so far."""
    rc_m, s_m, engine = _measured_stage(
        f"measure:engine:{n}",
        min(max(remaining() - 120.0, 60.0), timeout_s),
    )
    if not engine:
        engine = {"stage_rc": rc_m, "s": round(s_m, 1)}
        print(f"{name}: measure stage rc={rc_m} after {s_m:.0f}s — no "
              "number", file=sys.stderr)
    if "compile_s" in engine:
        REPORT["compile_s"][name] = engine.pop("compile_s")
    REPORT[name] = engine
    if isinstance(engine, dict) and engine.get("rows_per_sec"):
        _set_headline(f"{name}_sql_filter_join_agg_sort",
                      engine["rows_per_sec"])


def _engine_bench(n, iters):
    """Full SQL engine path (parse->plan->compiled pipeline->result) on the
    filter+join+aggregate+sort workload; reported on stderr."""
    s, q = _engine_setup(n)
    t0 = time.time()
    s.sql(q)  # warm (hits the persistent cache the subprocess filled)
    compile_s = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s.sql(q)
        ts.append(time.perf_counter() - t0)
    print(
        f"engine_sql_pipeline[{n}]: {n / min(ts):,.0f} rows/s "
        f"({min(ts)*1e3:.1f} ms/query, {n} rows, "
        f"warm+compile {compile_s:.1f}s)",
        file=sys.stderr,
    )
    return {
        "rows_per_sec": round(n / min(ts), 1),
        "ms_per_query": round(min(ts) * 1e3, 2),
        "rows": n,
        "compile_s": round(compile_s, 1),
    }


def _quick_op(salt, a, av, n):
    # MUST stay textually identical to the per-op "filter" op in _op_defs:
    # the two then lower to the same program and share one compile-cache
    # entry (warming either warms both). A bespoke small-shape variant of
    # this stage hung in the result fetch on the tunnel (r5 run 1) while
    # the per-op-shaped program has measured clean every round.
    return K.filter_count((a > (25 + salt).astype(a.dtype)) & av, n)


def _quick_args():
    cap = int(os.environ.get("QE_BENCH_ROWS", 1 << 24))
    import jax.random as jr

    # device-generated (see _build_args; key as ARGUMENT so XLA cannot
    # constant-fold the generation): age-like plane, all-valid
    gen = jax.jit(lambda k: (
        _pin(jr.randint(k, (cap,), 18, 65, jnp.int32), 18, 64),
        jnp.ones(cap, bool),
    ))
    age, ones = gen(jr.split(jr.PRNGKey(42), 7)[0])
    return (age, ones, np.int64(cap - 17))


def _quick_fn():
    return _one_fn(_quick_op)


def _quick_measure(iters):
    """Compile (cache-warm or trivially cold) + measure the quick filter
    program. Runs inside a measure:quick stage subprocess."""
    f = _quick_fn()
    a = _quick_args()
    float(np.asarray(f(*a)))  # warm
    ts = []
    for _ in range(max(iters, 3)):
        t0 = time.perf_counter()
        float(np.asarray(f(*a)))
        ts.append(time.perf_counter() - t0)
    rps = float(int(a[-1])) / min(ts)
    return {
        "rows_per_sec": round(rps, 1), "rows": int(a[-1]),
        "ms": round(min(ts) * 1e3, 2),
    }


def _quick_stage(iters):
    """The per-op filter program measured FIRST as the insurance number:
    one filter-count at QE_BENCH_ROWS, in the first ~2 min of the run, so
    the driver record is never value=0.0. The WHOLE stage (compile AND
    measure) runs in one bounded subprocess: the filter program compiles
    in seconds even cold, and the fetch-hang hazard (13-19 min tunnel
    stalls observed on warm programs) is bounded the same way."""
    rc, s, res = _run_stage("measure:quick",
                            min(max(remaining() - 700.0, 60.0), 240.0))
    REPORT["compile_s"]["quick_stage"] = (
        round(s, 1) if rc == 0 else f"rc={rc}/{s:.0f}s"
    )
    if not res or not res.get("rows_per_sec"):
        REPORT["quick_filter"] = res or {"stage_rc": rc, "s": round(s, 1)}
        print(f"quick_filter: stage rc={rc} after {s:.0f}s — no number",
              file=sys.stderr)
        return
    REPORT["quick_filter"] = res
    rps = res["rows_per_sec"]
    if REPORT["value"] == 0.0:
        REPORT["metric"] = "quick_filter_rows_per_sec"
        REPORT["value"] = rps
        REPORT["vs_baseline"] = round(rps / REFERENCE_JOIN_ROWS_PER_SEC, 2)
    REPORT.pop("in_progress", None)
    print(f"quick_filter: {rps:,.0f} rows/s ({res['ms']:.1f} ms)",
          file=sys.stderr)


def _tpch_items(tpch_mini):
    """TPC-H queries with the heaviest-compiling one (Q18: correlated IN
    over a grouped-HAVING subquery — its cold compile has eaten whole
    2400s warm legs through the compile service) moved LAST, so a bounded
    stage lands every other query before risking the wall."""
    items = list(tpch_mini.QUERIES.items())
    items.sort(key=lambda kv: kv[0] == "Q18")  # stable: Q18 to the back
    return items


def _tpch_bench():
    """Per-query TPC-H ms at QE_BENCH_TPCH_ROWS lineitem rows through the
    full SQL engine — the query-level perf record VERDICT r3 item 10 asks
    for. Budget-gated per query; skipped queries are marked explicitly."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    import tpch_mini

    n_li = int(os.environ.get("QE_BENCH_TPCH_ROWS", 1 << 21))
    if remaining() < 120:
        print(f"tpch: skipped entirely (remaining {remaining():.0f}s)",
              file=sys.stderr)
        return {"skipped_budget": True}
    t0 = time.time()
    s, _tables = tpch_mini.build(n_li)
    out = {"lineitem_rows": n_li, "build_s": round(time.time() - t0, 1)}
    reps = max(1, int(os.environ.get("QE_BENCH_TPCH_ITERS", "2")))
    # Which queries are already warm in the persistent cache? Inside a
    # measure:tpch stage subprocess the parent hands us the set it just
    # batch-precompiled (QE_WARMED_TPCH: ONE subprocess warms all 22 —
    # one startup + one table build instead of 22, each of which costs
    # ~30-60s even fully warm); standalone callers batch-precompile here.
    env_w = os.environ.get("QE_WARMED_TPCH")
    if env_w is not None:
        warmed = set(filter(None, env_w.split(",")))
    else:
        prog_path = f"/tmp/qe_tpch_progress_{os.getpid()}.txt"
        batch_timeout = min(max(remaining() - 90.0, 60.0), 1500.0)
        rc_b, pre_b = _precompile("tpch:ALL", batch_timeout,
                                  progress_path=prog_path)
        warmed = _read_progress(prog_path)
        try:
            os.unlink(prog_path)
        except OSError:
            pass
        out["precompile"] = {"s": round(pre_b, 1), "rc": rc_b,
                             "warmed": len(warmed)}
        print(f"tpch:ALL precompile: rc={rc_b} {pre_b:.0f}s, "
              f"{len(warmed)} queries warm", file=sys.stderr)
    for name, q in _tpch_items(tpch_mini):
        if remaining() < 40:
            out[name] = "skipped_budget"
            continue
        if f"tpch:{name}" not in warmed and "*" not in warmed:
            # cold query: per-query subprocess precompile (hard timeout) —
            # a cold compile of ONE query can no longer eat the remaining
            # budget; it marks a skip and the other queries still land
            timeout = min(max(remaining() - 30.0, 30.0),
                          float(os.environ.get("QE_BENCH_COMPILE_TIMEOUT",
                                               "600")))
            rc, pre_s = _precompile(f"tpch:{name}", timeout)
            if rc != 0:
                out[name] = f"skipped_compile_timeout_{pre_s:.0f}s"
                print(f"tpch {name}: precompile rc={rc} after {pre_s:.0f}s "
                      "— skipped", file=sys.stderr)
                continue
        try:
            s.sql(q)  # warm (persistent cache hit)
            ts = []
            for _ in range(reps):
                t1 = time.perf_counter()
                s.sql(q)
                ts.append(time.perf_counter() - t1)
            out[name] = round(min(ts) * 1e3, 1)
            print(f"tpch {name}: {out[name]:.1f} ms", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": repr(e)[:120]}
            print(f"tpch {name}: FAILED ({e!r})", file=sys.stderr)
        _stage_flush(out)  # progressive: a late hang keeps early queries
    q_ms = [v for k, v in out.items()
            if k.startswith("Q") and isinstance(v, (int, float))]
    out["total_warm_ms"] = round(sum(q_ms), 1) if q_ms else None
    return out


# measured v5e primitive ceilings, solo runs through the tunnel
# (docs/TPU_DESIGN.md "primitive ceilings" table): these ARE the
# speed-of-light for any operator built from them — random gathers and
# scatters are element-serial on this hardware (sequential gather measures
# the same 99 ms/8M as random), so ops that index per-row are bounded by
# the op pipeline, not HBM bandwidth.
PRIM_NS_PER_ROW = {
    # r3 amortized re-measurement: the 47 ms/8M (5.9 ns/row) figure from
    # round 2 carried residual dispatch; the dispatch-cancelled number is
    # 72 ms/16.7M for packed-key + perm lax.sort
    "sort_packed": 4.3,  # lax.sort, ONE packed i64 key + i32 perm
    "gather": 12.3,      # per gathered word: 98 ms/8M (element-serial)
    "scatter": 10.0,     # i32 scatter / scatter-add: 80 ms/8M
}

MXU_MACS_PER_NS = 98_500  # ~197 bf16 TFLOPS on v5e -> 98.5e12 MAC/s
# VPU ceiling estimate: ~4096 elementwise ALU ops/cycle at 940 MHz. Not a
# published number — a modeling assumption for ops whose binding resource
# is the vector unit (the factorized aggregate's one-hot/chunk builds),
# documented in docs/TPU_DESIGN.md #13.
VPU_OPS_PER_NS = 3_850


def _sol_ms(terms, rows):
    """Speed-of-light for an op = sum of its primitive terms.
    terms: ("hbm", bytes_per_row) | ("mxu", macs_per_row) |
    ("vpu", ops_per_row) | (measured primitive, multiplier)."""
    ns = 0.0
    for kind, mult in terms:
        if kind == "hbm":
            ns += mult / (HBM_BYTES_PER_SEC / 1e9)
        elif kind == "mxu":
            ns += mult / MXU_MACS_PER_NS
        elif kind == "vpu":
            ns += mult / VPU_OPS_PER_NS
        else:
            ns += PRIM_NS_PER_ROW[kind] * mult
    return ns * rows / 1e6


def _per_op(cap, bcap, args, iters):
    """Per-operator rows/s, both raw (one dispatch) and dispatch-amortized
    (QE_BENCH_AMORT_ITERS chained iterations inside ONE jitted fori_loop,
    each iteration's input salted by the previous digest so XLA can neither
    CSE nor reorder them), plus achieved bandwidth vs the HBM roofline AND
    the fraction of the op's primitive-derived speed-of-light (sol_frac) —
    the honest per-op metric on hardware where gathers/scatters are
    element-serial (BASELINE.json metric line; VERDICT round-2 item 2).

    Self-certification against work elision: per_iter and t(k) imply a
    fixed per-dispatch cost fixed_ms = t(k) - k*per_iter; a genuine
    measurement has fixed_ms in the tunnel-dispatch window. An op whose
    fixed_ms falls outside [-5, 500] ms is flagged "nonlinear": either
    the loop body was partially elided (per_iter underestimates) or the
    op's cost is not iteration-linear."""
    (age, age_v, salary, salary_v, dept, dept_v, grp,
     bdept, bdept_v, bval, bval_v, n_rows, n_build) = args
    results = {}
    k_amort = int(os.environ.get("QE_BENCH_AMORT_ITERS", "8"))

    # Which per-op programs are already warm in the persistent cache?
    # Inside a measure:ops stage subprocess the parent hands us the set it
    # just batch-precompiled (QE_WARMED_OPS); standalone callers batch-
    # precompile here. Warm ops skip their per-op precompile subprocess;
    # only the cold remainder pays one.
    env_w = os.environ.get("QE_WARMED_OPS")
    if env_w is not None:
        warmed = set(filter(None, env_w.split(",")))
    else:
        warmed = set()
        if remaining() > 90:
            prog_path = f"/tmp/qe_ops_progress_{os.getpid()}.txt"
            batch_timeout = min(max(remaining() - 90.0, 60.0), 1200.0)
            rc_b, pre_b = _precompile("ops:ALL", batch_timeout,
                                      progress_path=prog_path)
            warmed = _read_progress(prog_path)
            try:
                os.unlink(prog_path)
            except OSError:
                pass
            results["_ops_all_precompile"] = {
                "s": round(pre_b, 1), "rc": rc_b, "warmed": len(warmed),
            }
            print(f"ops:ALL precompile: rc={rc_b} {pre_b:.0f}s, "
                  f"{len(warmed)} programs warm", file=sys.stderr)

    def timed(name, bytes_per_row, sol_terms, op, a, rows=None, note=None):
        """op(salt, *a) -> output pytree; salt is an int64 scalar in {0,1}
        that the op must fold into at least one input plane.

        A failure in one op (transient tunnel hiccup) records an "error"
        entry instead of killing the run — the driver must always get the
        final JSON line. Ops past the wall-clock budget are marked
        skipped_budget; ops whose PROGRAM cannot compile within the budget
        are marked skipped_compile_timeout (the compile happens in a
        subprocess with a hard timeout — an XLA compile cannot be
        preempted in-process, which is what ate round 3)."""
        if remaining() < 45:
            results[name] = {"skipped_budget": True}
            print(f"{name}: skipped (budget, {remaining():.0f}s left)",
                  file=sys.stderr)
            return
        if name not in warmed and "*" not in warmed:
            timeout = min(
                max(remaining() - 40.0, 30.0),
                float(os.environ.get("QE_BENCH_COMPILE_TIMEOUT", "600")),
            )
            rc, pre_s = _precompile(name, timeout)
            if rc != 0:
                results[name] = {
                    "skipped_compile_timeout": round(pre_s, 1), "rc": rc,
                }
                print(f"{name}: program compile exceeded {timeout:.0f}s "
                      f"(rc={rc}) — skipped", file=sys.stderr)
                return
        try:
            _timed(name, bytes_per_row, sol_terms, op, *a, rows=rows,
                   note=note)
        except Exception as e:  # noqa: BLE001 — jax runtime errors vary
            results[name] = {"error": repr(e)[:200]}
            print(f"{name}: MEASUREMENT FAILED ({e!r})", file=sys.stderr)

    def _timed(name, bytes_per_row, sol_terms, op, *a, rows=None, note=None):
        rows_n = int(n_rows if rows is None else rows)
        t_op0 = time.time()

        one = _one_fn(op)

        def make_loop(k):
            def loop(*a):
                return jax.lax.fori_loop(
                    0, k, lambda i, salt: _digest(op(salt, *a)),
                    jnp.int64(0),
                )

            return jax.jit(loop)

        def run(f):
            return float(np.asarray(f(*a)))

        compile_s = [0.0]

        def compile_run(f):
            t0 = time.time()
            run(f)
            compile_s[0] += time.time() - t0

        compile_run(one)
        ts = []
        for _ in range(min(iters, 2)):
            t0 = time.perf_counter()
            run(one)
            ts.append(time.perf_counter() - t0)
        raw_ms = min(ts) * 1e3

        def best_of(f, reps):
            compile_run(f)
            out = []
            for _ in range(reps):
                t0 = time.perf_counter()
                run(f)
                out.append(time.perf_counter() - t0)
            return min(out)

        tunnel_ms = float(os.environ.get("QE_BENCH_DISPATCH_MS", "26"))
        fixed_ms = None
        if raw_ms > 300:
            # expensive op: dispatch is already <10% of the raw time and a
            # meaningful loop would run for many seconds — subtracting the
            # measured dispatch constant is the honest number
            amort_ms = max(raw_ms - tunnel_ms, raw_ms * 0.5)
            method = "raw_minus_dispatch"
        else:
            # two-point amortization: per-iter = (t(3k) - t(k)) / 2k
            # cancels the fixed dispatch+sync cost exactly. k adapts so
            # the 2k-iteration delta is ~tens of ms — well above the
            # +-20% tunnel jitter that swamps a fixed k=8 for cheap ops.
            k_lo = max(4, min(128, int(600.0 / max(raw_ms - 22.0, 3.0))))
            k_lo = max(k_lo, k_amort)

            def two_point(k):
                t_lo = best_of(make_loop(k), max(2, min(iters, 3)))
                t_hi = best_of(make_loop(3 * k), max(2, min(iters, 3)))
                return t_lo, t_hi

            t_lo, t_hi = two_point(k_lo)
            # raw_ms - tunnel over-estimates per-iter for ultra-cheap ops
            # (dispatch+transfer dominates raw), leaving the 2k delta
            # inside tunnel jitter. Escalate k off the MEASURED per-iter
            # until the delta is >=~150 ms of real work.
            if (t_hi - t_lo) < 0.08 and k_lo < 2048 and remaining() > 60:
                per_iter = max((t_hi - t_lo) / (2 * k_lo), 2e-5)
                k_lo = int(min(4096, max(2 * k_lo, 0.15 / per_iter)))
                t_lo, t_hi = two_point(k_lo)
            amort_ms = max((t_hi - t_lo) * 1e3 / (2 * k_lo),
                           t_hi * 1e3 / (3 * k_lo) * 0.05)
            method = f"two_point_k{k_lo}"
            # linearity self-check: implied per-dispatch fixed cost
            fixed_ms = t_lo * 1e3 - k_lo * amort_ms

        rps = rows_n / (amort_ms / 1e3)
        gbps = rps * bytes_per_row / 1e9
        sol = _sol_ms(sol_terms, rows_n)
        results[name] = {
            "rows_per_sec": round(rows_n / (raw_ms / 1e3), 1),
            "ms": round(raw_ms, 2),
            "rows_per_sec_amortized": round(rps, 1),
            "ms_amortized": round(amort_ms, 3),
            "achieved_gb_per_sec": round(gbps, 2),
            "hbm_roofline_frac": round(gbps * 1e9 / HBM_BYTES_PER_SEC, 4),
            "sol_ms": round(sol, 3),
            "sol_frac": round(sol / amort_ms, 4) if amort_ms > 0 else None,
            "sol_model": "+".join(
                f"{m}x{k}" if k != "hbm" else f"{m}B hbm"
                for k, m in sol_terms
            ),
            "amort_method": method,
            "compile_s": round(compile_s[0], 1),
        }
        if fixed_ms is not None:
            results[name]["fixed_ms"] = round(fixed_ms, 1)
            if not (-5.0 <= fixed_ms <= 500.0):
                results[name]["nonlinear"] = True
        if note:
            results[name]["note"] = note
        print(
            f"{name}: {rps:,.0f} rows/s amortized ({amort_ms:.2f} ms, raw "
            f"{raw_ms:.1f} ms)  {gbps:.1f} GB/s  sol {sol:.1f} ms -> "
            f"{100 * sol / max(amort_ms, 1e-9):.0f}% of speed-of-light  "
            f"[compile {compile_s[0]:.0f}s, {time.time()-t_op0:.0f}s total]",
            file=sys.stderr,
        )

    skip_mxu = jax.devices()[0].platform == "cpu"
    for d in _op_defs(cap, bcap, args):
        if skip_mxu and d["name"] == "hash_aggregate_mxu_pallas":
            continue
        timed(**d)
        _stage_flush(results)  # progressive: a later hang keeps early ops
    return results


def _op_defs(cap, bcap, args):
    """The per-op measurement registry, shared by the measurement loop and
    the subprocess precompile mode. Ordered most- to least-load-bearing:
    a tight budget drops from the back. min-traffic bytes/row convention:
    inputs read once + outputs written once. salt is folded into a
    comparison/key plane so every iteration's compute differs (defeats
    CSE) and depends on the previous digest (defeats reordering)."""
    (age, age_v, salary, salary_v, dept, dept_v, grp,
     bdept, bdept_v, bval, bval_v, n_rows, n_build) = args
    defs = []

    defs.append(dict(
        name="filter", bytes_per_row=5, sol_terms=[("hbm", 5)],
        op=lambda salt, a, av, n: K.filter_count(
            (a > (25 + salt).astype(a.dtype)) & av, n
        ),
        a=(age, age_v, n_rows),
    ))
    # count scatter + the chunk scatters covering the value span: the
    # engine passes table-stat bounds (pipeline.py _proj_bounds), so the
    # bench does too — salary spans 17 bits -> 2x16-bit chunks + count
    # = 3 scatter passes (the sol model)
    defs.append(dict(
        name="hash_aggregate_direct", bytes_per_row=14,
        sol_terms=[("scatter", 3), ("hbm", 14)],
        op=lambda salt, d, dv, s, sv, n: K.segment_aggregate(
            "sum", s + salt, sv,
            K.group_ids_direct(d, dv, n, 0, bcap)[0], n, bcap + 1,
            value_bounds=(50_000, 150_001),
        ),
        a=(dept, dept_v, salary, salary_v, n_rows),
    ))
    # the factorized transposed-one-hot Pallas kernel (group_agg.py,
    # round 4): 16384 MACs/row on the MXU ([128,128] lane-contraction per
    # 128 rows), ~1200 VPU ops/row of one-hot + chunk-lane builds (its
    # binding resource: 2 compares/converts x 128 for the one-hot, ~6 ops
    # x 128 lanes for the chunk matrix, the f32 accumulate), 16 B/row HBM
    defs.append(dict(
        name="hash_aggregate_mxu_pallas", bytes_per_row=13,
        sol_terms=[("mxu", 16384), ("vpu", 1200), ("hbm", 16)],
        op=lambda salt, s, sv, g: grouped_sum_count_i64(
            s + salt, sv, g, 1024
        ),
        a=(salary, salary_v, grp),
    ))

    def join_op(salt, d, dv, bd, bdv, n, nb):
        # the engine's general join path: fused ranks+counts (counts from
        # sorted-space scans, no rank-table gather)
        out = K.join_ranks_counts(
            [(d + salt.astype(d.dtype), dv)], [(bd, bdv)], n, nb
        )
        return out[2] + jnp.sum(out[0])  # total + ranks (keep both live)

    # joint packed rank sort + right-by-rank sort + the rank/count row
    # scatters + segmented scans
    defs.append(dict(
        name="sort_rank_join_count", bytes_per_row=5,
        sol_terms=[("sort_packed", 1.07), ("sort_packed", 0.07),
                   ("scatter", 2.0), ("hbm", 24)],
        op=join_op, a=(dept, dept_v, bdept, bdept_v, n_rows, n_build),
    ))

    def count_op(salt, d, dv, bd, bdv, n, nb):
        # the emit-capacity COUNT program: sorted-space only, no
        # scatters/gathers at all (kernels.join_count_total)
        return K.join_count_total(
            [(d + salt.astype(d.dtype), dv)], [(bd, bdv)], n, nb
        )[0]

    defs.append(dict(
        name="join_count_program", bytes_per_row=5,
        sol_terms=[("sort_packed", 1.07), ("hbm", 20)],
        op=count_op, a=(dept, dept_v, bdept, bdept_v, n_rows, n_build),
    ))

    # the join that actually serves engine queries (FK fast path: direct
    # ranks + fused rank-space gather incl. the matched bit)
    def fk_join(salt, d, dv, bd, bdv, bv, bvv, n, nb):
        iota_l = jnp.arange(cap, dtype=jnp.int32)
        iota_r = jnp.arange(bcap, dtype=jnp.int32)
        keep = dv & K.live_mask(cap, n)
        lr = jnp.where(keep, d + salt.astype(d.dtype), -(iota_l + 2))
        rr = jnp.where(bdv, bd, -(iota_r + cap + 2))
        out = K.fk_gather_by_rank(
            [bv], [bvv], [(0, 1024)], rr, jnp.ones(bcap, bool),
            lr, keep, bcap,
        )
        (jd,), (jv,), matched = out
        return jnp.sum(jnp.where(matched, jd, 0))

    # the probe gather hits a bcap-row (1M) table — measured ~0.5x the
    # 8M-table random-gather ceiling the "gather" primitive encodes
    defs.append(dict(
        name="hash_join_fk_gather", bytes_per_row=13,
        sol_terms=[("gather", 0.5), ("scatter", 0.07), ("hbm", 13)],
        op=fk_join,
        a=(dept, dept_v, bdept, bdept_v, bval, bval_v, n_rows, n_build),
    ))

    defs.append(dict(
        name="sort", bytes_per_row=13,
        sol_terms=[("sort_packed", 1.0), ("hbm", 13)],
        op=lambda salt, s, sv, n: K.sort_permutation(
            [s + salt], [sv], [False], [False], n
        ),
        a=(salary, salary_v, n_rows),
    ))

    # open-addressing hash join head-to-head (ops/hash_join.py) — a
    # DELIBERATELY KEPT NEGATIVE RESULT, not a serving path: random gathers
    # are element-serial on TPU, so open addressing measures ~90x slower
    # than the sort-rank join at 8Mx1M (docs/TPU_DESIGN.md #10). Kept in
    # the JSON so the design decision stays reproducible. LAST in the
    # measurement order: it is the least load-bearing number, so it is the
    # one a tight budget drops.
    from query_engine_tpu.ops.hash_join import hash_join_unique, table_size_for

    hj_n = min(cap, 1 << 19)
    T = table_size_for(bcap)
    defs.append(dict(
        name="hash_join_openaddr_negative_result", bytes_per_row=5,
        sol_terms=[("gather", 2.0)],
        op=lambda salt, d, dv, bd, bdv: hash_join_unique(
            d[:hj_n] + salt.astype(d.dtype), dv[:hj_n], bd, bdv, T
        ),
        a=(dept, dept_v, bdept, bdept_v), rows=hj_n,
        note="negative result kept for the record (TPU_DESIGN #10): "
             "open addressing loses ~90x to the sort-rank join on TPU; "
             "no engine path routes here",
    ))
    return defs


def _digest(out):
    """Fold an op's output pytree into one int64 bit — the loop-carried
    salt. MUST be shared by the measurement and precompile paths so the
    persistent compilation cache sees the identical program."""
    d = jnp.int64(0)
    for leaf in jax.tree_util.tree_leaves(out):
        d = d + leaf.ravel()[0].astype(jnp.int64)
    return d & jnp.int64(1)


def _one_fn(op):
    return jax.jit(lambda *a: _digest(op(jnp.int64(0), *a)))


def _precompile(name, timeout_s, progress_path=None):
    """Compile `name`'s program ("fused", a per-op name, or a batched
    "ops:ALL"/"tpch:ALL" target) in a SUBPROCESS with a hard timeout,
    populating the persistent compilation cache so the caller's own
    compile is instant. Returns (rc, seconds); rc None = timeout. An
    in-process XLA compile cannot be interrupted — this is the only way a
    wall-clock budget can actually bound one.

    progress_path: for batched targets, the subprocess appends each
    completed sub-target's name to this file as it finishes, so a timeout
    still tells the caller exactly which programs ARE warm (the cache is
    per-program, so partial progress is real progress)."""
    import subprocess

    env = dict(os.environ)
    env["QE_BENCH_PRECOMPILE"] = name
    env.pop("QE_PRECOMPILE_PROGRESS", None)
    env.pop("QE_STAGE_RESULTS", None)  # grandchild must not clobber ours
    if progress_path:
        env["QE_PRECOMPILE_PROGRESS"] = progress_path
    t0 = time.time()
    try:
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, timeout=timeout_s,
            stdout=subprocess.DEVNULL,
        ).returncode
    except subprocess.TimeoutExpired:
        return None, time.time() - t0
    return rc, time.time() - t0


def _progress_mark(name):
    """Record a completed sub-target in the batched-precompile progress
    file (see _precompile). No-op outside batched precompile runs."""
    p = os.environ.get("QE_PRECOMPILE_PROGRESS")
    if p:
        with open(p, "a") as fh:
            fh.write(name + "\n")


def _read_progress(path):
    try:
        with open(path) as fh:
            return {ln.strip() for ln in fh if ln.strip()}
    except OSError:
        return set()


def _is_skip(v):
    if isinstance(v, str):
        return v.startswith("skipped")
    if isinstance(v, dict):
        return any(k.startswith("skipped") or k in ("error", "stage_rc")
                   for k in v)
    return False


def _measured_stage(target, timeout_s, extra_env=None):
    """_run_stage with ONE retry: a first attempt that dies (timeout,
    fetch hang, cold-compile overrun) still fills the persistent compile
    cache and flushes partial results; the retry finishes the remainder
    warm. Results merge with real measurements preferred over skip/error
    markers."""
    rc, s, res = _run_stage(target, timeout_s, extra_env)
    if rc != 0 and remaining() > 150:
        rc2, s2, res2 = _run_stage(
            target, max(min(remaining() - 60.0, timeout_s), 90.0),
            extra_env)
        merged = dict(res)
        for k, v in res2.items():
            if k not in merged or _is_skip(merged[k]) or not _is_skip(v):
                merged[k] = v
        res, s, rc = merged, s + s2, rc2
    return rc, s, res


def _stage_flush(obj):
    """Atomically write a measurement stage's progressive results to the
    results file the parent reads (see _run_stage). No-op outside stage
    subprocesses."""
    path = os.environ.get("QE_STAGE_RESULTS")
    if not path:
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, path)


def _run_stage(target, timeout_s, extra_env=None):
    """Run a MEASUREMENT stage (target "measure:...") in a subprocess with
    a hard wall-clock timeout, reading progressive results from the stage
    results file. Compiles are bounded by the subprocess-precompile
    pattern already; this bounds the other in-process hazard — a tunnel
    result-fetch that hangs (observed 13-19 min stalls on otherwise-warm
    programs). A hung stage costs its timeout, keeps every sub-result it
    flushed before the hang, and cannot take the parent's record down.
    Returns (rc, seconds, results_dict); rc None = timeout."""
    import subprocess

    path = f"/tmp/qe_stage_{target.replace(':', '_')}_{os.getpid()}.json"
    env = dict(os.environ)
    env["QE_BENCH_PRECOMPILE"] = target
    env["QE_STAGE_RESULTS"] = path
    # the child's own budget gate counts from ITS start: hand it the slice
    # we are giving it, minus teardown margin
    env["QE_BENCH_BUDGET_S"] = str(max(timeout_s - 15.0, 30.0))
    env.pop("QE_PRECOMPILE_PROGRESS", None)
    if extra_env:
        env.update(extra_env)
    t0 = time.time()
    try:
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, timeout=timeout_s,
            stdout=subprocess.DEVNULL,
        ).returncode
    except subprocess.TimeoutExpired:
        rc = None
    res = {}
    try:
        with open(path) as fh:
            res = json.load(fh)
    except (OSError, ValueError):
        pass
    try:
        os.unlink(path)
    except OSError:
        pass
    return rc, time.time() - t0, res


def _precompile_main(name):
    """Subprocess entry: build the named program, compile + run it once
    (filling the persistent compilation cache), exit. Targets:
    "fused", "quick_filter", "engine[_small]:<rows>", "tpch:<Q>",
    or a per-op name."""
    if name == "quick_filter":
        f = _quick_fn()
        a = _quick_args()
        float(np.asarray(f(*a)))
        return
    if name.startswith("measure:"):
        # measurement stage subprocess (see _run_stage): run the stage
        # and flush its results for the parent. Compiles hit the warm
        # persistent cache; a fetch hang here dies with THIS process.
        what = name.split(":", 1)[1]
        iters = int(os.environ.get("QE_BENCH_ITERS", 3))
        if what == "quick":
            _stage_flush(_quick_measure(iters))
        elif what.startswith("engine:"):
            _stage_flush(_engine_bench(int(what.split(":", 1)[1]), iters))
        elif what == "fused":
            cap = int(os.environ.get("QE_BENCH_ROWS", 1 << 24))
            _stage_flush(_fused_measure(cap, max(cap >> 4, 128), iters))
        elif what == "ops":
            cap = int(os.environ.get("QE_BENCH_ROWS", 1 << 24))
            bcap = max(cap >> 4, 128)
            _per_op(cap, bcap, _build_args(cap, bcap), iters)
            # _per_op flushes progressively after each op
        elif what == "tpch":
            _stage_flush(_tpch_bench())
            # _tpch_bench also flushes progressively per query
        else:
            raise SystemExit(f"unknown measure target {what}")
        return
    if name.startswith(("engine:", "engine_small:")):
        n = int(name.split(":", 1)[1])
        s, q = _engine_setup(n)
        s.sql(q)
        return
    if name.startswith("tpch:"):
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "benchmarks"))
        import tpch_mini

        n_li = int(os.environ.get("QE_BENCH_TPCH_ROWS", 1 << 21))
        s, _tables = tpch_mini.build(n_li)
        which = name.split(":", 1)[1]
        if which == "ALL":
            # batched: ONE subprocess (one python+jax startup, one table
            # build/upload) warms every query, marking each as it lands —
            # 22 separate spawns cost ~30-60s EACH in startup + build
            done = _read_progress(
                os.environ.get("QE_PRECOMPILE_PROGRESS", ""))
            for qname, q in _tpch_items(tpch_mini):
                if f"tpch:{qname}" in done:
                    continue  # warmed by an earlier (killed) sweep leg
                try:
                    s.sql(q)
                    _progress_mark(f"tpch:{qname}")
                except Exception as e:  # noqa: BLE001
                    print(f"tpch:{qname} precompile failed: {e!r}",
                          file=sys.stderr)
            return
        s.sql(tpch_mini.QUERIES[which])
        return
    cap = int(os.environ.get("QE_BENCH_ROWS", 1 << 24))
    bcap = max(cap >> 4, 128)
    args = _build_args(cap, bcap)
    if name == "fused":
        pipeline = build_pipeline(
            cap, bcap, jax.devices()[0].platform != "cpu"
        )
        out = pipeline(*args)
        float(np.asarray(out[3]))
        return
    if name == "ops:ALL":
        # batched: one subprocess (one startup, one device-side arg gen)
        # warms every per-op program, marking each as it lands; entries
        # already marked by an earlier (killed) sweep leg are skipped
        skip_mxu = jax.devices()[0].platform == "cpu"
        done = _read_progress(os.environ.get("QE_PRECOMPILE_PROGRESS", ""))
        for d in _op_defs(cap, bcap, args):
            if skip_mxu and d["name"] == "hash_aggregate_mxu_pallas":
                continue
            if d["name"] in done:
                continue
            try:
                one = _one_fn(d["op"])
                float(np.asarray(one(*d["a"])))
                _progress_mark(d["name"])
            except Exception as e:  # noqa: BLE001
                print(f"{d['name']} precompile failed: {e!r}",
                      file=sys.stderr)
        return
    for d in _op_defs(cap, bcap, args):
        if d["name"] == name:
            one = _one_fn(d["op"])
            float(np.asarray(one(*d["a"])))
            return
    raise SystemExit(f"unknown precompile target {name}")


if __name__ == "__main__":
    if os.environ.get("QE_BENCH_PRECOMPILE"):
        _precompile_main(os.environ["QE_BENCH_PRECOMPILE"])
    else:
        main()
