#!/bin/bash
# Priority-ordered cache warm sweep with generous timeouts (the compile
# service through the tunnel measured >900s for the engine program on
# 2026-08-20; JAX's persistent cache makes killed runs incremental, so
# repeated attempts converge). Headline stages first, TPC-H last.
cd "$(dirname "$0")/.." || exit 1
export JAX_LOG_COMPILES="${JAX_LOG_COMPILES:-1}"
TARGETS=(
  "engine:8388608"
  fused
  filter
  hash_aggregate_mxu_pallas
  hash_aggregate_direct
  sort
  sort_rank_join_count
  join_count_program
  hash_join_fk_gather
  "engine_small:1048576"
  hash_join_openaddr_negative_result
  tpch:Q1 tpch:Q3 tpch:Q6 tpch:Q4 tpch:Q5 tpch:Q12 tpch:Q14 tpch:Q2
  tpch:Q7 tpch:Q8 tpch:Q9 tpch:Q10 tpch:Q11 tpch:Q13 tpch:Q15
  tpch:Q16 tpch:Q17 tpch:Q18 tpch:Q19 tpch:Q20 tpch:Q21 tpch:Q22
  quick_filter
)
for t in "${TARGETS[@]}"; do
  start=$(date +%s)
  if QE_BENCH_PRECOMPILE="$t" timeout "${QE_WARM_TIMEOUT:-2700}" \
      python bench.py >"/tmp/warm_${t//[:\/]/_}.log" 2>&1; then
    echo "warm $t: ok ($(( $(date +%s) - start ))s)"
  else
    echo "warm $t: FAILED rc=$? ($(( $(date +%s) - start ))s)"
  fi
done
echo "SWEEP DONE"
