#!/bin/bash
# Warm the persistent JAX compilation cache (.jax_cache) for every program
# bench.py measures, so the driver's `python bench.py` rerun hits warm
# compiles end to end (VERDICT r4 "round-ending hygiene" item). Each target
# runs bench.py's subprocess-precompile entry with a generous timeout;
# failures are reported but don't stop the sweep.
cd "$(dirname "$0")/.." || exit 1
TARGETS=(
  quick_filter
  "engine_small:1048576"
  "engine:8388608"
  fused
  filter
  hash_aggregate_direct
  hash_aggregate_mxu_pallas
  sort_rank_join_count
  join_count_program
  hash_join_fk_gather
  sort
  hash_join_openaddr_negative_result
  tpch:Q1 tpch:Q2 tpch:Q3 tpch:Q4 tpch:Q5 tpch:Q6 tpch:Q7 tpch:Q8
  tpch:Q9 tpch:Q10 tpch:Q11 tpch:Q12 tpch:Q13 tpch:Q14 tpch:Q15
  tpch:Q16 tpch:Q17 tpch:Q18 tpch:Q19 tpch:Q20 tpch:Q21 tpch:Q22
)
for t in "${TARGETS[@]}"; do
  start=$(date +%s)
  if QE_BENCH_PRECOMPILE="$t" timeout "${QE_WARM_TIMEOUT:-900}" \
      python bench.py >/dev/null 2>&1; then
    echo "warm $t: ok ($(( $(date +%s) - start ))s)"
  else
    echo "warm $t: FAILED rc=$? ($(( $(date +%s) - start ))s)"
  fi
done
