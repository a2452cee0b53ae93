#!/bin/bash
# Cache warm sweep using the BATCHED precompile targets (ops:ALL warms all
# per-op programs in one process/upload; tpch:ALL warms all 22 queries over
# one table build). Progress files record partial completion, so a timeout
# or tunnel hang loses only the in-flight program — rerunning converges.
cd "$(dirname "$0")/.." || exit 1
export JAX_LOG_COMPILES="${JAX_LOG_COMPILES:-1}"
TARGETS=(
  "engine:8388608"
  fused
  ops:ALL
  tpch:ALL
  "engine_small:1048576"
  quick_filter
)
for t in "${TARGETS[@]}"; do
  start=$(date +%s)
  prog="/tmp/qe_warm_progress_${t//[:\/]/_}.txt"
  : > "$prog"
  if QE_BENCH_PRECOMPILE="$t" QE_PRECOMPILE_PROGRESS="$prog" \
      timeout "${QE_WARM_TIMEOUT:-2400}" \
      python bench.py >"/tmp/warm_${t//[:\/]/_}.log" 2>&1; then
    echo "warm $t: ok ($(( $(date +%s) - start ))s, $(wc -l < "$prog") marked)"
  else
    echo "warm $t: FAILED rc=$? ($(( $(date +%s) - start ))s, $(wc -l < "$prog") marked)"
  fi
done
echo "SWEEP DONE"
