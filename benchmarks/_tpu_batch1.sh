#!/bin/bash
# Solo TPU validation batch 1 (round 3): amortized bench + 100M steady-state
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== devices ==="
python -c "import jax; print(jax.devices())"
echo "=== bench.py (amortized per-op) ==="
QE_BENCH_ITERS=3 python bench.py
echo "=== engine_100m (10 redispatches) ==="
python benchmarks/engine_100m.py
echo "=== DONE batch1 ==="
