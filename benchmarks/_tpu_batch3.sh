#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== q3_breakdown 2M ==="
python benchmarks/q3_breakdown.py
echo "=== engine_100m (2^26 chunks) ==="
python benchmarks/engine_100m.py
echo "=== bench.py (fused joins) ==="
QE_BENCH_ITERS=3 python bench.py
echo "=== DONE batch3 ==="
