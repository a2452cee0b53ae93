#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=tpu_r3_batch4.log
{
echo "=== bench.py (r3 final per-op, adaptive-k amortization) ==="
timeout 5400 python bench.py
echo "=== tpch_mini 2M (group-space count->emit + mirrored FK) ==="
timeout 2400 python benchmarks/tpch_mini.py
echo "=== DONE batch4 ==="
} >> "$LOG" 2>&1
