#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=tpu_r3_batch6.log
{
echo "=== engine_100m_sweep (2^25 / 2^24 / 2^23 chunks) ==="
timeout 5400 python benchmarks/engine_100m_sweep.py
echo "=== DONE batch6 ==="
} >> "$LOG" 2>&1
