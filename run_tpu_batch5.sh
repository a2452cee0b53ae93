#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=tpu_r3_batch5.log
{
echo "=== probe_int8_mxu 16.7M ==="
timeout 1800 python benchmarks/probe_int8_mxu.py
echo "=== bench.py retry (adaptive-k) ==="
timeout 5400 python bench.py
echo "=== DONE batch5 ==="
} >> "$LOG" 2>&1
