#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== engine_100m (chunked) ==="
python benchmarks/engine_100m.py
echo "=== tpch_mini 2M (FD pruning) ==="
python benchmarks/tpch_mini.py
echo "=== DONE batch2 ==="
