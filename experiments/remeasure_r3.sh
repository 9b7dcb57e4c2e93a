#!/bin/sh
# Re-measure all bench modes after the K-stacked select change
# (every engine mode shares the select path).  ONE TPU process at a
# time; serialized.  Output: /tmp/remeasure_r3.log
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== 128^3 internal ==="
SMOOTHMESH_BENCH_N=128 SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 3000 python bench.py
echo "=== stress 64^3 ==="
SMOOTHMESH_BENCH_STRESS=1 timeout 3000 python bench.py
echo "=== boundary 64^3 ==="
SMOOTHMESH_BENCH_BOUNDARY=1 timeout 3000 python bench.py
echo "=== sharded n=1 64^3 ==="
SMOOTHMESH_BENCH_SHARDED=1 timeout 3000 python bench.py
