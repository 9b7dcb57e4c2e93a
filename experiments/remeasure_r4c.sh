#!/bin/sh
# Round-4c TPU measurement — trimmed, priority-ordered variant of
# remeasure_r4b.sh for the post meta-packing tree (end-of-round time
# budget).  ONE TPU process at a time; host CPU otherwise idle.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== 64^3 default: post-meta regression check + warmup (items 4, 9) ==="
SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 2400 python bench.py

echo "=== 64^3 stress: FA eval-chunk effect (item 5) ==="
SMOOTHMESH_BENCH_STRESS=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 2400 python bench.py

echo "=== halo D=1 overhead (item 3) ==="
SMOOTHMESH_BENCH_SHARDED=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 2400 python bench.py

echo "=== true HBM tile padding probe (item 1a) ==="
timeout 900 python experiments/hbm_true.py

echo "=== 128^3 post-meta (item 4 scale point) ==="
SMOOTHMESH_BENCH_N=128 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py
