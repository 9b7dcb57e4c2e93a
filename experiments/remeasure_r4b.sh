#!/bin/sh
# Round-4b TPU measurement session — post meta-packing refactor.
# Covers VERDICT r3 items 1a (HBM), 3 (halo D=1), 4 (scale curve),
# 5 (stress FA), 9 (compile time).
# ONE TPU process at a time; host CPU otherwise idle (CLAUDE.md).
# Output: tee to /tmp/remeasure_r4b.log
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== true HBM tile padding probe (item 1a) ==="
timeout 600 python experiments/hbm_true.py

echo "=== 64^3 default: post-meta regression check + warmup (items 4, 9) ==="
SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 3000 python bench.py

echo "=== 64^3 stress: FA eval-chunk effect (item 5) ==="
SMOOTHMESH_BENCH_STRESS=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py

echo "=== halo D=1 overhead (item 3): with and without sync hooks ==="
SMOOTHMESH_BENCH_SHARDED=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py
SMOOTHMESH_BENCH_SHARDED=1 SMOOTHMESH_HALO_NOSYNC=1 \
    SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 3000 python bench.py

echo "=== scale curve post-meta (item 4) ==="
SMOOTHMESH_BENCH_N=128 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py
SMOOTHMESH_BENCH_N=160 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 6000 python bench.py
SMOOTHMESH_BENCH_N=192 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 6000 python bench.py

echo "=== compile-time breakdown (item 9) ==="
timeout 3000 python experiments/compiletime.py 1 8 16
