#!/bin/sh
# Round-4 TPU measurement session (VERDICT r3 items 3, 4, 9).
# ONE TPU process at a time; serialized; host CPU must be otherwise
# idle (CLAUDE.md measurement rules).  Output: tee to /tmp/remeasure_r4.log
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== scale curve post-K-stacking (item 4) ==="
SMOOTHMESH_BENCH_N=128 SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 3000 python bench.py
SMOOTHMESH_BENCH_N=160 SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 6000 python bench.py
SMOOTHMESH_BENCH_N=192 SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 6000 python bench.py

echo "=== halo D=1 overhead (item 3): with and without sync hooks ==="
SMOOTHMESH_BENCH_SHARDED=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 3000 python bench.py
SMOOTHMESH_BENCH_SHARDED=1 SMOOTHMESH_HALO_NOSYNC=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 3000 python bench.py

echo "=== compile-time breakdown (item 9) ==="
timeout 3000 python experiments/compiletime.py 1 8 16
