#!/bin/sh
# Round-4d TPU measurement queue — runs AFTER the 216^3 single-chip
# attempt (launched separately; OOM'd — /tmp/r4d_bench216.log).
# Priority order for the remaining open VERDICT items; ONE TPU process
# at a time, host otherwise idle.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== 64^3 stress @ FA_EVAL_CHUNK=16384 post-meta (item 5 baseline) ==="
SMOOTHMESH_BENCH_STRESS=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py

echo "=== 64^3 stress, FA slot-scan, COLD cache (items 5+9) ==="
JAX_COMPILATION_CACHE_DIR=/tmp/cold_ss_stress SMOOTHMESH_FA_SLOT_SCAN=1 \
    SMOOTHMESH_BENCH_STRESS=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py

echo "=== 64^3 default, FA slot-scan, COLD cache (in-band runtime + true warmup) ==="
JAX_COMPILATION_CACHE_DIR=/tmp/cold_ss_def SMOOTHMESH_FA_SLOT_SCAN=1 \
    SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 3000 python bench.py

echo "=== 64^3 default, unrolled, COLD cache (item 9 quiet-host warmup baseline) ==="
JAX_COMPILATION_CACHE_DIR=/tmp/cold_unroll_def \
    SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 3000 python bench.py

echo "=== halo D=1 overhead (item 3): full vs nosync ==="
SMOOTHMESH_BENCH_SHARDED=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3600 python bench.py
SMOOTHMESH_BENCH_SHARDED=1 SMOOTHMESH_HALO_NOSYNC=1 \
    SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 3600 python bench.py

echo "=== scale curve post-meta: 128/160/192 (item 4) ==="
SMOOTHMESH_BENCH_N=128 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py
SMOOTHMESH_BENCH_N=160 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 4200 python bench.py
SMOOTHMESH_BENCH_N=192 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 4800 python bench.py
