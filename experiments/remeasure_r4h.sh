#!/bin/sh
# Round-4h TPU queue (QUIET HOST; one TPU process at a time).
# Stress-mode face-angle, the UNMEASURED quadrant: r4f/r4g only ever
# WIDENED chunks (65536 everywhere / first-pass-only — both negative).
# Here: NARROW the sweep width below 16384 while pinning the first
# pass at 16384 (dirty sweeps pay a full-chunk-width eval floor per
# sweep; the first pass pays per-step latency, round-3: ~1.7 ms/step),
# and shrink FA_DIRTY_CAP (the sweep compactions run jnp.nonzero over
# fixed K_NEW*WE rows regardless of the actual dirty count).
# r4g packed-tables stress baseline: 347.98 ms/iter.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== 64^3 stress, EVAL_CHUNK=8192 FIRST_CHUNK=16384 ==="
SMOOTHMESH_FA_EVAL_CHUNK=8192 SMOOTHMESH_FA_FIRST_CHUNK=16384 \
    SMOOTHMESH_BENCH_STRESS=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py

echo "=== 64^3 stress, EVAL_CHUNK=4096 FIRST_CHUNK=16384 ==="
SMOOTHMESH_FA_EVAL_CHUNK=4096 SMOOTHMESH_FA_FIRST_CHUNK=16384 \
    SMOOTHMESH_BENCH_STRESS=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py

echo "=== 64^3 stress, DIRTY_CAP=8192 ==="
SMOOTHMESH_FA_DIRTY_CAP=8192 \
    SMOOTHMESH_BENCH_STRESS=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py

echo "=== 64^3 stress, DIRTY_CAP=8192 + best chunk combo (edit me) ==="
SMOOTHMESH_FA_DIRTY_CAP=8192 SMOOTHMESH_FA_EVAL_CHUNK=8192 \
    SMOOTHMESH_FA_FIRST_CHUNK=16384 \
    SMOOTHMESH_BENCH_STRESS=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py
