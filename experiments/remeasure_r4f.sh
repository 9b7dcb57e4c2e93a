#!/bin/sh
# Round-4f TPU measurements: FA combined pass + wide first-pass chunk
# (item 5).  Run from /root/repo AFTER the r4e queue (one TPU process
# at a time, host quiet).  r4d post-meta baselines:
#   stress unrolled two-pass: 352.03 ms/iter; in-band: 46.28 ms/iter.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== 64^3 stress, FA_COMBINED=1 ==="
SMOOTHMESH_FA_COMBINED=1 SMOOTHMESH_BENCH_STRESS=1 \
    SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 3000 python bench.py

echo "=== 64^3 stress, FA_FIRST_CHUNK=65536 (wide first pass only) ==="
SMOOTHMESH_FA_FIRST_CHUNK=65536 SMOOTHMESH_BENCH_STRESS=1 \
    SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 3000 python bench.py

echo "=== 64^3 stress, FA_COMBINED=1 + FA_FIRST_CHUNK=65536 ==="
SMOOTHMESH_FA_COMBINED=1 SMOOTHMESH_FA_FIRST_CHUNK=65536 \
    SMOOTHMESH_BENCH_STRESS=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py

echo "=== 64^3 default, FA_COMBINED=1 (in-band guard) ==="
SMOOTHMESH_FA_COMBINED=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py
