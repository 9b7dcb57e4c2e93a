#!/bin/sh
# Round-5 TPU queue (QUIET HOST; ONE TPU process at a time).
# Execution round: runs the measurements VERDICT r4 queued.
# Order: headline first (cheap, recoups the r4 regression), then the
# stress breakdown that picks the <=250 ms lever, then scale curve,
# then the halo boundary/layer timings, then 216^3 (gated on the
# oomprobe attribution, ~1h remote compile).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== [1] 64^3 default headline (new 3-window bench) ==="
timeout 3000 python bench.py 2>&1

echo "=== [2] stress FA phase breakdown (fabreakdown) ==="
timeout 7200 python experiments/fabreakdown.py 2>&1

echo "=== [3] stress knob sweep (r4h: narrow sweep chunks, DIRTY_CAP) ==="
sh experiments/remeasure_r4h.sh 2>&1

echo "=== [4] scale curve: 192^3 post-meta (item 4) ==="
SMOOTHMESH_BENCH_N=192 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 9000 python bench.py 2>&1

echo "=== [5] poolstats 128/160 (picks 160^3 pool-window probe) ==="
N=128 timeout 1200 python experiments/poolstats.py 2>&1
N=160 timeout 1200 python experiments/poolstats.py 2>&1

echo "=== [6] halo boundary+layer timings: D=1 on-device ==="
SMOOTHMESH_BENCH_BOUNDARY=1 SMOOTHMESH_BENCH_SHARDED=1 \
    SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 4200 python bench.py 2>&1
