#!/bin/sh
# Round-4i TPU queue (QUIET HOST; one TPU process at a time).
# Run AFTER: (a) r4g finishes, (b) the FA_PHASE_CAP patch lands +
# quick CPU parity check, (c) poolstats 128/160 has picked the
# ghost-dominated pools for the 160^3 window probe.
#
# Order: highest-value first.
#   1. [IF r4g oomprobe says 216^3 fits] 216^3 single-chip bench —
#      the BASELINE-scale headline datapoint.  ~2h (setup 4 min +
#      remote compile ~1h + run).
#   2. fabreakdown: stress FA per-phase cost + freeze counts (the
#      data that picks the next <200 ms lever).  14 smallish compiles.
#   3. r4h stress knob sweep (narrow sweep chunks + DIRTY_CAP).
#   4. 160^3 pool-window probe (EDIT pools after poolstats).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== [1] 216^3 single-chip bench (skip if oomprobe said OOM) ==="
# SMOOTHMESH_BENCH_N=216 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
#     timeout 9000 python bench.py

echo "=== [2] stress FA phase breakdown ==="
timeout 7200 python experiments/fabreakdown.py

echo "=== [3] stress knob sweep (r4h) ==="
sh experiments/remeasure_r4h.sh

echo "=== [4] 160^3 pool-window probe (EDIT pool list first) ==="
# SMOOTHMESH_POOL_WINDOWS=e_vm=8,r=8 SMOOTHMESH_BENCH_N=160 \
#     SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 4200 python bench.py
