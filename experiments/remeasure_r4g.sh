#!/bin/sh
# Round-4g consolidated TPU queue (QUIET HOST — nothing else may use
# the CPU while this runs; one TPU process at a time).
# Measures the packed-FA-tables code (device.FA_PACKED_KEYS):
#   items 1-6: stress/in-band matrix for FA_COMBINED + FA_FIRST_CHUNK
#     vs the new packed-tables baselines (old baselines: stress 352.03,
#     in-band 46.28 ms/iter pre-packing)
#   item 7: scale curve 128/160/192 (VERDICT item 4) post-packing
#   item 8: 216^3 oomprobe (capacity + live arrays + one dispatch) —
#     packed tables cut ~1.2 GB args; buffer assignment said 11.4/16 GB
#     BEFORE the cut, so this may now run (VERDICT item 1a)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== 64^3 stress, packed tables (new baseline) ==="
SMOOTHMESH_BENCH_STRESS=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py

echo "=== 64^3 stress, FA_COMBINED=1 ==="
SMOOTHMESH_FA_COMBINED=1 SMOOTHMESH_BENCH_STRESS=1 \
    SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 3000 python bench.py

echo "=== 64^3 stress, FA_FIRST_CHUNK=65536 ==="
SMOOTHMESH_FA_FIRST_CHUNK=65536 SMOOTHMESH_BENCH_STRESS=1 \
    SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 3000 python bench.py

echo "=== 64^3 stress, FA_COMBINED=1 + FA_FIRST_CHUNK=65536 ==="
SMOOTHMESH_FA_COMBINED=1 SMOOTHMESH_FA_FIRST_CHUNK=65536 \
    SMOOTHMESH_BENCH_STRESS=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py

echo "=== 64^3 default, packed tables (in-band baseline) ==="
SMOOTHMESH_BENCH_CONVERGE_CAP=0 timeout 3000 python bench.py

echo "=== 64^3 default, FA_COMBINED=1 (in-band guard) ==="
SMOOTHMESH_FA_COMBINED=1 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py

echo "=== scale curve post-packing: 128/160/192 (item 4) ==="
SMOOTHMESH_BENCH_N=128 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 3000 python bench.py
SMOOTHMESH_BENCH_N=160 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 4200 python bench.py
SMOOTHMESH_BENCH_N=192 SMOOTHMESH_BENCH_CONVERGE_CAP=0 \
    timeout 4800 python bench.py

echo "=== 216^3 oomprobe: capacity + live arrays + one dispatch ==="
SMOOTHMESH_OOMPROBE_N=216 timeout 6000 python experiments/oomprobe.py
