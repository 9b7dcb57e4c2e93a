"""10M-cell host-pipeline scale check (VERDICT r1 item 5).

Generates a 10M-cell graded hex mesh, times mesh generation,
topology compilation (native path), boundary classification inputs and
shard building, and reports peak RSS.  Compile-only: no device work.

Usage: python experiments/scale10m.py [N]   (default 216 -> 10.08M)
"""

import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 216


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def step(tag, fn):
    t0 = time.time()
    out = fn()
    print(f"{tag:28s} {time.time() - t0:8.1f} s   peak RSS {rss_gb():.1f} GB",
          flush=True)
    return out


from smoothmesh_tpu.mesh.blockmesh import hex_block  # noqa: E402
from smoothmesh_tpu.mesh.topology import compile_topology  # noqa: E402
from smoothmesh_tpu.parallel.partition import build_shards  # noqa: E402

mesh = step(f"hex_block {N}^3 ({N**3/1e6:.2f}M cells)",
            lambda: hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5)))
print(f"  points={mesh.n_points:,} faces={mesh.n_faces:,}")
topo = step("compile_topology (native)", lambda: compile_topology(mesh))
shards = step("build_shards x8", lambda: build_shards(mesh, 8))
print("OK")
