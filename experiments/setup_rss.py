#!/usr/bin/env python
"""Measure host-setup peak RSS + wall time per phase at a given N_side.

Companion to experiments/scale10m.py (which recorded the pre-int32
216^3 numbers: mesh gen 115 s / 5.3 GB, compile_topology 1119 s /
37.5 GB peak).  Run after the int32 intermediate conversion to record
the reduction.  Phases are measured cumulatively via ru_maxrss (peak
is monotone — run one size per process for clean numbers).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/setup_rss.py [n_side]
"""
import resource
import sys
import time

import numpy as np


def peak_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
    from smoothmesh_tpu.mesh.topology import compile_topology

    t0 = time.time()
    base = hex_block(n=(n,) * 3, grading=(2.0, 1.0, 0.5))
    min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                      for a in range(3))
    mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
    t1 = time.time()
    print(f"mesh gen      {t1 - t0:8.1f} s   peak RSS {peak_gb():6.2f} GB",
          flush=True)
    topo = compile_topology(mesh)
    t2 = time.time()
    print(f"topo compile  {t2 - t1:8.1f} s   peak RSS {peak_gb():6.2f} GB",
          flush=True)
    print(f"n_cells={mesh.n_cells:,} n_points={topo.n_points:,} "
          f"n_faces={topo.n_faces:,} n_edges={topo.n_edges:,}")


if __name__ == "__main__":
    main()
