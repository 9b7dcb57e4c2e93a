"""Cost anatomy of the batched dispatch: full batches vs partial
batches (dead scan iterations), vs the plain fori marginal (~82 ms)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

cache = os.path.expanduser("~/.jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from smoothmesh_tpu.driver import Smoother  # noqa: E402
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb  # noqa: E402
from smoothmesh_tpu.params import SmoothingParams  # noqa: E402

N = int(os.environ.get("N", "64"))

base = hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5))
min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                  for a in range(3))
mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
params = SmoothingParams(centroidal_iters=10_000, rel_tol=0.0)
sm = Smoother(mesh, params, dtype=np.float32)
sm.steps(8)     # compile + warm

for n in (8, 8, 2, 2, 1, 8):
    t0 = time.time()
    rs = sm.steps(n)
    dt = (time.time() - t0) * 1e3
    print(f"steps({n}): {dt:7.1f} ms total, {dt / n:6.1f} ms/live-iter "
          f"({len(rs)} executed)", flush=True)
