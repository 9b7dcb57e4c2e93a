"""Marginal cost of the REAL full iteration via in-jit repetition.

Runs driver.iteration_body K times inside one jit (the actual
points -> points recurrence).  marginal = (t(K=8) - t(K=1)) / 7 is the
true per-iteration device cost; the difference against the python-loop
sm.step() rate is per-dispatch overhead (amortizable by batching
iterations per dispatch).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

cache = os.path.expanduser("~/.jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from smoothmesh_tpu.driver import Smoother, iteration_body  # noqa: E402
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb  # noqa: E402
from smoothmesh_tpu.params import SmoothingParams  # noqa: E402

N = int(os.environ.get("N", "64"))
REPS = int(os.environ.get("REPS", "6"))

base = hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5))
min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                  for a in range(3))
mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
params = SmoothingParams(centroidal_iters=1, rel_tol=0.0)
sm = Smoother(mesh, params, dtype=np.float32, use_tile_engine=True)
p = sm.params


def one_iter(points, td, arrays):
    new_points, _normals, res, n_frozen, _miss = iteration_body(
        points, sm.smoothing_surface, sm.normals, td, p, sm._scale,
        False, chunk=sm.face_angle_chunk, engine=sm.engine,
        engine_arrays=arrays)
    return new_points, res


start = sm.points
if os.environ.get("EVOLVED") == "1":
    # measure at a mid-run state (FA cost is data-dependent)
    sm.steps(10)
    start = sm.points
    print("evolved 10 iterations before timing", flush=True)

for K in (1, 8):
    # topology + engine arrays as jit ARGUMENTS, not closure literals
    # (literals overflow the remote compiler upload limit — CLAUDE.md)
    def run(points, td, arrays, K=K):
        def body(i, s):
            pts, _ = s
            return one_iter(pts, td, arrays)

        return jax.lax.fori_loop(0, K, body, (points, jnp.float32(0)))

    jfn = jax.jit(run)
    out = jfn(start, sm.td, sm.engine.arrays)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(REPS):
        t0 = time.time()
        out = jfn(start, sm.td, sm.engine.arrays)
        float(out[1])
        best = min(best, time.time() - t0)
    print(f"K={K}: {best * 1e3:8.1f} ms", flush=True)
    if K == 1:
        t1 = best
    else:
        print(f"marginal per-iteration: {(best - t1) / 7 * 1e3:.1f} ms")
        print(f"dispatch+fetch overhead: {t1 * 1e3 - (best - t1) / 7 * 1e3:.1f} ms")
