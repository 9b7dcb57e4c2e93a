"""Bare fori marginal of iteration_body_planar (no outputs/select),
to compare against the dense iteration_body's 82 ms."""

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

from smoothmesh_tpu.driver import Smoother, iteration_body_planar  # noqa: E402
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb  # noqa: E402
from smoothmesh_tpu.params import SmoothingParams  # noqa: E402

N = int(os.environ.get("N", "64"))

base = hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5))
min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                  for a in range(3))
mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
params = SmoothingParams(centroidal_iters=1, rel_tol=0.0)
sm = Smoother(mesh, params, dtype=np.float32)
p = sm.params
pts4_0 = sm.engine.pts4(sm.points)

for K in (1, 8):
    def run(pts4, td, arrays, K=K):
        def body(i, s):
            pl, _ = s
            new_pl, res, nf = iteration_body_planar(
                pl, td, p, sm._scale, sm.face_angle_chunk, sm.engine,
                arrays)
            return new_pl, res
        return jax.lax.fori_loop(0, K, body, (pts4, jnp.float32(0)))

    jfn = jax.jit(run)
    out = jfn(pts4_0, sm.td, sm.engine.arrays)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(6):
        t0 = time.time()
        out = jfn(pts4_0, sm.td, sm.engine.arrays)
        float(out[1])
        best = min(best, time.time() - t0)
    print(f"K={K}: {best * 1e3:8.1f} ms", flush=True)
    if K == 1:
        t1 = best
    else:
        print(f"planar bare marginal: {(best - t1) / 7 * 1e3:.1f} ms "
              f"(dense was 82)")
