"""Marginal cost of the iteration GLUE (everything between engine
stages): pts4 build, planar<->dense conversions, revert, residual.
Engine stages and FA are replaced by precomputed constants.
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

from smoothmesh_tpu.driver import Smoother  # noqa: E402
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb  # noqa: E402
from smoothmesh_tpu.ops import calculate_residual  # noqa: E402
from smoothmesh_tpu.ops.tiled import from_planar  # noqa: E402
from smoothmesh_tpu.params import SmoothingParams  # noqa: E402

N = int(os.environ.get("N", "64"))

base = hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5))
min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                  for a in range(3))
mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
params = SmoothingParams(centroidal_iters=1, rel_tol=0.0)
sm = Smoother(mesh, params, dtype=np.float32, use_tile_engine=True)
p = sm.params
eng = sm.engine
arr = eng.arrays
max_step = p.max_step_length * sm._scale

pts = sm.points
pts4c = eng.pts4(pts)
geom6c, vm3c = eng.face_geometry(arr, pts4c[:3])
cc4c = eng.cell_centres_vols(arr, geom6c)
prop4c = eng.predictor(arr, pts4c, cc4c, max_step, p.rel_step_frac,
                       False)
td = sm.td

for K in (1, 8):
    def run(points, cc4, prop4, vm3, td, K=K):
        def body(i, s):
            pts, _ = s
            pts4 = eng.pts4(pts)                  # transpose+concat
            dep = 1e-20 * pts4[0, 0]
            cell_ctrs = from_planar(cc4[:3] + dep, eng.topo.n_cells)
            prop = from_planar(prop4[:3] + dep, pts.shape[0])
            fc_base = from_planar(vm3 + dep, eng.topo.n_faces)
            frozen_pl = jnp.zeros((1, pts4.shape[1]), jnp.float32) + dep
            frozen = from_planar(frozen_pl, pts.shape[0])[:, 0] > 0.5
            frozen = frozen | (fc_base[0, 0] < -1e30)
            revert = frozen | ~td["is_internal_point"]
            new_points = jnp.where(revert[:, None], pts, prop)
            res = calculate_residual(pts, new_points, max_step)
            n_frozen = jnp.sum(revert & td["point_valid"])
            return new_points, res + 0.0 * n_frozen
        return jax.lax.fori_loop(0, K, body, (points, jnp.float32(0)))

    jfn = jax.jit(run)
    args = (pts, cc4c, prop4c, vm3c, td)
    out = jfn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(6):
        t0 = time.time()
        out = jfn(*args)
        float(out[1])
        best = min(best, time.time() - t0)
    print(f"K={K}: {best * 1e3:8.1f} ms", flush=True)
    if K == 1:
        t1 = best
    else:
        print(f"glue marginal: {(best - t1) / 7 * 1e3:.2f} ms")
