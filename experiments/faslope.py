"""Marginal cost of restrict_face_angle_deterioration on the bench
state (K=1 vs K=8 in-jit repetitions)."""

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
from smoothmesh_tpu.ops.constraints import (  # noqa: E402
    restrict_face_angle_deterioration,
)
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

pts = sm.points
pts4 = eng.pts4(pts)
geom6, vm3 = eng.face_geometry(arr, pts4[:3])
cc4 = eng.cell_centres_vols(arr, geom6)
prop4 = eng.predictor(arr, pts4, cc4, p.max_step_length * sm._scale,
                      p.rel_step_frac, False)
prop = from_planar(prop4[:3], pts.shape[0])
cell_ctrs = from_planar(cc4[:3], sm.topo.n_cells)
fc_base = from_planar(vm3, sm.topo.n_faces)
cur_minmax = eng.face_angles_per_point(arr, pts4, vm3, cc4)
frozen0 = jnp.zeros(pts.shape[0], dtype=bool)

for K in (1, 8):
    def run(points, prop, cell_ctrs, fc_base, cm0, cm1, frozen, td, K=K):
        def body(i, fr):
            # runtime-false data dependency: every repetition starts
            # from the SAME empty freeze mask (full first-call work)
            fr_in = frozen & (fr | (cm1 > -1.0))
            fr_in = fr_in | (fr & (cm1 < -1.0))
            return restrict_face_angle_deterioration(
                points, cell_ctrs, prop, td, p.min_angle_rad,
                p.max_angle_rad, fr_in, chunk=sm.face_angle_chunk,
                fc_base=fc_base, cur_minmax=(cm0, cm1),
                u_space=True)

        return jax.lax.fori_loop(0, K, body, frozen)

    jfn = jax.jit(run)
    args = (pts, prop, cell_ctrs, fc_base, cur_minmax[0], cur_minmax[1],
            frozen0, sm.td)
    out = jfn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(6):
        t0 = time.time()
        out = jfn(*args)
        int(np.asarray(out).sum())
        best = min(best, time.time() - t0)
    print(f"K={K}: {best * 1e3:8.1f} ms", flush=True)
    if K == 1:
        t1 = best
    else:
        print(f"FA marginal: {(best - t1) / 7 * 1e3:.1f} ms")
