"""Marginal cost of the CHAINED engine stages (F->C->P->S->E->R) with
real dataflow, no FA/glue — isolates cross-stage costs vs the sum of
isolated stage marginals (~48 ms)."""

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
max_step = p.max_step_length * sm._scale
min_edge = p.min_edge_length * sm._scale
pts4_0 = eng.pts4(sm.points)
frozen0 = jnp.zeros((1, pts4_0.shape[1]), jnp.float32)

for K in (1, 8):
    def run(pts4, arr, K=K):
        def body(i, pts4):
            geom6, vm3 = eng.face_geometry(arr, pts4[:3])
            cc4 = eng.cell_centres_vols(arr, geom6)
            prop4 = eng.predictor(arr, pts4, cc4, max_step,
                                  p.rel_step_frac, False)
            fr = eng.freeze_constraints(arr, pts4, prop4, frozen0,
                                        min_edge, False, p.min_angle_rad,
                                        True)
            cm0, cm1 = eng.face_angles_per_point(arr, pts4, vm3, cc4)
            # chain: blend proposal back in (keeps values realistic)
            row3 = pts4[3:4] + 0.0 * (fr[0, 0] + cm0[0] + cm1[0])
            return jnp.concatenate(
                [0.5 * pts4[:3] + 0.5 * prop4[:3], row3], axis=0)
        return jax.lax.fori_loop(0, K, body, pts4)

    jfn = jax.jit(run)
    out = jfn(pts4_0, eng.arrays)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(6):
        t0 = time.time()
        out = jfn(pts4_0, eng.arrays)
        np.asarray(out[0, 0])
        best = min(best, time.time() - t0)
    print(f"K={K}: {best * 1e3:8.1f} ms", flush=True)
    if K == 1:
        t1 = best
    else:
        print(f"chained stages marginal: {(best - t1) / 7 * 1e3:.1f} ms "
              f"(isolated sum was ~48 ms)")
