"""Marginal cost of the lane-dim ghost gathers (ghosts_planar)."""

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
from smoothmesh_tpu.ops.tiled import ghosts_planar  # noqa: E402
from smoothmesh_tpu.params import SmoothingParams  # noqa: E402

N = int(os.environ.get("N", "64"))

base = hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5))
min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                  for a in range(3))
mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
params = SmoothingParams(centroidal_iters=1, rel_tol=0.0)
sm = Smoother(mesh, params, dtype=np.float32, use_tile_engine=True)
eng = sm.engine
arr = eng.arrays
pts4 = eng.pts4(sm.points)
geom6, vm3 = eng.face_geometry(arr, pts4[:3])

for tag, src, gids in [
    ("pp ghosts (pts4)", pts4, arr["p_pp_gids"]),
    ("f ghosts (pts)", pts4[:3], arr["f_gids"]),
    ("c ghosts (geom6)", geom6, arr["c_gids"]),
]:
    print(f"{tag}: src {src.shape}, gids {gids.shape}", flush=True)
    for K in (1, 8):
        def run(x, g, K=K):
            def body(i, s):
                gh = ghosts_planar(s, g)
                return s + 1e-20 * gh[0, 0]
            return jax.lax.fori_loop(0, K, body, x)

        jfn = jax.jit(run)
        out = jfn(src, gids)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(6):
            t0 = time.time()
            out = jfn(src, gids)
            np.asarray(out[0, 0])
            best = min(best, time.time() - t0)
        if K == 1:
            t1 = best
        else:
            print(f"  marginal {((best - t1) / 7) * 1e3:7.2f} ms/gather",
                  flush=True)
