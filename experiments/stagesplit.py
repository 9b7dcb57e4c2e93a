"""Stage cost split on the bench mesh (real TPU).

Times the full jitted step under constraint toggles to attribute
per-iteration cost to: geometry+predictors (tile engine), edge
freezes (tile engine), face-angle current pass (tile engine) +
proposal evaluation (XLA).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

cache = os.path.expanduser("~/.jax_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from smoothmesh_tpu.driver import Smoother  # noqa: E402
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb  # noqa: E402
from smoothmesh_tpu.params import SmoothingParams  # noqa: E402

N = int(os.environ.get("N", "64"))
ITERS = int(os.environ.get("ITERS", "10"))


def timed(tag, **kw):
    base = hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5))
    min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                      for a in range(3))
    mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
    params = SmoothingParams(centroidal_iters=ITERS, rel_tol=0.0, **kw)
    sm = Smoother(mesh, params, dtype=np.float32)
    sm.step()  # compile
    t0 = time.time()
    for _ in range(ITERS):
        r = sm.step()
    jax.block_until_ready(sm.points)
    dt = (time.time() - t0) / ITERS * 1e3
    print(f"{tag:30s} {dt:8.1f} ms/iter  residual={r.residual:.4f} "
          f"frozen={r.n_frozen}", flush=True)
    return dt


full = timed("full (default)")
no_fa = timed("face-angle off", face_angle_constraint=False)
no_both = timed("both angles off", face_angle_constraint=False,
                edge_angle_constraint=False)
print(f"face-angle total: {full - no_fa:.1f} ms")
print(f"edge-angle:       {no_fa - no_both:.1f} ms")
print(f"geometry+predictors+edge-shortening+residual: {no_both:.1f} ms")
