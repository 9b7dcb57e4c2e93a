"""Per-stage TPU timing of the tile engine at the bench mesh size.

Methodology (CLAUDE.md): python-level dispatch loop where each call's
input DEPENDS on the previous call's output and is numerically
different each iteration (axon memoizes identical dispatches), result
fetched at the end.  Per-dispatch RPC overhead (~4-8 ms) is measured
separately with a no-op and subtracted.
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

from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb  # noqa: E402
from smoothmesh_tpu.mesh.tiling import permute_mesh  # noqa: E402
from smoothmesh_tpu.mesh.topology import compile_topology  # noqa: E402
from smoothmesh_tpu.ops.tiledstep import TiledEngine  # noqa: E402

N = int(os.environ.get("N", "64"))
R = int(os.environ.get("R", "10"))

base = hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5))
min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                  for a in range(3))
mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
mesh, orders = permute_mesh(mesh)
topo = compile_topology(mesh)
eng = TiledEngine(topo, interpret=False)
arr = eng.arrays

pts = jnp.asarray(mesh.points, jnp.float32)
pts4 = eng.pts4(pts)
geom6, vm3 = eng.face_geometry(arr, pts4[:3])
cc4 = eng.cell_centres_vols(arr, geom6)
prop4 = eng.predictor(arr, pts4, cc4, 0.01, 0.5, False)
frozen0 = jnp.zeros((1, pts4.shape[1]), jnp.float32)

MAX_STEP, REL = 0.01, 0.5
MIN_EDGE, MIN_ANG = 0.005, 35.0 * np.pi / 180.0


def bench(tag, fn, state, sub=0.0):
    jfn = jax.jit(fn)
    x = jfn(state)
    jax.block_until_ready(x)      # compile
    t0 = time.time()
    for _ in range(R):
        x = jfn(x)
    np.asarray(x).reshape(-1)[0]  # fetch => completes the chain
    dt = (time.time() - t0) / R * 1e3 - sub
    print(f"{tag:24s} {dt:8.2f} ms", flush=True)
    return dt


def chain(x, y):
    """Data dependency that also changes the value every iteration."""
    return x + 1e-22 * y.reshape(-1)[0]


overhead = bench("dispatch overhead", lambda p4: p4 + 1e-22, pts4)
t_f = bench("F: face geometry", lambda p4: chain(
    p4, eng.face_geometry(arr, p4[:3])[0]), pts4, overhead)
t_c = bench("C: cell centres", lambda g6: chain(
    g6, eng.cell_centres_vols(arr, g6)[0]), geom6, overhead)
t_p = bench("P: predictor", lambda p4: chain(
    p4, eng.predictor(arr, p4, cc4, MAX_STEP, REL, False)), pts4, overhead)
t_s = bench("S: freeze", lambda p4: chain(
    p4, eng.freeze_constraints(arr, p4, prop4, frozen0, MIN_EDGE, False,
                               MIN_ANG, True)), pts4, overhead)
t_er = bench("E+R: face angles", lambda p4: chain(
    p4, eng.face_angles_per_point(arr, p4, vm3, cc4)[0]), pts4, overhead)

print(f"stages total: {t_f + t_c + t_p + t_s + t_er:.2f} ms "
      f"(full-step base ~120 ms; face-angle total ~68 ms)")
