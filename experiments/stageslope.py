"""Marginal per-call stage cost via repetition slope.

For each engine stage: one jit program runs the stage K times in a
fori_loop with a real data dependency between repetitions (carry mixes
the stage output back into its input).  t(K=8) - t(K=1) over 7 gives
the marginal cost of one stage invocation with dispatch overhead and
host noise cancelled.
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
REPS = int(os.environ.get("REPS", "6"))

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


def timeit(jfn, x, tag):
    out = jfn(x)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(REPS):
        t0 = time.time()
        out = jfn(x)
        np.asarray(out).reshape(-1)[0]
        best = min(best, time.time() - t0)
    return best * 1e3


def slope(tag, step_fn, x0):
    ts = {}
    for K in (1, 8):
        def run(x, K=K):
            return jax.lax.fori_loop(
                0, K, lambda i, s: step_fn(s, i), x)

        ts[K] = timeit(jax.jit(run), x0, f"{tag} K={K}")
    marg = (ts[8] - ts[1]) / 7.0
    print(f"{tag:22s} K1={ts[1]:7.1f}  K8={ts[8]:7.1f}  "
          f"marginal={marg:7.2f} ms/call", flush=True)
    return marg


def mix(x, y):
    """Same-shape mixing keeps values bounded + dependent."""
    return 0.999 * x + 1e-3 * y


def mix_scalar(x, y):
    return x + 1e-20 * y.reshape(-1)[0]


if os.environ.get("SKIP_F") != "1":
    slope("F: face geometry", lambda p4, i: mix_scalar(
        p4, eng.face_geometry(arr, p4[:3])[0]), pts4)
slope("C: cell centres", lambda g6, i: mix_scalar(
    g6, eng.cell_centres_vols(arr, g6)), geom6)
slope("P: predictor", lambda p4, i: mix(
    p4, eng.predictor(arr, p4, cc4, MAX_STEP, REL, False)), pts4)
slope("S: freeze", lambda p4, i: mix_scalar(
    p4, eng.freeze_constraints(arr, p4, prop4, frozen0, MIN_EDGE,
                               False, MIN_ANG, True)), pts4)
slope("E+R: face angles", lambda p4, i: mix_scalar(
    p4, eng.face_angles_per_point(arr, p4, vm3, cc4)[0]), pts4)
