"""Stress-mode face-angle fixed point: per-phase cost + freeze-count
breakdown on the bench stress state (64^3, minAngle 15, 0.6 distortion).

Uses SMOOTHMESH_FA_PHASE_CAP (ops/constraints.py) to truncate the fixed
point after each phase; differencing the K=1-vs-K=8 in-jit repetition
marginals (CLAUDE.md measurement rules) attributes the ~302 ms/iter of
stress-mode FA cost to: compaction prep, self eval+agg, first pair
eval, first pair agg, and the dirty sweeps.  Freeze counts per phase
come from the same runs (jnp.sum of the returned mask), answering the
structural question: how many points self-freeze on the first pass
(if most do, most pair-slot evaluations target already-frozen q's and
are dead work — the next lever).

Run (quiet host, no other TPU process):
    PYTHONPATH=/root/repo:/root/.axon_site python experiments/fabreakdown.py
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
from smoothmesh_tpu.ops import constraints as C  # noqa: E402
from smoothmesh_tpu.ops.tiled import from_planar  # noqa: E402
from smoothmesh_tpu.params import SmoothingParams  # noqa: E402

N = int(os.environ.get("N", "64"))

base = hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5))
min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                  for a in range(3))
mesh = perturb(base, amplitude=0.6 * min_spacing, seed=3)  # stress
params = SmoothingParams(centroidal_iters=1, rel_tol=0.0, min_angle=15.0)
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

# each phase costs 2 remote compiles; sweep2/3 omitted (counts at
# sweep1 vs full bound the sweep tail)
PHASES = ["none", "prep", "self", "pair0", "pair1", "sweep1", "full"]


def measure(phase):
    os.environ["SMOOTHMESH_FA_PHASE_CAP"] = phase
    # re-trace with the new phase constant: fresh closure each time
    times = {}
    n_frozen = None
    for K in (1, 8):
        def run(points, prop, cell_ctrs, fc_base, cm0, cm1, frozen, td,
                K=K):
            def body(i, fr):
                # runtime-false data dependency: every repetition
                # starts from the SAME empty freeze mask
                fr_in = frozen & (fr | (cm1 > -1.0))
                fr_in = fr_in | (fr & (cm1 < -1.0))
                return C.restrict_face_angle_deterioration(
                    points, cell_ctrs, prop, td, p.min_angle_rad,
                    p.max_angle_rad, fr_in, chunk=sm.face_angle_chunk,
                    fc_base=fc_base, cur_minmax=(cm0, cm1),
                    u_space=True)

            return jax.lax.fori_loop(0, K, body, frozen)

        jfn = jax.jit(run)
        args = (pts, prop, cell_ctrs, fc_base, cur_minmax[0],
                cur_minmax[1], frozen0, sm.td)
        out = jfn(*args)
        jax.block_until_ready(out)
        if K == 1:
            n_frozen = int(np.asarray(out).sum())
        best = np.inf
        for _ in range(6):
            t0 = time.time()
            out = jfn(*args)
            int(np.asarray(out).sum())
            best = min(best, time.time() - t0)
        times[K] = best
    marginal = (times[8] - times[1]) / 7 * 1e3
    return marginal, n_frozen


results = {}
for ph in PHASES:
    marg, nf = measure(ph)
    results[ph] = (marg, nf)
    print(f"{ph:8s} marginal={marg:8.2f} ms  frozen={nf:8d}", flush=True)

print("\n--- phase deltas (ms) ---")
prev = 0.0
for ph in PHASES:
    marg, nf = results[ph]
    print(f"{ph:8s} +{marg - prev:8.2f} ms  (cum {marg:8.2f}, "
          f"frozen {nf})", flush=True)
    prev = marg
