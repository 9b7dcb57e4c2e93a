"""Stage attribution by full-step differencing (the only methodology
that agrees with bench.py under the axon tunnel).

Builds the engine-path iteration (as in driver.iteration_body, default
params) and times variants where ONE stage's output is replaced by a
precomputed constant (+1e-20 * input scalar to keep the dependency
chain).  Downstream numerics stay realistic, so data-dependent loop
trip counts (face-angle fixed point) are unchanged.  stage cost =
t(full) - t(variant).
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

from smoothmesh_tpu.driver import Smoother, default_face_angle_chunk  # noqa: E402
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb  # noqa: E402
from smoothmesh_tpu.ops import (  # noqa: E402
    calculate_residual,
    restrict_face_angle_deterioration,
)
from smoothmesh_tpu.ops.tiled import from_planar, to_planar  # noqa: E402
from smoothmesh_tpu.params import SmoothingParams  # noqa: E402

N = int(os.environ.get("N", "64"))
R = int(os.environ.get("R", "10"))

base = hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5))
min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                  for a in range(3))
mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
params = SmoothingParams(centroidal_iters=1, rel_tol=0.0)
sm = Smoother(mesh, params, dtype=np.float32, use_tile_engine=True)
assert sm.engine is not None
eng = sm.engine
topo = sm.topo
td = sm.td
p = sm.params
s = sm._scale
chunk = sm.face_angle_chunk
max_step = p.max_step_length * s
min_edge = p.min_edge_length * s

# Precomputed "dummy" constants from the initial state
pts0 = sm.points
arr = eng.arrays
_pts4 = eng.pts4(pts0)
_geom6, _vm3 = eng.face_geometry(arr, _pts4[:3])
_cc4 = eng.cell_centres_vols(arr, _geom6)
_prop4 = eng.predictor(arr, _pts4, _cc4, max_step, p.rel_step_frac, False)
_fr0 = jnp.zeros((1, _pts4.shape[1]), jnp.float32)
_frS = eng.freeze_constraints(arr, _pts4, _prop4, _fr0, min_edge,
                              p.total_min_freeze, p.min_angle_rad, True)
_cmm = eng.face_angles_per_point(arr, _pts4, _vm3, _cc4)
CONSTS = dict(geom6=_geom6, vm3=_vm3, cc4=_cc4, prop4=_prop4, frS=_frS,
              cmm0=_cmm[0], cmm1=_cmm[1])


def make_step(skip):
    def step(points, arr, C):
        def dummy(x, dep):
            return x + 1e-20 * dep.reshape(-1)[0]

        pts4 = eng.pts4(points)
        if skip == "F":
            geom6, vm3 = dummy(C["geom6"], pts4), dummy(C["vm3"], pts4)
        else:
            geom6, vm3 = eng.face_geometry(arr, pts4[:3])
        if skip == "C":
            cc4 = dummy(C["cc4"], geom6)
        else:
            cc4 = eng.cell_centres_vols(arr, geom6)
        cell_ctrs = from_planar(cc4[:3], topo.n_cells)
        if skip == "P":
            prop4 = dummy(C["prop4"], cc4)
        else:
            prop4 = eng.predictor(arr, pts4, cc4, max_step,
                                  p.rel_step_frac, False)
        prop = from_planar(prop4[:3], points.shape[0])
        frozen_pl = jnp.zeros((1, pts4.shape[1]), jnp.float32)
        prop4b = jnp.concatenate(
            [to_planar(prop), jnp.zeros((1, pts4.shape[1]), jnp.float32)],
            axis=0)
        if skip == "S":
            frozen_pl = dummy(C["frS"], prop4b) * 0.0
        else:
            frozen_pl = eng.freeze_constraints(
                arr, pts4, prop4b, frozen_pl, min_edge,
                p.total_min_freeze, p.min_angle_rad, True)
        frozen = from_planar(frozen_pl, points.shape[0])[:, 0] > 0.5
        if skip == "ER":
            cur_minmax = (dummy(C["cmm0"], prop4b),
                          dummy(C["cmm1"], prop4b))
        else:
            cur_minmax = eng.face_angles_per_point(arr, pts4, vm3, cc4)
        if skip != "FA":
            fc_base = from_planar(vm3, topo.n_faces)
            frozen = restrict_face_angle_deterioration(
                points, cell_ctrs, prop, td, p.min_angle_rad,
                p.max_angle_rad, frozen, chunk=chunk, fc_base=fc_base,
                cur_minmax=cur_minmax, u_space=True)
        revert = frozen | ~td["is_internal_point"]
        new_points = jnp.where(revert[:, None], points, prop)
        res = calculate_residual(points, new_points, max_step)
        return new_points, res

    return jax.jit(step)


results = {}
for skip in ["none", "F", "C", "P", "S", "ER", "FA"]:
    fn = make_step(skip)
    pts = pts0
    pts, res = fn(pts, arr, CONSTS)
    float(res)  # compile + run
    t0 = time.time()
    for _ in range(R):
        pts, res = fn(pts, arr, CONSTS)
        float(res)
    dt = (time.time() - t0) / R * 1e3
    results[skip] = dt
    print(f"skip={skip:5s} {dt:8.1f} ms/iter", flush=True)

full = results["none"]
print("\n-- attribution (full - variant) --")
for k in ["F", "C", "P", "S", "ER", "FA"]:
    print(f"{k:5s} {full - results[k]:8.1f} ms")
