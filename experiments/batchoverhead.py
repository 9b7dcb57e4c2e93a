"""Bisect the ~20 ms/iter batching overhead: bare fori (82 ms) vs
+output buffers vs +convergence select, planar body."""

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
B = 8

base = hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5))
min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                  for a in range(3))
mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
params = SmoothingParams(centroidal_iters=1, rel_tol=0.0)
sm = Smoother(mesh, params, dtype=np.float32)
p = sm.params
pts4_0 = sm.engine.pts4(sm.points)


def core(pl, td, arrays):
    return iteration_body_planar(pl, td, p, sm._scale,
                                 sm.face_angle_chunk, sm.engine, arrays)


def v0(pts4, td, arrays, n_valid):
    def body(i, s):
        pl, _ = s
        new_pl, res, nf = core(pl, td, arrays)
        return new_pl, res
    return jax.lax.fori_loop(0, B, body, (pts4, jnp.float32(0)))[1]


def v1(pts4, td, arrays, n_valid):
    def body(i, s):
        pl, o_res, o_nf = s
        new_pl, res, nf = core(pl, td, arrays)
        return (new_pl, o_res.at[i].set(res),
                o_nf.at[i].set(nf.astype(jnp.int32)))
    out = jax.lax.fori_loop(
        0, B, body, (pts4, jnp.zeros(B, jnp.float32),
                     jnp.zeros(B, jnp.int32)))
    return out[1][B - 1]


def v2(pts4, td, arrays, n_valid):
    def body(i, s):
        pl, done, o_res, o_nf = s
        new_pl, res, nf = core(pl, td, arrays)
        skip = done | (i >= n_valid)
        return (jnp.where(skip, pl, new_pl),
                jnp.where(skip, done, res < p.rel_tol),
                o_res.at[i].set(jnp.where(skip, jnp.nan, res)),
                o_nf.at[i].set(jnp.where(skip, 0, nf.astype(jnp.int32))))
    out = jax.lax.fori_loop(
        0, B, body, (pts4, jnp.asarray(False), jnp.zeros(B, jnp.float32),
                     jnp.zeros(B, jnp.int32)))
    return out[2][B - 1]


for tag, fn in [("v0 bare", v0), ("v1 +outputs", v1),
                ("v2 +select", v2)]:
    jfn = jax.jit(fn)
    args = (pts4_0, sm.td, sm.engine.arrays, jnp.asarray(B, jnp.int32))
    out = jfn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(6):
        t0 = time.time()
        out = jfn(*args)
        float(np.asarray(out).reshape(-1)[0])
        best = min(best, time.time() - t0)
    print(f"{tag:14s} {best * 1e3 / B:7.1f} ms/iter "
          f"(total {best * 1e3:.0f} ms)", flush=True)
