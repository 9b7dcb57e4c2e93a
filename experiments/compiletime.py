"""Warmup (trace+compile+first dispatch) breakdown at 64^3 — VERDICT
r3 weak #7: jit_warmup_s regressed 34.75 s (round 2) -> 156.8 s
(round 3).  Suspects: the B=16 fori batch (round 2 shipped B=8) and
the K-stacked bf16 select terms (bigger fused stage graphs).

Usage (one TPU process at a time!):
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/compiletime.py [B ...]

Cache busting: the axon remote compiler caches by HLO hash and
jax_compilation_cache_dir persists locally, so each timing run embeds a
unique constant (SMOOTHMESH_CT_SALT) into the program via rel_step_frac
jitter — every invocation is a cold compile unless SALT is fixed.
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("SMOOTHMESH_CT_SALT", str(time.time()))
SALT = float(os.environ["SMOOTHMESH_CT_SALT"])

from smoothmesh_tpu.driver import Smoother  # noqa: E402
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb  # noqa: E402
from smoothmesh_tpu.params import SmoothingParams  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    n = int(os.environ.get("SMOOTHMESH_BENCH_N", "64"))
    bs = [int(b) for b in sys.argv[1:]] or [1, 8, 16]
    mesh = perturb(hex_block(n=(n, n, n), grading=(2.0, 1.0, 0.5)),
                   amplitude=0.25 / n, seed=3)
    # unique constant -> unique HLO -> cold compile each run
    frac = 0.5 + 1e-9 * (SALT % 1000.0)
    for B in bs:
        os.environ["SMOOTHMESH_ITER_BATCH"] = str(B)
        sm = Smoother(mesh, SmoothingParams(centroidal_iters=B,
                                            rel_tol=0.0,
                                            rel_step_frac=frac),
                      dtype=np.float32)
        t0 = time.time()
        sm._batch = jax.jit(sm._build_batch())
        lowered = sm._batch.lower(
            sm.points, sm.smoothing_surface, sm.normals, sm.td,
            sm.layer or {}, sm._bnd_arrays(),
            sm.engine.arrays if sm.engine is not None else {},
            jnp.asarray(B, jnp.int32))
        t_trace = time.time() - t0
        t1 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t1
        t2 = time.time()
        out = compiled(
            sm.points, sm.smoothing_surface, sm.normals, sm.td,
            sm.layer or {}, sm._bnd_arrays(),
            sm.engine.arrays if sm.engine is not None else {},
            jnp.asarray(B, jnp.int32))
        np.asarray(out[2][0])     # fetch residuals: completes dispatch
        t_first = time.time() - t2
        print(f"B={B}: trace {t_trace:.1f}s compile {t_compile:.1f}s "
              f"first-dispatch {t_first:.1f}s "
              f"total {t_trace + t_compile + t_first:.1f}s", flush=True)


if __name__ == "__main__":
    main()
