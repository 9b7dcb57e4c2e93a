"""Offline compile-cost proxy for VERDICT r3 weak #7 (warmup 34.75 s
round 2 -> 156.8 s round 3 -> 208.9 s round 4 at 64^3).

Lowers the batched step on the CPU backend (no TPU traffic — safe to
run while a device job is in its remote-compile phase) and reports
StableHLO module size + trace/lower wall time for each iter-batch B.
HLO text size scales with what the remote compiler must chew through;
if size is ~flat in B (fori_loop body is shared) the regression is NOT
the batch count but per-stage graph growth (K-stacked selects, meta
unpacking), which B cannot bisect.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/hlosize.py [B ...]
"""
import os
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from smoothmesh_tpu.driver import Smoother
    from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
    from smoothmesh_tpu.params import SmoothingParams

    bs = [int(b) for b in sys.argv[1:]] or [1, 8, 16]
    base = hex_block(n=(64, 64, 64), grading=(2.0, 1.0, 0.5))
    min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                      for a in range(3))
    mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
    # SMOOTHMESH_HLOSIZE_MODE: default | nofa | noconstraints — lower
    # param variants to attribute module size to the constraint stages
    mode = os.environ.get("SMOOTHMESH_HLOSIZE_MODE", "default")
    extra = {}
    if mode in ("nofa", "noconstraints"):
        extra["face_angle_constraint"] = False
    if mode == "noconstraints":
        extra["edge_angle_constraint"] = False
    for B in bs:
        os.environ["SMOOTHMESH_ITER_BATCH"] = str(B)
        t0 = time.time()
        sm = Smoother(mesh, SmoothingParams(centroidal_iters=16,
                                            rel_tol=0.0, **extra),
                      dtype=np.float32, use_tile_engine=True)
        setup_t = time.time() - t0
        import jax.numpy as jnp

        fn = sm._build_batch()
        args = (sm.points, sm.smoothing_surface, sm.normals, sm.td,
                sm.layer or {}, sm._bnd_arrays(),
                sm.engine.arrays if sm.engine is not None else {},
                jnp.asarray(B, jnp.int32))
        t0 = time.time()
        lowered = jax.jit(fn).lower(*args)
        lower_t = time.time() - t0
        txt = lowered.as_text()
        print(f"B={B:3d} setup={setup_t:6.1f}s lower={lower_t:6.1f}s "
              f"stablehlo_bytes={len(txt):,} "
              f"ops={txt.count(chr(10)):,}", flush=True)


if __name__ == "__main__":
    main()
