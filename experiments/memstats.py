#!/usr/bin/env python
"""Exact device-HBM accounting of the batched step via XLA's buffer
assignment — compile-only, no dispatch (VERDICT r4 item 1a: 216^3
RESOURCE_EXHAUSTED post-meta-packing, /tmp/r4d_bench216.log).

``jit(batch).lower(args).compile().memory_analysis()`` returns the
compiled executable's argument / output / TEMP buffer totals from the
real TPU buffer assignment — the ground truth the OOM is about, without
risking a worker crash on dispatch.  Mode-differencing (default vs
nofa vs noconstraints, like experiments/hlosize.py) attributes the temp
peak to the constraint stages.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    SMOOTHMESH_MEMSTATS_N=216 [SMOOTHMESH_HLOSIZE_MODE=nofa] \
    python experiments/memstats.py

ONE TPU process at a time (compile uses the remote-compiler tunnel).
"""
import os
import time

import numpy as np


def main():
    import jax

    n_side = int(os.environ.get("SMOOTHMESH_MEMSTATS_N", "64"))
    mode = os.environ.get("SMOOTHMESH_HLOSIZE_MODE", "default")

    from smoothmesh_tpu.driver import Smoother
    from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
    from smoothmesh_tpu.params import SmoothingParams

    t0 = time.time()
    base = hex_block(n=(n_side,) * 3, grading=(2.0, 1.0, 0.5))
    min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                      for a in range(3))
    mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
    extra = {}
    if mode in ("nofa", "noconstraints"):
        extra["face_angle_constraint"] = False
    if mode == "noconstraints":
        extra["edge_angle_constraint"] = False
    sm = Smoother(mesh, SmoothingParams(centroidal_iters=16, rel_tol=0.0,
                                        **extra),
                  dtype=np.float32, use_tile_engine=True)
    print(f"setup {time.time() - t0:.1f}s  N={n_side}^3 "
          f"pts={sm.topo.n_points:,}", flush=True)

    import jax.numpy as jnp

    fn = sm._build_batch()
    args = (sm.points, sm.smoothing_surface, sm.normals, sm.td,
            sm.layer or {}, sm._bnd_arrays(),
            sm.engine.arrays if sm.engine is not None else {},
            jnp.asarray(sm.iter_batch, jnp.int32))
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    print(f"lower {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compile {time.time() - t0:.1f}s", flush=True)
    ma = compiled.memory_analysis()
    gb = 1 / 2**30
    print(f"mode={mode} N={n_side}^3")
    print(f"  argument {ma.argument_size_in_bytes * gb:8.2f} GB")
    print(f"  output   {ma.output_size_in_bytes * gb:8.2f} GB")
    print(f"  temp     {ma.temp_size_in_bytes * gb:8.2f} GB")
    print(f"  alias    {ma.alias_size_in_bytes * gb:8.2f} GB")
    tot = (ma.argument_size_in_bytes + ma.output_size_in_bytes
           + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    print(f"  arg+out+temp-alias {tot * gb:8.2f} GB  (chip: 16 GB)",
          flush=True)


if __name__ == "__main__":
    main()
