#!/usr/bin/env python
"""216^3 dispatch-fix probe: pre-convert arguments to the compiled
batched step's parameter formats.

oomprobe.py (r5) findings this builds on:
  - usable HBM ~15.8 GB; the axon worker OVERSUBSCRIBES client buffers
    (16.6 GB of random data held fine — inactive buffers page to host),
    so only DISPATCH needs simultaneous residence.
  - live args at 216^3 = 5.69 GB logical; XLA buffer assignment wants
    argument 7.42 + temp 3.67 + output 0.3 = 11.4 GB (memstats r4).
  - first dispatch dies RESOURCE_EXHAUSTED: if the executable's
    parameter layouts differ from the staged arrays' default layouts,
    the runtime materializes converted COPIES at dispatch:
    5.69 live + 11.4 program = 17.1 GB > 15.8 -> OOM.

This probe compiles the step (persistent cache is warm from oomprobe),
prints which inputs need a format change, re-stages them with
jax.device_put(arg, format) BEFORE dispatch, frees the originals, and
attempts the batch.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    SMOOTHMESH_OOMPROBE_N=216 python experiments/oomprobe2.py
ONE TPU process at a time.
"""
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    n_side = int(os.environ.get("SMOOTHMESH_OOMPROBE_N", "216"))

    from smoothmesh_tpu.driver import Smoother
    from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
    from smoothmesh_tpu.params import SmoothingParams

    t0 = time.time()
    base = hex_block(n=(n_side,) * 3, grading=(2.0, 1.0, 0.5))
    min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                      for a in range(3))
    mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
    sm = Smoother(mesh, SmoothingParams(centroidal_iters=16, rel_tol=0.0),
                  dtype=np.float32)
    print(f"setup {time.time() - t0:.1f}s  N={n_side}^3 "
          f"pts={sm.topo.n_points:,}", flush=True)

    fn = sm._build_batch()
    args = (sm.points, sm.smoothing_surface, sm.normals, sm.td,
            sm.layer or {}, sm._bnd_arrays(),
            sm.engine.arrays if sm.engine is not None else {},
            jnp.asarray(sm.iter_batch, jnp.int32))
    jfn = jax.jit(fn)
    t0 = time.time()
    lowered = jfn.lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(f"lower {t_lower:.1f}s  compile {t_compile:.1f}s "
          f"(persistent cache shared with oomprobe/bench)", flush=True)
    try:
        ma = compiled.memory_analysis()
        print(f"memory_analysis: arg "
              f"{ma.argument_size_in_bytes/2**30:.2f} temp "
              f"{ma.temp_size_in_bytes/2**30:.2f} out "
              f"{ma.output_size_in_bytes/2**30:.2f} GB", flush=True)
    except Exception as e:
        print(f"(memory_analysis unavailable: {e})")

    # --- re-stage args in the executable's parameter formats ----------
    in_fmts, _ = compiled.input_formats
    flat_args, tree = jax.tree.flatten(args)
    flat_fmts = jax.tree.flatten(in_fmts)[0]
    n_conv = 0
    conv_bytes = 0
    new_flat = []
    for i, (a, f) in enumerate(zip(flat_args, flat_fmts)):
        try:
            cur = a.format if hasattr(a, "format") else None
        except Exception:
            cur = None
        if cur is not None and cur != f:
            n_conv += 1
            conv_bytes += a.nbytes
            b = jax.device_put(a, f)
            b.block_until_ready()
            new_flat.append(b)
        else:
            new_flat.append(a)
    print(f"format conversions needed: {n_conv} args, "
          f"{conv_bytes/2**30:.2f} GB logical", flush=True)
    new_args = jax.tree.unflatten(tree, new_flat)
    # swap the smoother's state to the converted buffers and drop
    # originals so dispatch sees no stale duplicates
    (sm.points, sm.smoothing_surface, sm.normals, sm.td, _lay, _bnd,
     eng_arrays, _nv) = new_args
    if sm.engine is not None:
        sm.engine.arrays = eng_arrays
    del args, flat_args, new_flat, new_args
    import gc
    gc.collect()
    sm._batch = jfn

    t0 = time.time()
    try:
        res = sm.steps(sm.iter_batch)
        print(f"first batch OK: {len(res)} iters "
              f"{time.time() - t0:.1f}s  residual={res[-1].residual:.3e}",
              flush=True)
        t0 = time.time()
        res = sm.steps(sm.iter_batch)
        print(f"second batch OK: {time.time() - t0:.1f}s "
              f"residual={res[-1].residual:.3e}", flush=True)
    except Exception as e:
        print(f"batch FAILED after {time.time() - t0:.1f}s: "
              f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
