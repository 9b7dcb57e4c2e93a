#!/usr/bin/env python
"""Why does the 216^3 first dispatch OOM when the compiled step's
buffer assignment says 11.4 GB / 16 GB (experiments/memstats.py)?

Reproduces bench.py's default-mode setup at SMOOTHMESH_OOMPROBE_N^3,
then BEFORE the first dispatch prints:
  - every live jax array >= 1 MB (what actually resides in HBM)
  - device.memory_stats() if the axon backend exposes it
then attempts ONE batched dispatch and prints stats again (or the
error).  The gap between live-array bytes + temp(3.67 GB) and 16 GB
is the unexplained resident this hunts.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    SMOOTHMESH_OOMPROBE_N=216 python experiments/oomprobe.py
ONE TPU process at a time.
"""
import os
import time

import numpy as np


def report_live(tag):
    import jax

    arrs = jax.live_arrays()
    tot = 0
    big = []
    for a in arrs:
        try:
            nb = a.nbytes
        except Exception:
            continue
        tot += nb
        if nb >= (1 << 20):
            big.append((nb, str(a.dtype), tuple(a.shape)))
    big.sort(reverse=True)
    print(f"[{tag}] live arrays: {len(arrs)}  total "
          f"{tot / 2**30:.2f} GB", flush=True)
    for nb, dt, shp in big[:25]:
        print(f"    {nb / 2**20:9.1f} MB  {dt:8s} {shp}")
    try:
        ms = jax.devices()[0].memory_stats()
        if ms:
            for k in ("bytes_in_use", "peak_bytes_in_use",
                      "bytes_limit", "largest_free_block_bytes"):
                if k in ms:
                    print(f"    memstat {k} = {ms[k] / 2**30:.2f} GB")
    except Exception as e:
        print(f"    (memory_stats unavailable: {e})")


def capacity_probe():
    """Binary-search the usable HBM: single contiguous f32 allocations
    (fragmentation-free), freed between attempts.  The axon worker's
    usable limit may be well below the nominal 16 GB."""
    import jax
    import jax.numpy as jnp

    lo, hi = 4.0, 16.0
    while hi - lo > 0.25:
        mid = 0.5 * (lo + hi)
        try:
            n = int(mid * 2**30 // 4)
            a = jnp.zeros((n,), jnp.float32)
            a.block_until_ready()
            del a
            lo = mid
        except Exception:
            hi = mid
        # give the async deallocation a beat
        jnp.zeros((8,)).block_until_ready()
    print(f"[capacity] largest single f32 alloc ~{lo:.2f} GB "
          f"(nominal 16)", flush=True)


def main():
    import jax

    # same persistent compile cache as bench.py: the 216^3 remote
    # compile costs ~1 h cold — pay it once, share it with the bench
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    n_side = int(os.environ.get("SMOOTHMESH_OOMPROBE_N", "216"))
    if os.environ.get("SMOOTHMESH_OOMPROBE_CAPACITY", "1") == "1":
        capacity_probe()

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
    report_live("post-setup")

    t0 = time.time()
    try:
        res = sm.steps(sm.iter_batch)
        print(f"first batch OK: {len(res)} iters "
              f"{time.time() - t0:.1f}s", flush=True)
        report_live("post-dispatch")
    except Exception as e:
        print(f"first batch FAILED after {time.time() - t0:.1f}s: "
              f"{type(e).__name__}: {e}", flush=True)
        report_live("post-failure")


if __name__ == "__main__":
    main()
