#!/usr/bin/env python
"""Physical HBM cost of representative array shapes via capacity
probing (axon's memory_stats() returns None, so hbm_true.py's
bytes_in_use deltas are unavailable).

Method: binary-search the largest single f32 allocation that succeeds
(resolution 1/8 GB) while HOLDING n copies of a probe shape; the drop
vs the empty-device capacity, divided by the held logical bytes, is the
physical multiplier (tile padding + allocator rounding).

Probe shapes mirror the 216^3 oomprobe live-array census
(docs r5: the biggest residents are (30.5M, 4) int32 CSR tables).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/hbm_cap.py
ONE TPU process at a time.
"""
import gc
import os

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def cap(res=0.125):
    lo, hi = 0.5, 16.0
    while hi - lo > res:
        mid = 0.5 * (lo + hi)
        try:
            n = int(mid * 2**30 // 4)
            a = jnp.zeros((n,), jnp.float32) + 1.0
            a.block_until_ready()
            del a
            lo = mid
        except Exception:
            hi = mid
        jnp.zeros((8,)).block_until_ready()
    return lo


def main():
    base = cap()
    print(f"empty-device capacity ~{base:.3f} GB", flush=True)
    GB = 2**30
    # (shape, dtype, n_copies) — n_copies sized so logical ~2-4 GB
    probes = [
        ("(30.5M,4) i32 CSR", (30513672, 4), jnp.int32, 8),
        ("(30.5M,2) i32 edges", (30513672, 2), jnp.int32, 12),
        ("(10.2M,6) i32 pps", (10218313, 6), jnp.int32, 12),
        ("(14,30.5M) i16 meta", (14, 30515200), jnp.int16, 4),
        ("(10.2M,3) f32 pts", (10218313, 3), jnp.float32, 24),
        ("(30.4M,) i32 1D", (30373056,), jnp.int32, 24),
        ("(30.5M,) bool", (30513672,), jnp.bool_, 32),
        ("(10.2M,8) f32 Pf", (10218313, 8), jnp.float32, 8),
        ("(14900,3840) i32 wide", (14900, 3840), jnp.int32, 12),
    ]
    for name, shape, dt, n in probes:
        logical = int(np.prod(shape)) * jnp.dtype(dt).itemsize
        held = []
        try:
            for i in range(n):
                if dt == jnp.bool_:
                    a = jnp.zeros(shape, dt)
                else:
                    a = jnp.full(shape, i + 1, dt)
                a.block_until_ready()
                held.append(a)
        except Exception as e:
            print(f"{name:24s} HOLD FAILED at copy {len(held)}: "
                  f"{type(e).__name__}", flush=True)
        nheld = len(held)
        c = cap()
        phys = (base - c) * GB / max(nheld * logical, 1)
        print(f"{name:24s} n={nheld} logical={nheld*logical/GB:6.2f} GB "
              f"cap={c:6.2f} GB  multiplier x{phys:5.2f}", flush=True)
        del held
        gc.collect()
        jnp.zeros((8,)).block_until_ready()


if __name__ == "__main__":
    main()
