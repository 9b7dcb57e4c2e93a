#!/usr/bin/env python
"""Gather ROW-WIDTH probe: is T[idx] for T=(N, W) the same per-row cost
as a 1D (N,) gather?

Round-2 gatherbench found XLA TPU gathers are padded-row-fetch bound at
~110-140 GB/s (~150-300M rows/s).  If the padded fetch is the (8,128)
tile row regardless of logical W, a single (N, 8) row gather delivers 8
components for the price one 1D gather pays for 1 — the basis for the
round-5 face-angle eval repack (ops/constraints.py eval_edges_chunk
currently issues ~124 per-component 1D gather rows per edge; packed
tables would cut that to ~24).

Measures, at M = 4M random indices over N = 1M source rows:
  - f32 1D gather (baseline), and (N, W) row gathers for W in
    2/3/4/8/16/32/128
  - W separate 1D gathers vs one (N, W) row gather (the refactor
    question, W = 8)
  - int32 (N, 16) row gather (the packed edge-meta pattern)

Usage (quiet host, ONE TPU process):
    PYTHONPATH=/root/repo:/root/.axon_site python experiments/gatherwidth.py
"""
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

NSRC = 1 << 20
M = 1 << 22
ITERS = 20

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, NSRC, M), jnp.int32)


def timed(name, fn, *args, rows=M):
    f = jax.jit(fn)
    out, chk = f(jnp.float32(0.0), *args)
    jax.block_until_ready((out, chk))
    t0 = time.perf_counter()
    s = jnp.float32(0.0)
    for _ in range(ITERS):
        out, s = f(s, *args)
    _ = float(np.asarray(s))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:24s} {dt*1e3:8.3f} ms  {rows/dt/1e6:10.1f} M rows/s",
          flush=True)
    return dt


def g_wide(s, x, idx):
    # x: (N, W) f32; one row gather, consume all columns
    y = (x + s)[idx]
    return y, y.sum(dtype=jnp.float32).ravel()[0]


def g_1d_multi(s, cols, idx):
    outs = [(c + s)[idx] for c in cols]
    acc = outs[0]
    for o in outs[1:]:
        acc = acc + o
    return outs, acc.sum(dtype=jnp.float32)


def g_i32(s, x, idx):
    y = x[idx]
    return y, (y.sum().astype(jnp.float32) * 0 + s)


def main():
    x1 = jnp.asarray(rng.standard_normal(NSRC), jnp.float32)
    t1 = timed("f32 (N,) 1D", lambda s, x, i: ((x + s)[i],
                                               (x + s)[i].sum()), x1, idx)
    for W in (2, 3, 4, 8, 16, 32, 128):
        xw = jnp.asarray(rng.standard_normal((NSRC, W)), jnp.float32)
        tw = timed(f"f32 (N,{W}) row", g_wide, xw, idx)
        print(f"    -> per-row cost vs 1D: {tw/t1:5.2f}x "
              f"(per-component: {tw/t1/W:5.3f}x)", flush=True)
    # the refactor question head-to-head at W=8
    cols = [jnp.asarray(rng.standard_normal(NSRC), jnp.float32)
            for _ in range(8)]
    t8sep = timed("8 x f32 (N,) 1D", g_1d_multi, cols, idx, rows=8 * M)
    x8 = jnp.asarray(rng.standard_normal((NSRC, 8)), jnp.float32)
    t8row = timed("1 x f32 (N,8) row", g_wide, x8, idx)
    print(f"    -> (N,8) row gather is {t8sep/t8row:5.2f}x faster than "
          f"8 separate 1D gathers", flush=True)
    xi = jnp.asarray(rng.integers(0, 1 << 20, (NSRC, 16)), jnp.int32)
    timed("i32 (N,16) row", g_i32, xi, idx)


if __name__ == "__main__":
    main()
