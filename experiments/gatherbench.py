#!/usr/bin/env python
"""TPU microbenchmarks for the round-2 gather-engine design.

Questions answered (on the real chip):
  1. Elementwise bandwidth by layout: (N,3) vs (3,N) vs (N,128)
     -- is the minor dim physically padded to 128 lanes?
  2. Gather throughput by formulation:
     - row gather x[idx] from (N,3)
     - per-component 1D lane gather xc[idx] from (N,)
     - 2D common-index gather x[:, idx] from (8, N)
     - blocked one-hot matmul gather (MXU), XLA formulation
     - blocked one-hot matmul gather, Pallas kernel w/ DMA span pools
  3. Locality sensitivity of the XLA gather (random vs block-local idx).

Usage: python experiments/gatherbench.py [variant ...]
Variants: ew3 ewT ew128 grow3 g1d g1d_local g2d onehot_xla onehot_pallas
          (default: all but pallas)
"""
import sys
import time
import os
import functools

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

NSRC = 1 << 20          # source rows
M = 1 << 22             # gathered rows
KB = 512                # consumer block size (one-hot variants)
R = 1024                # pool span
ITERS = 30

rng = np.random.default_rng(0)
x3 = jnp.asarray(rng.standard_normal((NSRC, 3)), jnp.float32)
xT = jnp.asarray(np.asarray(x3).T.copy())                    # (3, N)
x8T = jnp.asarray(np.repeat(np.asarray(xT), 3, 0)[:8].copy())  # (8, N)
x128 = jnp.asarray(rng.standard_normal((NSRC // 8, 128)), jnp.float32)

idx_rand = jnp.asarray(rng.integers(0, NSRC, M), jnp.int32)
# block-local indices: consumer block b of KB rows reads within
# [lo_b, lo_b + R)
nb = M // KB
lo = np.minimum((np.arange(nb) * NSRC) // nb, NSRC - R).astype(np.int32)
lidx = rng.integers(0, R, (nb, KB)).astype(np.int32)
idx_local = jnp.asarray((lo[:, None] + lidx).reshape(-1))
lo_j = jnp.asarray(lo)
lidx_j = jnp.asarray(lidx)


def timed(name, fn, *args, bytes_payload=None, rows=None):
    f = jax.jit(fn)
    out, chk = f(jnp.float32(0.0), *args)
    jax.block_until_ready((out, chk))
    t0 = time.perf_counter()
    s = jnp.float32(0.0)
    for _ in range(ITERS):
        out, s = f(s, *args)
    _ = float(np.asarray(s))  # fetch: completes the chain
    dt = (time.perf_counter() - t0) / ITERS
    msg = f"{name:16s} {dt*1e3:8.3f} ms"
    if rows:
        msg += f"  {rows/dt/1e6:10.1f} M rows/s"
    if bytes_payload:
        msg += f"  {bytes_payload/dt/1e9:8.1f} GB/s payload"
    print(msg, flush=True)
    return out


# -- elementwise bandwidth probes ------------------------------------------
def ew(s, x):
    y = x * 1.000001 + s
    return y, y.ravel()[0]


# -- gather variants -------------------------------------------------------
def grow3(s, x, idx):
    y = (x + s)[idx]
    return y, y.ravel()[0]


def g1d(s, xT, idx):
    outs = [(xT[c] + s)[idx] for c in range(3)]
    return outs, outs[0][0]


def g2d(s, x8, idx):
    y = (x8 + s)[:, idx]
    return y, y.ravel()[0]


def onehot_xla(s, xT, lo, lidx):
    # pools via vmapped dynamic_slice of the (3, N) table -> (nb, 3, R)
    xs = xT + s
    pools = jax.vmap(
        lambda l: jax.lax.dynamic_slice(xs, (0, l), (3, R)))(lo)
    oh = (lidx[:, :, None] ==
          jax.lax.broadcasted_iota(jnp.int32, (1, 1, R), 2))
    ohb = oh.astype(jnp.bfloat16)
    pb = pools.astype(jnp.bfloat16)
    plo = (pools - pb.astype(jnp.float32)).astype(jnp.bfloat16)
    hi = jnp.einsum("bkr,bcr->bck", ohb, pb,
                    preferred_element_type=jnp.float32)
    lo_part = jnp.einsum("bkr,bcr->bck", ohb, plo,
                         preferred_element_type=jnp.float32)
    y = hi + lo_part
    return y, y.ravel()[0]


def onehot_xla_f32(s, xT, lo, lidx):
    xs = xT + s
    pools = jax.vmap(
        lambda l: jax.lax.dynamic_slice(xs, (0, l), (3, R)))(lo)
    oh = (lidx[:, :, None] ==
          jax.lax.broadcasted_iota(jnp.int32, (1, 1, R), 2)
          ).astype(jnp.float32)
    y = jnp.einsum("bkr,bcr->bck", oh, pools,
                   preferred_element_type=jnp.float32)
    return y, y.ravel()[0]


def onehot_pallas(s, xT, lo, lidx):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(lo_ref, lidx_ref, x_hbm, out_ref, pool, sem):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(lo_ref[b], R)], pool, sem)
        cp.start()
        cp.wait()
        li = lidx_ref[0]                                     # (KB,)
        oh = (jax.lax.broadcasted_iota(jnp.int32, (R, KB), 0)
              == li[None, :])
        p = pool[:]                                          # (3, R)
        phi = p.astype(jnp.bfloat16)
        plo = (p - phi.astype(jnp.float32)).astype(jnp.bfloat16)
        ohb = oh.astype(jnp.bfloat16)
        hi = jax.lax.dot(phi, ohb, preferred_element_type=jnp.float32)
        lo_p = jax.lax.dot(plo, ohb, preferred_element_type=jnp.float32)
        out_ref[0] = hi + lo_p                               # (3, KB)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, KB), lambda b, lo_ref: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 3, KB), lambda b, lo_ref: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, R), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, 3, KB), jnp.float32),
        grid_spec=grid_spec,
    )(lo, lidx, xT + s)
    return y, y.ravel()[0]


VARIANTS = {
    "ew3": lambda: timed("ew (N,3)", ew, x3,
                         bytes_payload=2 * NSRC * 12, rows=NSRC),
    "ewT": lambda: timed("ew (3,N)", ew, xT,
                         bytes_payload=2 * NSRC * 12, rows=NSRC),
    "ew128": lambda: timed("ew (N/8,128)", ew, x128,
                           bytes_payload=2 * NSRC * 16, rows=NSRC),
    "grow3": lambda: timed("rowgather (N,3)", grow3, x3, idx_rand, rows=M),
    "g1d": lambda: timed("1d x3 rand", g1d, xT, idx_rand, rows=M),
    "g1d_local": lambda: timed("1d x3 local", g1d, xT, idx_local, rows=M),
    "g2d": lambda: timed("2d (8,N) rand", g2d, x8T, idx_rand, rows=M),
    "onehot_xla": lambda: timed("onehot xla bf16", onehot_xla, xT, lo_j,
                                lidx_j, rows=M),
    "onehot_xla_f32": lambda: timed("onehot xla f32", onehot_xla_f32, xT,
                                    lo_j, lidx_j, rows=M),
    "onehot_pallas": lambda: timed("onehot pallas", onehot_pallas, xT,
                                   lo_j, lidx_j, rows=M),
}

if __name__ == "__main__":
    names = sys.argv[1:] or [k for k in VARIANTS if k != "onehot_pallas"]
    print(f"device={jax.devices()[0]}  NSRC={NSRC} M={M} KB={KB} R={R}")
    for n in names:
        try:
            VARIANTS[n]()
        except Exception as e:
            print(f"{n:16s} FAILED: {type(e).__name__}: {e}")
