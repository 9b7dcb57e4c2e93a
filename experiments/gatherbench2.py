#!/usr/bin/env python
"""Round 2 of gather microbenchmarks: two-level formulations.

All variants loop K times INSIDE one jit (chained) to exclude the
~1-2ms axon dispatch overhead that polluted gatherbench.py's small
timings.

Variants:
  row128      gather of (128,)-wide rows -- is XLA gather index-bound?
  row384      gather of (384,)-wide rows (the tiled-interleave layout)
  twolevel    XLA einsum: block pools (S=128 rows of 384) built by row
              gather, one-hot matmul row-select (bf16 2-term), VPU lane
              select
  twolevel3   same with 3-term (f32-exact) split
  planegather Pallas per-lane 2D gather throughput (take_along_axis)
  ref_row3    baseline x[idx] from (N,3) for comparison, in-jit loop
"""
import sys
import time
import os

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
KB = 512                 # consumers per block
S = 128                  # source 128-rows per block pool
LOOP = 8

rng = np.random.default_rng(0)
xT = np.asarray(rng.standard_normal((3, NSRC)), np.float32)
# tiled-interleave layout: (N/128, 3, 128) -> (N/128, 384)
x_ti = jnp.asarray(
    np.ascontiguousarray(xT.reshape(3, NSRC // 128, 128).transpose(1, 0, 2))
    .reshape(NSRC // 128, 384))
x3 = jnp.asarray(xT.T.copy())
x128 = jnp.asarray(np.asarray(xT[0]).reshape(-1, 128))

nb = M // KB
# Block-local index model (what mesh reordering buys): each consumer
# block touches <= S distinct source 128-rows
pool_rows = np.sort(
    np.stack([rng.choice(NSRC // 128, S, replace=False)
              for _ in range(nb)]), axis=1).astype(np.int32)
slot_of = rng.integers(0, S, (nb, KB)).astype(np.int32)
lane_of = rng.integers(0, 128, (nb, KB)).astype(np.int32)
idx = (pool_rows[np.arange(nb)[:, None], slot_of] * 128
       + lane_of).reshape(-1).astype(np.int32)
pool_rows_j = jnp.asarray(pool_rows)
slot_j = jnp.asarray(slot_of)
lane_j = jnp.asarray(lane_of)
idx_j = jnp.asarray(idx)
idx128 = jnp.asarray(idx[: M // 1] // 128)  # row ids for row gathers


def timed(name, fn, *args, rows=None, inner=LOOP):
    f = jax.jit(fn)
    out = f(jnp.float32(0.0), *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    REP = 4
    s = jnp.float32(0.0)
    for _ in range(REP):
        s = f(s, *args)
    _ = float(np.asarray(s.ravel()[0] if hasattr(s, "ravel") else s))
    dt = (time.perf_counter() - t0) / (REP * inner)
    msg = f"{name:14s} {dt*1e3:9.3f} ms/op"
    if rows:
        msg += f"  {rows/dt/1e6:10.1f} M rows/s"
    print(msg, flush=True)


def loop(body):
    def run(s, *args):
        def it(i, s):
            return body(s, *args)
        return jax.lax.fori_loop(0, LOOP, it, s)
    return run


def ref_row3(s, x3, idx):
    y = x3[idx] + s
    return y[0, 0] + y[-1, -1] * 1e-20


def row128(s, x128, ids):
    y = x128[ids] + s
    return y[0, 0] + y[-1, -1] * 1e-20


def row384(s, x_ti, ids):
    y = x_ti[ids] + s
    return y[0, 0] + y[-1, -1] * 1e-20


def _split(p, terms):
    outs = []
    rem = p
    for _ in range(terms - 1):
        h = rem.astype(jnp.bfloat16)
        outs.append(h)
        rem = rem - h.astype(jnp.float32)
    outs.append(rem.astype(jnp.bfloat16))
    return outs


def twolevel(s, x_ti, pool_rows, slot, lane, terms):
    # pools: (nb, S, 384) by row gather (nb*S rows)
    pools = x_ti[pool_rows] + s                       # (nb, S, 384)
    oh1 = (slot[:, :, None]
           == jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2))
    ohb = oh1.astype(jnp.bfloat16)
    acc = None
    for p in _split(pools, terms):
        t = jnp.einsum("bks,bsd->bkd", ohb, p,
                       preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    tmp = acc.reshape(nb, KB, 3, 128)                  # (nb, KB, 3, 128)
    oh2 = (lane[:, :, None]
           == jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2))
    y = jnp.sum(tmp * oh2[:, :, None, :].astype(jnp.float32), axis=-1)
    return y[0, 0, 0] + y[-1, -1, -1] * 1e-20


def planegather(s, x128, idxmat):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, L = 2048, 128
    K = idxmat.shape[0]

    def kernel(a_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(a_ref[:], i_ref[:], axis=0)

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x128[:R] + s, idxmat)
    return y[0, 0] + y[-1, -1] * 1e-20


VARIANTS = {}
VARIANTS["ref_row3"] = lambda: timed("ref_row3", loop(ref_row3), x3, idx_j,
                                     rows=M)
VARIANTS["row128"] = lambda: timed("row128", loop(row128), x128, idx128,
                                   rows=M)
VARIANTS["row384"] = lambda: timed(
    "row384", loop(row384), x_ti,
    jnp.asarray(rng.integers(0, NSRC // 128, M // 32).astype(np.int32)),
    rows=M // 32)
VARIANTS["twolevel"] = lambda: timed(
    "twolevel bf16x2", loop(lambda s, *a: twolevel(s, *a, terms=2)),
    x_ti, pool_rows_j, slot_j, lane_j, rows=M)
VARIANTS["twolevel3"] = lambda: timed(
    "twolevel bf16x3", loop(lambda s, *a: twolevel(s, *a, terms=3)),
    x_ti, pool_rows_j, slot_j, lane_j, rows=M)

_pg_idx = jnp.asarray(rng.integers(0, 2048, (1 << 12, 128)).astype(np.int32))
VARIANTS["planegather"] = lambda: timed(
    "planegather", loop(planegather), x128, _pg_idx, rows=(1 << 12) * 128)

if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    print(f"device={jax.devices()[0]} NSRC={NSRC} M={M} KB={KB} S={S} "
          f"LOOP={LOOP}")
    for n in names:
        try:
            VARIANTS[n]()
        except Exception as e:
            print(f"{n:14s} FAILED: {type(e).__name__}: {str(e)[:300]}")
