#!/usr/bin/env python
"""Pallas pool-select gather prototype, round 2 (tile-native algebra).

Values live in tiled-interleave layout (NR, 384): row r holds x/y/z of
source entities r*128..r*128+127 as three 128-lane groups.  Consumers
come in blocks of KB; each block touches <= S source rows (by
construction -- mesh reordering + topology compiler guarantee this).

Kernel per block:
  1. DMA the S pool rows into VMEM (row-id indexed copies).
  2. For each 128-consumer group g (KB/128 of them):
       ohT_g (S,128) = iota(S,128,0) == slot[g]        (lane broadcast)
       tmp_g (384,128) = sum_t poolT_t (384,S) @ ohT_g  (bf16 terms)
       out[c, g*128:...] = sublane-reduce of tmp_g[c*128+r] at r=lane
  3. Write (3, KB) output block (tiled-interleave, no padding waste).

Variants: pool_mm2 / pool_mm3 (2- and 3-term bf16 splits; 3-term is
f32-exact), and a dma variant probing batched DMA issue.
"""
import sys
import time
import os

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

NSRC = 1 << 20
NR = NSRC // 128
M = 1 << 22
KB = 2048
S = 128
G = KB // 128
LOOP = 8

rng = np.random.default_rng(0)
xT = np.asarray(rng.standard_normal((3, NSRC)), np.float32)
x_ti = jnp.asarray(
    np.ascontiguousarray(xT.reshape(3, NR, 128).transpose(1, 0, 2))
    .reshape(NR, 384))

nb = M // KB
pool_rows = np.sort(
    np.stack([rng.choice(NR, S, replace=False) for _ in range(nb)]),
    axis=1).astype(np.int32)
slot_of = rng.integers(0, S, (nb, KB)).astype(np.int32)
lane_of = rng.integers(0, 128, (nb, KB)).astype(np.int32)
idx = (pool_rows[np.arange(nb)[:, None], slot_of] * 128
       + lane_of).reshape(-1).astype(np.int32)
pr_j = jnp.asarray(pool_rows)
slot2d = jnp.asarray(slot_of.reshape(M // 128, 128))
lane2d = jnp.asarray(lane_of.reshape(M // 128, 128))


def make_pool_kernel(terms, batched_dma):
    def kernel(pr_ref, slot_ref, lane_ref, x_hbm, out_ref, pool, sems):
        b = pl.program_id(0)
        if batched_dma:
            def start(s_i, _):
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(pr_ref[b, s_i], 1)],
                    pool.at[pl.ds(s_i, 1)], sems.at[s_i % 16]).start()
                return 0
            jax.lax.fori_loop(0, S, start, 0)

            def wait(s_i, _):
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(pr_ref[b, s_i], 1)],
                    pool.at[pl.ds(s_i, 1)], sems.at[s_i % 16]).wait()
                return 0
            jax.lax.fori_loop(0, S, wait, 0)
        else:
            def fetch(s_i, _):
                cp = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(pr_ref[b, s_i], 1)],
                    pool.at[pl.ds(s_i, 1)], sems.at[0])
                cp.start()
                cp.wait()
                return 0
            jax.lax.fori_loop(0, S, fetch, 0)

        p = pool[:]                                      # (S, 384)
        pT = p.T                                         # (384, S)
        # bf16 split terms of the pool (exact selection per term)
        pts = []
        rem = pT
        for t in range(terms):
            h = rem.astype(jnp.bfloat16)
            if t < terms - 1:
                rem = rem - h.astype(jnp.float32)
            pts.append(h)

        for g in range(G):
            slot_g = slot_ref[g, :][None, :]             # (1, 128)
            lane_g = lane_ref[g, :][None, :]
            ohT = (jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
                   == slot_g).astype(jnp.bfloat16)
            tmp = None
            for h in pts:
                d = jax.lax.dot(h, ohT,
                                preferred_element_type=jnp.float32)
                tmp = d if tmp is None else tmp + d       # (384, 128)
            pick = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                    == lane_g)
            for c in range(3):
                sub = tmp[c * 128:(c + 1) * 128, :]      # (128, 128)
                out_ref[c, pl.ds(g * 128, 128)] = jnp.sum(
                    jnp.where(pick, sub, 0.0), axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((G, 128), lambda b, pr: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), lambda b, pr: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((3, KB), lambda b, pr: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((S, 384), jnp.float32),
            pltpu.SemaphoreType.DMA((16,)),
        ],
    )

    def run(s, x_ti, pr, slot, lane):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3, nb * KB), jnp.float32),
            grid_spec=grid_spec,
        )(pr, slot, lane, x_ti + s)

    return run


def timed(name, run):
    ref = np.asarray(xT)[:, idx]

    f = jax.jit(lambda s, *a: (run(s, *a), s))
    y, _ = f(jnp.float32(0.0), x_ti, pr_j, slot2d, lane2d)
    err = float(np.abs(np.asarray(y) - ref).max())

    def body(s, *args):
        y = run(s, *args)
        return s + y[0, 0] * 1e-20

    def looped(s, *args):
        return jax.lax.fori_loop(0, LOOP, lambda i, s: body(s, *args), s)

    g = jax.jit(looped)
    s = g(jnp.float32(0.0), x_ti, pr_j, slot2d, lane2d)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    REP = 4
    s = jnp.float32(0.0)
    for _ in range(REP):
        s = g(s, x_ti, pr_j, slot2d, lane2d)
    _ = float(np.asarray(s))
    dt = (time.perf_counter() - t0) / (REP * LOOP)
    print(f"{name:14s} {dt*1e3:9.3f} ms/op  {M/dt/1e6:10.1f} M rows/s"
          f"  err={err:g}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["pool_mm2", "pool_mm3", "pool_mm3_dma"]
    print(f"device={jax.devices()[0]} NR={NR} M={M} KB={KB} S={S}")
    for nm, terms, bd in (("pool_mm2", 2, False), ("pool_mm3", 3, False),
                          ("pool_mm3_dma", 3, True)):
        if nm not in names:
            continue
        try:
            timed(nm, make_pool_kernel(terms, bd))
        except Exception as e:
            print(f"{nm:14s} FAILED {type(e).__name__}: {str(e)[:300]}")
