#!/usr/bin/env python
"""Bisect which Pallas/Mosaic features crash the axon remote compiler."""
import sys
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

S, D, KB = 128, 384, 256
NR = 1024
nb = 4
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((NR, D)), jnp.float32)
pr = jnp.asarray(rng.integers(0, NR, (nb, S)), np.int32)
slot = jnp.asarray(rng.integers(0, S, (nb * KB // 128, 128)), np.int32)


def run(name, fn):
    try:
        y = jax.jit(fn)()
        jax.block_until_ready(y)
        print(f"{name:24s} OK   {np.asarray(y).ravel()[0]:.4f}")
    except Exception as e:
        print(f"{name:24s} FAIL {type(e).__name__}: {str(e)[:160]}")


# p1: scalar prefetch, no DMA
def p1():
    def k(pr_ref, a_ref, o_ref):
        o_ref[:] = a_ref[:] * 1.0
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,),
        in_specs=[pl.BlockSpec((8, D), lambda b, pr: (b, 0))],
        out_specs=pl.BlockSpec((8, D), lambda b, pr: (b, 0)))
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((nb * 8, D), jnp.float32),
        grid_spec=gs)(pr, x[:nb * 8])


# p2: DMA with static row index
def p2():
    def k(pr_ref, x_hbm, o_ref, pool, sem):
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(0, S)], pool, sem)
        cp.start()
        cp.wait()
        o_ref[:] = jnp.broadcast_to(
            jnp.sum(pool[:], axis=0, keepdims=True), (8, D))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, D), lambda b, pr: (b, 0)),
        scratch_shapes=[pltpu.VMEM((S, D), jnp.float32),
                        pltpu.SemaphoreType.DMA])
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((nb * 8, D), jnp.float32),
        grid_spec=gs)(pr, x)


# p3: DMA row-by-row with dynamic ids from prefetch, in fori_loop
def p3():
    def k(pr_ref, x_hbm, o_ref, pool, sem):
        b = pl.program_id(0)

        def fetch(i, _):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(pr_ref[b, i], 1)],
                pool.at[pl.ds(i, 1)], sem)
            cp.start()
            cp.wait()
            return 0
        jax.lax.fori_loop(0, S, fetch, 0)
        o_ref[:] = jnp.broadcast_to(
            jnp.sum(pool[:], axis=0, keepdims=True), (8, D))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, D), lambda b, pr: (b, 0)),
        scratch_shapes=[pltpu.VMEM((S, D), jnp.float32),
                        pltpu.SemaphoreType.DMA])
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((nb * 8, D), jnp.float32),
        grid_spec=gs)(pr, x)


# p4: VMEM transpose
def p4():
    def k(a_ref, o_ref):
        o_ref[:] = a_ref[:].T
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((D, S), jnp.float32),
    )(x[:S])


# p5: bf16 dot (D,S)@(S,128)
def p5():
    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot(
            a_ref[:].astype(jnp.bfloat16), b_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((D, 128), jnp.float32),
    )(x[:D, :S] * 1.0, x[:S, :128] * 1.0)


# p6: iota one-hot + dot
def p6():
    def k(s_ref, a_ref, o_ref):
        oh = (jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
              == s_ref[0, :][None, :]).astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot(
            a_ref[:].astype(jnp.bfloat16), oh,
            preferred_element_type=jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((D, 128), jnp.float32),
    )(slot[:1], x[:D, :S] * 1.0)


# p7: store with scalar leading index + dynamic slice lanes
def p7():
    def k(a_ref, o_ref):
        for c in range(3):
            for g in range(2):
                o_ref[c, pl.ds(g * 128, 128)] = a_ref[c, pl.ds(g * 128,
                                                               128)] * 2.0
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((3, 256), jnp.float32),
    )(x[:3, :256] * 1.0)


# p8: semaphore array
def p8():
    def k(x_hbm, o_ref, pool, sems):
        for i in range(4):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * 8, 8)], pool.at[pl.ds(i * 8, 8)],
                sems.at[i]).start()
        for i in range(4):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * 8, 8)], pool.at[pl.ds(i * 8, 8)],
                sems.at[i]).wait()
        o_ref[:] = jnp.sum(pool[:], axis=0, keepdims=True)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, D), lambda: (0, 0)),
        scratch_shapes=[pltpu.VMEM((32, D), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))])(x[:64])


# p9: output block with sublane dim 3 over whole array
def p9():
    def k(a_ref, o_ref):
        o_ref[:] = a_ref[:] * 3.0
    gs = pl.GridSpec(
        grid=(nb,),
        in_specs=[pl.BlockSpec((3, KB), lambda b: (0, b))],
        out_specs=pl.BlockSpec((3, KB), lambda b: (0, b)))
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((3, nb * KB), jnp.float32),
        grid_spec=gs)(jnp.tile(x[:3, :KB], (1, nb)))




# p3 variants: what exactly breaks dynamic-index DMA?
def _dma_probe(body):
    def k(pr_ref, x_hbm, o_ref, pool, sem):
        body(pr_ref, x_hbm, pool, sem)
        o_ref[:] = jnp.broadcast_to(
            jnp.sum(pool[:], axis=0, keepdims=True), (8, D))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, D), lambda b, pr: (b, 0)),
        scratch_shapes=[pltpu.VMEM((S, D), jnp.float32),
                        pltpu.SemaphoreType.DMA])
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((nb * 8, D), jnp.float32),
        grid_spec=gs)(pr, x)


def p3a():  # single dynamic-index copy, one row
    def body(pr_ref, x_hbm, pool, sem):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(pr_ref[b, 0], 1)], pool.at[pl.ds(0, 1)], sem)
        cp.start()
        cp.wait()
    return _dma_probe(body)


def p3b():  # single dynamic-index copy, 8 rows
    def body(pr_ref, x_hbm, pool, sem):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(pr_ref[b, 0], 8)], pool.at[pl.ds(0, 8)], sem)
        cp.start()
        cp.wait()
    return _dma_probe(body)


def p3c():  # unrolled python loop of 8 single-row dynamic copies
    def body(pr_ref, x_hbm, pool, sem):
        b = pl.program_id(0)
        for i in range(8):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(pr_ref[b, i], 1)], pool.at[pl.ds(i, 1)],
                sem)
            cp.start()
            cp.wait()
    return _dma_probe(body)


def p3d():  # fori_loop, dynamic dest too, 8 rows each
    def body(pr_ref, x_hbm, pool, sem):
        b = pl.program_id(0)

        def fetch(i, _):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(pr_ref[b, i], 8)],
                pool.at[pl.ds(i * 8, 8)], sem)
            cp.start()
            cp.wait()
            return 0
        jax.lax.fori_loop(0, 8, fetch, 0)
    return _dma_probe(body)


def p3e():  # fori_loop single-row dynamic src, STATIC dest row 0
    def body(pr_ref, x_hbm, pool, sem):
        b = pl.program_id(0)

        def fetch(i, _):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(pr_ref[b, i], 1)], pool.at[pl.ds(0, 1)],
                sem)
            cp.start()
            cp.wait()
            return 0
        jax.lax.fori_loop(0, 8, fetch, 0)
    return _dma_probe(body)



# p10: index_map reading prefetched scalars (pipeline-driven dynamic fetch)
def p10():
    def k(pr_ref, a_ref, o_ref):
        o_ref[:] = a_ref[:] * 1.0
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,),
        in_specs=[pl.BlockSpec((8, D), lambda b, pr: (pr[b, 0], 0))],
        out_specs=pl.BlockSpec((8, D), lambda b, pr: (b, 0)))
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((nb * 8, D), jnp.float32),
        grid_spec=gs)(pr % (NR // 8), x)


# p11: multi-dim grid, revolving pool scratch filled via prefetch index_map
def p11():
    P = 4

    def k(pr_ref, a_ref, o_ref, pool):
        p_i = pl.program_id(1)
        pool[pl.ds(p_i * 8, 8), :] = a_ref[:]

        @pl.when(p_i == P - 1)
        def _():
            o_ref[:] = jnp.broadcast_to(
                jnp.sum(pool[:], axis=0, keepdims=True), (8, D))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb, P),
        in_specs=[pl.BlockSpec((8, D), lambda b, p, pr: (pr[b, p], 0))],
        out_specs=pl.BlockSpec((8, D), lambda b, p, pr: (b, 0)),
        scratch_shapes=[pltpu.VMEM((8 * P, D), jnp.float32)])
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((nb * 8, D), jnp.float32),
        grid_spec=gs)(pr % (NR // 8), x)


# p12: VPU masked sublane-reduce select (the core select primitive)
def p12():
    P = 16  # pool rows

    def k(r_ref, l_ref, pool_ref, o_ref):
        pool = pool_ref[:]                       # (P, 128)
        rj = r_ref[:]                            # (8, 128) consumer rows
        lj = l_ref[:]
        # row select: out2[j128 block...] -> for 8x128 consumers
        acc = jnp.zeros((8, 128), jnp.float32)
        for g in range(8):
            row_sel = jnp.zeros((128, 128), jnp.float32)
            rg = rj[g, :][None, :]               # (1, 128)
            for r in range(P):
                row_sel = jnp.where(rg == r, pool[r, :][:, None].T *
                                    jnp.ones((128, 1)), row_sel)
            # row_sel[l, j] = pool[r_j, l]; lane select:
            lg = lj[g, :][None, :]
            pick = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                    == lg)
            acc = acc.at[g, :].set(
                jnp.sum(jnp.where(pick, row_sel, 0.0), axis=0))
        o_ref[:] = acc

    rr = jnp.asarray(rng.integers(0, P, (8, 128)), jnp.int32)
    ll = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(rr, ll, x[:P, :128] * 1.0)


if __name__ == "__main__":
    names = sys.argv[1:] or ["p1", "p2", "p3", "p4", "p5", "p6", "p7",
                             "p8", "p9"]
    print(f"device={jax.devices()[0]}")
    for n in names:
        run(n, globals()[n])
