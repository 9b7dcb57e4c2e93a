import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
from smoothmesh_tpu.mesh.tiling import permute_mesh
from smoothmesh_tpu.mesh.topology import compile_topology
from smoothmesh_tpu.ops import tiled

mesh = perturb(hex_block(n=(48,48,48)), amplitude=0.002, seed=3)
new_mesh, _ = permute_mesh(mesh)
topo = compile_topology(new_mesh)
print("points", topo.n_points, "cells", topo.n_cells)
t0=time.time()
pool, (codes,) = tiled.build_pool(topo.n_points, [(topo.point_cells, topo.point_cells_mask)], topo.n_cells)
print("pool build s", round(time.time()-t0,2), tiled.pool_stats(pool))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((topo.n_cells, 3)), jnp.float32)
W = codes.width
M = topo.point_cells.shape[0]*W
# correctness on TPU
got = np.asarray(tiled.tiled_gather(x, pool, codes, topo.n_points))
want = np.asarray(x)[np.asarray(topo.point_cells, np.int64)]
m = topo.point_cells_mask
print("tpu err", np.abs(got[m]-want[m]).max())
# throughput: loop in jit
f = lambda s: tiled.tiled_gather(x + s, pool, codes, topo.n_points)
def looped(s):
    def body(i, s):
        y = f(s)
        return s + y[0,0,0]*1e-20
    return jax.lax.fori_loop(0, 8, body, s)
g = jax.jit(looped)
s = g(jnp.float32(0)); jax.block_until_ready(s)
t0=time.perf_counter()
s = jnp.float32(0)
for _ in range(4): s = g(s)
_ = float(np.asarray(s))
dt = (time.perf_counter()-t0)/32
print(f"tiled_gather {dt*1e3:.3f} ms  {M/dt/1e6:.1f} M rows/s (3-comp)")
# XLA baseline same shape
pc = jnp.asarray(topo.point_cells)
def fx(s):
    return (x + s)[pc]
def looped2(s):
    def body(i, s):
        y = fx(s)
        return s + y[0,0,0]*1e-20
    return jax.lax.fori_loop(0, 8, body, s)
g2 = jax.jit(looped2)
s = g2(jnp.float32(0)); jax.block_until_ready(s)
t0=time.perf_counter()
s = jnp.float32(0)
for _ in range(4): s = g2(s)
_ = float(np.asarray(s))
dt2 = (time.perf_counter()-t0)/32
print(f"xla_gather   {dt2*1e3:.3f} ms  {M/dt2/1e6:.1f} M rows/s")
