"""Multi-chip sharded smoothing driver.

The TPU analog of the reference's ``mpirun -np N smoothMesh -parallel``
(reference README.md:157, SURVEY.md §3.5): the mesh is partitioned into
per-device shards (parallel.partition), every device runs the identical
jitted iteration over its local padded block under ``jax.shard_map``,
and cross-shard traffic is exactly the shared-point halo combines +
scalar allreduces of the serial reference's sync sites — riding XLA
collectives over ICI instead of MPI.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smoothmesh_tpu import quality
from smoothmesh_tpu.driver import StepResult, iteration_body
from smoothmesh_tpu.io.polymesh import PolyMesh
from smoothmesh_tpu.parallel.partition import ShardedMesh, build_shards
from smoothmesh_tpu.parallel.sync import PointSync
from smoothmesh_tpu.params import SmoothingParams


class ShardedSmoother:
    """Sharded counterpart of driver.Smoother with the same surface API."""

    def __init__(self, mesh: PolyMesh, params: SmoothingParams,
                 n_devices: Optional[int] = None, dtype=None,
                 normalize: bool = True, devices=None):
        if devices is None:
            devices = jax.devices()
            if n_devices is not None:
                devices = devices[:n_devices]
        self.devices = list(devices)
        D = len(self.devices)

        self.mesh_host = mesh
        self.shards: ShardedMesh = build_shards(mesh, D)

        # Global stats for derived defaults (reference getMeshStats is a
        # global allreduce; we have the whole mesh on host here)
        from smoothmesh_tpu.mesh.topology import compile_topology

        self._global_topo = compile_topology(mesh)
        self.stats = quality.mesh_stats(mesh.points, self._global_topo.edges)
        self.params = params.resolve(self.stats.min_edge_length)

        if dtype is None:
            dtype = jnp.zeros(0).dtype
        self.dtype = jnp.dtype(dtype)

        if normalize:
            self._center = mesh.points.mean(axis=0)
            self._scale = 1.0 / max(self.stats.min_edge_length, 1e-300)
        else:
            self._center = np.zeros(3)
            self._scale = 1.0

        self.jmesh = Mesh(np.array(self.devices), ("shard",))
        shard0 = NamedSharding(self.jmesh, P("shard"))

        def put(x):
            return jax.device_put(jnp.asarray(x), shard0)

        self.td = {k: put(v) for k, v in self.shards.stacked.items()}
        self.points = put(
            ((self.shards.local_points - self._center) * self._scale
             ).astype(self.dtype)
        )
        self.slot = put(self.shards.shared_slot_local.astype(np.int32))
        self.valid = put(self.shards.shared_valid)
        self.owner_is_me = put(self.shards.shared_owner_is_me)
        self.smoothing_surface = put(
            np.zeros(self.shards.local_points.shape[:2], dtype=bool))
        self.normals = put(np.zeros(self.shards.local_points.shape,
                                    dtype=self.dtype))
        self.do_boundary_smoothing = False
        self.layer = None  # sharded layer treatment: wired via driver TODO

        self._step = self._build_step()
        self._iteration = 0

    def _build_step(self):
        p = self.params
        s = self._scale
        do_boundary = self.do_boundary_smoothing
        jmesh = self.jmesh

        td_specs = {k: P("shard") for k in self.td}

        def local_step(points, smoothing_surface, normals, td, slot,
                       valid, own):
            # Blocks carry a leading size-1 shard axis
            sync = PointSync(slot[0], valid[0], own[0], axis="shard")
            new_pts, new_norm, res, n_frozen = iteration_body(
                points[0], smoothing_surface[0], normals[0],
                {k: v[0] for k, v in td.items()},
                p, s, do_boundary, layer=None, sync=sync)
            return (new_pts[None], new_norm[None], res[None],
                    n_frozen[None])

        sm = jax.shard_map(
            local_step,
            mesh=jmesh,
            in_specs=(P("shard"), P("shard"), P("shard"), td_specs,
                      P("shard"), P("shard"), P("shard")),
            out_specs=(P("shard"), P("shard"), P("shard"), P("shard")),
            check_vma=False,
        )
        return jax.jit(sm)

    def step(self) -> StepResult:
        self._iteration += 1
        new_points, new_normals, res, n_frozen = self._step(
            self.points, self.smoothing_surface, self.normals, self.td,
            self.slot, self.valid, self.owner_is_me)
        self.points = new_points
        self.normals = new_normals
        # Every shard already holds the global reductions; take shard 0
        return StepResult(self._iteration, float(np.asarray(res)[0]),
                          int(np.asarray(n_frozen)[0]))

    def denormalize(self, pts=None) -> np.ndarray:
        """Assemble the global point field (host, float64)."""
        lp = np.asarray(self.points if pts is None else pts,
                        dtype=np.float64)
        glob = self.shards.gather_global_points(lp)
        return glob / self._scale + self._center

    def run(self, log: Optional[Callable[[str], None]] = print,
            on_write=None) -> StepResult:
        p = self.params
        t0 = time.time()
        result = StepResult(0, float("inf"), 0)
        for i in range(p.centroidal_iters):
            result = self.step()
            if log:
                log(f"Smoothing iteration={result.iteration} "
                    f"nFrozenPoints={result.n_frozen} "
                    f"residual={result.residual:.6g}")
            stop = result.residual < p.rel_tol
            if on_write and (stop or i == p.centroidal_iters - 1
                             or (i + 1) % p.write_interval == 0 and i > 0):
                on_write(result.iteration, self.denormalize())
            if stop:
                if log:
                    log("Residual reached relTol, stopping.")
                break
        if log:
            log(f"ClockTime = {time.time() - t0:.1f} s.")
        return result
