"""Halo-sharded tile engine (parallel/halo.py) vs the single-chip
engine path.

The halo decomposition gives every shard the complete stencil of its
owned points, so sharded results match the serial engine up to float32
summation-order noise (per-shard meshes are independently RCB-permuted,
so pool block sums associate differently) — unlike the XLA sharded
driver, whose parity tests must disable constraints where shard-local
freeze evaluation diverges (CLAUDE.md invariant).
"""

import jax
import numpy as np
import pytest

from smoothmesh_tpu.driver import Smoother
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
from smoothmesh_tpu.params import SmoothingParams
from smoothmesh_tpu.parallel.halo import HaloSmoother


def _mesh():
    return perturb(hex_block(n=(6, 6, 6), grading=(2.0, 1.0, 0.5)),
                   amplitude=0.02, seed=3)


def _run_serial(mesh, params, iters):
    sm = Smoother(mesh, params, dtype=np.float32, use_tile_engine=True)
    rs = sm.steps(iters)
    return rs, sm.denormalize()


def test_halo_matches_serial_engine_default_constraints():
    mesh = _mesh()
    params = SmoothingParams(centroidal_iters=4, rel_tol=0.0)
    rs, ref = _run_serial(mesh, params, 2)

    hs = HaloSmoother(mesh, params, n_devices=2)
    rh = hs.steps(2)
    out = hs.denormalize()

    assert len(rh) == len(rs)
    for a, b in zip(rs, rh):
        # identical freeze decisions; residual agrees to f32 noise
        assert a.n_frozen == b.n_frozen
        assert a.residual == pytest.approx(b.residual, rel=1e-4, abs=1e-5)
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 1e-5 * scale


def test_halo_freeze_free_4shards_improves_quality():
    mesh = _mesh()
    params = SmoothingParams(centroidal_iters=4, rel_tol=0.0,
                             edge_angle_constraint=False,
                             face_angle_constraint=False)
    rs, ref = _run_serial(mesh, params, 3)

    hs = HaloSmoother(mesh, params, n_devices=4)
    rh = hs.steps(3)
    out = hs.denormalize()

    for a, b in zip(rs, rh):
        assert a.n_frozen == b.n_frozen
        assert a.residual == pytest.approx(b.residual, rel=1e-4, abs=1e-5)
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 1e-5 * scale

    q = hs.quality()
    from smoothmesh_tpu import quality as qmod
    from smoothmesh_tpu.device import to_device
    from smoothmesh_tpu.mesh.topology import compile_topology

    q0 = qmod.quality_report(np.asarray(mesh.points, np.float64),
                             to_device(compile_topology(mesh)))
    assert q["min_face_angle_deg"] > q0["min_face_angle_deg"]


def test_halo_quality_per_shard_matches_global():
    """quality() assembles from per-shard claimed entities — no global
    topology compile — and must agree with the global computation."""
    from smoothmesh_tpu import quality as qmod
    from smoothmesh_tpu.device import to_device
    from smoothmesh_tpu.mesh.topology import compile_topology

    mesh = _mesh()
    params = SmoothingParams(centroidal_iters=2, rel_tol=0.0)
    hs = HaloSmoother(mesh, params, n_devices=4)
    hs.steps(2)

    topo = compile_topology(mesh)
    # claims cover every global entity exactly once
    assert int(hs.shards.claim_edge.sum()) == topo.n_edges
    assert int(hs.shards.claim_face.sum()) == topo.n_faces
    assert int(hs.shards.claim_cell.sum()) == topo.n_cells
    assert not hasattr(hs, "_global_topo")

    q = hs.quality()
    q0 = qmod.quality_report(np.asarray(hs.denormalize()),
                             to_device(topo))
    for k, v in q0.items():
        if isinstance(v, int):
            assert q[k] == v, k
        else:
            # f32 per-shard vs f64 global on identical coordinates
            assert q[k] == pytest.approx(v, rel=5e-4, abs=1e-5), k


def test_smoother_dispatches_to_halo_on_engine_request():
    mesh = _mesh()
    sm = Smoother(mesh, SmoothingParams(centroidal_iters=2, rel_tol=0.0),
                  n_devices=2, use_tile_engine=True)
    assert isinstance(sm, HaloSmoother)
    with pytest.raises(NotImplementedError):
        sm.enable_boundary_smoothing(None, None, None, None)
