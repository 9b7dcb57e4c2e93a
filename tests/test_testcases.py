"""End-to-end golden scenarios mirroring the reference's 8 testcases
(SURVEY.md §4), validated with the checkMesh-equivalent oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from smoothmesh_tpu import testcases as tcs
from smoothmesh_tpu.driver import Smoother
from smoothmesh_tpu.quality import check_mesh, quality_report


def _run(tc):
    sm = Smoother(tc.mesh, tc.params)
    if tc.geometry is not None:
        V, tris, ipts, iedges, tpts, tedges = tc.geometry
        sm.enable_boundary_smoothing(V, tris, ipts, iedges, tpts, tedges)
    res = sm.run(log=None)
    return sm, res


@pytest.mark.parametrize("name", sorted(tcs.ALL))
def test_case_runs_and_mesh_valid(name):
    tc = tcs.ALL[name]()
    sm, res = _run(tc)
    out = sm.denormalize()
    assert np.isfinite(res.residual)
    before = check_mesh(jnp.asarray(
        sm.transform(tc.mesh.points).astype(np.float64)), sm.td)
    rep = check_mesh(jnp.asarray(sm.points), sm.td)
    assert rep["n_negative_volumes"] == 0, (name, rep)
    assert rep["max_non_ortho_deg"] < tc.max_non_ortho, (name, rep)
    assert rep["max_skewness"] < 4.0, (name, rep)
    if tc.require_improvement:
        assert rep["avg_non_ortho_deg"] < before["avg_non_ortho_deg"], (
            name, before["avg_non_ortho_deg"], rep["avg_non_ortho_deg"])
    # Note: centroidal smoothing may trade orthogonality for spacing
    # uniformity on graded meshes, and layer treatment trades global
    # non-ortho for layer orthogonality (the reference behaves the
    # same); validity above is the oracle, mirroring the reference's
    # checkMesh-based harness (run_tests.sh:31).

    if tc.runs > 1:
        # restart path: rebuild on the smoothed mesh and run again
        mesh2 = tc.mesh
        mesh2.points = out
        sm2 = Smoother(mesh2, tc.params)
        res2 = sm2.run(log=None)
        assert np.isfinite(res2.residual)
        # second run starts closer to converged
        assert res2.iteration <= res.iteration or res2.residual <= res.residual


@pytest.mark.parametrize(
    "name,n_devices",
    [(n, 3) for n in sorted(tcs.ALL)]
    + [("tc2", 8), ("tc3", 8), ("tc4", 8)])
def test_case_sharded_runs_and_mesh_valid(name, n_devices):
    """The reference runs every testcase under mpirun -np 3 AND serial
    (run_tests.sh:25-38); this is the mpirun leg — real testcase
    geometry x the sharded driver, validated with the same checkMesh
    oracle.  The three at 8 devices cover the stress (tc3), full
    boundary trio (tc4) and layer (tc2) pipelines at higher shard
    counts."""
    tc = tcs.ALL[name]()
    sm = Smoother(tc.mesh, tc.params, n_devices=n_devices)
    if tc.geometry is not None:
        V, tris, ipts, iedges, tpts, tedges = tc.geometry
        sm.enable_boundary_smoothing(V, tris, ipts, iedges, tpts, tedges)
    res = sm.run(log=None)
    assert np.isfinite(res.residual)
    rep = sm.quality()
    assert rep["n_negative_volumes"] == 0, (name, rep)
    assert rep["max_non_ortho_deg"] < tc.max_non_ortho, (name, rep)
    assert rep["max_skewness"] < 4.0, (name, rep)


def test_tc3_sharded_halo_engineless_quality():
    """The stress case on the HALO decomposition (engine-less float64
    path — the same configuration as the 10M-cell CPU artifact)."""
    from smoothmesh_tpu.parallel.halo import HaloSmoother

    tc = tcs.ALL["tc3"]()
    sm = HaloSmoother(tc.mesh, tc.params, n_devices=3,
                      use_tile_engine=False)
    res = sm.run(log=None)
    assert np.isfinite(res.residual)
    rep = sm.quality()
    assert rep["n_negative_volumes"] == 0
    assert rep["max_non_ortho_deg"] < tc.max_non_ortho
    assert rep["max_skewness"] < 4.0


def test_tc3_concave_improves_min_angle():
    tc = tcs.tc3()
    sm, res = _run(tc)
    before = quality_report(jnp.asarray(
        sm.transform(tc.mesh.points).astype(np.float64)), sm.td)
    after = quality_report(jnp.asarray(sm.points), sm.td)
    assert after["min_face_angle_deg"] >= before["min_face_angle_deg"] - 1e-6
    assert after["max_skewness"] <= before["max_skewness"]


def test_tc7_edges_morph_to_target():
    tc = tcs.tc7()
    sm, res = _run(tc)
    out = sm.denormalize()
    setup = sm.boundary_setup
    feat = np.where(setup.is_feature_edge & setup.is_smoothing_surface)[0]
    assert len(feat) > 0
    # feature points contracted towards the shrunk ring: their distance
    # from the centre decreased
    r_before = np.linalg.norm(tc.mesh.points[feat, :2] - 0.5, axis=1)
    r_after = np.linalg.norm(out[feat, :2] - 0.5, axis=1)
    assert (r_after < r_before - 1e-4).mean() > 0.8
