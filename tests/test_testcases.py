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
