"""End-to-end smoothing: the framework's equivalents of the reference
testcases (SURVEY.md §4), with quality_report as the checkMesh oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from smoothmesh_tpu.device import to_device
from smoothmesh_tpu.driver import Smoother
from smoothmesh_tpu.io import write_polymesh
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
from smoothmesh_tpu.mesh.topology import compile_topology
from smoothmesh_tpu.params import SmoothingParams
from smoothmesh_tpu.quality import check_mesh, quality_report


@pytest.fixture(scope="module")
def smoothed():
    mesh = perturb(hex_block(n=(6, 6, 6), grading=(2.0, 1.0, 0.5)),
                   0.03, seed=5)
    params = SmoothingParams(centroidal_iters=60, rel_tol=0.02)
    sm = Smoother(mesh, params)
    result = sm.run(log=None)
    return mesh, sm, result


def test_converges_and_improves_quality(smoothed):
    mesh, sm, result = smoothed
    topo = sm.topo
    td = sm.td
    before = quality_report(jnp.asarray(mesh.points), td)
    after = quality_report(jnp.asarray(sm.denormalize()), td)
    assert result.residual < 0.05  # monotone decay towards relTol
    assert after["min_face_angle_deg"] > before["min_face_angle_deg"]
    assert after["max_non_ortho_deg"] < before["max_non_ortho_deg"]
    assert after["max_skewness"] < before["max_skewness"]
    assert after["n_negative_volumes"] == 0
    assert check_mesh(jnp.asarray(sm.denormalize()), td)["ok"]


def test_boundary_points_fixed(smoothed):
    mesh, sm, result = smoothed
    out = sm.denormalize()
    bnd = ~sm.topo.is_internal_point
    assert np.allclose(out[bnd], mesh.points[bnd], atol=1e-9)


def test_frozen_count_matches_boundary(smoothed):
    mesh, sm, result = smoothed
    # Internal smoothing with loose constraints: frozen = all boundary
    assert result.n_frozen >= int((~sm.topo.is_internal_point).sum())


def test_float32_normalized_tiny_scale():
    """testcase8-style absolute scale (1e-8 m): normalization keeps f32
    viable — volumes positive, quality improves."""
    g = [(0.333333, 1.50895, 1.14286), (0, 0, 1), (1.66667, 4.73843, 0.375)]
    mesh = perturb(
        hex_block(p_min=(-1, -1, -1), p_max=(1, 1, 1), n=(4, 4, 4),
                  grading=(g, g, g), patches="default", scale=1e-8),
        0.1e-8, seed=2)
    params = SmoothingParams(centroidal_iters=25)
    sm = Smoother(mesh, params, dtype=np.float32)
    sm.run(log=None)
    out = sm.denormalize()
    td = sm.td
    q = quality_report(jnp.asarray(out), td)
    assert q["n_negative_volumes"] == 0
    assert np.isclose(q["total_volume"], (2e-8) ** 3, rtol=1e-4)


def test_cli_end_to_end(tmp_path):
    import subprocess
    import sys

    case = tmp_path / "case"
    (case / "system").mkdir(parents=True)
    (case / "system" / "controlDict").write_text("deltaT 1;\n")
    mesh = perturb(hex_block(n=(4, 4, 4)), 0.03, seed=9)
    write_polymesh(str(case / "constant" / "polyMesh"), mesh)

    from smoothmesh_tpu.cli import main

    rc = main(["-case", str(case), "-centroidalIters", "10",
               "-writeInterval", "5"])
    assert rc == 0
    # Written at convergence or at centroidalIters, whichever first
    times = sorted(
        (d for d in case.iterdir()
         if d.is_dir() and d.name.replace(".", "").isdigit()),
        key=lambda d: float(d.name))
    assert times, "no time directory written"
    out_dir = times[-1] / "polyMesh"
    assert (out_dir / "points").exists()
    from smoothmesh_tpu.io import read_polymesh

    out = read_polymesh(str(out_dir))
    assert out.n_points == mesh.n_points
    assert not np.allclose(out.points, mesh.points)  # something moved
