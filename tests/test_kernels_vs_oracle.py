"""Vectorized JAX kernels vs the naive numpy reference oracle.

The oracle (tests/oracle.py) is a direct loop/stack transcription of
the reference algorithms; these tests pin the TPU-native kernels to the
serial reference semantics, including the sequential face-angle freeze
propagation (checked against our parallel fixed point).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from smoothmesh_tpu import geometry as geo
from smoothmesh_tpu.device import to_device
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
from smoothmesh_tpu.mesh.topology import compile_topology
from smoothmesh_tpu.ops import (
    aspect_ratio_smoothing,
    calculate_residual,
    centroidal_smoothing,
    constrain_max_step_length,
    restrict_edge_shortening,
    restrict_face_angle_deterioration,
    restrict_min_edge_angle_decrease,
)


@pytest.fixture(scope="module")
def setup():
    m = perturb(
        hex_block(n=(4, 4, 4), grading=(3.0, 1.0, 0.3)), 0.02, seed=11
    )
    t = compile_topology(m)
    td = to_device(t)
    pts = jnp.asarray(m.points)
    ctrs = geo.cell_centres(pts, td)
    return m, t, td, pts, ctrs


def test_centroidal_matches_oracle(setup):
    m, t, td, pts, ctrs = setup
    ours = centroidal_smoothing(pts, ctrs, td, do_boundary_smoothing=False)
    ref = oracle.centroidal(t, m.points, np.asarray(ctrs), False)
    assert np.allclose(np.asarray(ours), ref, atol=1e-12)
    # boundary points stay put
    assert np.allclose(np.asarray(ours)[~t.is_internal_point],
                       m.points[~t.is_internal_point])


def test_centroidal_with_boundary_smoothing(setup):
    m, t, td, pts, ctrs = setup
    ours = centroidal_smoothing(pts, ctrs, td, do_boundary_smoothing=True)
    ref = oracle.centroidal(t, m.points, np.asarray(ctrs), True)
    assert np.allclose(np.asarray(ours), ref, atol=1e-12)


def test_aspect_ratio_matches_oracle(setup):
    m, t, td, pts, ctrs = setup
    cent = centroidal_smoothing(pts, ctrs, td, do_boundary_smoothing=False)
    ours = aspect_ratio_smoothing(pts, cent, td)
    ref = oracle.closest_points_blend(t, m.points, np.asarray(cent))
    assert np.allclose(np.asarray(ours), ref, atol=1e-12)
    # The graded mesh must actually exercise the blend somewhere
    assert np.any(np.abs(np.asarray(ours) - np.asarray(cent)) > 1e-9)


def test_step_limiter_matches_oracle(setup):
    m, t, td, pts, ctrs = setup
    cent = centroidal_smoothing(pts, ctrs, td, do_boundary_smoothing=False)
    ours = constrain_max_step_length(pts, cent, 0.01, 0.5)
    ref = oracle.step_limit(m.points, np.asarray(cent), 0.01, 0.5)
    assert np.allclose(np.asarray(ours), ref, atol=1e-14)
    # applied steps never exceed maxStepLength
    d = np.linalg.norm(np.asarray(ours) - m.points, axis=1)
    assert d.max() <= 0.01 + 1e-12


def test_edge_shortening_matches_oracle(setup):
    m, t, td, pts, ctrs = setup
    cent = centroidal_smoothing(pts, ctrs, td, do_boundary_smoothing=False)
    prop = constrain_max_step_length(pts, cent, 0.05, 0.5)
    frozen0 = jnp.zeros(t.n_points, dtype=bool)
    # Threshold above the mesh minimum edge so freezing actually occurs
    elen = np.linalg.norm(
        m.points[t.edges[:, 1]] - m.points[t.edges[:, 0]], axis=1)
    thr = 2.0 * elen.min()
    for total in (False, True):
        ours = restrict_edge_shortening(pts, prop, td, thr, total, frozen0)
        ref = oracle.edge_shortening_freeze(
            t, m.points, np.asarray(prop), thr, total,
            np.zeros(t.n_points, dtype=bool))
        assert np.array_equal(np.asarray(ours), ref)
    assert np.asarray(ours).any()  # totalMinFreeze at 2x min edge must bite


def test_edge_angle_matches_oracle(setup):
    m, t, td, pts, ctrs = setup
    cent = centroidal_smoothing(pts, ctrs, td, do_boundary_smoothing=False)
    prop = constrain_max_step_length(pts, cent, 0.05, 0.5)
    frozen0 = jnp.zeros(t.n_points, dtype=bool)
    ours = restrict_min_edge_angle_decrease(pts, prop, td, np.deg2rad(85.0),
                                            frozen0)
    ref = oracle.edge_angle_freeze(t, m.points, np.asarray(prop), 85.0,
                                   np.zeros(t.n_points, dtype=bool))
    assert np.array_equal(np.asarray(ours), ref)
    assert ref.any()


def test_face_angle_matches_oracle_stack(setup):
    m, t, td, pts, ctrs = setup
    cent = centroidal_smoothing(pts, ctrs, td, do_boundary_smoothing=False)
    prop = constrain_max_step_length(pts, cent, 0.05, 0.5)
    frozen0 = jnp.zeros(t.n_points, dtype=bool)
    # Tight angle band so the constraint bites on the perturbed mesh
    ours = restrict_face_angle_deterioration(
        pts, ctrs, prop, td, np.deg2rad(80.0), np.deg2rad(100.0), frozen0)
    ref = oracle.face_angle_freeze(
        t, m.points, np.asarray(ctrs), np.asarray(prop), 80.0, 100.0,
        np.zeros(t.n_points, dtype=bool))
    assert np.array_equal(np.asarray(ours), ref)
    assert ref.any()


def test_residual():
    pts = jnp.zeros((5, 3))
    new = pts.at[2, 0].set(0.004)
    assert np.isclose(float(calculate_residual(pts, new, 0.01)), 0.4)


def test_global_scaling_step_limit(setup):
    m, t, td, pts, ctrs = setup
    from smoothmesh_tpu.ops.smoothing import get_proposed_max_step_length

    cent = centroidal_smoothing(pts, ctrs, td, do_boundary_smoothing=False)
    gmax = float(get_proposed_max_step_length(pts, cent))
    assert gmax > 0
    out = constrain_max_step_length(pts, cent, 0.01, 0.5,
                                    do_global_scaling=True)
    # one common factor: applied steps are proportional to proposals
    step = np.asarray(out) - m.points
    prop = np.asarray(cent) - m.points
    nz = np.linalg.norm(prop, axis=1) > 1e-12
    ratio = np.linalg.norm(step[nz], axis=1) / np.linalg.norm(prop[nz],
                                                             axis=1)
    assert np.allclose(ratio, ratio[0], rtol=1e-9)
    # reference formula: scale = min(1, maxStep/(gmax*relFrac)) * relFrac
    expected = min(1.0, 0.01 / (gmax * 0.5)) * 0.5
    assert np.isclose(ratio[0], expected, rtol=1e-9)


def test_surface_centroids(setup):
    m, t, td, pts, ctrs = setup
    from smoothmesh_tpu.boundary import surface_centroids

    sums, counts = surface_centroids(pts, td)
    bnd = ~t.is_internal_point
    assert np.all(np.asarray(counts)[bnd] > 0)
    assert np.all(np.asarray(counts)[~bnd] == 0)
    # corner point of the cube: mean of its 3 boundary face centres
    c = int(np.where(bnd)[0][0])


def test_debug_stl_export(tmp_path, setup):
    m, t, td, pts, ctrs = setup
    from smoothmesh_tpu.utils import export_edges_as_stl

    pmap = np.full(t.n_points, -1)
    pmap[5] = 6
    pmap[7] = 8
    n = export_edges_as_stl(str(tmp_path / "e.stl"), m.points, pmap)
    assert n == 2
    text = (tmp_path / "e.stl").read_text()
    assert text.count("facet") == 4  # 2 facet + 2 endfacet
    assert text.startswith("solid")
