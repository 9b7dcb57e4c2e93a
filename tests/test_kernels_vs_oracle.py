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


def test_face_angle_sweep_paths_agree(setup, monkeypatch):
    """The list-driven fast dirty sweep and the mask-based fallback
    must both reproduce the oracle stack closure (the cap decides which
    path a sweep takes; cap=1 forces the mask-based sweep whenever more
    than one point froze in the previous sweep)."""
    m, t, td, pts, ctrs = setup
    cent = centroidal_smoothing(pts, ctrs, td, do_boundary_smoothing=False)
    prop = constrain_max_step_length(pts, cent, 0.05, 0.5)
    frozen0 = jnp.zeros(t.n_points, dtype=bool)
    ref = oracle.face_angle_freeze(
        t, m.points, np.asarray(ctrs), np.asarray(prop), 80.0, 100.0,
        np.zeros(t.n_points, dtype=bool))
    outs = []
    for cap in ("1", "32768"):
        monkeypatch.setenv("SMOOTHMESH_FA_DIRTY_CAP", cap)
        ours = restrict_face_angle_deterioration(
            pts, ctrs, prop, td, np.deg2rad(80.0), np.deg2rad(100.0),
            frozen0)
        outs.append(np.asarray(ours))
        assert np.array_equal(outs[-1], ref)
    assert np.array_equal(outs[0], outs[1])


def test_face_angle_combined_pass_matches_oracle(setup, monkeypatch):
    """SMOOTHMESH_FA_COMBINED=1 (single eval pass computing pair + self
    bits, with list-driven re-eval of edges whose endpoint self-froze)
    must be bit-identical to the two-pass default and the oracle, on
    both the fast re-eval path and the mask-based fallback (cap=1
    forces the fallback whenever >1 point self-froze)."""
    m, t, td, pts, ctrs = setup
    cent = centroidal_smoothing(pts, ctrs, td, do_boundary_smoothing=False)
    prop = constrain_max_step_length(pts, cent, 0.05, 0.5)
    frozen0 = jnp.zeros(t.n_points, dtype=bool)
    ref = oracle.face_angle_freeze(
        t, m.points, np.asarray(ctrs), np.asarray(prop), 80.0, 100.0,
        np.zeros(t.n_points, dtype=bool))
    monkeypatch.setenv("SMOOTHMESH_FA_COMBINED", "1")
    # the tiny first-pass chunk forces the chunked while-loop to take
    # multiple steps (covers SMOOTHMESH_FA_FIRST_CHUNK < E_active)
    monkeypatch.setenv("SMOOTHMESH_FA_FIRST_CHUNK", "64")
    for cap in ("1", "32768"):
        monkeypatch.setenv("SMOOTHMESH_FA_DIRTY_CAP", cap)
        ours = restrict_face_angle_deterioration(
            pts, ctrs, prop, td, np.deg2rad(80.0), np.deg2rad(100.0),
            frozen0)
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


@pytest.fixture(scope="module")
def prism_setup():
    from smoothmesh_tpu.mesh.blockmesh import prism_block

    m = prism_block(n=(4, 3, 3))
    rng = np.random.default_rng(21)
    disp = rng.uniform(-0.02, 0.02, m.points.shape)
    from smoothmesh_tpu.mesh.topology import boundary_point_mask

    disp[boundary_point_mask(m)] = 0
    m.points = m.points + disp
    t = compile_topology(m)
    td = to_device(t)
    pts = jnp.asarray(m.points)
    ctrs = geo.cell_centres(pts, td)
    return m, t, td, pts, ctrs


def test_prism_mesh_all_kernels_match_oracle(prism_setup):
    """Mixed tri+quad faces and 5-faced prisms through every kernel —
    the polyhedral (non-hex) code path the reference supports."""
    m, t, td, pts, ctrs = prism_setup
    cent = centroidal_smoothing(pts, ctrs, td, do_boundary_smoothing=False)
    ref_c = oracle.centroidal(t, m.points, np.asarray(ctrs), False)
    assert np.allclose(np.asarray(cent), ref_c, atol=1e-12)

    ar = aspect_ratio_smoothing(pts, cent, td)
    ref_ar = oracle.closest_points_blend(t, m.points, np.asarray(cent))
    assert np.allclose(np.asarray(ar), ref_ar, atol=1e-12)

    prop = constrain_max_step_length(pts, ar, 0.05, 0.5)
    fr0 = jnp.zeros(t.n_points, dtype=bool)

    ours = restrict_edge_shortening(pts, prop, td, 0.2, False, fr0)
    ref = oracle.edge_shortening_freeze(t, m.points, np.asarray(prop),
                                        0.2, False,
                                        np.zeros(t.n_points, bool))
    assert np.array_equal(np.asarray(ours), ref)

    ours = restrict_min_edge_angle_decrease(pts, prop, td,
                                            np.deg2rad(44.0), fr0)
    ref = oracle.edge_angle_freeze(t, m.points, np.asarray(prop), 44.0,
                                   np.zeros(t.n_points, bool))
    assert np.array_equal(np.asarray(ours), ref)
    assert ref.any()  # prism diagonals sit near 45 deg

    ours = restrict_face_angle_deterioration(
        pts, ctrs, prop, td, np.deg2rad(50.0), np.deg2rad(130.0), fr0)
    ref = oracle.face_angle_freeze(t, m.points, np.asarray(ctrs),
                                   np.asarray(prop), 50.0, 130.0,
                                   np.zeros(t.n_points, bool))
    assert ref.any()
    # Freeze decisions may differ only at exact numerical ties: the
    # kernel computes substituted face centres as corrections on the
    # base means (mathematically equal, ULP-different), and the
    # reference's strict < comparisons are equally arbitrary at a tie.
    diff = np.where(np.asarray(ours) != ref)[0]
    from smoothmesh_tpu.ops.constraints import (
        current_face_angles_per_point, simple_face_centres)

    fc_base = simple_face_centres(pts, td)
    cmn, cmx = current_face_angles_per_point(pts, ctrs, td,
                                             fc_base=fc_base)
    small, large = np.deg2rad(50.0), np.deg2rad(130.0)
    prop_np = np.asarray(prop)
    ctrs_np = np.asarray(ctrs)
    for q in diff:
        # a near-tie must exist among the oracle evaluations that could
        # freeze q (its own self test or a pair test from a neighbour)
        margins = []
        mn, mx = oracle._minmax_face_angle_point(
            t, m.points, ctrs_np, int(q), {int(q): prop_np[q]})
        margins += [abs(mn - small), abs(mn - float(cmn[q])),
                    abs(mx - large), abs(mx - float(cmx[q]))]
        for x in t.point_points[q][t.point_points_mask[q]]:
            for xc in (prop_np[x], m.points[x]):
                mn, mx = oracle._minmax_face_angle_point(
                    t, m.points, ctrs_np, int(x),
                    {int(x): xc, int(q): prop_np[q]})
                margins += [abs(mn - small), abs(mn - float(cmn[x])),
                            abs(mx - large), abs(mx - float(cmx[x]))]
        assert min(margins) < 1e-9, (q, min(margins))


def test_prism_mesh_smooths_validly(prism_setup):
    from smoothmesh_tpu.driver import Smoother
    from smoothmesh_tpu.params import SmoothingParams
    from smoothmesh_tpu.quality import check_mesh

    m, t, td, pts, ctrs = prism_setup
    sm = Smoother(m, SmoothingParams(centroidal_iters=30, min_angle=30.0))
    r = sm.run(log=None)
    assert np.isfinite(r.residual)
    rep = check_mesh(jnp.asarray(sm.points), sm.td)
    assert rep["n_negative_volumes"] == 0
