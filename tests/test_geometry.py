"""Geometry kernels vs analytic values (OpenFOAM centroid conventions)."""

import jax.numpy as jnp
import numpy as np

from smoothmesh_tpu import geometry as geo
from smoothmesh_tpu.device import to_device
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
from smoothmesh_tpu.mesh.topology import compile_topology


def _geo(mesh):
    t = compile_topology(mesh)
    td = to_device(t)
    pts = jnp.asarray(mesh.points)
    fg = geo.face_centres_areas(pts, td["face_points"],
                                td["face_points_next"], td["face_mask"],
                                td["face_npoints"])
    ctrs, vols = geo.cell_centres_vols(fg, td["owner"], td["cell_faces"],
                                       td["cell_faces_mask"])
    return t, td, pts, fg, ctrs, vols


def test_uniform_cube():
    m = hex_block(n=(2, 2, 2))
    t, td, pts, fg, ctrs, vols = _geo(m)
    assert np.allclose(vols, 0.125)
    assert np.allclose(fg.mags, 0.25)
    assert np.allclose(np.sort(np.asarray(ctrs)[:, 0]),
                       [0.25] * 4 + [0.75] * 4)


def test_total_volume_invariant_under_perturbation():
    m = perturb(hex_block(n=(4, 4, 4)), 0.04, seed=3)
    t, td, pts, fg, ctrs, vols = _geo(m)
    # Interior point movement redistributes but conserves total volume
    assert np.isclose(np.sum(np.asarray(vols)), 1.0, rtol=1e-10)
    assert np.all(np.asarray(vols) > 0)


def _naive_openfoam_geometry(mesh):
    """Straightforward per-face loops implementing the OpenFOAM
    primitiveMesh centroid algorithm — the spec our vectorized kernels
    must match bit-for-bit (up to summation order)."""
    pts = mesh.points
    F = mesh.n_faces
    f_ctr = np.zeros((F, 3))
    f_area = np.zeros((F, 3))
    for f in range(F):
        fp = mesh.face_points(f)
        n = len(fp)
        centre = pts[fp].mean(axis=0)
        sum_n = np.zeros(3)
        sum_a = 0.0
        sum_ac = np.zeros(3)
        for k in range(n):
            a = pts[fp[k]]
            b = pts[fp[(k + 1) % n]]
            nv = np.cross(b - a, centre - a)
            ar = np.linalg.norm(nv)
            sum_n += nv
            sum_a += ar
            sum_ac += ar * (a + b + centre)
        f_ctr[f] = sum_ac / (3 * sum_a) if sum_a > 1e-18 else centre
        f_area[f] = 0.5 * sum_n
    C = mesh.n_cells
    c_est = np.zeros((C, 3))
    n_cf = np.zeros(C)
    own = mesh.owner
    nei = mesh.neighbour
    for f in range(F):
        c_est[own[f]] += f_ctr[f]
        n_cf[own[f]] += 1
    for f in range(len(nei)):
        c_est[nei[f]] += f_ctr[f]
        n_cf[nei[f]] += 1
    c_est /= n_cf[:, None]
    ctr = np.zeros((C, 3))
    vol3 = np.zeros(C)
    for f in range(F):
        pv = np.dot(f_area[f], f_ctr[f] - c_est[own[f]])
        pc = 0.75 * f_ctr[f] + 0.25 * c_est[own[f]]
        ctr[own[f]] += pv * pc
        vol3[own[f]] += pv
    for f in range(len(nei)):
        pv = np.dot(f_area[f], c_est[nei[f]] - f_ctr[f])
        pc = 0.75 * f_ctr[f] + 0.25 * c_est[nei[f]]
        ctr[nei[f]] += pv * pc
        vol3[nei[f]] += pv
    ctr /= vol3[:, None]
    return f_ctr, f_area, ctr, vol3 / 3.0


def test_skewed_mesh_matches_naive_openfoam_algorithm():
    m = perturb(hex_block(n=(3, 3, 3), grading=(2.0, 1.0, 0.5)), 0.03, seed=7)
    t, td, p, fg, ctrs, vols = _geo(m)
    f_ctr, f_area, n_ctr, n_vol = _naive_openfoam_geometry(m)
    assert np.allclose(np.asarray(fg.centres), f_ctr, atol=1e-12)
    assert np.allclose(np.asarray(fg.areas), f_area, atol=1e-12)
    assert np.allclose(np.asarray(ctrs), n_ctr, atol=1e-12)
    assert np.allclose(np.asarray(vols), n_vol, atol=1e-12)
    # Pyramid-decomposition volumes are exact: totals must be conserved
    assert np.isclose(np.asarray(vols).sum(), 1.0, rtol=1e-10)


def test_boundary_point_normals_cube():
    m = hex_block(n=(2, 2, 2))
    t, td, pts, fg, ctrs, vols = _geo(m)
    n, sharp, nf = geo.boundary_point_normals(pts, td)
    n = np.asarray(n)
    assert np.allclose(n[0], np.ones(3) / np.sqrt(3))   # corner, inward
    assert np.allclose(n[4], [0, 0, 1])                  # zmin side centre
    assert nf[13] == 0 and np.allclose(n[13], 0)         # internal point
    assert not np.any(np.asarray(sharp))


def test_checkmesh_aspect_openness_pyramids_cube():
    """OpenFOAM checkMesh's closedness / aspect-ratio / face-pyramid
    metrics (primitiveMeshCheck) on an analytic cube lattice: aspect
    ratio exactly 1, perfectly closed cells, pyramid volume =
    face_area * (spacing/2) / 3."""
    from smoothmesh_tpu.quality import check_mesh, quality_report

    m = hex_block(n=(4, 4, 4))          # 0.25-edge cubes
    td = to_device(compile_topology(m))
    rep = quality_report(jnp.asarray(m.points), td)
    assert abs(rep["max_aspect_ratio"] - 1.0) < 1e-12
    assert rep["max_cell_openness"] < 1e-12
    expected_pyr = 0.25 ** 2 * 0.125 / 3.0
    assert abs(rep["min_pyramid_volume"] - expected_pyr) < 1e-12
    assert check_mesh(jnp.asarray(m.points), td)["ok"]

    # a collapsed cell flips a pyramid negative and fails the verdict
    bad = m.points.copy()
    # push one interior point through the opposite face of its cell
    interior = np.where(
        (np.abs(bad - 0.5).max(axis=1) < 0.26)
        & (np.abs(bad - 0.5).max(axis=1) > 0.2))[0]
    bad[interior[0]] += 0.4
    rep2 = check_mesh(jnp.asarray(bad), td)
    assert rep2["min_pyramid_volume"] < 0.0
    assert not rep2["ok"]
