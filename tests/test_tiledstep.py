"""Fused tile stages vs the XLA reference implementations (f32)."""

import numpy as np
import pytest

import jax.numpy as jnp

from smoothmesh_tpu import geometry as geo
from smoothmesh_tpu.device import to_device
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb, prism_block
from smoothmesh_tpu.mesh.tiling import permute_mesh
from smoothmesh_tpu.mesh.topology import compile_topology
from smoothmesh_tpu.ops.tiled import from_planar, to_planar
from smoothmesh_tpu.ops.tiledstep import TiledEngine


def _setup(mesh):
    new_mesh, _ = permute_mesh(mesh)
    topo = compile_topology(new_mesh)
    td = to_device(topo)
    pts = jnp.asarray(new_mesh.points, jnp.float32)
    eng = TiledEngine(topo, interpret=True)
    return topo, td, pts, eng


MESHES = [
    perturb(hex_block(n=(14, 12, 10)), amplitude=0.05, seed=5),
    perturb(prism_block(n=(8, 8, 6)), amplitude=0.04, seed=6),
]


@pytest.mark.parametrize("mesh", MESHES, ids=["hex", "prism"])
def test_face_geometry_matches_xla(mesh):
    topo, td, pts, eng = _setup(mesh)
    fg = geo.face_centres_areas(pts, td["face_points"],
                                td["face_points_next"], td["face_mask"],
                                td["face_npoints"])
    geom6, vm3 = eng.face_geometry(eng.arrays, to_planar(pts))
    fc = from_planar(geom6[:3], topo.n_faces)
    fa = from_planar(geom6[3:6], topo.n_faces)
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fg.centres),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fg.areas),
                               rtol=0, atol=2e-6)
    # vertex means
    m = td["face_mask"][..., None]
    vm_ref = (pts[td["face_points"]] * m).sum(1) / \
        td["face_npoints"].astype(jnp.float32)[:, None]
    np.testing.assert_allclose(
        np.asarray(from_planar(vm3, topo.n_faces)), np.asarray(vm_ref),
        rtol=0, atol=2e-6)


@pytest.mark.parametrize("mesh", MESHES, ids=["hex", "prism"])
def test_cell_centres_match_xla(mesh):
    topo, td, pts, eng = _setup(mesh)
    cc_ref = geo.cell_centres(pts, td)
    cc = eng.cell_centres_dense(pts)
    np.testing.assert_allclose(np.asarray(cc), np.asarray(cc_ref),
                               rtol=0, atol=5e-6)


@pytest.mark.parametrize("mesh", MESHES, ids=["hex", "prism"])
@pytest.mark.parametrize("do_boundary", [False, True])
def test_predictor_matches_xla(mesh, do_boundary):
    from smoothmesh_tpu.ops import smoothing as sm

    topo, td, pts, eng = _setup(mesh)
    cc = geo.cell_centres(pts, td)
    cent = sm.centroidal_smoothing(pts, cc, td, do_boundary)
    prop = sm.aspect_ratio_smoothing(pts, cent, td)
    max_step, rsf = 0.013, 0.5
    prop = sm.constrain_max_step_length(pts, prop, max_step, rsf)

    out4 = eng.predictor(
        eng.arrays, eng.pts4(pts),
        eng.cell_centres_vols(
            eng.arrays, eng.face_geometry(eng.arrays,
                                          to_planar(pts))[0]),
        max_step, rsf, do_boundary)
    got = from_planar(out4[:3], topo.n_points)
    np.testing.assert_allclose(np.asarray(got), np.asarray(prop),
                               rtol=0, atol=3e-6)
    # curmin = min current edge length per point
    rel = pts[td["point_points"]] - pts[:, None, :]
    L = jnp.linalg.norm(rel, axis=-1)
    curmin = jnp.min(jnp.where(td["point_points_mask"], L, jnp.inf),
                     axis=1)
    got_min = from_planar(out4[3:4], topo.n_points)[:, 0]
    np.testing.assert_allclose(np.asarray(got_min), np.asarray(curmin),
                               rtol=0, atol=3e-6)


@pytest.mark.parametrize("mesh", MESHES, ids=["hex", "prism"])
@pytest.mark.parametrize("tmf", [False, True])
def test_freeze_constraints_match_xla(mesh, tmf):
    import math

    from smoothmesh_tpu.ops import constraints as con
    from smoothmesh_tpu.ops import smoothing as sm

    topo, td, pts, eng = _setup(mesh)
    cc = geo.cell_centres(pts, td)
    cent = sm.centroidal_smoothing(pts, cc, td, False)
    prop = sm.aspect_ratio_smoothing(pts, cent, td)
    prop = sm.constrain_max_step_length(pts, prop, 0.02, 0.5)

    min_edge = 0.04
    min_angle = math.radians(35.0)
    frozen0 = jnp.zeros(topo.n_points, dtype=bool)
    want = con.restrict_edge_shortening(pts, prop, td, min_edge, tmf,
                                        frozen0)
    want = con.restrict_min_edge_angle_decrease(pts, prop, td,
                                               min_angle, want)

    p4 = eng.pts4(pts)
    prop4 = jnp.concatenate(
        [to_planar(prop.astype(jnp.float32)),
         jnp.zeros((1, to_planar(prop).shape[1]), jnp.float32)], axis=0)
    fz = eng.freeze_constraints(
        eng.arrays, p4, prop4,
        jnp.zeros((1, p4.shape[1]), jnp.float32),
        min_edge, tmf, min_angle, True)
    got = from_planar(fz, topo.n_points)[:, 0] > 0.5
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("mesh", MESHES, ids=["hex", "prism"])
def test_face_angles_per_point_match_xla(mesh):
    from smoothmesh_tpu.ops import constraints as con

    topo, td, pts, eng = _setup(mesh)
    cc = geo.cell_centres(pts, td)
    want_min, want_max = con.current_face_angles_per_point(pts, cc, td)

    pp = to_planar(pts)
    geom6, vm3 = eng.face_geometry(eng.arrays, pp)
    cc4 = eng.cell_centres_vols(eng.arrays, geom6)
    from smoothmesh_tpu.ops.tiledstep import u_to_angle

    u_min, u_max = eng.face_angles_per_point(
        eng.arrays, eng.pts4(pts), vm3, cc4)
    got_min, got_max = u_to_angle(u_min), u_to_angle(u_max)
    # the u-space (cosine-pair) representation loses precision where
    # the angle approaches pi (d acos / d cos -> inf) — far from the
    # 35/160 degree freeze thresholds; 4e-4 rad bounds the drift there
    np.testing.assert_allclose(np.asarray(got_min), np.asarray(want_min),
                               rtol=0, atol=4e-4)
    np.testing.assert_allclose(np.asarray(got_max), np.asarray(want_max),
                               rtol=0, atol=4e-4)


def test_full_loop_tile_vs_xla():
    """driver.Smoother with the tile engine tracks the XLA path over a
    multi-iteration run (f32, interpret mode).

    Face-angle freeze decisions on evaluations within float32 noise of
    "no deterioration" are inherently path-dependent (the XLA path
    compares bit-identical values; the tile path compares values from
    two code paths with an epsilon guard, see constraints.det_eps) —
    individually-frozen point sets may differ slightly and trajectories
    then diverge point-wise, so parity is asserted on the aggregate
    trajectory (residuals, freeze counts) and final mesh quality.
    """
    from smoothmesh_tpu import quality
    from smoothmesh_tpu.device import to_device
    from smoothmesh_tpu.driver import Smoother
    from smoothmesh_tpu.params import SmoothingParams

    mesh = perturb(hex_block(n=(10, 8, 8)), amplitude=0.06, seed=7)
    params = SmoothingParams(centroidal_iters=4, rel_tol=0.0)

    sm_x = Smoother(mesh, params, dtype=np.float32,
                    use_tile_engine=False)
    sm_t = Smoother(mesh, params, dtype=np.float32,
                    use_tile_engine=True)
    assert sm_t.engine is not None
    for _ in range(4):
        rx = sm_x.step()
        rt = sm_t.step()
        assert abs(rx.residual - rt.residual) < 2e-3
        assert abs(rx.n_frozen - rt.n_frozen) <= 0.1 * rx.n_frozen + 10
    qx = sm_x.quality()
    qt = sm_t.quality()
    for k in ("min_face_angle_deg", "max_face_angle_deg",
              "min_edge_length", "max_skewness"):
        np.testing.assert_allclose(qt[k], qx[k], rtol=0.03, atol=0.5)
    # the tile run must produce a valid improving mesh
    assert qt["n_negative_volumes"] == 0
