"""Boundary point smoothing: classification, strings, ray cast,
end-to-end surface morphing (the reference's testcase4/5/7 pattern)."""

import jax.numpy as jnp
import numpy as np
import pytest

from smoothmesh_tpu import boundary as bps
from smoothmesh_tpu.driver import Smoother
from smoothmesh_tpu.mesh.blockmesh import hex_block
from smoothmesh_tpu.mesh.topology import compile_topology
from smoothmesh_tpu.params import SmoothingParams


def test_edge_strings_square_plus_segment():
    # A square (4 edges joined at 4 corners of valence 2) forms one
    # string; an isolated segment chain forms another.
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [2, 0, 0], [3, 0, 0], [4, 0, 0]], dtype=float)
    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 0], [4, 5], [5, 6]])
    s = bps.find_edge_strings(pts, edges)
    assert len(set(s[:4])) == 1
    assert len(set(s[4:])) == 1
    assert s[0] != s[4]


def test_edge_strings_broken_at_corners():
    # A T junction: the stem is its own string, valence-3 point breaks it
    pts = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [1, 1, 0]],
                   dtype=float)
    edges = np.array([[0, 1], [1, 2], [1, 3]])
    s = bps.find_edge_strings(pts, edges)
    assert len(set(s.tolist())) == 3  # every edge isolated by the corner


def test_project_point_to_edges_clipping():
    pts = np.array([[0, 0, 0], [1, 0, 0]], dtype=float)
    edges = np.array([[0, 1]])
    proj, dist, vert = bps.project_point_to_edges(
        np.array([0.5, 1.0, 0.0]), pts, edges, 1e-6)
    assert np.allclose(proj[0], [0.5, 0, 0])
    # beyond the end -> clipped to endpoint; the free projection is far
    # from the vertex so no coincidence is recorded (reference
    # bPS.C:129-136 tests the *unclipped* projection)
    proj, dist, vert = bps.project_point_to_edges(
        np.array([2.0, 0.0, 0.0]), pts, edges, 1e-6)
    assert np.allclose(proj[0], [1, 0, 0])
    assert vert[0] == -1
    # perpendicular above the endpoint -> free projection == vertex
    proj, dist, vert = bps.project_point_to_edges(
        np.array([1.0, 1.0, 0.0]), pts, edges, 1e-6)
    assert np.allclose(proj[0], [1, 0, 0])
    assert vert[0] == 1


def test_segment_triangle_hits():
    ta = jnp.asarray([[0.0, 0.0, 1.0]])
    tb = jnp.asarray([[4.0, 0.0, 1.0]])
    tc = jnp.asarray([[0.0, 4.0, 1.0]])
    orig = jnp.asarray([[0.5, 0.5, 0.0], [0.5, 0.5, 3.0], [10.0, 10.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 3)
    tp, tn = bps.segment_triangle_hits(orig, d, 10.0, ta, tb, tc)
    assert np.isclose(float(tp[0]), 1.0)      # hit above
    assert not np.isfinite(float(tn[0]))
    assert np.isclose(float(tn[1]), 2.0)      # hit below
    assert not np.isfinite(float(tp[2]))      # miss
    assert not np.isfinite(float(tn[2]))


def _dome_fixture():
    """Flat-top box whose top surface should morph to a dome."""
    n = 6
    m = hex_block(n=(n, n, 4),
                  patches={"top": ["zmax"],
                           "rest": ["xmin", "xmax", "ymin", "ymax",
                                    "zmin"]})

    def dome_z(x, y):
        return 1.0 + 0.25 * np.sin(np.pi * x) * np.sin(np.pi * y)

    # target surface triangles over an extended top grid
    k = 24
    xs = np.linspace(-0.2, 1.2, k)
    ys = np.linspace(-0.2, 1.2, k)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    Z = dome_z(np.clip(X, 0, 1), np.clip(Y, 0, 1))
    V = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
    tris = []
    for i in range(k - 1):
        for j in range(k - 1):
            a = i * k + j
            tris.append((a, a + k, a + 1))
            tris.append((a + 1, a + k, a + k + 1))
    tris = np.array(tris)

    # feature edges: the square border of the top at z=1 (initial and
    # target coincide there since sin vanishes on the border).  Each
    # side is an open polyline with its own endpoints, so the four
    # square corners are valence-1 edge-mesh vertices -> corners
    # (OpenFOAM valence != 2 rule), and each side is one string.
    kb = 13
    corners = [(0, 0), (1, 0), (1, 1), (0, 1)]
    bpts = []
    bedges = []
    for s in range(4):
        x0, y0 = corners[s]
        x1, y1 = corners[(s + 1) % 4]
        base = len(bpts)
        for t in np.linspace(0, 1, kb):
            bpts.append((x0 + t * (x1 - x0), y0 + t * (y1 - y0), 1.0))
        for i in range(kb - 1):
            bedges.append((base + i, base + i + 1))
    bpts = np.array(bpts)
    bedges = np.array(bedges)
    return m, dome_z, V, tris, bpts, bedges


def test_boundary_smoothing_morphs_to_dome():
    m, dome_z, V, tris, bpts, bedges = _dome_fixture()
    params = SmoothingParams(centroidal_iters=60, rel_tol=0.005,
                             smoothing_patches=("top",),
                             min_angle=15.0)
    sm = Smoother(m, params)
    setup = sm.enable_boundary_smoothing(V, tris, bpts, bedges)
    assert sm.do_boundary_smoothing
    # the 4 top corners of the mesh are corner-classified on the
    # smoothing surface (points on other patches may classify too —
    # reference-faithful — but are reverted, not snapped)
    assert (setup.is_corner & setup.is_smoothing_surface).sum() == 4
    # top border points are feature-edge points
    assert setup.is_feature_edge.sum() > 0
    assert setup.is_smoothing_surface.sum() > setup.is_feature_edge.sum()

    sm.run(log=None)
    out = sm.denormalize()

    top = np.where(setup.is_smoothing_surface & ~setup.is_feature_edge
                   & ~setup.is_corner)[0]
    assert len(top) > 0
    err = np.abs(out[top, 2] - dome_z(out[top, 0], out[top, 1]))
    err0 = np.abs(m.points[top, 2]
                  - dome_z(m.points[top, 0], m.points[top, 1]))
    # interior top points moved onto the dome surface
    assert err.max() < 0.02, (err.max(), err0.max())
    assert err.max() < 0.1 * err0.max()

    # mesh stays valid
    from smoothmesh_tpu.quality import quality_report

    q = quality_report(jnp.asarray(out), sm.td)
    assert q["n_negative_volumes"] == 0


def test_checkpoint_roundtrip_classification():
    m, dome_z, V, tris, bpts, bedges = _dome_fixture()
    params = SmoothingParams(centroidal_iters=1,
                             smoothing_patches=("top",))
    sm = Smoother(m, params)
    setup = sm.enable_boundary_smoothing(V, tris, bpts, bedges)
    ck_c = setup.is_corner.astype(np.int64)
    ck_f = setup.is_feature_edge.astype(np.int64)
    # Re-classify from the checkpoint: identical classification
    sm2 = Smoother(m, params)
    setup2 = sm2.enable_boundary_smoothing(
        V, tris, bpts, bedges, checkpoint_corner=ck_c,
        checkpoint_feature=ck_f)
    assert np.array_equal(setup.is_corner, setup2.is_corner)
    assert np.array_equal(setup.is_feature_edge, setup2.is_feature_edge)
    assert np.allclose(setup.corner_targets[setup.is_corner],
                       setup2.corner_targets[setup2.is_corner])


def test_reference_geometry_files_end_to_end_classification():
    """Run string labeling and projection machinery on the REAL
    reference testcase4 OBJ geometry (data only)."""
    import os

    base = "/root/reference/testcase4/constant/geometry"
    if not os.path.isdir(base):
        pytest.skip("reference fixtures unavailable")
    from smoothmesh_tpu.io.obj import read_obj_edges, read_obj_surface

    tv, te = read_obj_edges(os.path.join(base, "targetEdges.obj"))
    sv, st = read_obj_surface(os.path.join(base, "targetSurfaces.obj"))
    strings = bps.find_edge_strings(tv, te)
    assert strings.min() >= 0
    # the target edges form a small number of continuous strings
    n_strings = len(set(strings.tolist()))
    assert 1 <= n_strings <= 16
    # project a surface vertex onto the edges: lands within the bbox
    proj, ei, sid, vert = bps.find_closest_edge_info(
        sv[0], tv, te, strings, -1, 1e-6)
    assert np.isfinite(proj).all()
    # ray cast against the real triangle soup
    import jax.numpy as jnp

    ta = jnp.asarray(sv[st[:, 0]])
    tb = jnp.asarray(sv[st[:, 1]])
    tc = jnp.asarray(sv[st[:, 2]])
    centre = jnp.asarray(sv.mean(axis=0))[None, :]
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    tp, tn = bps.segment_triangle_hits(centre, d, 100.0, ta, tb, tc)
    # from inside the closed surface, some direction must hit
    assert np.isfinite(float(tp[0])) or np.isfinite(float(tn[0]))


def test_pallas_raycast_matches_jnp():
    """Experimental Pallas ray-cast kernel (interpret mode off-TPU)
    agrees with the XLA path."""
    from smoothmesh_tpu.ops.raycast import (pack_triangles,
                                            segment_triangle_hits_pallas)

    rng = np.random.default_rng(0)
    T = 300
    a = (rng.random((T, 3)) * 2).astype(np.float32)
    b = a + (rng.random((T, 3)) * 0.5).astype(np.float32)
    c = a + (rng.random((T, 3)) * 0.5).astype(np.float32)
    B = 500
    o = (rng.random((B, 3)) * 2).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    tpr, tnr = bps.segment_triangle_hits(
        jnp.asarray(o), jnp.asarray(d), 10.0,
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    tpp, tnp_ = segment_triangle_hits_pallas(
        o, d, 10.0, jnp.asarray(pack_triangles(a, b, c)), T)
    for ref, ours in ((tpr, tpp), (tnr, tnp_)):
        x, y = np.asarray(ref), np.asarray(ours)
        ok = ((~np.isfinite(x) & ~np.isfinite(y))
              | np.isclose(x, y, rtol=1e-4, atol=1e-6))
        assert ok.all()


def test_boundary_smoothing_float32_uses_pallas_path():
    """f32 driver exercises the Pallas ray-cast path (interpret mode on
    CPU) through the full boundary pipeline."""
    m, dome_z, V, tris, bpts, bedges = _dome_fixture()
    params = SmoothingParams(centroidal_iters=15, rel_tol=0.005,
                             smoothing_patches=("top",), min_angle=15.0)
    sm = Smoother(m, params, dtype=np.float32)
    setup = sm.enable_boundary_smoothing(V, tris, bpts, bedges)
    assert "tri_packed" in sm.bnd
    sm.run(log=None)
    out = sm.denormalize()
    top = np.where(setup.is_smoothing_surface & ~setup.is_feature_edge
                   & ~setup.is_corner)[0]
    err = np.abs(out[top, 2] - dome_z(out[top, 0], out[top, 1]))
    err0 = np.abs(m.points[top, 2]
                  - dome_z(m.points[top, 0], m.points[top, 1]))
    assert err.max() < 0.5 * err0.max()
