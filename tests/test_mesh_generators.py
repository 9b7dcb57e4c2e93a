"""Unit tests for the fixture-geometry generators (VERDICT r1 item 4):
extrude2DMesh equivalent, multi-block blockMesh, createBaffles+split.
"""

import os

import jax.numpy as jnp
import numpy as np

from smoothmesh_tpu.device import to_device
from smoothmesh_tpu.mesh.blockmesh import hex_block
from smoothmesh_tpu.mesh.extrude import create_baffles, extrude_triangulation
from smoothmesh_tpu.mesh.multiblock import multi_block, sphere_projector
from smoothmesh_tpu.mesh.topology import compile_topology
from smoothmesh_tpu.quality import quality_report
from smoothmesh_tpu import testcases as tcs


def _quality(mesh):
    return quality_report(jnp.asarray(mesh.points),
                          to_device(compile_topology(mesh)))


def test_extrude_triangulation_basic():
    # two triangles -> prisms; every boundary face in a box patch or
    # the default patch
    V = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]], float)
    T = np.array([[0, 1, 2], [0, 2, 3]])
    m = extrude_triangulation(V, T, direction=(0, 1, 0), thickness=0.5,
                              n_layers=2,
                              patch_boxes=[("front", (-9, 0.49, -9),
                                            (9, 0.51, 9))])
    assert m.n_cells == 4
    # 1 interior edge x 2 layers + 1 horizontal pair = 4 internal faces
    assert m.n_internal_faces == 4
    names = {p.name: p.n_faces for p in m.patches}
    assert names["front"] == 2          # extruded end triangles
    assert names["defaultFaces"] == 2 + 4 * 2   # back tris + side quads
    q = _quality(m)
    assert q["n_negative_volumes"] == 0


def test_extrude_orientation_insensitive():
    # flipped triangle windings produce the identical valid mesh
    V = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]], float)
    T1 = np.array([[0, 1, 2], [0, 2, 3]])
    T2 = np.array([[0, 2, 1], [0, 3, 2]])
    m1 = extrude_triangulation(V, T1, n_layers=2, thickness=0.5)
    m2 = extrude_triangulation(V, T2, n_layers=2, thickness=0.5)
    assert m1.n_cells == m2.n_cells
    assert _quality(m2)["n_negative_volumes"] == 0


def test_multi_block_merges_shared_faces():
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                      [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
                      [2, 0, 0], [2, 1, 0], [2, 0, 1], [2, 1, 1]],
                     float)
    blocks = [(0, 1, 2, 3, 4, 5, 6, 7), (1, 8, 9, 2, 5, 10, 11, 6)]
    m = multi_block(verts, blocks, [(2, 2, 2), (2, 2, 2)],
                    patches=[("left", "patch", [(0, 4, 7, 3)])])
    # shared face points merged: 3*3 twice-counted lattice plane
    assert m.n_points == 45  # 5x3x3
    assert m.n_cells == 16
    # the shared block face became internal faces (4 of them)
    q = _quality(m)
    assert q["n_negative_volumes"] == 0
    names = {p.name: p.n_faces for p in m.patches}
    assert names["left"] == 4
    assert names["defaultFaces"] == 40 - 4


def test_multi_block_sphere_projection():
    proj = sphere_projector(1.0)
    tc = tcs.tc2()
    m = tc.mesh
    # wall_sphere patch faces lie on the unit sphere
    p = next(p for p in m.patches if p.name == "wall_sphere")
    ids = set()
    for f in range(p.start_face, p.start_face + p.n_faces):
        ids.update(m.face_flat[m.face_offsets[f]: m.face_offsets[f + 1]])
    r = np.linalg.norm(m.points[sorted(ids)], axis=1)
    assert np.allclose(r, 1.0, atol=1e-9)
    assert _quality(m)["n_negative_volumes"] == 0


def test_create_baffles_splits_interior_points():
    m = hex_block(n=(6, 6, 6))
    offs = m.face_offsets
    fc = np.stack([m.points[m.face_flat[offs[f]: offs[f + 1]]].mean(0)
                   for f in range(m.n_internal_faces)])
    sel = np.where((np.abs(fc[:, 2] - 0.5) < 1e-9)
                   & (fc[:, 0] > 0.2) & (fc[:, 0] < 0.8)
                   & (fc[:, 1] > 0.2) & (fc[:, 1] < 0.8))[0]
    assert len(sel) == 16               # 4x4 face patch
    m2 = create_baffles(m, sel)
    # 3x3 interior lattice points duplicated; rim stays shared
    assert m2.n_points == m.n_points + 9
    assert m2.n_internal_faces == m.n_internal_faces - 16
    names = {p.name: p.n_faces for p in m2.patches}
    assert names["baffle"] == 16 and names["baffle_slave"] == 16
    q = _quality(m2)
    assert q["n_negative_volumes"] == 0
    # baffle points are boundary points now
    topo = compile_topology(m2)
    bafstart = next(p.start_face for p in m2.patches
                    if p.name == "baffle")
    bpts = set(m2.face_flat[m2.face_offsets[bafstart]:])
    assert not topo.is_internal_point[sorted(bpts)].any()


def test_tc1_uses_reference_surface_when_available():
    tc = tcs.tc1(n_layers=2)
    names = [p.name for p in tc.mesh.patches]
    assert "defaultFaces" in names      # interior hole walls
    if os.path.exists(os.path.join(tcs.REFERENCE_DIR, "testcase",
                                   "MeshedSurface.obj")):
        assert tc.mesh.n_cells == 1225 * 2
    assert _quality(tc.mesh)["n_negative_volumes"] == 0
