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
    geom6, vm3 = eng.face_geometry(to_planar(pts))
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
