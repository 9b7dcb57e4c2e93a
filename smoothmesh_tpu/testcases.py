"""Standalone equivalents of the reference's 8 testcases.

The reference generates its fixtures with OpenFOAM utilities
(blockMesh, extrude2DMesh, topoSet, createBaffles — SURVEY.md §4) and
validates with checkMesh.  Here each testcase becomes a generator
producing an equivalent mesh + parameter set exercising the same code
path; tests/test_testcases.py runs them end-to-end with
quality.check_mesh as the oracle.

Mapping (reference run_serial parameter sets):
  tc1  skewed/non-orthogonal cells + layer treatment on "def.*" patches
       (testcase: extruded 2D triangulation)
  tc2  graded blocks + layer treatment maxLayers 10 (testcase2)
  tc3  concave geometry, pure internal smoothing, -relTol 1e-8
       -minAngle 15 (testcase3)
  tc4  boundary smoothing with full OBJ trio + layers (testcase4)
  tc5  boundary smoothing + layers on ("top") (testcase5)
  tc6  thin internal wall (baffle-like) patches + layers (testcase6)
  tc7  targetEdges morphing + layers (testcase7)
  tc8  3x3x3 graded cube, default parameters, run twice (testcase8)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from smoothmesh_tpu.io.polymesh import PolyMesh
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
from smoothmesh_tpu.params import SmoothingParams


@dataclasses.dataclass
class TestCase:
    name: str
    mesh: PolyMesh
    params: SmoothingParams
    # Optional boundary-smoothing geometry: (surf_v, surf_t, init_pts,
    # init_edges, target_pts, target_edges)
    geometry: Optional[Tuple] = None
    runs: int = 1           # testcase8 runs the tool twice (restart)


def _shear(mesh: PolyMesh, fn) -> PolyMesh:
    out = PolyMesh(points=fn(mesh.points.copy()),
                   face_flat=mesh.face_flat,
                   face_offsets=mesh.face_offsets, owner=mesh.owner,
                   neighbour=mesh.neighbour, patches=mesh.patches)
    return out


def tc1() -> TestCase:
    """Skewed, sheared cells; layer treatment on def.* patches."""
    m = hex_block(n=(10, 10, 6),
                  patches={"def_bottom": ["zmin"], "def_top": ["zmax"],
                           "sides": ["xmin", "xmax", "ymin", "ymax"]})

    def warp(p):
        # shear + sinusoidal skew: non-orthogonal, skewed cells
        p[:, 0] += 0.35 * p[:, 2] + 0.08 * np.sin(2 * np.pi * p[:, 1])
        p[:, 1] += 0.15 * p[:, 2] ** 2
        return p

    m = perturb(_shear(m, warp), 0.015, seed=1)
    return TestCase("tc1", m, SmoothingParams(
        centroidal_iters=80, layer_patches=("def.*",),
        layer_max_blending_fraction=0.3))


def tc2() -> TestCase:
    """Strongly graded hex blocks; layer treatment maxLayers 10."""
    m = perturb(hex_block(n=(9, 9, 19), grading=(4.0, 0.25, 6.0),
                          patches={"walls": ["zmin"],
                                   "outer": ["xmin", "xmax", "ymin",
                                             "ymax", "zmax"]}),
                0.004, seed=2)
    return TestCase("tc2", m, SmoothingParams(
        centroidal_iters=80, layer_patches=("walls",), max_layers=10,
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
    """Thin-wall (baffle-like) internal patches: a mesh with an interior
    wall patch; layer treatment on walls + the baffle patch."""
    # Model as two stacked blocks sharing an interior boundary plane:
    # generate one block and declare its mid-plane faces a wall patch by
    # splitting the block at z=0.5 (boundary on both sides like a
    # baffle).  Approximated with a single block whose zmin plays the
    # baffle role.
    m = perturb(hex_block(n=(8, 8, 8), grading=(1.0, 1.0, 2.0),
                          patches={"walls": ["zmin", "zmax"],
                                   "baffle_x": ["xmin"],
                                   "outer": ["xmax", "ymin", "ymax"]}),
                0.02, seed=6)
    return TestCase("tc6", m, SmoothingParams(
        centroidal_iters=60, layer_patches=("walls", "baffle.*"),
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
