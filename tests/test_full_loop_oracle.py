"""Full-iteration driver vs oracle parity (VERDICT round-1 item 3).

Composes the loop-level numpy oracle kernels (tests/oracle.py) into a
COMPLETE reference iteration — stateful normals accumulation ->
centroidal -> aspect-ratio -> step limit -> orthogonal layer blending
-> boundary projection (corner / feature / sharp / ray cast) ->
prismatic projection -> step limit -> edge-shortening / edge-angle /
face-angle freezes -> revert -> residual — exactly the order of the
reference main loop (src/smoothMesh.C:2257-2437), and asserts parity
of point fields, freeze (revert) sets, frozen counts and residuals
against ``driver.iteration_body`` over several iterations with ALL
features enabled (layer treatment + boundary smoothing + all three
constraints + prismatic blending).

This is the test that catches driver-level ordering/state bugs that
per-kernel oracle parity cannot (e.g. mis-threaded stateful normals,
wrong constraint order, missing step-limit call sites).
"""

import math

import numpy as np

import oracle
from smoothmesh_tpu.driver import Smoother
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
from smoothmesh_tpu.params import REL_TOL, SmoothingParams


def _fixture():
    """Small dome-morph case: top patch smooths onto a curved target
    surface (testcase4 pattern) with layer treatment on the same patch
    and a perturbed interior so all three freeze constraints fire."""
    n = 5
    m = hex_block(n=(n, n, 3),
                  patches={"top": ["zmax"],
                           "rest": ["xmin", "xmax", "ymin", "ymax",
                                    "zmin"]})
    m = perturb(m, amplitude=0.03, seed=7)

    def dome_z(x, y):
        return 1.0 + 0.2 * np.sin(np.pi * x) * np.sin(np.pi * y)

    k = 14
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

    # Feature edges: four open polylines along the top border (square
    # corners become valence-1 edge-mesh vertices -> corner points).
    kb = 9
    corners = [(0, 0), (1, 0), (1, 1), (0, 1)]
    bpts, bedges = [], []
    for s in range(4):
        x0, y0 = corners[s]
        x1, y1 = corners[(s + 1) % 4]
        base = len(bpts)
        for t in np.linspace(0, 1, kb):
            bpts.append((x0 + t * (x1 - x0), y0 + t * (y1 - y0), 1.0))
        for i in range(kb - 1):
            bedges.append((base + i, base + i + 1))
    return m, V, tris, np.array(bpts), np.array(bedges)


def _oracle_iteration(topo, setup, maps, points, normals, params,
                      smoothing_surface):
    """One full reference iteration in loop-level numpy (the oracle
    composition; mirrors driver.iteration_body stage for stage)."""
    p = params
    frozen = np.zeros(topo.n_points, dtype=bool)

    # stateful normals (smoothMesh.C:2266 -> oBB.C:141, no reset)
    normals, is_sharp = oracle.accumulate_normals(topo, points, normals)

    # predictors (smoothMesh.C:2269-2280)
    cell_ctrs = oracle.cell_centres(topo, points)
    cent = oracle.centroidal(topo, points, cell_ctrs, do_boundary=True)
    prop = oracle.closest_points_blend(topo, points, cent)
    prop = oracle.step_limit(points, prop, p.max_step_length,
                             p.rel_step_frac)

    # orthogonal layer blending (smoothMesh.C:2283-2305)
    outer_coords = points[np.maximum(maps.outer_map, 0)]
    prop = oracle.blend_orthogonal(
        topo, points, prop, maps.hops_layer, normals, outer_coords,
        p.layer_max_blending_fraction, p.layer_edge_length,
        p.layer_expansion_ratio, p.min_layers, p.max_layers + 1)
    prop = oracle.step_limit(points, prop, p.max_step_length,
                             p.rel_step_frac)

    # boundary projection + prismatic projection (smoothMesh.C:2307-2356)
    max_dist = setup.distance_tolerance * (1.0 / REL_TOL) ** 4
    prop, frozen, _ = oracle.project_boundary(
        topo, setup, points, prop, normals, is_sharp, frozen, max_dist)
    prop = oracle.project_prismatic(
        topo, setup, maps, prop, normals, is_sharp, points,
        p.internal_smoothing_blending_fraction)
    prop = oracle.step_limit(points, prop, p.max_step_length,
                             p.rel_step_frac)

    # the three freeze constraints (smoothMesh.C:2359-2370)
    frozen = oracle.edge_shortening_freeze(
        topo, points, prop, p.min_edge_length, p.total_min_freeze, frozen)
    frozen = oracle.edge_angle_freeze(topo, points, prop, p.min_angle,
                                      frozen)
    frozen = oracle.face_angle_freeze(topo, points, cell_ctrs, prop,
                                      p.min_angle, p.max_angle, frozen)

    # revert + residual (smoothMesh.C:2374-2405)
    revert = frozen | (~topo.is_internal_point & ~smoothing_surface)
    new_points = np.where(revert[:, None], points, prop)
    residual = np.max(np.linalg.norm(new_points - points, axis=1)) \
        / p.max_step_length
    return new_points, normals, revert, residual


def test_full_iteration_driver_matches_oracle():
    m, V, tris, bpts, bedges = _fixture()
    # rel_step_frac=1.0 keeps the limiter CONTINUOUS at |step| ==
    # maxStepLength (reference smoothMesh.C:731-741: at the default 0.5
    # the scale jumps 0.5 -> 1.0 exactly at the threshold, and since
    # limited steps sit exactly ON the threshold at the next limiter
    # call, any 1-ulp cross-implementation difference flips the branch
    # into a 2x step difference — a property of the reference
    # algorithm, not a bug).  All limiter code paths still execute.
    params = SmoothingParams(
        centroidal_iters=5, rel_tol=0.0,
        smoothing_patches=("top",), layer_patches=("top",),
        internal_smoothing_blending_fraction=0.5,
        rel_step_frac=1.0,
        min_angle=35.0, max_angle=160.0)
    sm = Smoother(m, params, dtype=np.float64, normalize=False,
                  use_tile_engine=False)
    setup = sm.enable_boundary_smoothing(V, tris, bpts, bedges)
    assert sm.layer is not None, "layer treatment must be active"
    assert sm.do_boundary_smoothing

    topo = sm.topo
    maps = sm.layer_maps
    p = sm.params  # resolved derived defaults
    points = np.asarray(m.points, dtype=np.float64)
    normals = np.asarray(maps.normals_init, dtype=np.float64)
    smoothing_surface = np.asarray(setup.is_smoothing_surface)

    for it in range(5):
        points, normals, revert, residual = _oracle_iteration(
            topo, setup, maps, points, normals, p, smoothing_surface)
        r = sm.step()
        drv_pts = np.asarray(sm.points)
        drv_normals = np.asarray(sm.normals)

        # freeze/revert set: a reverted point's coordinates are exactly
        # its previous coordinates in both paths, so the revert masks
        # must agree point for point
        assert int(revert.sum()) == r.n_frozen, (
            f"iter {it}: oracle reverted {int(revert.sum())}, "
            f"driver froze {r.n_frozen}")
        assert np.allclose(drv_pts, points, rtol=1e-9, atol=1e-9), (
            f"iter {it}: max point drift "
            f"{np.abs(drv_pts - points).max():.3e}")
        assert np.allclose(drv_normals, normals, rtol=1e-9, atol=1e-9), (
            f"iter {it}: stateful normals diverged "
            f"{np.abs(drv_normals - normals).max():.3e}")
        assert math.isclose(residual, r.residual, rel_tol=1e-8,
                            abs_tol=1e-12), (it, residual, r.residual)

    # the loop actually did something: points moved and some froze
    assert np.abs(points - m.points).max() > 1e-4
