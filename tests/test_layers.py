"""Boundary-layer treatment (orthogonal boundary blending) tests."""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from smoothmesh_tpu import geometry as geo
from smoothmesh_tpu import layers as lay
from smoothmesh_tpu.device import to_device
from smoothmesh_tpu.driver import Smoother
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
from smoothmesh_tpu.mesh.topology import compile_topology
from smoothmesh_tpu.params import SmoothingParams


@pytest.fixture(scope="module")
def layered():
    m = perturb(
        hex_block(n=(5, 5, 6), grading=(1.0, 1.0, 3.0),
                  patches={"walls": ["zmin"],
                           "outer": ["xmin", "xmax", "ymin", "ymax",
                                     "zmax"]}),
        0.02, seed=4)
    t = compile_topology(m)
    td = to_device(t)
    return m, t, td


def test_hops_match_oracle(layered):
    m, t, td = layered
    is_conn = lay.connected_to_internal(t)
    ids = t.patch_ids_matching(["walls"])
    for max_iter in (2, 5):
        ours = lay.point_hops_to_boundary(t, ids, is_conn, max_iter)
        seed = lay.patch_point_mask(t, ids)
        ref = oracle.point_hops(t, seed, is_conn, max_iter)
        assert np.array_equal(ours, ref)
    # walls points are 0; top interior points got larger hop counts
    assert ours.max() >= 3


def test_outer_maps_match_oracle(layered):
    m, t, td = layered
    pts = jnp.asarray(m.points)
    bn, sharp, _ = geo.boundary_point_normals(pts, td)
    maps = lay.build_layer_maps(t, np.asarray(bn), np.asarray(sharp),
                                t.patch_ids_matching(["walls"]),
                                t.patch_ids_matching([".*"]), max_layers=4)
    seed = lay.patch_point_mask(t, t.patch_ids_matching(["walls"]))
    hops_ref = oracle.point_hops(t, seed, lay.connected_to_internal(t), 5)
    omap_ref, normals_ref = oracle.propagate_outer(
        t, np.asarray(bn), maps.layer_surface, hops_ref, 5)
    assert np.array_equal(maps.outer_map, omap_ref)
    assert np.allclose(maps.normals_init, normals_ref, atol=1e-12)
    assert (maps.outer_map >= 0).sum() > 0


def test_blend_matches_oracle(layered):
    m, t, td = layered
    pts = jnp.asarray(m.points)
    bn, sharp, _ = geo.boundary_point_normals(pts, td)
    maps = lay.build_layer_maps(t, np.asarray(bn), np.asarray(sharp),
                                t.patch_ids_matching(["walls"]),
                                t.patch_ids_matching([".*"]), max_layers=4)
    normals = jnp.asarray(maps.normals_init)
    new_pts = pts * 1.001  # arbitrary proposal
    outer = lay.update_neigh_coords(pts, jnp.asarray(maps.outer_map),
                                    jnp.asarray(maps.outer_map) >= 0,
                                    jnp.asarray(1e18))
    ours = lay.blend_with_orthogonal_points(
        pts, new_pts, td, jnp.asarray(maps.hops_layer), normals, outer,
        0.3, 0.05, 1.3, 1, 5)
    outer_np = np.where((maps.outer_map >= 0)[:, None],
                        m.points[np.maximum(maps.outer_map, 0)], 1e30)
    ref = oracle.blend_orthogonal(
        t, m.points, np.asarray(new_pts), maps.hops_layer,
        maps.normals_init, outer_np, 0.3, 0.05, 1.3, 1, 5)
    assert np.allclose(np.asarray(ours), ref, atol=1e-12)
    assert np.any(np.abs(np.asarray(ours) - np.asarray(new_pts)) > 1e-9)


def test_layer_treatment_end_to_end(layered):
    """Layer treatment drives first-layer thickness toward
    layerEdgeLength (the reference's documented purpose,
    algorithm_description.md 117-200)."""
    m, t, td = layered
    target = 0.04
    params = SmoothingParams(centroidal_iters=80, rel_tol=0.001,
                             layer_patches=("walls",),
                             layer_edge_length=target,
                             layer_max_blending_fraction=0.3,
                             min_layers=1, max_layers=3)
    sm = Smoother(m, params)
    assert sm.layer is not None
    sm.run(log=None)
    out = sm.denormalize()

    # Evaluate prismatic first-layer edge lengths (wall point -> its
    # unique first-layer interior point, via the inner map built on the
    # smoothing hops)
    maps = sm.layer_maps
    first = np.where((maps.hops_layer == 1) & (maps.outer_map >= 0))[0]
    assert len(first) > 0
    th_after = np.linalg.norm(out[first] - out[maps.outer_map[first]],
                              axis=1)
    th_before = np.linalg.norm(
        m.points[first] - m.points[maps.outer_map[first]], axis=1)
    # Blending pulls thickness toward the target
    err_after = np.abs(th_after - target).mean()
    err_before = np.abs(th_before - target).mean()
    assert err_after < err_before

    from smoothmesh_tpu.quality import check_mesh

    assert check_mesh(jnp.asarray(out), td)["ok"]


def test_no_layer_without_patches(layered):
    m, t, td = layered
    sm = Smoother(m, SmoothingParams(centroidal_iters=2))
    assert sm.layer is None
