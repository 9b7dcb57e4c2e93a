"""Mesh reordering + tile-pool metadata (mesh/tiling.py)."""

import numpy as np
import pytest

from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
from smoothmesh_tpu.mesh.tiling import (
    CHUNK,
    LANES,
    build_block_pools,
    from_ti_np,
    permute_mesh,
    rcb_order,
    to_ti_np,
)
from smoothmesh_tpu.mesh.topology import compile_topology


@pytest.fixture(scope="module")
def mesh():
    return perturb(hex_block(n=(12, 10, 8)), amplitude=0.05, seed=2)


def test_rcb_order_is_permutation_and_local(mesh):
    order = rcb_order(mesh.points, leaf=128)
    assert sorted(order) == list(range(mesh.n_points))
    # locality: every 128-point leaf covers a small sub-box of the
    # ~1300-point unit cube
    pts = mesh.points[order]
    n = len(pts)
    vols = [
        float(np.prod(np.maximum(
            pts[s:s + 128].max(0) - pts[s:s + 128].min(0), 1e-9)))
        for s in range(0, n - 128, 128)
    ]
    # 128-point windows of the ordered unit-cube mesh stay compact on
    # average (windows straddling RCB leaves may individually be large)
    assert np.mean(vols) < 0.4 and max(vols) < 0.8


def test_permuted_mesh_equivalent(mesh):
    new_mesh, orders = permute_mesh(mesh)
    new_mesh.validate()
    assert new_mesh.n_points == mesh.n_points
    assert new_mesh.n_cells == mesh.n_cells
    assert new_mesh.n_internal_faces == mesh.n_internal_faces
    # points are the same set, permuted
    np.testing.assert_allclose(new_mesh.points,
                               mesh.points[orders.point_old])
    np.testing.assert_array_equal(
        orders.point_new[orders.point_old], np.arange(mesh.n_points))
    # faces carry the same point sets
    f = orders.face_old[5]
    old_pts = set(orders.point_new[mesh.face_points(f)])
    assert old_pts == set(new_mesh.face_points(5))
    # geometry invariants: total volume identical
    from smoothmesh_tpu import quality
    from smoothmesh_tpu.device import to_device
    import jax.numpy as jnp

    t_old = compile_topology(mesh)
    t_new = compile_topology(new_mesh)
    r_old = quality.quality_report(jnp.asarray(mesh.points),
                                   to_device(t_old))
    r_new = quality.quality_report(jnp.asarray(new_mesh.points),
                                   to_device(t_new))
    for k in ("total_volume", "min_volume", "min_edge_length",
              "min_face_angle_deg", "max_face_angle_deg"):
        np.testing.assert_allclose(r_old[k], r_new[k], rtol=1e-10)


def test_block_pools_cover_and_decode(mesh):
    new_mesh, _ = permute_mesh(mesh)
    topo = compile_topology(new_mesh)
    kb = 2048
    tp = build_block_pools(topo.point_cells, topo.point_cells_mask, kb,
                           topo.n_cells, max_pool_tiles=16)
    W = topo.point_cells.shape[1]
    assert tp.codes.shape[0] == W
    # decode every masked entry and compare to the table
    for b in range(tp.n_blocks):
        tiles = tp.tiles[b]
        n_real = min((b + 1) * kb, topo.n_points) - b * kb
        for w in range(W):
            code = tp.codes[w].reshape(-1)[b * kb:(b + 1) * kb]
            lane = code % LANES
            prow = code // LANES
            chunk = tiles[prow // 8]
            src = chunk * CHUNK + (prow % 8) * LANES + lane
            sl = slice(b * kb, b * kb + n_real)
            m = topo.point_cells_mask[sl, w]
            np.testing.assert_array_equal(src[:n_real][m],
                                          topo.point_cells[sl, w][m])


def test_pool_budget_violation_raises():
    # one consumer block referencing two distinct source chunks
    table = np.array([[0], [CHUNK]], dtype=np.int64)
    with pytest.raises(ValueError):
        build_block_pools(table, None, 128, 2 * CHUNK, max_pool_tiles=1)


def test_ti_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1000, 3)).astype(np.float32)
    t = to_ti_np(x)
    assert t.shape[1] == 384 and t.shape[0] % 8 == 0
    np.testing.assert_array_equal(from_ti_np(t, 1000, 3), x)
