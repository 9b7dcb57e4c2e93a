"""Rank-local constraint evaluation + OR-combine (VERDICT r2 weak #4).

The reference evaluates freeze constraints on each rank's LOCAL
adjacency and OR-combines the masks across ranks
(syncTools orEqOp, src/smoothMesh.C:2374-2380) — for a point whose
edges straddle a processor boundary this can freeze where a serial run
would not: each rank sees only a subset of the point's edges, so the
"new minimum is decreasing" test (restrictEdgeShortening,
src/smoothMesh.C:602-652) runs against a rank-local minimum.

This fixture engineers exactly that divergence and asserts the sharded
driver reproduces the reference's rank-local-OR semantics (not the
serial decision):

  x-planes at 0, 1, 2, 2.3, 2.6 (y, z unit): the mid point p=(2,1,1)
  has a LONG left edge (1.0, lives on shard 0 only) and a SHORT right
  edge (0.3, shard 1 only).  Centroidal smoothing pulls p left by
  0.0875 (after the 0.5 relStepFrac):
    shard 0 local:  cur_min=1.0  -> new_min=0.9125 < minEdge=0.95 and
                    decreasing  => FREEZE
    shard 1 local:  cur_min=0.3  -> new_min=0.3875: not decreasing
                    => no freeze
    serial/global:  cur_min=0.3  -> new_min=0.3875: not decreasing
                    => NO freeze
  OR-combine => sharded freezes p, serial moves it.
"""

import numpy as np

from smoothmesh_tpu.driver import Smoother
from smoothmesh_tpu.mesh.blockmesh import hex_block
from smoothmesh_tpu.params import SmoothingParams
from smoothmesh_tpu.parallel.sharded import ShardedSmoother


def _mesh():
    m = hex_block(p_min=(0, 0, 0), p_max=(4, 2, 2), n=(4, 2, 2))
    pts = m.points.copy()
    pts[:, 0] = np.where(np.isclose(pts[:, 0], 3.0), 2.3, pts[:, 0])
    pts[:, 0] = np.where(np.isclose(pts[:, 0], 4.0), 2.6, pts[:, 0])
    m.points = pts
    return m


_PARAMS = SmoothingParams(centroidal_iters=1, rel_tol=0.0,
                          min_edge_length=0.95,
                          edge_angle_constraint=False,
                          face_angle_constraint=False)


def _rank_local_oracle(shards, cur_pts, prop, p_gid):
    """Reference restrictEdgeShortening per rank on the rank's local
    point_points, from the (serial) proposal field."""
    decisions = []
    for d in range(shards.n_shards):
        g = shards.local_to_global[d]
        g2l = np.full(prop.shape[0], -1, dtype=np.int64)
        g2l[g] = np.arange(len(g))
        li = g2l[p_gid]
        if li < 0:
            decisions.append(False)
            continue
        t = shards.topos[d]
        nb = g[t.point_points[li][t.point_points_mask[li]]]
        cur = np.linalg.norm(
            cur_pts[nb] - cur_pts[p_gid], axis=1).min()
        new = np.linalg.norm(prop[nb] - prop[p_gid], axis=1).min()
        decisions.append(bool(new < 0.95 and new < cur))
    return decisions


def test_rank_local_freeze_matches_reference_semantics():
    mesh = _mesh()
    p_gid = int(np.where(np.all(np.isclose(
        mesh.points, [2.0, 1.0, 1.0]), axis=1))[0][0])

    # serial run: p must MOVE (global minimum is the short right edge,
    # which the move lengthens -> not decreasing -> no freeze)
    serial = Smoother(mesh, _PARAMS, dtype=np.float64,
                      use_tile_engine=False)
    serial.steps(1)
    s_pts = serial.denormalize()
    assert s_pts[p_gid, 0] < 2.0 - 0.05

    # the serial proposal (freeze disabled) feeds the numpy oracle
    free = Smoother(
        mesh,
        SmoothingParams(centroidal_iters=1, rel_tol=0.0,
                        min_edge_length=1e-12,
                        max_step_length=0.3 * 0.95,  # match _PARAMS
                        edge_angle_constraint=False,
                        face_angle_constraint=False),
        dtype=np.float64, use_tile_engine=False)
    free.steps(1)
    prop = free.denormalize()

    # sharded run: p must FREEZE (shard 0's local evaluation) — the
    # reference's rank-local + OR-combine outcome
    sh = ShardedSmoother(mesh, _PARAMS, n_devices=2, dtype=np.float64)
    sh.step()
    p_shards = _rank_local_oracle(sh.shards, mesh.points, prop, p_gid)
    assert p_shards == [True, False], p_shards   # fixture sanity
    h_pts = sh.denormalize()
    assert abs(h_pts[p_gid, 0] - 2.0) < 1e-9

    # every other point agrees between the two runs (single step: no
    # other decision depends on p's freeze)
    mask = np.ones(len(s_pts), dtype=bool)
    mask[p_gid] = False
    assert np.abs(s_pts[mask] - h_pts[mask]).max() < 1e-9
