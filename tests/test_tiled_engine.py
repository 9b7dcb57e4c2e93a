"""Select-engine (ops/tiled.py) correctness: pools, codes, gather."""

import numpy as np
import pytest

import jax.numpy as jnp

from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
from smoothmesh_tpu.mesh.tiling import permute_mesh
from smoothmesh_tpu.mesh.topology import compile_topology
from smoothmesh_tpu.ops import tiled


@pytest.fixture(scope="module")
def topo():
    mesh = perturb(hex_block(n=(20, 18, 16)), amplitude=0.05, seed=4)
    new_mesh, _ = permute_mesh(mesh)
    return compile_topology(new_mesh)


def test_pool_codes_decode(topo):
    pool, (codes,) = tiled.build_pool(
        topo.n_points, [(topo.point_cells, topo.point_cells_mask)],
        topo.n_cells)
    kb = tiled.KB
    span = pool.n_windows * tiled.SPAN_UNIT
    nb = codes.codes.shape[1] // kb
    W = codes.width
    raw = codes.codes.astype(np.int32)
    valid_bit = raw < 0                       # bit 15 = table mask
    decoded = raw & 0x7FFF
    n_pad = codes.codes.shape[1]
    exp_mask = np.zeros((W, n_pad), bool)
    exp_mask[:, :topo.n_points] = topo.point_cells_mask.T
    np.testing.assert_array_equal(valid_bit, exp_mask)
    for b in range(nb):
        for w in range(W):
            code = decoded[w, b * kb:(b + 1) * kb]
            n_real = min((b + 1) * kb, topo.n_points) - b * kb
            win_src = (pool.win[b, np.clip(code // tiled.SPAN_UNIT, 0,
                                           pool.n_windows - 1)]
                       * tiled.SPAN_UNIT + code % tiled.SPAN_UNIT)
            src = np.where(code < span, win_src,
                           pool.ghost_ids[b, np.clip(code - span, 0,
                                                     None)])
            sl = slice(b * kb, b * kb + n_real)
            m = topo.point_cells_mask[sl, w]
            np.testing.assert_array_equal(src[:n_real][m],
                                          topo.point_cells[sl, w][m])


@pytest.mark.parametrize("table_name,src_attr", [
    ("point_cells", "n_cells"),
    ("point_points", "n_points"),
    ("face_points", "n_points"),
    ("edge_cells", "n_cells"),
])
def test_tiled_gather_matches_plain(topo, table_name, src_attr):
    table = getattr(topo, table_name)
    mask_name = {"point_cells": "point_cells_mask",
                 "point_points": "point_points_mask",
                 "face_points": "face_mask",
                 "edge_cells": "edge_cells_mask"}[table_name]
    mask = getattr(topo, mask_name)
    n_src = getattr(topo, src_attr)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n_src, 3)).astype(np.float32)

    pool, (codes,) = tiled.build_pool(table.shape[0], [(table, mask)],
                                      n_src)
    got = np.asarray(tiled.tiled_gather(
        jnp.asarray(x), pool, codes, table.shape[0], interpret=True))
    want = x[np.asarray(table, np.int64)]
    np.testing.assert_allclose(got[mask], want[mask], rtol=0, atol=0)


def test_tiled_gather_fold2_interpret(topo, monkeypatch):
    """fold>1 meta layout (fold_meta + stage_call's folded meta_idx).

    pick_fold returns 1 in production (measured Mosaic sublane-block
    constraint, see its docstring) which leaves the fold>1 branches
    cold; this interpret-mode run keeps them correct in case the
    constraint is ever lifted (ADVICE r4)."""
    monkeypatch.setattr(tiled, "pick_fold", lambda rows: 2)
    table, mask = topo.point_cells, topo.point_cells_mask
    rng = np.random.default_rng(1)
    x = rng.standard_normal((topo.n_cells, 3)).astype(np.float32)
    pool, (codes,) = tiled.build_pool(table.shape[0], [(table, mask)],
                                      topo.n_cells)
    got = np.asarray(tiled.tiled_gather(
        jnp.asarray(x), pool, codes, table.shape[0], interpret=True))
    want = x[np.asarray(table, np.int64)]
    np.testing.assert_allclose(got[mask], want[mask], rtol=0, atol=0)
