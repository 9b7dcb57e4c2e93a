"""Spatial mesh reordering + tile-pool metadata for the select engine.

The TPU gather engine (ops/tiled.py) fetches *8-row chunks* (1024
entities) of tiled-interleave arrays and selects entries on-chip.  For
that to work, every consumer block's sources must fall into a small set
of chunks — a property of the MESH ORDERING.  This module provides:

  - :func:`rcb_order`: balanced recursive-coordinate-bisection ordering
    of points (equal leaf sizes, split along the widest axis).  Cells
    and faces are then ordered by their minimum (new) point id, which
    inherits the point locality; derived edges sort lexicographically
    by (min point, max point) in the topology compiler and inherit it
    too.
  - :func:`permute_mesh`: apply the orders to a PolyMesh (points
    renumbered, internal faces and per-patch faces reordered in place,
    cells renumbered) plus the permutations needed to map fields back.
  - :func:`build_block_pools`: per-table consumer-block metadata: which
    source chunks each block of KB consumers touches (the "pool"), and
    per-entry select codes (pool_row * 128 + lane).

The reference has no analog — OpenFOAM meshes arrive in generator
order; this ordering exists purely to make the TPU data layout
gather-friendly (SURVEY.md §7 hard part #4).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from smoothmesh_tpu.io.polymesh import PolyMesh

CHUNK = 1024          # entities per fetch chunk: 8 rows x 128 lanes
LANES = 128
ROWS_PER_CHUNK = CHUNK // LANES


def rcb_order(coords: np.ndarray, leaf: int = CHUNK) -> np.ndarray:
    """Balanced RCB ordering: returns ``order`` s.t. coords[order] is
    arranged leaf-by-leaf; every leaf has (almost) equal count <= leaf.

    Iterative median splits along the widest axis of each part.
    """
    n = len(coords)
    order = np.arange(n)
    if n <= leaf:
        return order
    parts = [order]
    while max(len(p) for p in parts) > leaf:
        nxt = []
        for p in parts:
            if len(p) <= leaf:
                nxt.append(p)
                continue
            c = coords[p]
            ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
            half = len(p) // 2
            sel = np.argpartition(c[:, ax], half)
            nxt.append(p[sel[:half]])
            nxt.append(p[sel[half:]])
        parts = nxt
    return np.concatenate(parts)


@dataclasses.dataclass
class MeshOrders:
    """new-id = perm_*[old-id] maps for a permuted mesh."""

    point_new: np.ndarray    # (N,) old -> new
    point_old: np.ndarray    # (N,) new -> old
    cell_new: np.ndarray
    cell_old: np.ndarray
    face_new: np.ndarray
    face_old: np.ndarray


def _group_order_by_key(key: np.ndarray) -> np.ndarray:
    """Stable order of ids by key (new-id -> old-id)."""
    return np.argsort(key, kind="stable")


def permute_mesh(mesh: PolyMesh) -> Tuple[PolyMesh, MeshOrders]:
    """Spatially reorder a PolyMesh for the tile engine.

    Points: RCB on coordinates.  Cells: by min new point id.  Faces:
    by min new point id, permuted only within the internal-face range
    and within each patch range (patch start/count preserved).  Face
    windings, owner/neighbour roles and patch metadata are untouched,
    so geometry semantics (normals owner->neighbour) are preserved.
    """
    N, F, Fi = mesh.n_points, mesh.n_faces, mesh.n_internal_faces
    C = mesh.n_cells

    p_old = rcb_order(np.asarray(mesh.points, np.float64))
    p_new = np.empty(N, dtype=np.int64)
    p_new[p_old] = np.arange(N)

    offs = mesh.face_offsets.astype(np.int64)
    counts = np.diff(offs)
    flat_new = p_new[mesh.face_flat]

    # min new point per face / per cell
    face_min = np.minimum.reduceat(flat_new, offs[:-1])
    cell_min = np.full(C, np.iinfo(np.int64).max)
    np.minimum.at(cell_min, mesh.owner, face_min)
    np.minimum.at(cell_min, mesh.neighbour, face_min[: Fi])

    c_old = _group_order_by_key(cell_min)
    c_new = np.empty(C, dtype=np.int64)
    c_new[c_old] = np.arange(C)

    f_old = np.arange(F)
    f_old[:Fi] = _group_order_by_key(face_min[:Fi])
    for p in mesh.patches:
        s, e = p.start_face, p.start_face + p.n_faces
        f_old[s:e] = s + _group_order_by_key(face_min[s:e])

    # rebuild ragged faces in the new face order with new point ids
    new_counts = counts[f_old]
    new_offs = np.zeros(F + 1, dtype=np.int64)
    np.cumsum(new_counts, out=new_offs[1:])
    gather_idx = np.concatenate(
        [np.arange(offs[f], offs[f] + counts[f]) for f in f_old]
    ) if F else np.zeros(0, np.int64)
    new_flat = flat_new[gather_idx]

    new_mesh = PolyMesh(
        points=np.ascontiguousarray(mesh.points[p_old]),
        face_flat=new_flat,
        face_offsets=new_offs,
        owner=c_new[mesh.owner[f_old]],
        neighbour=c_new[mesh.neighbour[f_old[:Fi]]],
        patches=list(mesh.patches),
    )
    orders = MeshOrders(
        point_new=p_new, point_old=p_old,
        cell_new=c_new, cell_old=c_old,
        face_new=np.argsort(f_old), face_old=f_old,
    )
    return new_mesh, orders


@dataclasses.dataclass
class TablePools:
    """Select-engine metadata for one (consumer-block, source) table.

    For consumer block b (KB consecutive consumers), ``tiles[b]`` lists
    the source chunks whose union covers every masked entry; per entry,
    ``codes`` = pool_row * 128 + lane with pool_row = slot-in-pool * 8 +
    row-within-chunk.  Codes of masked-off entries are 0.

    codes are laid out slot-major — codes[w] is the (Nc_pad,) vector of
    slot w — reshaped to (Nc_pad // 128, 128) per slot for native 2D
    kernel blocks.
    """

    tiles: np.ndarray       # (nb, P) int32 chunk ids
    codes: np.ndarray       # (W, nb * KB // 128, 128) int32
    kb: int
    n_pool_tiles: int       # P
    n_blocks: int           # nb
    n_consumers: int        # unpadded consumer count
    fill: float             # mean fraction of pool entries referenced


def build_block_pools(table: np.ndarray, mask: Optional[np.ndarray],
                      kb: int, n_src: int,
                      max_pool_tiles: int = 16) -> TablePools:
    """Compute per-block pools + select codes for a padded (Nc, W)
    index table whose values index a source array of n_src entities.

    Raises if any block needs more than ``max_pool_tiles`` chunks —
    that signals insufficient mesh locality (increase the budget or
    retile).
    """
    table = np.asarray(table, dtype=np.int64)
    Nc, W = table.shape
    if mask is None:
        mask = np.ones((Nc, W), dtype=bool)
    nb = -(-Nc // kb)
    Nc_pad = nb * kb

    pad_rows = Nc_pad - Nc
    if pad_rows:
        table = np.pad(table, ((0, pad_rows), (0, 0)))
        mask = np.pad(mask, ((0, pad_rows), (0, 0)))

    chunk_of = table // CHUNK                     # (Nc_pad, W)
    codes = np.zeros((Nc_pad, W), dtype=np.int64)
    tiles_list = []
    P = 0
    used = 0
    for b in range(nb):
        sl = slice(b * kb, (b + 1) * kb)
        m = mask[sl]
        ch = chunk_of[sl][m]
        uniq = np.unique(ch) if len(ch) else np.zeros(1, np.int64)
        tiles_list.append(uniq)
        P = max(P, len(uniq))
        used += len(np.unique(table[sl][m]))
    if P > max_pool_tiles:
        raise ValueError(
            f"block pool needs {P} chunks > budget {max_pool_tiles}; "
            "mesh ordering lacks locality for this table")
    tiles = np.zeros((nb, P), dtype=np.int64)
    for b, uniq in enumerate(tiles_list):
        tiles[b, :len(uniq)] = uniq
        tiles[b, len(uniq):] = uniq[-1] if len(uniq) else 0
        # map entries -> slot
        sl = slice(b * kb, (b + 1) * kb)
        slot = np.searchsorted(uniq, chunk_of[sl])
        slot = np.clip(slot, 0, len(uniq) - 1)
        local = table[sl] - uniq[slot] * CHUNK       # 0..CHUNK-1
        pool_row = slot * ROWS_PER_CHUNK + local // LANES
        code = pool_row * LANES + local % LANES
        codes[sl] = np.where(mask[sl], code, 0)

    fill = used / max(nb * P * CHUNK, 1)
    codes_T = np.ascontiguousarray(
        codes.T.reshape(W, Nc_pad // LANES, LANES))
    return TablePools(
        tiles=tiles.astype(np.int32), codes=codes_T.astype(np.int32),
        kb=kb, n_pool_tiles=P, n_blocks=nb, n_consumers=Nc, fill=fill)


# -- tiled-interleave layout helpers (device-friendly, numpy twins) --------

def ti_rows(n: int) -> int:
    """Padded row count of an n-entity tiled-interleave array."""
    return -(-n // CHUNK) * ROWS_PER_CHUNK


def to_ti_np(x: np.ndarray) -> np.ndarray:
    """(N, C) -> (ti_rows(N), C * 128) tiled-interleave, numpy."""
    x = np.asarray(x)
    N, Ccomp = x.shape
    R = ti_rows(N)
    pad = R * LANES - N
    xp = np.pad(x, ((0, pad), (0, 0)))
    return np.ascontiguousarray(
        xp.reshape(R, LANES, Ccomp).transpose(0, 2, 1)
    ).reshape(R, Ccomp * LANES)


def from_ti_np(t: np.ndarray, n: int, ncomp: int) -> np.ndarray:
    """Inverse of :func:`to_ti_np`."""
    R = t.shape[0]
    return t.reshape(R, ncomp, LANES).transpose(0, 2, 1).reshape(
        R * LANES, ncomp)[:n]
