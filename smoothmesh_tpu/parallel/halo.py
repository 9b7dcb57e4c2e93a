"""Halo-sharded select-engine smoothing — the fast multi-chip path.

The XLA sharded driver (parallel/sharded.py) mirrors the reference's
decomposition exactly: cell-disjoint shards, partial per-shard sums,
and the ~12-sync-per-iteration structure of syncTools (SURVEY.md §5).
That structure is MPI-shaped, not TPU-shaped: every sync is a small
gather/scatter + collective between big fused kernels.

This module instead uses an OVERLAP (halo) decomposition designed for
the tile engine (ops/tiled.py / ops/tiledstep.py):

  - Points are partitioned into OWNED sets (one owner per point).
  - Each shard holds the vertex-complete 1-ring of its owned points:
    every cell containing an owned point, with all of that cell's
    faces/edges/points.  Hence every owned point's full smoothing
    stencil (point_cells, point_points, point_faces, point_edges, and
    the edge->face->cell closure used by the constraints) is local and
    complete — per-shard kernels compute owned results EXACTLY, with no
    partial-sum combines.
  - Per iteration only three cross-shard exchanges remain:
      1. proposal consensus — replicated (non-owned) copies of a point
         adopt the owner's proposal (all stencil inputs of later
         kernels are then globally consistent);
      2. freeze-mask OR-combines (reference orEqOp semantics,
         src/smoothMesh.C:2374-2380) after the stage-S constraints and
         after the face-angle fixed point;
      3. scalar allreduces for the residual / frozen count
         (returnReduce, src/smoothMesh.C:1567,2396).
    Everything else is the unmodified single-chip planar engine
    iteration (driver.iteration_body_planar).

Parity notes: with quality constraints disabled the per-shard results
are exact, so sharded == serial bit-for-bit.  With constraints on, the
face-angle fixed point runs shard-locally (like the reference's
rank-local work stack) and freezes are OR-combined once — the same
conservative cross-rank semantics as the reference's parallel mode
(CLAUDE.md invariant).

All shards execute one identical program under ``jax.shard_map``; the
per-shard engine metadata (pool windows, codes, ghost ids, masks) is
stacked into (D, ...) arrays, which requires every shard's engine to
have identical static shapes — entity counts and table widths are
padded to common targets (:func:`pad_topology`) and pool ghost rows are
forced to the per-pool maximum (TiledEngine ``ghost_rows``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from smoothmesh_tpu.io.polymesh import Patch, PolyMesh
from smoothmesh_tpu.mesh.topology import (
    MeshTopology,
    boundary_point_mask,
    compile_topology,
)
from smoothmesh_tpu.parallel.partition import partition_cells

KB = 2048   # entity-count rounding: ops/tiled.KB (consumer block size)


# ---------------------------------------------------------------------------
# Submesh extraction (vertex-complete local cell sets)
# ---------------------------------------------------------------------------

def extract_submesh(mesh: PolyMesh, cell_mask: np.ndarray,
                    face_patch: np.ndarray):
    """Extract the submesh of ``cell_mask`` cells.

    Faces with exactly one local cell become a ``procBoundary``
    processor patch; faces are flipped when their global owner is
    off-shard so the local owner is always local (outward normals
    preserved).  Returns (local PolyMesh, point l2g, cell l2g).

    Same extraction semantics as parallel.partition.build_shards
    (which keeps its own copy specialized to disjoint decompositions).
    """
    F = mesh.n_faces
    Fi = mesh.n_internal_faces
    owner = mesh.owner
    neighbour = mesh.neighbour
    flat = mesh.face_flat
    offs = mesh.face_offsets

    own_in = cell_mask[owner]
    nei_in = np.zeros(F, dtype=bool)
    nei_in[:Fi] = cell_mask[neighbour]
    touch = own_in | nei_in
    face_ids = np.where(touch)[0]

    is_internal_local = own_in[face_ids] & nei_in[face_ids]
    is_proc = (face_ids < Fi) & ~is_internal_local
    n_patches = len(mesh.patches)
    order = np.argsort(
        np.where(is_internal_local, 0,
                 np.where(is_proc, 2 + n_patches,
                          1 + face_patch[face_ids])),
        kind="stable",
    )
    face_ids = face_ids[order]
    is_internal_local = is_internal_local[order]
    is_proc = is_proc[order]

    counts = offs[face_ids + 1] - offs[face_ids]
    starts = offs[face_ids]
    out_off = np.zeros(len(face_ids) + 1, dtype=np.int64)
    np.cumsum(counts, out=out_off[1:])
    total = int(out_off[-1])
    rep_row = np.repeat(np.arange(len(face_ids)), counts)
    within = np.arange(total, dtype=np.int64) - out_off[rep_row]
    sel_entries = flat[starts[rep_row] + within]
    gids = np.unique(sel_entries)
    g2l = np.full(mesh.n_points, -1, dtype=np.int64)
    g2l[gids] = np.arange(len(gids))

    cell_ids = np.where(cell_mask)[0]
    c2l = np.full(mesh.n_cells, -1, dtype=np.int64)
    c2l[cell_ids] = np.arange(len(cell_ids))

    o = owner[face_ids]
    if Fi > 0:
        n = np.where(face_ids < Fi,
                     neighbour[np.minimum(face_ids, Fi - 1)], -1)
    else:
        n = np.full(len(face_ids), -1, dtype=np.int64)
    flips = ~cell_mask[o]
    within_f = np.where(flips[rep_row],
                        counts[rep_row] - 1 - within, within)
    new_flat = g2l[flat[starts[rep_row] + within_f]]
    new_owner = c2l[np.where(flips, n, o)]
    new_neighbour = c2l[np.where(flips, o, n)[is_internal_local]]

    patches = []
    fp = face_patch[face_ids]
    pos = int(is_internal_local.sum())
    for pid, p in enumerate(mesh.patches):
        cnt = int(((fp == pid) & ~is_internal_local & ~is_proc).sum())
        patches.append(Patch(name=p.name, type=p.type, n_faces=cnt,
                             start_face=pos))
        pos += cnt
    n_proc = int(is_proc.sum())
    patches.append(Patch(name="procBoundary", type="processor",
                         n_faces=n_proc, start_face=pos))

    lmesh = PolyMesh(
        points=mesh.points[gids],
        face_flat=np.asarray(new_flat, dtype=np.int64),
        face_offsets=out_off,
        owner=np.asarray(new_owner, dtype=np.int64),
        neighbour=np.asarray(new_neighbour, dtype=np.int64),
        patches=patches,
    )
    return lmesh, gids, cell_ids


# ---------------------------------------------------------------------------
# Topology padding to common static shapes
# ---------------------------------------------------------------------------

def _pad_rows(a: np.ndarray, n: int, fill=0) -> np.ndarray:
    if a.shape[0] >= n:
        return a
    pad = np.full((n - a.shape[0],) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


def _pad_cols(a: np.ndarray, w: int, fill=0) -> np.ndarray:
    if a.shape[1] >= w:
        return a
    pad = np.full((a.shape[0], w - a.shape[1]) + a.shape[2:], fill,
                  dtype=a.dtype)
    return np.concatenate([a, pad], axis=1)


def pad_topology(t: MeshTopology, n_points: int, n_cells: int,
                 n_faces: int, n_edges: int,
                 widths: Dict[str, int]) -> MeshTopology:
    """Pad a compiled topology to common entity counts + table widths.

    Padded rows carry all-False masks (their index entries are 0 and
    never dereferenced through a True mask); explicit ``*_valid_rows``
    attributes mark live rows (consumed by device.to_device and the
    tile engine's planar glue).
    """
    w = widths
    out = MeshTopology(
        n_points=n_points, n_cells=n_cells, n_faces=n_faces,
        n_internal_faces=t.n_internal_faces, n_edges=n_edges,
        face_points=_pad_rows(_pad_cols(t.face_points, w["fp"]), n_faces),
        face_points_next=_pad_rows(
            _pad_cols(t.face_points_next, w["fp"]), n_faces),
        face_mask=_pad_rows(_pad_cols(t.face_mask, w["fp"], False),
                            n_faces, False),
        face_npoints=_pad_rows(t.face_npoints, n_faces, 1),
        owner=_pad_rows(t.owner, n_faces),
        neighbour=_pad_rows(t.neighbour, n_faces),
        has_neighbour=_pad_rows(t.has_neighbour, n_faces, False),
        edges=_pad_rows(t.edges, n_edges),
        edge_faces=_pad_rows(_pad_cols(t.edge_faces, w["ef"]), n_edges),
        edge_faces_mask=_pad_rows(
            _pad_cols(t.edge_faces_mask, w["ef"], False), n_edges, False),
        edge_cells=_pad_rows(_pad_cols(t.edge_cells, w["ec"]), n_edges),
        edge_cells_mask=_pad_rows(
            _pad_cols(t.edge_cells_mask, w["ec"], False), n_edges, False),
        edge_cell_f0=_pad_rows(_pad_cols(t.edge_cell_f0, w["ec"]),
                               n_edges),
        edge_cell_f1=_pad_rows(_pad_cols(t.edge_cell_f1, w["ec"]),
                               n_edges),
        point_points=_pad_rows(_pad_cols(t.point_points, w["pp"]),
                               n_points),
        point_points_mask=_pad_rows(
            _pad_cols(t.point_points_mask, w["pp"], False), n_points,
            False),
        point_cells=_pad_rows(_pad_cols(t.point_cells, w["pc"]),
                              n_points),
        point_cells_mask=_pad_rows(
            _pad_cols(t.point_cells_mask, w["pc"], False), n_points,
            False),
        point_faces=_pad_rows(_pad_cols(t.point_faces, w["pf"]),
                              n_points),
        point_faces_mask=_pad_rows(
            _pad_cols(t.point_faces_mask, w["pf"], False), n_points,
            False),
        point_edges=_pad_rows(_pad_cols(t.point_edges, w["pe"]),
                              n_points),
        point_edges_mask=_pad_rows(
            _pad_cols(t.point_edges_mask, w["pe"], False), n_points,
            False),
        point_edges_side=_pad_rows(
            _pad_cols(t.point_edges_side, w["pe"]), n_points),
        wedge_prev=_pad_rows(_pad_cols(t.wedge_prev, w["pf"]), n_points),
        wedge_next=_pad_rows(_pad_cols(t.wedge_next, w["pf"]), n_points),
        cell_faces=_pad_rows(_pad_cols(t.cell_faces, w["cf"]), n_cells),
        cell_faces_mask=_pad_rows(
            _pad_cols(t.cell_faces_mask, w["cf"], False), n_cells, False),
        is_internal_point=_pad_rows(t.is_internal_point, n_points, False),
        face_patch=_pad_rows(t.face_patch, n_faces, -1),
        patch_names=t.patch_names,
        patch_types=t.patch_types,
    )
    out.point_valid_rows = _pad_rows(
        np.ones(t.n_points, dtype=bool), n_points, False)
    out.edge_valid_rows = _pad_rows(
        np.ones(t.n_edges, dtype=bool), n_edges, False)
    out.cell_valid_rows = _pad_rows(
        np.ones(t.n_cells, dtype=bool), n_cells, False)
    return out


def _round_kb(n: int) -> int:
    return -(-n // KB) * KB


# ---------------------------------------------------------------------------
# Halo shard build
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class HaloShards:
    n_shards: int
    topos: List[MeshTopology]           # per-shard padded local topology
    local_points: np.ndarray            # (D, Npad, 3) initial coords
    owned: np.ndarray                   # (D, Npad) bool — shard owns point
    l2g: List[np.ndarray]               # per shard: local (permuted) -> global
    orders: List                        # per-shard MeshOrders
    # Replicated-point routing (points on >1 shard):
    shared_slot_local: np.ndarray       # (D, S) local idx or OOB sentinel
    shared_valid: np.ndarray            # (D, S)
    shared_owner_is_me: np.ndarray      # (D, S)
    point_owner_shard: np.ndarray       # (Nglobal,)
    point_owner_local: np.ndarray       # (Nglobal,) local idx on owner
    oob: int                            # the OOB sentinel value
    # Quality-report claims: each global face/edge/cell is claimed by
    # exactly one shard (the owner shard of its minimum global point
    # id) whose local closure of the entity is complete, so the global
    # quality report assembles from per-shard parts with no global
    # topology compile
    claim_face: np.ndarray = None       # (D, n_faces_pad) bool
    claim_edge: np.ndarray = None       # (D, n_edges_pad) bool
    claim_cell: np.ndarray = None       # (D, n_cells_pad) bool
    # Global mesh stats assembled from per-shard pieces (every edge
    # lives on >= 1 shard), so the driver needs no global topology
    min_edge_length: float = 0.0
    max_edge_length: float = 0.0

    @property
    def n_padded_points(self) -> int:
        return self.local_points.shape[1]

    def gather_global_points(self, local_points) -> np.ndarray:
        lp = np.asarray(local_points)
        return lp[self.point_owner_shard, self.point_owner_local]


def build_halo_shards(mesh: PolyMesh, n_shards: int,
                      cell_shard: Optional[np.ndarray] = None
                      ) -> HaloShards:
    from smoothmesh_tpu.mesh.tiling import permute_mesh

    if cell_shard is None:
        cell_shard = partition_cells(mesh, n_shards)
    D = n_shards
    N, C, F = mesh.n_points, mesh.n_cells, mesh.n_faces
    Fi = mesh.n_internal_faces
    global_internal = ~boundary_point_mask(mesh)

    face_patch = np.full(F, -1, dtype=np.int64)
    for pid, p in enumerate(mesh.patches):
        face_patch[p.start_face: p.start_face + p.n_faces] = pid

    # (point, cell) incidences via faces
    flat = mesh.face_flat
    offs = mesh.face_offsets
    counts = np.diff(offs)
    face_of = np.repeat(np.arange(F), counts)
    has_n = np.zeros(F, dtype=bool)
    has_n[:Fi] = True
    inc_pt = np.concatenate([flat, flat[has_n[face_of]]])
    neigh_full = np.full(F, -1, dtype=np.int64)
    neigh_full[:Fi] = mesh.neighbour
    inc_cl = np.concatenate([mesh.owner[face_of],
                             neigh_full[face_of][has_n[face_of]]])

    # Point owner: min shard over incident cells (deterministic)
    point_owner = np.full(N, D, dtype=np.int64)
    np.minimum.at(point_owner, inc_pt, cell_shard[inc_cl])
    if np.any(point_owner >= D):
        raise ValueError("points without incident cells")

    # Local cell sets: every cell containing an owned point
    local = np.zeros((D, C), dtype=bool)
    local[point_owner[inc_pt], inc_cl] = True
    # the owning shard's own cells are trivially included
    local[cell_shard, np.arange(C)] = True

    topos_raw: List[MeshTopology] = []
    l2g: List[np.ndarray] = []
    orders_list = []
    pts_list = []
    owned_list = []
    claims_raw: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    min_edge, max_edge = np.inf, 0.0

    for d in range(D):
        lmesh, gids, _cells = extract_submesh(mesh, local[d], face_patch)
        pmesh, orders = permute_mesh(lmesh)
        topo = compile_topology(pmesh)
        gids_perm = gids[orders.point_old]     # new local idx -> global
        topo.is_internal_point = global_internal[gids_perm]
        elen = np.linalg.norm(
            pmesh.points[topo.edges[:, 0]] - pmesh.points[topo.edges[:, 1]],
            axis=1)
        min_edge = min(min_edge, float(elen.min()))
        max_edge = max(max_edge, float(elen.max()))
        # quality claims: entity -> min global point id -> owner shard
        fp_g = np.where(topo.face_mask, gids_perm[topo.face_points], N)
        min_fp = np.minimum(fp_g.min(axis=1), N - 1)
        c_face = point_owner[min_fp] == d
        c_edge = point_owner[gids_perm[topo.edges].min(axis=1)] == d
        cell_min = np.minimum(
            np.where(topo.cell_faces_mask, min_fp[topo.cell_faces],
                     N).min(axis=1), N - 1)
        c_cell = point_owner[cell_min] == d
        claims_raw.append((c_face, c_edge, c_cell))
        topos_raw.append(topo)
        l2g.append(gids_perm)
        orders_list.append(orders)
        pts_list.append(pmesh.points)
        owned_list.append(point_owner[gids_perm] == d)

    # Common static shapes (rounded to the engine's consumer block)
    n_pts = _round_kb(max(t.n_points for t in topos_raw))
    n_cls = _round_kb(max(t.n_cells for t in topos_raw))
    n_fcs = _round_kb(max(t.n_faces for t in topos_raw))
    n_edg = _round_kb(max(t.n_edges for t in topos_raw))
    widths = {
        "fp": max(t.face_points.shape[1] for t in topos_raw),
        "ef": max(t.edge_faces.shape[1] for t in topos_raw),
        "ec": max(t.edge_cells.shape[1] for t in topos_raw),
        "pp": max(t.point_points.shape[1] for t in topos_raw),
        "pc": max(t.point_cells.shape[1] for t in topos_raw),
        "pf": max(t.point_faces.shape[1] for t in topos_raw),
        "pe": max(t.point_edges.shape[1] for t in topos_raw),
        "cf": max(t.cell_faces.shape[1] for t in topos_raw),
    }
    topos = [pad_topology(t, n_pts, n_cls, n_fcs, n_edg, widths)
             for t in topos_raw]
    claim_face = np.stack([_pad_rows(c[0], n_fcs, False)
                           for c in claims_raw])
    claim_edge = np.stack([_pad_rows(c[1], n_edg, False)
                           for c in claims_raw])
    claim_cell = np.stack([_pad_rows(c[2], n_cls, False)
                           for c in claims_raw])
    if int(claim_cell.sum()) != C or int(claim_face.sum()) != F:
        raise AssertionError("quality claims do not cover the mesh")

    pts = np.zeros((D, n_pts, 3))
    owned = np.zeros((D, n_pts), dtype=bool)
    for d in range(D):
        pts[d, :len(pts_list[d])] = pts_list[d]
        owned[d, :len(owned_list[d])] = owned_list[d]

    # Replicated points + routing.  OOB sentinel = planar width so
    # scatters into planar (C, W) arrays drop absent slots.
    from smoothmesh_tpu.ops.tiled import planar_width

    oob = planar_width(n_pts)
    count = np.zeros(N, dtype=np.int64)
    for g in l2g:
        count[g] += 1
    shared_gids = np.where(count > 1)[0]
    S = max(len(shared_gids), 1)     # keep collectives non-empty

    slot_local = np.full((D, S), oob, dtype=np.int64)
    valid = np.zeros((D, S), dtype=bool)
    for d, g in enumerate(l2g):
        g2l = np.full(N, -1, dtype=np.int64)
        g2l[g] = np.arange(len(g))
        li = g2l[shared_gids] if len(shared_gids) else np.zeros(0, np.int64)
        has = li >= 0
        slot_local[d, :len(shared_gids)][has] = li[has]
        valid[d, :len(shared_gids)] = has
    owner_is_me = np.zeros((D, S), dtype=bool)
    if len(shared_gids):
        owner_is_me[:, :len(shared_gids)] = (
            point_owner[shared_gids][None, :]
            == np.arange(D)[:, None])

    owner_local = np.full(N, -1, dtype=np.int64)
    for d, g in enumerate(l2g):
        mine = point_owner[g] == d
        owner_local[g[mine]] = np.where(mine)[0]
    if np.any(owner_local < 0):
        raise ValueError("point not present on its owner shard")

    return HaloShards(
        n_shards=D, topos=topos, local_points=pts, owned=owned,
        l2g=l2g, orders=orders_list,
        shared_slot_local=slot_local, shared_valid=valid,
        shared_owner_is_me=owner_is_me,
        point_owner_shard=point_owner,
        point_owner_local=owner_local, oob=oob,
        claim_face=claim_face, claim_edge=claim_edge,
        claim_cell=claim_cell,
        min_edge_length=min_edge, max_edge_length=max_edge,
    )


# ---------------------------------------------------------------------------
# Device side: planar-layout halo sync + stacked engines + driver
# ---------------------------------------------------------------------------

class PlanarSync:
    """Cross-shard combines on PLANAR (C, W) point arrays.

    The tile engine's fields put components on sublanes and points on
    lanes; replicated-point slots address lane positions directly
    (slot == local point index; OOB sentinel >= W drops).  Runs inside
    ``shard_map``; sums/maxes ride XLA collectives over ICI — the
    syncTools role (SURVEY.md §5) with the halo decomposition's reduced
    op set: owner consensus, orEqOp, returnReduce.
    """

    def __init__(self, slot, valid, owner_is_me, axis: str = "shard"):
        self.slot = slot
        self.valid = valid
        self.owner = owner_is_me
        self.axis = axis

    def consensus(self, planar, rows: int = 3):
        """Replicas of each shared point adopt the owner's value."""
        import jax
        import jax.numpy as jnp

        safe = jnp.minimum(self.slot, planar.shape[1] - 1)
        v = planar[:rows, safe]                       # (rows, S)
        v = jnp.where((self.valid & self.owner)[None, :], v, 0.0)
        tot = jax.lax.psum(v, self.axis)
        return planar.at[:rows, self.slot].set(tot, mode="drop")

    def or_mask(self, mask):
        """orEqOp<bool> over a (W,) lane-aligned mask."""
        import jax
        import jax.numpy as jnp

        safe = jnp.minimum(self.slot, mask.shape[0] - 1)
        v = jnp.where(self.valid, mask[safe], False)
        tot = jax.lax.psum(v.astype(jnp.int32), self.axis) > 0
        return mask.at[self.slot].set(tot, mode="drop")

    def all_max(self, x):
        import jax

        return jax.lax.pmax(x, self.axis)

    def all_sum(self, x):
        import jax

        return jax.lax.psum(x, self.axis)


_POOL_ATTRS = {
    "f": "f_pool", "c": "c_pool", "p_cc": "p_cc_pool",
    "p_pp": "p_pp_pool", "e_pts": "e_pts_pool", "e_vm": "e_vm_pool",
    "e_cc": "e_cc_pool", "r": "r_pool",
}


def probe_ghost_rows(t: MeshTopology) -> Dict[str, Tuple[int, int]]:
    """Natural (ghost_rows, n_windows) of every engine pool for one
    topology (cheap pre-pass so shards can force a common shape)."""
    from smoothmesh_tpu.ops import tiled

    def g(n_cons, tables, n_src):
        pool, _ = tiled.build_pool(n_cons, tables, n_src)
        return pool.n_ghost_rows, pool.n_windows

    return {
        "f": g(t.n_faces, [(t.face_points, t.face_mask)], t.n_points),
        "c": g(t.n_cells, [(t.cell_faces, t.cell_faces_mask)], t.n_faces),
        "p_cc": g(t.n_points, [(t.point_cells, t.point_cells_mask)],
                  t.n_cells),
        "p_pp": g(t.n_points, [(t.point_points, t.point_points_mask)],
                  t.n_points),
        "e_pts": g(t.n_edges, [(t.edges, None)], t.n_points),
        "e_vm": g(t.n_edges, [(t.edge_faces, t.edge_faces_mask)],
                  t.n_faces),
        "e_cc": g(t.n_edges, [(t.edge_cells, t.edge_cells_mask)],
                  t.n_cells),
        "r": g(t.n_points, [(t.point_edges, t.point_edges_mask)],
               t.n_edges),
    }


def build_stacked_engines(topos, interpret: bool):
    """Per-shard TiledEngines with identical static shapes.

    Returns (template engine, stacked arrays {name: (D, ...) np}).
    The template's stage functions are pure shape-parameterized
    programs — every shard runs them on its own slice of the stacked
    arrays under shard_map.
    """
    from smoothmesh_tpu.ops.tiledstep import TiledEngine

    probes = [probe_ghost_rows(t) for t in topos]
    gr = {k: max(p[k][0] for p in probes) for k in probes[0]}
    nw = {k: max(p[k][1] for p in probes) for k in probes[0]}
    engines = [TiledEngine(t, interpret=interpret, ghost_rows=gr,
                           windows=nw)
               for t in topos]
    e0 = engines[0]
    for e in engines[1:]:
        for k in _POOL_ATTRS.values():
            if getattr(e, k).n_pool_rows != getattr(e0, k).n_pool_rows:
                raise AssertionError(f"pool {k} shape mismatch")
    stacked = {}
    for k in e0.arrays:
        parts = [np.asarray(e.arrays[k]) for e in engines]
        shapes = {p.shape for p in parts}
        if len(shapes) != 1:
            raise AssertionError(f"engine array {k} shapes differ: {shapes}")
        stacked[k] = np.stack(parts)
    return e0, stacked


class HaloSmoother:
    """Multi-chip smoothing on the tile engine (halo decomposition).

    Supports the full feature set: default internal smoothing runs the
    PLANAR batched engine iteration (iteration_body_planar); layer
    treatment and boundary point smoothing run the DENSE engine
    iteration (driver.iteration_body) per shard with halo-consensus
    sync semantics (sync.HaloDenseSync) — owned points' stencils are
    complete, so the reference's ~12 partial-sum syncs per iteration
    (SURVEY.md §3.2) reduce to one proposal consensus + freeze
    OR-combines + scalar allreduces.  Surface API matches
    driver.Smoother (steps/run/quality/denormalize/
    enable_boundary_smoothing).
    """

    def __init__(self, mesh: PolyMesh, params, n_devices=None,
                 dtype=None, normalize: bool = True, devices=None,
                 use_tile_engine: bool = True):
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from smoothmesh_tpu import quality
        from smoothmesh_tpu.driver import default_face_angle_chunk
        from smoothmesh_tpu.ops.tiled import planar_width, to_planar
        from smoothmesh_tpu.device import to_device

        if devices is None:
            devices = jax.devices()
            if n_devices is not None:
                devices = devices[:n_devices]
        self.devices = list(devices)
        D = len(self.devices)
        self.mesh_host = mesh
        self.use_tile_engine = bool(use_tile_engine)
        if dtype is not None:
            self.dtype = jnp.dtype(dtype)
        elif self.use_tile_engine:
            self.dtype = jnp.dtype(jnp.float32)
        else:
            self.dtype = jnp.zeros(0).dtype     # respects jax_enable_x64
        if self.use_tile_engine and self.dtype != jnp.float32:
            raise ValueError("tile engine is float32-only; pass "
                             "use_tile_engine=False for other dtypes")

        self.shards = build_halo_shards(mesh, D)
        sh = self.shards
        pts = mesh.points
        mins, maxs = pts.min(0), pts.max(0)
        self.stats = quality.MeshStats(
            sh.min_edge_length, sh.max_edge_length,
            float((maxs[0] - mins[0]) + (maxs[1] - mins[1])
                  + (maxs[2] + mins[2])))
        self.params = params.resolve(self.stats.min_edge_length)

        if normalize:
            self._center = mesh.points.mean(axis=0)
            self._scale = 1.0 / max(self.stats.min_edge_length, 1e-300)
        else:
            self._center = np.zeros(3)
            self._scale = 1.0

        self.jmesh = Mesh(np.array(self.devices), ("shard",))
        self._shard0 = NamedSharding(self.jmesh, P("shard"))
        self._rep0 = NamedSharding(self.jmesh, P())
        put = self._put

        pts_n = ((sh.local_points - self._center) * self._scale)
        if self.use_tile_engine:
            # Same fallback contract as the single-chip Smoother
            # (driver.py): engine-construction ValueErrors (point
            # degree > 31, point_points width > 15, pool-locality
            # violations) degrade to the engine-less dense path with a
            # warning instead of crashing (ADVICE r4 medium).
            interpret = jax.default_backend() != "tpu"
            try:
                self.engine, self._stacked_arr = build_stacked_engines(
                    sh.topos, interpret)
            except ValueError as e:
                import warnings

                warnings.warn(
                    f"tile engine unavailable for this mesh ({e}); "
                    "falling back to the engine-less halo path",
                    RuntimeWarning)
                self.use_tile_engine = False
        if self.use_tile_engine:
            # The default halo iteration is pure iteration_body_planar:
            # stage only the planar key set (halves per-shard device
            # topology); the dense layer/boundary path upgrades to the
            # full dict in _activate_dense()
            self._td_full = False
            self.td = self._stage_td(full=False)
            self.arrays = {k: put(v) for k, v in
                           self._stacked_arr.items()}

            # initial planar point state (4, W): xyz + is-internal flag
            Wpl = planar_width(sh.n_padded_points)
            p4 = np.zeros((D, 4, Wpl), np.float32)
            for d in range(D):
                p4[d, :3, :sh.n_padded_points] = pts_n[d].T
                p4[d, 3, :sh.n_padded_points] = \
                    sh.topos[d].is_internal_point.astype(np.float32)
            self.pts4 = put(p4)
            ow = np.zeros((D, Wpl), dtype=bool)
            ow[:, :sh.n_padded_points] = sh.owned
            self.owned = put(ow)
        else:
            # Engine-less halo driver: the dense XLA iteration per
            # shard (any dtype/backend; the at-scale CPU artifact and
            # the float64 oracle-parity path)
            self.engine = None
            self._stacked_arr = {}
            self._td_full = True
            self.td = self._stage_td(full=True)
            self.arrays = {}
            self.pts4 = None
            self.owned = None
        self.owned_dense = put(sh.owned)
        self.slot = put(sh.shared_slot_local.astype(np.int32))
        self.valid = put(sh.shared_valid)
        self.owner_is_me = put(sh.shared_owner_is_me)

        self.face_angle_chunk = default_face_angle_chunk(sh.topos[0])
        self.iter_batch = int(
            __import__("os").environ.get("SMOOTHMESH_ITER_BATCH", "16"))
        self._batch = None
        self._batch_dense = None
        self._iteration = 0

        # Layer / boundary state (dense iteration path)
        N = sh.n_padded_points
        self._dense = False
        self.points_dense = None
        self.layer = None
        self.bnd = None
        self.layer_maps = None
        self._setup_topo = None
        self._bnd_shard = {}
        self._bnd_rep = {}
        self._bnd_scalars = {}
        self.do_boundary_smoothing = False
        npdt = np.dtype(self.dtype)
        self.normals = put(np.zeros((D, N, 3), npdt))
        self.smoothing_surface = put(np.zeros((D, N), dtype=bool))
        layer_ids = sh.topos[0].patch_ids_matching(
            self.params.layer_patches)
        if (len(layer_ids)
                and self.params.layer_max_blending_fraction > 1e-15):
            from smoothmesh_tpu.parallel import scatter

            self._setup_maps()
            g2ls = scatter.g2l_maps(sh.l2g, mesh.n_points)
            layer_host, ninit = scatter.scatter_layer_maps(
                self.layer_maps, sh.l2g, g2ls, N)
            self.layer = {k: put(v) for k, v in layer_host.items()}
            self.normals = put(ninit.astype(npdt))
            self._activate_dense()
            self._free_global_setup()
        if not self.use_tile_engine:
            self._activate_dense()

    # -- device staging helpers ---------------------------------------------
    def _put(self, x):
        import jax
        import jax.numpy as jnp

        return jax.device_put(jnp.asarray(x), self._shard0)

    def _put_rep(self, x, dtype=None):
        import jax
        import jax.numpy as jnp

        return jax.device_put(jnp.asarray(x, dtype=dtype), self._rep0)

    def _stage_td(self, full: bool):
        import numpy as np

        from smoothmesh_tpu.device import to_device
        from smoothmesh_tpu.driver import PLANAR_TD_KEYS

        keys = None if full else PLANAR_TD_KEYS
        tds = [to_device(t, keys) for t in self.shards.topos]
        tds = [{k: np.asarray(v) for k, v in td.items()} for td in tds]
        td_stack = {k: np.stack([td[k] for td in tds]) for k in tds[0]}
        self._td_full = full
        return {k: self._put(v) for k, v in td_stack.items()}

    # -- one-time global setup (layer maps / boundary classification) -------
    def _global_setup(self):
        """Transient GLOBAL topology for one-time setup (hop BFS,
        prismatic maps, boundary classification — reference
        src/smoothMesh.C:2190-2230).  Freed after setup: the
        per-iteration path and quality() stay global-topology-free."""
        if self._setup_topo is None:
            self._setup_topo = compile_topology(self.mesh_host)
        return self._setup_topo

    def _free_global_setup(self):
        self._setup_topo = None

    def _setup_maps(self):
        if self.layer_maps is not None:
            return
        from smoothmesh_tpu import layers as lay

        topo = self._global_setup()
        bn, sharp = lay.boundary_point_normals_np(
            self.mesh_host.points, topo)
        layer_ids = topo.patch_ids_matching(self.params.layer_patches)
        smoothing_ids = topo.patch_ids_matching(
            self.params.smoothing_patches)
        self.layer_maps = lay.build_layer_maps(
            topo, bn, sharp, layer_ids, smoothing_ids,
            self.params.max_layers)

    def _activate_dense(self):
        """Switch the carried state to the dense per-shard layout used
        by the layer/boundary (and engine-less) iteration
        (driver.iteration_body)."""
        import numpy as np

        if not self._td_full:
            self.td = self._stage_td(full=True)
        if not self._dense:
            if self.pts4 is not None:
                lp = self.points    # planar -> (D, N, 3) np, normalized
            else:
                lp = ((self.shards.local_points - self._center)
                      * self._scale)
            self.points_dense = self._put(
                np.asarray(lp, np.dtype(self.dtype)))
            self._dense = True
        self._batch_dense = None

    def enable_boundary_smoothing(
        self, surf_vertices, surf_tris, init_edge_points, init_edges,
        target_edge_points=None, target_edges=None,
        checkpoint_corner=None, checkpoint_feature=None,
    ):
        """Halo-sharded boundary point smoothing: classification runs
        once globally on host (reference classifyBoundaryPoints,
        bPS.C:269-441), restricted per shard; per-iteration projections
        are shard-local for owned points (complete stencils) with one
        proposal consensus (HaloDenseSync)."""
        import numpy as np

        from smoothmesh_tpu import boundary as bps
        from smoothmesh_tpu.parallel import scatter

        mesh = self.mesh_host
        sh = self.shards
        N = sh.n_padded_points
        if target_edge_points is None:
            target_edge_points, target_edges = init_edge_points, init_edges
        bps.check_edge_mesh_sanity(init_edge_points, init_edges,
                                   self.stats.min_edge_length,
                                   self.stats.perimeter)
        bps.check_edge_mesh_sanity(target_edge_points, target_edges,
                                   self.stats.min_edge_length,
                                   self.stats.perimeter)
        self._setup_maps()
        topo = self._global_setup()
        layer_ids = topo.patch_ids_matching(self.params.layer_patches)
        smoothing_ids = topo.patch_ids_matching(
            self.params.smoothing_patches)
        setup = bps.classify_boundary_points(
            topo, init_edge_points, init_edges,
            target_edge_points, target_edges, surf_vertices, surf_tris,
            layer_ids, smoothing_ids, mesh.points,
            self.params.distance_tolerance,
            checkpoint_corner=checkpoint_corner,
            checkpoint_feature=checkpoint_feature)
        self.boundary_setup = setup

        def t(x):
            return ((np.asarray(x, dtype=np.float64) - self._center)
                    * self._scale)

        g2ls = scatter.g2l_maps(sh.l2g, mesh.n_points)
        bnd_sh, bnd_rep, scalars = scatter.scatter_boundary_setup(
            setup, self.layer_maps, sh.l2g, g2ls, sh.topos, N, t,
            self._scale)
        put, put_rep = self._put, self._put_rep
        npdt = np.dtype(self.dtype)
        self._bnd_shard = {
            k: put(v.astype(npdt) if v.dtype == np.float64 else v)
            for k, v in bnd_sh.items()}
        self._bnd_rep = {
            k: put_rep(v, npdt if v.dtype == np.float64 else None)
            for k, v in bnd_rep.items()}
        if npdt == np.float32:
            from smoothmesh_tpu.ops.raycast import pack_triangles

            self._bnd_rep["tri_packed"] = put_rep(pack_triangles(
                t(setup.surf_tri_a), t(setup.surf_tri_b),
                t(setup.surf_tri_c)))
        self._bnd_scalars = scalars
        self.bnd = self._bnd_shard
        self.smoothing_surface = put(bnd_sh["smoothing_surface"])
        ninit = scatter.restrict_vectors(
            self.layer_maps.normals_init, sh.l2g, N)
        self.normals = put(ninit.astype(npdt))
        self.do_boundary_smoothing = True
        self._activate_dense()
        self._free_global_setup()
        return setup

    # -- jitted batched step ------------------------------------------------
    def _build_batch(self):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from smoothmesh_tpu.driver import iteration_body_planar

        p = self.params
        s = self._scale
        chunk = self.face_angle_chunk
        engine = self.engine
        B = self.iter_batch
        td_specs = {k: P("shard") for k in self.td}
        arr_specs = {k: P("shard") for k in self.arrays}

        # Measurement-only knob (experiments): drop the halo sync hooks
        # so shard_map/stacking glue can be timed separately from the
        # consensus/OR-combine ops.  NOT semantics-preserving at D>1.
        import os as _os
        nosync = _os.environ.get("SMOOTHMESH_HALO_NOSYNC") == "1"

        def local_batch(pts4, td, arr, slot, valid, own, owned, n_valid):
            sync = PlanarSync(slot[0], valid[0], own[0])
            halo = None if nosync else {"sync": sync, "owned": owned[0]}
            tdl = {k: v[0] for k, v in td.items()}
            arrl = {k: v[0] for k, v in arr.items()}

            def body(i, state):
                pl, done, o_res, o_nf, o_ran = state
                skip = done | (i >= n_valid)
                new_pl, res, nf = iteration_body_planar(
                    pl, tdl, p, s, chunk, engine, arrl, skip=skip,
                    halo=halo)
                new_done = skip | (res < p.rel_tol)
                zero = jnp.asarray(0, jnp.int32)
                return (new_pl, new_done,
                        o_res.at[i].set(jnp.where(
                            skip, jnp.nan, res).astype(jnp.float32)),
                        o_nf.at[i].set(jnp.where(
                            skip, zero, nf.astype(jnp.int32))),
                        o_ran.at[i].set(~skip))

            init = (pts4[0], jnp.asarray(False),
                    jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32),
                    jnp.zeros(B, bool))
            pl, _, o_res, o_nf, o_ran = jax.lax.fori_loop(
                0, B, body, init)
            return (pl[None], o_res[None], o_nf[None], o_ran[None])

        sm = jax.shard_map(
            local_batch,
            mesh=self.jmesh,
            in_specs=(P("shard"), td_specs, arr_specs, P("shard"),
                      P("shard"), P("shard"), P("shard"), P()),
            out_specs=(P("shard"), P("shard"), P("shard"), P("shard")),
            check_vma=False,
        )
        return jax.jit(sm)

    def _build_batch_dense(self):
        """B dense iterations per dispatch under shard_map — the
        layer/boundary path (driver.iteration_body per shard with
        halo-consensus sync)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from smoothmesh_tpu.driver import iteration_body
        from smoothmesh_tpu.parallel.sync import HaloDenseSync

        p = self.params
        s = self._scale
        chunk = self.face_angle_chunk
        engine = self.engine
        B = self.iter_batch
        do_boundary = self.do_boundary_smoothing
        has_layer = self.layer is not None
        has_bnd = bool(self._bnd_shard)
        dist_tol = self._bnd_scalars.get("distance_tolerance", 0.0)
        n_tri = self._bnd_scalars.get("n_tri", 0)
        fatal_miss = bool(p.ray_miss_fatal) and has_bnd

        td_specs = {k: P("shard") for k in self.td}
        arr_specs = {k: P("shard") for k in self.arrays}
        layer = self.layer or {}
        layer_specs = {k: P("shard") for k in layer}
        bnd_sh = self._bnd_shard
        bnd_rep = self._bnd_rep
        bnd_sh_specs = {k: P("shard") for k in bnd_sh}
        bnd_rep_specs = {k: P() for k in bnd_rep}

        def local_batch(points, normals, smoothing_surface, td, arr,
                        layer_blk, bnd_sh_blk, bnd_rep_blk, slot, valid,
                        own, owned, n_valid):
            sync = HaloDenseSync(slot[0], valid[0], own[0], owned[0])
            tdl = {k: v[0] for k, v in td.items()}
            arrl = {k: v[0] for k, v in arr.items()}
            layer_loc = ({k: v[0] for k, v in layer_blk.items()}
                         if has_layer else None)
            bnd_loc = None
            if has_bnd:
                bnd_loc = {k: v[0] for k, v in bnd_sh_blk.items()}
                bnd_loc.update(bnd_rep_blk)
                bnd_loc["distance_tolerance"] = dist_tol
                bnd_loc["n_tri"] = n_tri

            def body(i, state):
                pts, norms, done, o_res, o_nf, o_nm, o_ran = state
                np_, nn, res, nf, nm = iteration_body(
                    pts, smoothing_surface[0], norms, tdl, p, s,
                    do_boundary, layer=layer_loc, bnd=bnd_loc,
                    sync=sync, chunk=chunk, engine=engine,
                    engine_arrays=arrl, owned=owned[0])
                stop = res < p.rel_tol
                if fatal_miss:
                    stop = stop | (nm > 0)
                skip = done | (i >= n_valid)
                zero = jnp.asarray(0, jnp.int32)
                return (jnp.where(skip, pts, np_),
                        jnp.where(skip, norms, nn),
                        jnp.where(skip, done, stop),
                        o_res.at[i].set(jnp.where(
                            skip, jnp.nan, res).astype(points.dtype)),
                        o_nf.at[i].set(jnp.where(
                            skip, zero, nf.astype(jnp.int32))),
                        o_nm.at[i].set(jnp.where(
                            skip, zero, nm.astype(jnp.int32))),
                        o_ran.at[i].set(~skip))

            init = (points[0], normals[0], jnp.asarray(False),
                    jnp.zeros(B, points.dtype), jnp.zeros(B, jnp.int32),
                    jnp.zeros(B, jnp.int32), jnp.zeros(B, bool))
            pts, norms, _, o_res, o_nf, o_nm, o_ran = jax.lax.fori_loop(
                0, B, body, init)
            return (pts[None], norms[None], o_res[None], o_nf[None],
                    o_nm[None], o_ran[None])

        sm = jax.shard_map(
            local_batch,
            mesh=self.jmesh,
            in_specs=(P("shard"), P("shard"), P("shard"), td_specs,
                      arr_specs, layer_specs, bnd_sh_specs,
                      bnd_rep_specs, P("shard"), P("shard"), P("shard"),
                      P("shard"), P()),
            out_specs=(P("shard"),) * 6,
            check_vma=False,
        )
        return jax.jit(sm)

    def _steps_dense(self, n: int):
        import time

        import jax.numpy as jnp
        import numpy as np

        from smoothmesh_tpu.driver import RAY_MISS_MSG, StepResult

        if self._batch_dense is None:
            self._batch_dense = self._build_batch_dense()
        results = []
        p = self.params
        while n > 0:
            n_valid = min(n, self.iter_batch)
            t0 = time.time()
            pts, norms, res, nf, nm, ran = self._batch_dense(
                self.points_dense, self.normals, self.smoothing_surface,
                self.td, self.arrays, self.layer or {},
                self._bnd_shard, self._bnd_rep,
                self.slot, self.valid, self.owner_is_me,
                self.owned_dense, jnp.asarray(n_valid, jnp.int32))
            res = np.asarray(res)[0]          # host sync
            wall = (time.time() - t0) * 1e3
            nf = np.asarray(nf)[0]
            nm = np.asarray(nm)[0]
            k = int(np.asarray(ran)[0].sum())
            self.points_dense = pts
            self.normals = norms
            for i in range(k):
                self._iteration += 1
                results.append(StepResult(
                    self._iteration, float(res[i]), int(nf[i]),
                    wall / max(k, 1), int(nm[i])))
            if p.ray_miss_fatal and k and nm[:k].sum():
                raise RuntimeError(RAY_MISS_MSG.format(
                    n=int(nm[:k].max())))
            if k == 0 or res[k - 1] < p.rel_tol:
                break
            n -= k
        return results

    def steps(self, n: int):
        import time

        import jax.numpy as jnp
        import numpy as np

        from smoothmesh_tpu.driver import StepResult

        if self._dense:
            return self._steps_dense(n)
        if self._batch is None:
            self._batch = self._build_batch()
        results = []
        p = self.params
        while n > 0:
            n_valid = min(n, self.iter_batch)
            t0 = time.time()
            pts4, res, nf, ran = self._batch(
                self.pts4, self.td, self.arrays, self.slot, self.valid,
                self.owner_is_me, self.owned,
                jnp.asarray(n_valid, jnp.int32))
            res = np.asarray(res)[0]          # host sync
            wall = (time.time() - t0) * 1e3
            nf = np.asarray(nf)[0]
            k = int(np.asarray(ran)[0].sum())
            self.pts4 = pts4
            for i in range(k):
                self._iteration += 1
                results.append(StepResult(
                    self._iteration, float(res[i]), int(nf[i]),
                    wall / max(k, 1)))
            if k == 0 or res[k - 1] < p.rel_tol:
                break
            n -= k
        return results

    def step(self):
        r = self.steps(1)
        return r[0] if r else None

    def run(self, log=print, on_write=None, profile_dir=None):
        import contextlib
        import time

        import jax

        from smoothmesh_tpu.driver import StepResult

        ctx = (jax.profiler.trace(profile_dir) if profile_dir
               else contextlib.nullcontext())
        p = self.params
        t0 = time.time()
        result = StepResult(0, float("inf"), 0)
        iter_ms = []
        done = 0
        with ctx:
            while done < p.centroidal_iters:
                n = p.centroidal_iters - done
                if on_write and p.write_interval > 0:
                    boundary = ((done // p.write_interval) + 1) \
                        * p.write_interval
                    n = min(n, boundary - done)
                rs = self.steps(n)
                for r in rs:
                    iter_ms.append(r.wall_ms)
                    if log:
                        log(f"Smoothing iteration={r.iteration} "
                            f"nFrozenPoints={r.n_frozen} "
                            f"residual={r.residual:.6g}")
                if rs:
                    result = rs[-1]
                done += len(rs)
                stop = result.residual < p.rel_tol
                if stop and log:
                    log("Residual reached relTol, stopping.")
                if on_write and (stop or done >= p.centroidal_iters
                                 or (p.write_interval > 0
                                     and done % p.write_interval == 0
                                     and done > 1)):
                    on_write(result.iteration, self.denormalize())
                if stop or not rs:
                    break
        if log:
            skip = min(max(self.iter_batch, 1), max(len(iter_ms) - 1, 0))
            steady = iter_ms[skip:] or iter_ms
            if steady:
                mean_ms = sum(steady) / len(steady)
                rate = self.mesh_host.n_points / (mean_ms / 1e3)
                log(f"Performance: {mean_ms:.1f} ms/iteration, "
                    f"{rate:,.0f} point-updates/s "
                    f"({self.shards.n_shards} halo shards)")
            log(f"ClockTime = {time.time() - t0:.1f} s.")
        return result

    # -- host-side assembly -------------------------------------------------
    @property
    def points(self):
        """(D, Npad, 3) local point blocks (normalized coords)."""
        import numpy as np

        if self._dense:
            return np.asarray(self.points_dense)
        p4 = np.asarray(self.pts4)
        return np.transpose(
            p4[:, :3, :self.shards.n_padded_points], (0, 2, 1))

    def denormalize(self, pts=None) -> np.ndarray:
        lp = np.asarray(self.points if pts is None else pts,
                        dtype=np.float64)
        glob = self.shards.gather_global_points(lp)
        return glob / self._scale + self._center

    def quality(self) -> dict:
        """Global quality report assembled from per-shard parts.

        Each face/edge/cell is claimed by exactly one shard whose local
        closure is complete (HaloShards claims), so no global topology
        compile is needed — at 10M cells the global compile alone costs
        minutes and ~13 GB host RAM.
        """
        import jax.numpy as jnp

        from smoothmesh_tpu import quality
        from smoothmesh_tpu.device import to_device

        sh = self.shards
        lp = self.points                     # (D, Npad, 3) normalized
        parts = []
        for d in range(sh.n_shards):
            # quality never runs the face-angle kernel: skip the packed
            # FA tables (host packing time + duplicate device memory)
            td = to_device(sh.topos[d], fa_packed=False)
            parts.append(quality.quality_report_parts(
                jnp.asarray(lp[d], dtype=self.dtype), td,
                face_claim=jnp.asarray(sh.claim_face[d]),
                edge_claim=jnp.asarray(sh.claim_edge[d]),
                cell_claim=jnp.asarray(sh.claim_cell[d])))
        rep = quality.combine_quality_parts(parts)
        s = self._scale
        for k in ("min_edge_length", "max_edge_length"):
            rep[k] /= s
        for k in ("min_volume", "max_volume", "total_volume",
                  "min_pyramid_volume"):
            rep[k] /= s ** 3
        return rep
