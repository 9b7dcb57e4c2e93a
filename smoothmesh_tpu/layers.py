"""Orthogonal boundary-layer blending (reference
src/orthogonalBoundaryBlending.C).

Setup (host, once — the reference builds these distributed because it
never holds the global mesh; we do, so the hop BFS and prismatic maps
are computed globally in numpy and shipped to shards):

  - hop counts to layer/smoothing boundaries
    (``calculatePointHopsToBoundary`` oBB.C:52-134 — note the
    reference's deliberate quirk: an internal point's hop count is
    max(neighbour hops)+1, giving layer *indices* along prismatic
    stacks, not geodesic distance)
  - prismatic outer/inner neighbour maps (``propagateOuterNeighInfo``
    oBB.C:244-391, ``propagateInnerNeighInfo`` :396-459), including
    multiply-connected invalidation and normal propagation along unique
    prismatic edges

Per-iteration (device):
  - stateful boundary point normals (``calculateBoundaryPointNormals``
    oBB.C:141-233 — the reference accumulates into the previous,
    already-normalized field each iteration; replicated exactly)
  - neighbour coordinate exchange (``updateNeighCoords`` :464-501)
  - orthogonal blending (``blendWithOrthogonalPoints`` :507-567)
  - prismatic projection of boundary points
    (``projectPrismaticInternalPointsToSurfaces`` :573-633)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from smoothmesh_tpu.mesh.topology import MeshTopology

UNDEF = -1


def patch_point_mask(topo: MeshTopology, patch_ids) -> np.ndarray:
    """Points on any face of the given patches (reference
    getPatchPointIndices, oBB.C:22-46)."""
    mask = np.zeros(topo.n_points, dtype=bool)
    sel = np.isin(topo.face_patch, np.asarray(patch_ids, dtype=np.int64))
    pts = topo.face_points[sel][topo.face_mask[sel]]
    mask[pts] = True
    return mask


def connected_to_internal(topo: MeshTopology) -> np.ndarray:
    """Boundary points with at least one internal neighbour (reference
    classifyBoundaryPoints, bPS.C:332-340)."""
    internal = topo.is_internal_point
    nb_internal = internal[topo.point_points] & topo.point_points_mask
    return ~internal & nb_internal.any(axis=1)


def point_hops_to_boundary(topo: MeshTopology, patch_ids,
                           is_connected: np.ndarray,
                           max_iter: int) -> np.ndarray:
    """Reference calculatePointHopsToBoundary (oBB.C:52-134), global."""
    hops = np.full(topo.n_points, UNDEF, dtype=np.int64)
    seed = patch_point_mask(topo, patch_ids) & is_connected
    hops[seed] = 0
    internal = topo.is_internal_point
    pp = topo.point_points
    ppm = topo.point_points_mask
    new_hops = np.full(topo.n_points, -1, dtype=np.int64)
    for _ in range(max_iter):
        nb = np.where(ppm, hops[pp], -1)
        max_nb = nb.max(axis=1)
        cand = (hops < 0) & internal & (max_nb >= 0)
        new_hops[cand] = max_nb[cand] + 1
        grow = new_hops > hops
        hops[grow] = new_hops[grow]
    return hops


@dataclasses.dataclass
class LayerMaps:
    hops_layer: np.ndarray          # (N,)
    hops_smoothing: np.ndarray      # (N,)
    outer_map: np.ndarray           # (N,) point -> outer (boundary-ward)
    inner_map: np.ndarray           # (N,) boundary point -> first inner
    normals_init: np.ndarray        # (N, 3) incl. propagated internal
    is_sharp_init: np.ndarray       # (N,)
    layer_surface: np.ndarray       # (N,) bool
    smoothing_surface: np.ndarray   # (N,) bool
    is_connected: np.ndarray        # (N,) bool


def build_layer_maps(topo: MeshTopology, boundary_normals: np.ndarray,
                     is_sharp: np.ndarray, layer_patch_ids,
                     smoothing_patch_ids, max_layers: int) -> LayerMaps:
    """One-time setup equivalent of reference src/smoothMesh.C:2215-2230."""
    from smoothmesh_tpu.boundary import classifying_patch

    is_conn = connected_to_internal(topo)
    hops_layer = point_hops_to_boundary(topo, layer_patch_ids, is_conn,
                                        max_layers + 1)
    hops_smooth = point_hops_to_boundary(topo, smoothing_patch_ids, is_conn,
                                         2)
    # Surface-point flags use the reference's first-patch-wins
    # classification (bPS.C:301-318); the hop seeds above use the plain
    # any-face patch membership (getPatchPointIndices), matching the two
    # different reference code paths.
    cpatch = classifying_patch(topo)
    internal = topo.is_internal_point
    layer_surface = (~internal & (cpatch >= 0)
                     & np.isin(cpatch, np.asarray(layer_patch_ids)))
    smoothing_surface = (~internal & (cpatch >= 0)
                         & np.isin(cpatch, np.asarray(smoothing_patch_ids)))

    normals = boundary_normals.astype(np.float64).copy()
    internal = topo.is_internal_point
    pp = topo.point_points
    ppm = topo.point_points_mask

    outer_map = np.full(topo.n_points, UNDEF, dtype=np.int64)
    invalid = np.zeros(topo.n_points, dtype=bool)

    # propagateOuterNeighInfo (oBB.C:244-391): level by level towards
    # the interior; a point maps outward iff exactly one neighbour has
    # hop-1; a boundary target must be on a layer patch; a target
    # claimed twice invalidates all claimants (and the invalidation
    # propagates to higher levels through the copied normals).
    for lvl in range(1, max_layers + 2):
        at_lvl = hops_layer == lvl
        nb_low = ppm & (hops_layer[pp] == lvl - 1)
        n_low = nb_low.sum(axis=1)
        # reference keeps the *last* matching neighbour; unique anyway
        last_slot = np.where(
            nb_low.any(axis=1),
            nb_low.shape[1] - 1 - np.argmax(nb_low[:, ::-1], axis=1), 0)
        neigh = pp[np.arange(topo.n_points), last_slot]
        cand = at_lvl & (n_low == 1)
        ok_target = internal[neigh] | layer_surface[neigh]
        cand &= ok_target
        # conflicts
        claims = np.zeros(topo.n_points, dtype=np.int64)
        np.add.at(claims, neigh[cand], 1)
        conflict = cand & (claims[neigh] >= 2)
        good = cand & ~conflict
        outer_map[good] = neigh[good]
        normals[good] = normals[neigh[good]]
        invalid[good] |= invalid[neigh[good]]   # propagate invalidation
        invalid[conflict] = True

    normals[invalid] = 0.0
    outer_map[invalid] = UNDEF

    # propagateInnerNeighInfo (oBB.C:396-459)
    inner_map = np.full(topo.n_points, UNDEF, dtype=np.int64)
    nb_hi = ppm & (hops_smooth[pp] == 1)
    n_hi = nb_hi.sum(axis=1)
    last_slot = np.where(
        nb_hi.any(axis=1),
        nb_hi.shape[1] - 1 - np.argmax(nb_hi[:, ::-1], axis=1), 0)
    neigh_hi = pp[np.arange(topo.n_points), last_slot]
    ok = smoothing_surface & is_conn & (hops_smooth == 0) & (n_hi == 1)
    inner_map[ok] = neigh_hi[ok]

    return LayerMaps(
        hops_layer=hops_layer,
        hops_smoothing=hops_smooth,
        outer_map=outer_map,
        inner_map=inner_map,
        normals_init=normals,
        is_sharp_init=np.asarray(is_sharp, dtype=bool),
        layer_surface=layer_surface,
        smoothing_surface=smoothing_surface,
        is_connected=is_conn,
    )


def boundary_point_normals_np(points: np.ndarray, topo: MeshTopology):
    """Host/numpy twin of geometry.boundary_point_normals for global
    setup on meshes that never materialize on one device (sharded)."""
    fp = topo.face_points
    fm = topo.face_mask
    fn = np.maximum(topo.face_npoints.astype(np.float64), 1.0)
    p = points[fp]
    f_centre = (p * fm[..., None]).sum(axis=1) / fn[:, None]
    nxt = points[topo.face_points_next]
    nv = np.cross(nxt - p, f_centre[:, None, :] - p)
    a = np.linalg.norm(nv, axis=-1, keepdims=True)
    sum_n = (nv * fm[..., None]).sum(axis=1)
    sum_a = (a * fm[..., None]).sum(axis=1)
    areas = np.where(sum_a > 1e-18, 0.5 * sum_n, 0.0)
    mags = np.linalg.norm(areas, axis=-1)
    unit = areas / np.maximum(mags, 1e-300)[:, None]

    real_patch = np.array([t not in ("processor", "empty")
                           for t in topo.patch_types])
    eligible = np.zeros(topo.n_faces, dtype=bool)
    bnd = topo.face_patch >= 0
    eligible[bnd] = real_patch[topo.face_patch[bnd]]

    pf = topo.point_faces
    sel = topo.point_faces_mask & eligible[pf]
    normals = -(unit[pf] * sel[..., None]).sum(axis=1)
    n_faces = sel.sum(axis=1)
    mag = np.linalg.norm(normals, axis=-1)
    has = n_faces >= 1
    is_sharp = has & (mag < 0.1)
    normals[is_sharp] = 0.0
    nz = (mag > 0) & ~is_sharp
    normals[nz] /= mag[nz][:, None]
    return normals, is_sharp


# ---------------------------------------------------------------------------
# Per-iteration device kernels
# ---------------------------------------------------------------------------

def accumulate_point_normals(points, td, prev_normals, sync=None,
                             face_areas=None):
    """Stateful normal update: add the inward unit normals of adjacent
    real-boundary faces to the previous (normalized) field, re-classify
    sharp points, renormalize (reference oBB.C:141-233 called per
    iteration at src/smoothMesh.C:2266 *without* resetting the field).
    Internal points keep their propagated normals untouched.

    ``face_areas``: precomputed (F, 3) face area vectors (the tile
    engine's stage F already produces them — passing them in skips a
    duplicate full face-geometry pass).
    """
    from smoothmesh_tpu import geometry as geo

    dtype = points.dtype
    if face_areas is None:
        fg = geo.face_centres_areas(points, td["face_points"],
                                    td["face_points_next"],
                                    td["face_mask"], td["face_npoints"])
        face_areas = fg.areas
    mags = jnp.linalg.norm(face_areas, axis=-1)
    unit = face_areas / jnp.maximum(mags, 1e-30)[:, None]
    pf = td["point_faces"]
    sel = td["point_faces_mask"] & td["face_is_real_boundary"][pf]
    add = -jnp.sum(unit[pf] * sel[..., None].astype(dtype), axis=1)
    n_faces = jnp.sum(sel, axis=1)
    if sync is not None:
        add = sync.sum(add)
        n_faces = sync.sum(n_faces)

    normals = prev_normals + add
    mag = jnp.linalg.norm(normals, axis=-1)
    has = n_faces >= 1
    is_sharp = has & (mag < 0.1)
    normals = jnp.where(is_sharp[:, None], 0.0, normals)
    nz = mag >= 1e-300 if dtype == jnp.float64 else mag > 0
    norm = jnp.where((nz & ~is_sharp)[:, None],
                     normals / jnp.maximum(mag, 1e-30)[:, None], normals)
    return norm, is_sharp


def update_neigh_coords(points, neigh_map, in_proc, dtype_big, sync=None):
    """Gather mapped neighbour coordinates; off-shard ones arrive via
    the min-magnitude halo combine (reference oBB.C:464-501)."""
    safe = jnp.maximum(neigh_map, 0)
    coords = jnp.where(in_proc[:, None], points[safe], dtype_big)
    if sync is not None:
        coords = sync.min_mag_sqr(coords)
    return coords


def blend_with_orthogonal_points(points, new_points, td, hops, normals,
                                 outer_coords, layer_max_blending_fraction,
                                 layer_edge_length, layer_expansion_ratio,
                                 min_layers, max_layers_plus1):
    """Reference blendWithOrthogonalPoints (oBB.C:507-567).

    ``max_layers_plus1`` carries the reference's call-site +1
    (src/smoothMesh.C:2300).
    """
    dtype = points.dtype
    normal_ok = jnp.any(normals != 0.0, axis=-1)
    ok = (normal_ok & td["is_internal_point"] & (hops >= 1)
          & jnp.all(jnp.abs(outer_coords) < 1e17, axis=-1))

    max_hops = jnp.minimum(hops - 1, max_layers_plus1)
    length = layer_edge_length * jnp.power(
        jnp.asarray(layer_expansion_ratio, dtype), max_hops.astype(dtype))

    slope = -layer_max_blending_fraction / (max_layers_plus1 - min_layers)
    y0 = -slope * max_layers_plus1
    y = y0 + slope * hops.astype(dtype)
    blend = jnp.clip(y, 0.0, layer_max_blending_fraction)

    ortho = outer_coords + length[:, None] * normals
    blended = blend[:, None] * ortho + (1.0 - blend[:, None]) * new_points
    return jnp.where(ok[:, None], blended, new_points)


def project_prismatic_boundary_points(new_points, td, maps_dev,
                                      normals, inner_coords,
                                      is_feature_edge, is_corner, is_sharp,
                                      internal_blend_frac):
    """Reference projectPrismaticInternalPointsToSurfaces (oBB.C:573-633):
    remove the tangential offset of a free smoothing-surface point
    relative to its first inner-layer neighbour along the point normal."""
    ok = (maps_dev["smoothing_surface"] & maps_dev["is_connected"]
          & (maps_dev["inner_map"] >= 0)
          & ~is_feature_edge & ~is_corner & ~is_sharp
          & jnp.any(normals != 0.0, axis=-1)
          & jnp.all(jnp.abs(inner_coords) < 1e17, axis=-1))

    c = new_points
    neigh_vec = c - inner_coords
    dot = jnp.sum(neigh_vec * normals, axis=-1, keepdims=True)
    pvec = neigh_vec - dot * normals
    proj = c - pvec
    out = internal_blend_frac * proj + (1.0 - internal_blend_frac) * c
    return jnp.where(ok[:, None], out, new_points)
