"""On-device mesh geometry, recomputed each iteration from points.

The reference relies on OpenFOAM's ``mesh.cellCentres()`` / ``mesh.C()``
(reference src/smoothMesh.C:129, :1218) which ``mesh.movePoints`` keeps
up to date each iteration (:2399).  Matching OpenFOAM's *decomposition
based* centroids exactly matters for quality-metric parity (SURVEY.md
hard part #2), so this module reimplements the algorithms of OpenFOAM's
``primitiveMesh`` face/cell geometry as vectorized JAX over the padded
topology arrays:

  - face centre/area: fan decomposition of the polygon about the vertex
    average; area-weighted sub-triangle centroid average.
  - cell centre/volume: face-pyramid decomposition about the average of
    face centres; pyramid-volume-weighted centroid average.

Everything is mask-safe for padded slots and jit/vmap-friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

ROOT_VSMALL = 1e-18
VSMALL = 1e-30


class FaceGeometry(NamedTuple):
    centres: jnp.ndarray   # (F, 3)
    areas: jnp.ndarray     # (F, 3) area vectors (owner-outward normal)
    mags: jnp.ndarray      # (F,) area magnitudes


def face_centres_areas(points, face_points, face_points_next, face_mask,
                       face_npoints) -> FaceGeometry:
    """OpenFOAM-style face centres and area vectors for all faces.

    The cyclic next-vertex coordinates come from rolling the gathered
    block (slot n-1 wraps to slot 0) instead of a second full gather —
    TPU gathers dominate this kernel's cost.
    """
    dtype = points.dtype
    del face_points_next  # superseded by the roll; kept for API parity
    p = points[face_points]          # (F, W, 3)
    W = face_points.shape[1]
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    is_last = slot == (face_npoints.astype(jnp.int32)[:, None] - 1)
    rolled = jnp.roll(p, -1, axis=1)
    nxt = jnp.where(is_last[..., None], p[:, :1, :], rolled)
    m = face_mask[..., None].astype(dtype)
    n_pts = face_npoints.astype(dtype)[:, None]

    f_centre = jnp.sum(p * m, axis=1) / n_pts          # vertex average (F, 3)

    fc = f_centre[:, None, :]
    c = p + nxt + fc                                    # (F, W, 3)
    n_vec = jnp.cross(nxt - p, fc - p)                  # (F, W, 3)
    a = jnp.linalg.norm(n_vec, axis=-1, keepdims=True)  # (F, W, 1)

    sum_n = jnp.sum(n_vec * m, axis=1)
    sum_a = jnp.sum(a * m, axis=1)                      # (F, 1)
    sum_ac = jnp.sum(a * c * m, axis=1)

    good = sum_a[:, 0] > ROOT_VSMALL
    centres = jnp.where(
        good[:, None], sum_ac / (3.0 * jnp.maximum(sum_a, VSMALL)), f_centre
    )
    areas = jnp.where(good[:, None], 0.5 * sum_n, jnp.zeros_like(sum_n))
    mags = jnp.linalg.norm(areas, axis=-1)
    return FaceGeometry(centres, areas, mags)


def cell_centres_vols(face_geo: FaceGeometry, owner, cell_faces,
                      cell_faces_mask) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """OpenFOAM-style cell centres and volumes.

    Matches primitiveMesh::makeCellCentresAndVols: estimate the centre
    as the mean of the cell's face centres, then average face-pyramid
    centroids weighted by (signed) pyramid volumes.
    """
    f_ctrs = face_geo.centres[cell_faces]        # (C, W, 3)
    f_areas = face_geo.areas[cell_faces]         # (C, W, 3)
    dtype = f_ctrs.dtype
    m = cell_faces_mask[..., None].astype(dtype)
    n_faces = jnp.sum(cell_faces_mask, axis=1).astype(dtype)[:, None]

    c_est = jnp.sum(f_ctrs * m, axis=1) / jnp.maximum(n_faces, 1.0)

    # Sign: +1 when this cell owns the face (outward area), else -1
    cell_ids = jnp.arange(cell_faces.shape[0], dtype=cell_faces.dtype)[:, None]
    sign = jnp.where(owner[cell_faces] == cell_ids, 1.0, -1.0).astype(dtype)

    d = f_ctrs - c_est[:, None, :]
    pyr3vol = sign * jnp.sum(f_areas * d, axis=-1)          # (C, W)
    pc = 0.75 * f_ctrs + 0.25 * c_est[:, None, :]

    vol3 = jnp.sum(pyr3vol * cell_faces_mask, axis=1)       # (C,)
    ctr_num = jnp.sum(
        (pyr3vol * cell_faces_mask)[..., None] * pc, axis=1
    )
    good = jnp.abs(vol3) > VSMALL
    centres = jnp.where(
        good[:, None], ctr_num / jnp.where(good, vol3, 1.0)[:, None], c_est
    )
    vols = vol3 / 3.0
    return centres, vols


def cell_centres(points, topo_dev) -> jnp.ndarray:
    """Convenience: cell centres from points + device topology dict."""
    fg = face_centres_areas(
        points,
        topo_dev["face_points"],
        topo_dev["face_points_next"],
        topo_dev["face_mask"],
        topo_dev["face_npoints"],
    )
    ctrs, _ = cell_centres_vols(
        fg, topo_dev["owner"], topo_dev["cell_faces"],
        topo_dev["cell_faces_mask"],
    )
    return ctrs


def boundary_point_normals(points, topo_dev):
    """Inward area-normalized point normals on real boundary patches.

    Reimplements ``calculateBoundaryPointNormals`` (reference
    src/orthogonalBoundaryBlending.C:141-233): sum of inverted unit face
    normals of adjacent non-processor / non-empty patch faces; points
    whose summed normal has magnitude < 0.1 are "sharp edge points" and
    get a zero normal; otherwise the normal is normalized.

    Returns (normals (N, 3), is_sharp (N,), n_bnd_faces (N,)).
    """
    dtype = points.dtype
    fg = face_centres_areas(
        points,
        topo_dev["face_points"],
        topo_dev["face_points_next"],
        topo_dev["face_mask"],
        topo_dev["face_npoints"],
    )
    unit = fg.areas / jnp.maximum(fg.mags, VSMALL)[:, None]

    pf = topo_dev["point_faces"]                 # (N, W)
    pf_mask = topo_dev["point_faces_mask"]
    eligible = topo_dev["face_is_real_boundary"]  # (F,) bool
    sel = pf_mask & eligible[pf]
    selw = sel[..., None].astype(dtype)

    normals = -jnp.sum(unit[pf] * selw, axis=1)
    n_faces = jnp.sum(sel, axis=1)

    mag = jnp.linalg.norm(normals, axis=-1)
    has = n_faces >= 1
    is_sharp = has & (mag < 0.1)
    keep = has & (mag >= 0.1)
    normals = jnp.where(
        keep[:, None], normals / jnp.maximum(mag, VSMALL)[:, None],
        jnp.zeros_like(normals),
    )
    return normals, is_sharp, n_faces
