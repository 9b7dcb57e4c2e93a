"""Mesh-quality metrics — the framework's checkMesh equivalent.

The reference validates results with OpenFOAM's external ``checkMesh``
(reference run_tests.sh:31,36); this module provides the equivalent
oracle in-framework: non-orthogonality, skewness, face-face angles,
edge lengths, cell volumes.  Used by tests as the pass/fail oracle and
by the driver for reporting.  Also provides the reference's mesh stats
(min/max edge length + bounding-box perimeter,
src/smoothMesh.C:1478-1541) used for derived parameter defaults.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp
import numpy as np

from smoothmesh_tpu import geometry as geo
from smoothmesh_tpu.ops.constraints import face_angles_for_edges

VSMALL = 1e-30


@dataclasses.dataclass
class MeshStats:
    min_edge_length: float
    max_edge_length: float
    perimeter: float   # sum of bounding-box side lengths (reference quirk:
                       # z-term is max+min, matching src/smoothMesh.C:1538)


def mesh_stats(points: np.ndarray, edges: np.ndarray) -> MeshStats:
    p = np.asarray(points)
    e = np.asarray(edges)
    lengths = np.linalg.norm(p[e[:, 1]] - p[e[:, 0]], axis=1)
    mins = p.min(axis=0)
    maxs = p.max(axis=0)
    perimeter = (maxs[0] - mins[0]) + (maxs[1] - mins[1]) + (maxs[2] + mins[2])
    return MeshStats(float(lengths.min()), float(lengths.max()),
                     float(perimeter))


def quality_report_parts(points, td, face_claim=None, edge_claim=None,
                         cell_claim=None) -> Dict[str, float]:
    """Partial quality aggregates over a claimed entity subset.

    ``*_claim`` restrict which faces/edges/cells this invocation is
    responsible for (None = all).  The halo-sharded driver computes one
    parts dict per shard — each global entity claimed by exactly one
    shard whose local closure is complete — and folds them with
    :func:`combine_quality_parts`; the single-chip path is the
    ``claim=None`` fold of one part.
    """
    dtype = points.dtype
    big = jnp.asarray(np.inf, dtype)
    fg = geo.face_centres_areas(
        points, td["face_points"], td["face_points_next"], td["face_mask"],
        td["face_npoints"])
    cell_ctrs, vols = geo.cell_centres_vols(
        fg, td["owner"], td["cell_faces"], td["cell_faces_mask"])

    # Non-orthogonality (internal faces): angle between face area vector
    # and owner->neighbour centre vector
    has_n = td["has_neighbour"]
    if face_claim is not None:
        has_n = has_n & face_claim
    own_c = cell_ctrs[td["owner"]]
    nei_c = cell_ctrs[td["neighbour"]]
    d = nei_c - own_c
    dn = jnp.linalg.norm(d, axis=-1)
    an = jnp.maximum(fg.mags, VSMALL)
    cos_t = jnp.sum(fg.areas * d, axis=-1) / (an * jnp.maximum(dn, VSMALL))
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    nonortho = jnp.degrees(jnp.arccos(cos_t))
    nonortho = jnp.where(has_n, nonortho, 0.0)
    n_int = jnp.sum(has_n)

    # Skewness (internal faces): offset of the face centre from the
    # owner->neighbour line's intersection with the face plane, relative
    # to the centre distance
    nrm = fg.areas / an[:, None]
    denom = jnp.sum(d * nrm, axis=-1)
    lam = jnp.sum((fg.centres - own_c) * nrm, axis=-1) / jnp.where(
        jnp.abs(denom) > VSMALL, denom, 1.0)
    intersect = own_c + lam[:, None] * d
    skew = jnp.linalg.norm(fg.centres - intersect, axis=-1) / jnp.maximum(
        dn, VSMALL)
    skew = jnp.where(has_n & (jnp.abs(denom) > VSMALL), skew, 0.0)

    # Face-face angles over all edges (no substitution)
    E = td["edges"].shape[0]
    no_id = jnp.full((E,), -1, dtype=td["edges"].dtype)
    zeros = jnp.zeros((E, 3), dtype=dtype)
    emin, emax = face_angles_for_edges(
        points, cell_ctrs, td, jnp.arange(E, dtype=td["edges"].dtype),
        no_id, zeros, no_id, zeros, with_subst=False)
    if edge_claim is not None:
        emin = jnp.where(edge_claim, emin, big)
        emax = jnp.where(edge_claim, emax, -big)

    # Edge lengths
    ep = points[td["edges"]]
    elen = jnp.linalg.norm(ep[:, 1] - ep[:, 0], axis=-1)
    if edge_claim is not None:
        elen = jnp.where(edge_claim, elen, jnp.nan)

    # Cell closedness + aspect ratio (OpenFOAM checkMesh
    # primitiveMeshCheck: checkClosedCells).  Openness = |net signed
    # face-area sum| / total face area; aspect = (1/6) total face area
    # / V^(2/3) (== 1 for a cube).
    cf = td["cell_faces"]
    cfm = td["cell_faces_mask"]
    cell_ids = jnp.arange(cf.shape[0], dtype=cf.dtype)[:, None]
    sign = jnp.where(td["owner"][cf] == cell_ids, 1.0, -1.0).astype(dtype)
    fa_c = fg.areas[cf]                             # (C, W, 3)
    m = cfm[..., None].astype(dtype)
    net = jnp.sum(sign[..., None] * fa_c * m, axis=1)
    tot = jnp.sum(fg.mags[cf] * cfm.astype(dtype), axis=1)
    openness = jnp.linalg.norm(net, axis=-1) / jnp.maximum(tot, VSMALL)
    aspect = (tot / 6.0) / jnp.maximum(vols, VSMALL) ** (2.0 / 3.0)
    if cell_claim is not None:
        openness = jnp.where(cell_claim, openness, 0.0)
        aspect = jnp.where(cell_claim, aspect, 0.0)

    # Face pyramid volumes (checkFacePyramids): owner-side pyramid
    # positive, neighbour-side negative
    pyr_own = jnp.sum(fg.areas * (fg.centres - own_c), axis=-1) / 3.0
    pyr_nei = -jnp.sum(fg.areas * (fg.centres - nei_c), axis=-1) / 3.0
    fvalid = td["face_mask"].any(axis=1)
    if face_claim is not None:
        fvalid = fvalid & face_claim
    pyr = jnp.where(fvalid, pyr_own, jnp.inf)
    pyr = jnp.minimum(pyr, jnp.where(
        fvalid & td["has_neighbour"], pyr_nei, jnp.inf))

    if cell_claim is not None:
        vols = jnp.where(cell_claim, vols, jnp.nan)
    vol_valid = ~jnp.isnan(vols)
    e_valid = ~jnp.isnan(elen)

    return {
        "max_aspect_ratio": float(jnp.max(aspect)),
        "max_cell_openness": float(jnp.max(openness)),
        "min_pyramid_volume": float(jnp.min(pyr)),
        "min_face_angle_deg": float(jnp.degrees(jnp.min(emin))),
        "max_face_angle_deg": float(jnp.degrees(jnp.max(emax))),
        "max_non_ortho_deg": float(jnp.max(nonortho)),
        "sum_non_ortho_deg": float(jnp.sum(nonortho)),
        "n_internal_faces": int(n_int),
        "max_skewness": float(jnp.max(skew)),
        "min_edge_length": float(jnp.min(jnp.where(e_valid, elen, big))),
        "max_edge_length": float(jnp.max(jnp.where(e_valid, elen, -big))),
        "min_volume": float(jnp.min(jnp.where(vol_valid, vols, big))),
        "max_volume": float(jnp.max(jnp.where(vol_valid, vols, -big))),
        "total_volume": float(jnp.sum(jnp.where(vol_valid, vols, 0.0))),
        "n_negative_volumes": int(jnp.sum(vol_valid & (vols <= 0))),
    }


def combine_quality_parts(parts) -> Dict[str, float]:
    """Fold per-shard :func:`quality_report_parts` dicts into the
    global report (same keys as :func:`quality_report`)."""
    def mn(k):
        return min(p[k] for p in parts)

    def mx(k):
        return max(p[k] for p in parts)

    def sm(k):
        return sum(p[k] for p in parts)

    n_int = sm("n_internal_faces")
    return {
        "max_aspect_ratio": mx("max_aspect_ratio"),
        "max_cell_openness": mx("max_cell_openness"),
        "min_pyramid_volume": mn("min_pyramid_volume"),
        "min_face_angle_deg": mn("min_face_angle_deg"),
        "max_face_angle_deg": mx("max_face_angle_deg"),
        "max_non_ortho_deg": mx("max_non_ortho_deg"),
        "avg_non_ortho_deg": sm("sum_non_ortho_deg") / max(n_int, 1),
        "max_skewness": mx("max_skewness"),
        "min_edge_length": mn("min_edge_length"),
        "max_edge_length": mx("max_edge_length"),
        "min_volume": mn("min_volume"),
        "max_volume": mx("max_volume"),
        "total_volume": sm("total_volume"),
        "n_negative_volumes": sm("n_negative_volumes"),
    }


def quality_report(points, td) -> Dict[str, float]:
    """Compute the full quality metric set on device, return floats."""
    return combine_quality_parts([quality_report_parts(points, td)])


def check_mesh(points, td, max_non_ortho: float = 70.0,
               max_skew: float = 4.0, max_aspect: float = 1000.0,
               max_openness: float = 1e-6) -> Dict[str, object]:
    """checkMesh-style pass/fail verdict with the standard OpenFOAM
    thresholds: non-orthogonality 70 deg, skewness 4, aspect ratio
    1000, cell openness 1e-6 (closedThreshold_), face pyramids
    positive (checkFacePyramids)."""
    rep = quality_report(points, td)
    ok = (
        rep["n_negative_volumes"] == 0
        and rep["max_non_ortho_deg"] < max_non_ortho
        and rep["max_skewness"] < max_skew
        and rep["max_aspect_ratio"] < max_aspect
        and rep["max_cell_openness"] < max_openness
        and rep["min_pyramid_volume"] > 0.0
    )
    return {"ok": bool(ok), **rep}
