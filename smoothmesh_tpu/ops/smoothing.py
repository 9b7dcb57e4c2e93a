"""Predictor kernels: centroidal + aspect-ratio smoothing, step limiter.

TPU-native reimplementation of the reference's L3 layer:
  - ``centroidalSmoothing``      (reference src/smoothMesh.C:96-166)
  - ``aspectRatioSmoothing`` / ``findClosestPoints`` / ``calcARSmoothingRatio``
                                 (reference src/smoothMesh.C:313-593)
  - ``constrainMaxStepLength``   (reference src/smoothMesh.C:684-754)
  - ``calculateResidual``        (reference src/smoothMesh.C:1546-1570)

All kernels are pure functions over the padded device topology: masked
gathers + reductions, no data-dependent control flow.  Multi-chip halo
combines are injected through an optional ``sync`` object (see
:mod:`smoothmesh_tpu.parallel.sync`); the default no-op reproduces the
serial path where OpenFOAM's syncPointList degenerates to identity.
"""

from __future__ import annotations

import jax.numpy as jnp

VSMALL = 1e-30


def _big(dtype) -> float:
    """Stand-in for OpenFOAM GREAT in UNDEF_VECTOR, overflow-safe per dtype."""
    return 1e18 if jnp.dtype(dtype) == jnp.float32 else 1e150


def centroidal_smoothing(points, cell_ctrs, td, do_boundary_smoothing,
                         sync=None):
    """Mean of surrounding cell centres per point.

    Skips boundary points (falls back to current coords) unless boundary
    smoothing is enabled, exactly like the reference's eligibility test
    (src/smoothMesh.C:114-119).  Returns the proposed point field.
    """
    pc = td["point_cells"]
    m = td["point_cells_mask"]
    eligible = td["is_internal_point"] | bool(do_boundary_smoothing)

    w = (m & eligible[:, None]).astype(points.dtype)
    sums = jnp.sum(cell_ctrs[pc] * w[..., None], axis=1)       # (N, 3)
    counts = jnp.sum(w, axis=1)                                 # (N,)

    if sync is not None:
        sums = sync.sum(sums)
        counts = sync.sum(counts)

    has = counts > 0
    return jnp.where(has[:, None], sums / jnp.maximum(counts, 1.0)[:, None],
                     points)


def _closest_three(points, td):
    """Per point: relative vectors + neighbour ids of the three closest
    edge-connected points, with the reference's boundary filtering
    (boundary points only consider boundary neighbours,
    src/smoothMesh.C:277-308).

    Ties are broken by neighbour order (stable), matching the stable
    ``sortedOrder`` sort of the reference up to pointPoints ordering.
    Missing candidates (fewer than k eligible neighbours) get an
    UNDEF-style huge vector.
    """
    dtype = points.dtype
    big = _big(dtype)
    pp = td["point_points"]
    mask = td["point_points_mask"]
    internal = td["is_internal_point"]

    rel = points[pp] - points[:, None, :]          # (N, W, 3)
    lengths = jnp.linalg.norm(rel, axis=-1)
    eligible = mask & (internal[:, None] | ~internal[pp])
    lengths = jnp.where(eligible, lengths, jnp.inf)

    outs = []
    ids = []
    for _ in range(3):
        slot = jnp.argmin(lengths, axis=1)                       # (N,)
        found = jnp.take_along_axis(lengths, slot[:, None], 1)[:, 0] < jnp.inf
        vec = jnp.take_along_axis(rel, slot[:, None, None], 1)[:, 0, :]
        nid = jnp.take_along_axis(pp, slot[:, None], 1)[:, 0]
        vec = jnp.where(found[:, None], vec, jnp.full_like(vec, big))
        nid = jnp.where(found, nid, -1)
        outs.append(vec)
        ids.append(nid)
        lengths = jnp.where(
            jnp.arange(lengths.shape[1])[None, :] == slot[:, None],
            jnp.inf, lengths,
        )
    return outs, ids


def _share_cell(td, a_ids, b_ids):
    """True where points a and b share at least one cell.

    Replaces the reference's pointNeighPoints lookup
    (src/smoothMesh.C:383-386) with an on-device set intersection over
    the two points' pointCells rows.
    """
    pc = td["point_cells"]
    pm = td["point_cells_mask"]
    a = jnp.maximum(a_ids, 0)
    b = jnp.maximum(b_ids, 0)
    ca, ma = pc[a], pm[a]                      # (N, W)
    cb, mb = pc[b], pm[b]
    eq = ca[:, :, None] == cb[:, None, :]
    eq &= ma[:, :, None] & mb[:, None, :]
    return jnp.any(eq, axis=(1, 2)) & (a_ids >= 0) & (b_ids >= 0)


def aspect_ratio_smoothing(points, centroidal_points, td, sync=None):
    """Blend midpoint-of-two-closest-points with the centroidal target.

    Internal points: blend only when the two closest edge lengths are
    similar (ratio < 1.5) and the third is clearly farther (ratio in
    [1.5, 3] ramps the blend 0..1) — the reference's high-aspect-ratio
    detection (src/smoothMesh.C:489-543).  Boundary points use the
    [1.0, 2.0] ramp on the closest-two ratio.  Disabled when the two
    closest points share a cell.
    """
    dtype = points.dtype
    (c1, c2, c3), (i1, i2, _) = _closest_three(points, td)
    has_common = _share_cell(td, i1, i2)

    if sync is not None:
        c1, c2, c3, has_common = sync.closest_points(c1, c2, c3, has_common)

    internal = td["is_internal_point"]
    l1 = jnp.linalg.norm(c1, axis=-1)
    l2 = jnp.linalg.norm(c2, axis=-1)
    l3 = jnp.linalg.norm(c3, axis=-1)
    ratio1 = l2 / jnp.maximum(l1, VSMALL)
    ratio2 = l3 / jnp.maximum(l2, VSMALL)

    # Internal-point ramp (min 1.5 -> max 3.0)
    frac_int = jnp.clip((ratio2 - 1.5) / 1.5, 0.0, 1.0)
    frac_int = jnp.where((ratio1 < 1.5) & (ratio2 > 1.5), frac_int, 0.0)
    # Boundary-point ramp (min 1.0 -> max 2.0)
    frac_bnd = jnp.clip(ratio1 - 1.0, 0.0, 1.0)

    frac = jnp.where(internal, frac_int, frac_bnd)
    zero1 = jnp.all(c1 == 0.0, axis=-1) | jnp.all(c2 == 0.0, axis=-1)
    frac = jnp.where(has_common | zero1, 0.0, frac).astype(dtype)

    mid = points + 0.5 * (c1 + c2)
    blended = (1.0 - frac)[:, None] * centroidal_points + frac[:, None] * mid
    return jnp.where((frac > 0.0)[:, None], blended, centroidal_points)


def get_proposed_max_step_length(points, proposed, sync=None):
    """Global maximum proposed jump (reference
    getProposedMaxStepLength src/smoothMesh.C:657-676, allreduced)."""
    m = jnp.max(jnp.linalg.norm(proposed - points, axis=-1))
    if sync is not None:
        m = sync.all_max(m)
    return m


def constrain_max_step_length(points, proposed, max_step_length,
                              rel_step_frac, do_global_scaling=False,
                              sync=None):
    """Clamp each point's jump (reference src/smoothMesh.C:684-754).

    The live call sites use doGlobalScaling=false: steps longer than
    ``max_step_length`` are rescaled so the *applied* step equals
    exactly ``max_step_length``; shorter steps are scaled by
    ``rel_step_frac``.  The global-scaling mode (one common factor from
    the global max proposed step, :707-715) is provided for parity.
    """
    step = proposed - points
    length = jnp.linalg.norm(step, axis=-1)
    if do_global_scaling:
        proposed_max = get_proposed_max_step_length(points, proposed,
                                                    sync=sync)
        gscale = jnp.minimum(
            1.0, max_step_length / jnp.maximum(
                proposed_max * rel_step_frac, VSMALL))
        scale = jnp.full_like(length, gscale)
    else:
        scale = jnp.where(
            length > max_step_length,
            max_step_length / (jnp.maximum(length, VSMALL) * rel_step_frac),
            1.0,
        )
    return points + (rel_step_frac * scale)[:, None] * step


def calculate_residual(points, new_points, max_step_length, sync=None):
    """max |displacement| / maxStepLength over all points (allreduced)."""
    res = jnp.max(jnp.linalg.norm(new_points - points, axis=-1))
    res = res / max_step_length
    if sync is not None:
        res = sync.all_max(res)
    return res
