"""Boundary point smoothing: feature-edge/corner classification and
projection onto target surface/edge meshes (reference
src/boundaryPointSmoothing.C).

Host setup (once):
  - edge-mesh sanity checks            (checkEdgeMeshSanity bPS.C:20-80)
  - edge-string labeling               (findEdgeMeshStrings :446-587,
                                        iterative instead of recursive)
  - boundary point classification      (classifyBoundaryPoints :269-441)
    incl. the reference's first-patch-wins quirk: a point shared by two
    patches is classified by the patch of its lowest-numbered boundary
    face
  - per-feature-point string ids       (src/smoothMesh.C:2234-2249)

Device per-iteration:
  - feature-edge projections           (calculateFeatureEdgeProjections
                                        :623-677): neighbours projected
    onto string-filtered target edges, averaged
  - priority application + surface snap (projectBoundaryPointsToEdges-
    AndSurfaces :843-945): corner snap -> feature mean -> sharp freeze
    -> brute-force ray cast against the target triangles (replaces the
    octree: targets are small, masked argmin over padded triangle blocks
    is the TPU-native choice — SURVEY.md hard part #3)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from smoothmesh_tpu.mesh.topology import MeshTopology
from smoothmesh_tpu.params import ABS_TOL, REL_TOL

UNDEF = -1


# ---------------------------------------------------------------------------
# Host: edge-mesh utilities
# ---------------------------------------------------------------------------

def check_edge_mesh_sanity(points: np.ndarray, edges: np.ndarray,
                           mesh_min_edge: float, mesh_perimeter: float
                           ) -> None:
    """reference checkEdgeMeshSanity (bPS.C:20-80)."""
    if len(edges) == 0:
        raise ValueError("edge mesh has no edges")
    lengths = np.linalg.norm(points[edges[:, 1]] - points[edges[:, 0]],
                             axis=1)
    if lengths.min() < REL_TOL * mesh_min_edge:
        raise ValueError(
            f"Minimum edge length in edge mesh {lengths.min()} is too small "
            f"in comparison to minimum edge length in polyMesh "
            f"{mesh_min_edge}")
    used = np.unique(edges)
    mins = points[used].min(axis=0)
    maxs = points[used].max(axis=0)
    # NOTE: replicates the reference's perimeter formula including its
    # z-term quirk (max+min, bPS.C:71 / smoothMesh.C:1538)
    em_perim = (maxs[0] - mins[0]) + (maxs[1] - mins[1]) + (maxs[2] + mins[2])
    if abs(em_perim / mesh_perimeter - 1.0) > 0.5:
        raise ValueError(
            f"Perimeter (sum of bounding box side lengths) of edge mesh "
            f"{em_perim} is too different in comparison to perimeter of "
            f"polyMesh {mesh_perimeter}")


def point_edge_valence(n_points: int, edges: np.ndarray) -> np.ndarray:
    v = np.zeros(n_points, dtype=np.int64)
    np.add.at(v, edges.reshape(-1), 1)
    return v


def find_edge_strings(points: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Label continuous edge strings (paths joined at valence-2
    vertices, broken at corners) — reference findEdgeMeshStrings
    (bPS.C:446-587), iterative flood fill."""
    E = len(edges)
    valence = point_edge_valence(len(points), edges)
    # adjacency: for each vertex its incident edges
    incid = {}
    for e, (a, b) in enumerate(edges):
        incid.setdefault(a, []).append(e)
        incid.setdefault(b, []).append(e)

    strings = np.full(E, UNDEF, dtype=np.int64)
    next_id = 0
    for e0 in range(E):
        if strings[e0] >= 0:
            continue
        sid = next_id
        next_id += 1
        stack = [e0]
        strings[e0] = sid
        while stack:
            e = stack.pop()
            for endpoint in edges[e]:
                if valence[endpoint] != 2:
                    continue  # corners break strings
                for e2 in incid[endpoint]:
                    if strings[e2] < 0:
                        strings[e2] = sid
                        stack.append(e2)
    return strings


def project_point_to_edges(pt: np.ndarray, points: np.ndarray,
                           edges: np.ndarray, tol: float):
    """Project pt onto every edge (clipped at endpoints), return
    (proj (E,3), dist (E,), coincident vertex id (E,) or -1) —
    vectorized reference projectPointToEdge (bPS.C:89-145)."""
    a = points[edges[:, 0]]
    b = points[edges[:, 1]]
    ab = b - a
    ll = np.sum(ab * ab, axis=1)
    ndp = np.sum((pt - a) * ab, axis=1) / np.maximum(ll, 1e-300)
    free = a + ndp[:, None] * ab
    proj = np.where((ndp <= ABS_TOL)[:, None], a,
                    np.where((ndp >= 1 - ABS_TOL)[:, None], b, free))
    vert = np.full(len(edges), UNDEF, dtype=np.int64)
    near_a = (ndp <= ABS_TOL) & (
        np.linalg.norm(free - a, axis=1) <= tol)
    near_b = (ndp >= 1 - ABS_TOL) & (
        np.linalg.norm(free - b, axis=1) <= tol)
    vert[near_a] = edges[near_a, 0]
    vert[near_b] = edges[near_b, 1]
    dist = np.linalg.norm(proj - pt, axis=1)
    return proj, dist, vert


def find_closest_edge_info(pt, points, edges, strings, required_string,
                           tol):
    """reference findClosestEdgeInfo (bPS.C:206-264)."""
    proj, dist, vert = project_point_to_edges(pt, points, edges, tol)
    if required_string >= 0:
        dist = np.where(strings == required_string, dist, np.inf)
    i = int(np.argmin(dist))
    sid = strings[i] if len(strings) == len(edges) else UNDEF
    return proj[i], i, sid, vert[i]


def closest_edge_batch(pts: np.ndarray, epoints: np.ndarray,
                       edges: np.ndarray, tol: float,
                       pair_budget: int = 4_000_000):
    """Vectorized find_closest_edge_info over a batch of query points
    (no string filter): returns (proj (B,3), edge idx (B,),
    coincident vertex (B,)).  Chunked so the (Q, E, 3) intermediates
    stay within a fixed memory budget — replaces the per-point Python
    loop of the classifier, which was O(N_bnd * E) interpreter work
    (VERDICT r1 item 5)."""
    B, E = len(pts), len(edges)
    proj_o = np.zeros((B, 3))
    ei_o = np.zeros(B, dtype=np.int64)
    vert_o = np.full(B, UNDEF, dtype=np.int64)
    if B == 0 or E == 0:
        return proj_o, ei_o, vert_o
    a = epoints[edges[:, 0]]
    b = epoints[edges[:, 1]]
    ab = b - a
    ll = np.maximum(np.sum(ab * ab, axis=1), 1e-300)
    chunk = max(1, pair_budget // E)
    for s in range(0, B, chunk):
        q = pts[s: s + chunk]                                # (Q, 3)
        ndp = ((q[:, None, :] - a) * ab).sum(-1) / ll        # (Q, E)
        free = a + ndp[..., None] * ab                       # (Q, E, 3)
        lo = ndp <= ABS_TOL
        hi = ndp >= 1 - ABS_TOL
        proj = np.where(lo[..., None], a,
                        np.where(hi[..., None], b, free))
        dist = np.linalg.norm(proj - q[:, None, :], axis=-1)
        i = np.argmin(dist, axis=1)                          # (Q,)
        r = np.arange(len(q))
        near_a = lo & (np.linalg.norm(free - a, axis=-1) <= tol)
        near_b = hi & (np.linalg.norm(free - b, axis=-1) <= tol)
        vert = np.where(near_a, edges[:, 0],
                        np.where(near_b, edges[:, 1], UNDEF))
        proj_o[s: s + chunk] = proj[r, i]
        ei_o[s: s + chunk] = i
        vert_o[s: s + chunk] = vert[r, i]
    return proj_o, ei_o, vert_o


# ---------------------------------------------------------------------------
# Host: classification
# ---------------------------------------------------------------------------

def classifying_patch(topo: MeshTopology) -> np.ndarray:
    """Per point: the patch id of its lowest-numbered real boundary
    face (-1 for pure internal / processor-only points) — reproduces
    the reference's first-visit patch assignment (bPS.C:301-318)."""
    out = np.full(topo.n_points, UNDEF, dtype=np.int64)
    real = np.array([t not in ("processor", "empty")
                     for t in topo.patch_types])
    # first-visit (lowest face id) wins: scatter-min of face ids per
    # point, then read the winning face's patch (vectorized)
    fb = np.arange(topo.n_internal_faces, topo.n_faces)
    pid = topo.face_patch[fb]
    ok = (pid >= 0) & real[np.maximum(pid, 0)]
    fb = fb[ok]
    if len(fb):
        mask = topo.face_mask[fb]
        flat_p = topo.face_points[fb][mask]
        flat_f = np.repeat(fb, mask.sum(axis=1))
        first = np.full(topo.n_points, np.iinfo(np.int64).max)
        np.minimum.at(first, flat_p, flat_f)
        has = first < np.iinfo(np.int64).max
        out[has] = topo.face_patch[first[has]]
    return out


@dataclasses.dataclass
class BoundarySetup:
    is_corner: np.ndarray            # (N,)
    is_feature_edge: np.ndarray      # (N,)
    is_smoothing_surface: np.ndarray
    is_frozen_surface: np.ndarray
    is_layer_surface: np.ndarray
    is_connected: np.ndarray
    corner_targets: np.ndarray       # (N, 3)
    point_strings: np.ndarray        # (N,) target string per feature point
    # feature-point neighbour table (surface, non-feature, non-corner)
    feat_neigh: np.ndarray           # (N, W) point ids
    feat_neigh_mask: np.ndarray      # (N, W)
    # target geometry (device-ready, in mesh coordinates)
    target_edge_points: np.ndarray   # (Ve, 3)
    target_edges: np.ndarray         # (Ee, 2)
    target_edge_strings: np.ndarray  # (Ee,)
    surf_tri_a: np.ndarray           # (T, 3)
    surf_tri_b: np.ndarray
    surf_tri_c: np.ndarray
    distance_tolerance: float


def classify_boundary_points(
    topo: MeshTopology,
    init_edge_points: np.ndarray, init_edges: np.ndarray,
    target_edge_points: np.ndarray, target_edges: np.ndarray,
    surf_vertices: np.ndarray, surf_tris: np.ndarray,
    layer_patch_ids, smoothing_patch_ids,
    mesh_points: np.ndarray,
    distance_tolerance: float,
    checkpoint_corner: Optional[np.ndarray] = None,
    checkpoint_feature: Optional[np.ndarray] = None,
) -> BoundarySetup:
    """reference classifyBoundaryPoints (bPS.C:269-441) + string
    assignment (src/smoothMesh.C:2234-2249)."""
    N = topo.n_points
    internal = topo.is_internal_point
    cp = classifying_patch(topo)

    is_corner = np.zeros(N, dtype=bool)
    is_feature = np.zeros(N, dtype=bool)
    corner_targets = np.full((N, 3), 1e30)

    target_strings = find_edge_strings(target_edge_points, target_edges)
    init_valence = point_edge_valence(len(init_edge_points), init_edges)
    target_valence = point_edge_valence(len(target_edge_points),
                                        target_edges)
    target_corner_ids = np.where(target_valence != 2)[0]

    bnd = np.where(~internal & (cp >= 0))[0]

    use_ckpt = (
        checkpoint_corner is not None and checkpoint_feature is not None
        and (checkpoint_corner == 1).any() | (checkpoint_feature == 1).any()
    )

    if use_ckpt:
        is_corner[bnd] = np.asarray(checkpoint_corner)[bnd] == 1
        is_feature[bnd] = np.asarray(checkpoint_feature)[bnd] == 1
    elif len(bnd):
        # batched closest-edge query (bPS.C:206-264 semantics,
        # vectorized over all boundary points)
        projp, _, vert = closest_edge_batch(
            mesh_points[bnd], init_edge_points, init_edges,
            distance_tolerance)
        at_corner_vert = (vert >= 0) & (
            init_valence[np.maximum(vert, 0)] != 2)
        on_edge = np.linalg.norm(mesh_points[bnd] - projp,
                                 axis=1) < distance_tolerance
        is_corner[bnd] = at_corner_vert
        is_feature[bnd] = ~at_corner_vert & on_edge

    corner_ids = np.where(is_corner)[0]
    if len(corner_ids):
        if len(target_corner_ids) == 0:
            raise ValueError(
                "Did not find any eligible corner points in edge mesh")
        # snap target: closest corner vertex of the target edge mesh
        d = np.linalg.norm(
            mesh_points[corner_ids][:, None, :]
            - target_edge_points[target_corner_ids][None, :, :], axis=2)
        corner_targets[corner_ids] = target_edge_points[
            target_corner_ids[np.argmin(d, axis=1)]]

    is_layer = (cp >= 0) & np.isin(cp, np.asarray(layer_patch_ids)) & ~internal
    on_smooth_patch = (cp >= 0) & np.isin(
        cp, np.asarray(smoothing_patch_ids)) & ~internal
    is_smoothing = on_smooth_patch
    is_frozen_surface = ~internal & (cp >= 0) & ~on_smooth_patch

    # connected-to-internal
    nb_internal = internal[topo.point_points] & topo.point_points_mask
    is_connected = ~internal & nb_internal.any(axis=1)

    # per-feature-point string ids against the *target* edges
    point_strings = np.full(N, UNDEF, dtype=np.int64)
    feat_ids = np.where(is_feature)[0]
    if len(feat_ids):
        _, ei, _ = closest_edge_batch(
            mesh_points[feat_ids], target_edge_points, target_edges,
            distance_tolerance)
        point_strings[feat_ids] = target_strings[ei]

    # feature-point neighbour table (findNeighborSurfacePoints,
    # bPS.C:592-616): boundary neighbours that are neither feature nor
    # corner points
    ok_neigh = (~internal[topo.point_points] & ~is_feature[topo.point_points]
                & ~is_corner[topo.point_points] & topo.point_points_mask)
    ok_neigh &= is_feature[:, None]
    feat_neigh = np.where(ok_neigh, topo.point_points, 0)

    tri = surf_tris
    return BoundarySetup(
        is_corner=is_corner,
        is_feature_edge=is_feature,
        is_smoothing_surface=is_smoothing,
        is_frozen_surface=is_frozen_surface,
        is_layer_surface=is_layer,
        is_connected=is_connected,
        corner_targets=corner_targets,
        point_strings=point_strings,
        feat_neigh=feat_neigh,
        feat_neigh_mask=ok_neigh,
        target_edge_points=target_edge_points,
        target_edges=target_edges,
        target_edge_strings=target_strings,
        surf_tri_a=surf_vertices[tri[:, 0]],
        surf_tri_b=surf_vertices[tri[:, 1]],
        surf_tri_c=surf_vertices[tri[:, 2]],
        distance_tolerance=distance_tolerance,
    )


# ---------------------------------------------------------------------------
# Device: per-iteration projection kernels
# ---------------------------------------------------------------------------

def _project_to_edges_dev(pts, ea, eb):
    """Clipped projection of pts (B,3) onto every edge (E,) —
    device version of projectPointToEdge."""
    ab = eb - ea                                        # (E, 3)
    ll = jnp.sum(ab * ab, axis=1)
    ndp = (
        jnp.einsum("bi,ei->be", pts, ab)
        - jnp.sum(ea * ab, axis=1)[None, :]
    ) / jnp.maximum(ll, 1e-30)[None, :]                 # (B, E)
    ndp_c = jnp.clip(ndp, 0.0, 1.0)
    ndp_c = jnp.where(ndp <= ABS_TOL, 0.0, ndp_c)
    ndp_c = jnp.where(ndp >= 1 - ABS_TOL, 1.0, ndp_c)
    proj = ea[None] + ndp_c[..., None] * ab[None]       # (B, E, 3)
    dist = jnp.linalg.norm(proj - pts[:, None, :], axis=-1)
    return proj, dist


def feature_edge_projections(points, bd, sync=None):
    """Mean of string-filtered projections of each feature point's
    surface neighbours onto the target edges (reference
    calculateFeatureEdgeProjections bPS.C:623-677).

    Returns (sums (N,3), counts (N,)) after halo combine; the caller
    divides (reference :898).
    """
    N = points.shape[0]
    rows = bd.get("feat_rows")
    if rows is not None:
        # Static compaction: only feature points have neighbours to
        # project (a few hundred vs N) — the dense evaluation was
        # ~60 ms/iter at 64^3 (round-3 boundary profile); rows are
        # padded with N (dropped on scatter-back)
        safe = jnp.minimum(rows, N - 1)
        fn = bd["feat_neigh"][safe]                      # (K, W)
        fm = bd["feat_neigh_mask"][safe] & (rows < N)[:, None]
        pstr_rows = bd["point_strings"][safe]
    else:
        fn = bd["feat_neigh"]                            # (N, W)
        fm = bd["feat_neigh_mask"]
        pstr_rows = bd["point_strings"]
    K, W = fn.shape
    ea = bd["edge_a"]
    eb = bd["edge_b"]
    estr = bd["edge_strings"]                            # (E,)

    flat = fn.reshape(-1)
    pts = points[flat]                                   # (K*W, 3)
    proj, dist = _project_to_edges_dev(pts, ea, eb)
    pstr = jnp.repeat(pstr_rows, W)
    allowed = (pstr[:, None] < 0) | (estr[None, :] == pstr[:, None])
    dist = jnp.where(allowed, dist, jnp.inf)
    best = jnp.argmin(dist, axis=1)
    bestp = jnp.take_along_axis(proj, best[:, None, None], axis=1)[:, 0]
    bestp = bestp.reshape(K, W, 3)
    m = fm[..., None].astype(points.dtype)
    sums = jnp.sum(bestp * m, axis=1)
    counts = jnp.sum(fm, axis=1)
    if rows is not None:
        sums = jnp.zeros((N, 3), points.dtype).at[rows].set(
            sums, mode="drop")
        counts = jnp.zeros((N,), counts.dtype).at[rows].set(
            counts, mode="drop")
    if sync is not None:
        sums = sync.sum(sums)
        counts = sync.sum(counts)
    return sums, counts


def surface_centroids(points, td, sync=None):
    """Mean of adjacent real-boundary face centres per boundary point
    (reference calculateSurfaceCentroids bPS.C:781-839).

    Present for parity: the reference computes this every iteration but
    blends it with weight faceCentroidBlendingFraction = 0.0
    (bPS.C:876, "needs more testing"), so the orchestrator only calls
    it when a non-zero fraction is configured.
    """
    from smoothmesh_tpu import geometry as geo

    dtype = points.dtype
    fg = geo.face_centres_areas(points, td["face_points"],
                                td["face_points_next"], td["face_mask"],
                                td["face_npoints"])
    pf = td["point_faces"]
    sel = td["point_faces_mask"] & td["face_is_real_boundary"][pf]
    sums = jnp.sum(fg.centres[pf] * sel[..., None].astype(dtype), axis=1)
    counts = jnp.sum(sel, axis=1)
    if sync is not None:
        sums = sync.sum(sums)
        counts = sync.sum(counts)
    return sums, counts


def segment_triangle_hits(orig, direction, max_dist, ta, tb, tc):
    """Nearest |t| intersections of o + t*d with the triangle soup for
    t in [0, max_dist] and [-max_dist, 0] — the brute-force masked
    replacement of the octree findLine (bPS.C:682-744).

    Returns (t_pos (B,), t_neg (B,)) with +inf where no hit.
    """
    eps = 1e-12
    # Barycentric crack tolerance must exceed the dtype's rounding
    # noise: a hit exactly on a shared triangle edge (common when mesh
    # and surface derive from aligned lattices) otherwise computes
    # u/v a few ulps OUTSIDE both triangles and the ray falls through
    # the crack.  1e-9 is fine for f64 but is sub-ulp at f32.
    bary = 1e-9 if jnp.asarray(ta).dtype == jnp.float64 else 1e-5
    e1 = tb - ta                                         # (T, 3)
    e2 = tc - ta
    # Moller-Trumbore, batched over (B, T)
    p = jnp.cross(direction[:, None, :], e2[None])       # (B, T, 3)
    det = jnp.sum(e1[None] * p, axis=-1)
    inv = 1.0 / jnp.where(jnp.abs(det) > eps, det, 1.0)
    s = orig[:, None, :] - ta[None]
    u = jnp.sum(s * p, axis=-1) * inv
    q = jnp.cross(s, e1[None])
    v = jnp.sum(direction[:, None, :] * q, axis=-1) * inv
    t = jnp.sum(e2[None] * q, axis=-1) * inv
    ok = (jnp.abs(det) > eps) & (u >= -bary) & (v >= -bary) & (
        u + v <= 1 + bary)
    t = jnp.where(ok, t, jnp.inf)
    t_pos = jnp.min(jnp.where((t >= 0) & (t <= max_dist), t, jnp.inf),
                    axis=1)
    t_neg = jnp.min(jnp.where((t < 0) & (t >= -max_dist), -t, jnp.inf),
                    axis=1)
    return t_pos, t_neg


def project_boundary_points(points, proposal, normals, frozen, bd, td,
                            is_sharp, sync=None, chunk=None):
    """Priority projection of boundary points (reference
    projectBoundaryPointsToEdgesAndSurfaces bPS.C:843-945):

      corner -> stored corner target
      feature edge -> mean of neighbour projections
      sharp edge -> freeze
      free smoothing-surface -> ray-cast snap along +-normal

    Returns (new proposal, frozen, no_hit): ``no_hit`` marks free
    smoothing-surface points whose ray cast found no intersection.
    The reference retries with 4 exponentially growing search radii and
    aborts on final miss (bPS.C:909-940); a single search at the final
    radius is result-equivalent whenever a hit exists (the nearest hit
    within a smaller radius is also the overall nearest hit), so only
    the failure handling differs — the driver raises on
    ``no_hit`` by default (params.ray_miss_fatal) and can instead
    freeze the points in place (shard-safe degradation).
    """
    sums, counts = feature_edge_projections(points, bd, sync=sync)

    is_corner = bd["is_corner"]
    is_feature = bd["is_feature_edge"]
    is_smoothing = bd["is_smoothing_surface"]
    internal = td["is_internal_point"]

    out = proposal
    # corners
    out = jnp.where((is_corner & ~internal)[:, None], bd["corner_targets"],
                    out)
    # feature edges: mean of projections
    feat_mean = sums / jnp.maximum(counts, 1)[:, None]
    out = jnp.where((is_feature & ~internal & (counts > 0))[:, None],
                    feat_mean, out)
    # sharp edge points freeze
    sharp_freeze = (~internal & is_sharp & ~is_corner & ~is_feature)
    frozen = frozen | sharp_freeze

    # free surface points: ray cast
    free = (~internal & is_smoothing & ~is_corner & ~is_feature
            & ~sharp_freeze)
    max_dist = bd["distance_tolerance"] * (1.0 / REL_TOL) ** 4

    # Optional face-centroid blending; the reference hard-codes the
    # fraction to 0.0 (bPS.C:876) so this stays inert by default
    fcbf = bd.get("face_centroid_blending_fraction", 0.0)
    if fcbf > 0.0:
        sums, counts = surface_centroids(points, td, sync=sync)
        cent = sums / jnp.maximum(counts, 1)[:, None]
        blended = fcbf * cent + (1.0 - fcbf) * out
        out = jnp.where((~internal & is_smoothing)[:, None], blended, out)

    # Pallas fast path: VMEM-resident triangle soup (10x+ faster than
    # the XLA formulation on TPU; float32 only — f64 tests use the
    # generic path below)
    if bd.get("tri_packed") is not None and out.dtype == jnp.float32:
        from smoothmesh_tpu.ops.raycast import segment_triangle_hits_pallas

        N = out.shape[0]
        rows = bd.get("surf_rows")
        if rows is not None:
            # Static compaction: only free smoothing-surface candidate
            # points cast rays (the static classified superset of
            # ``free``) — the full-N cast was ~50 ms/iter at 64^3
            # (round-3 boundary profile); padding rows (== N) cast a
            # dummy and are dropped on scatter-back
            safe = jnp.minimum(rows, N - 1)
            tp_c, tn_c = segment_triangle_hits_pallas(
                out[safe], normals[safe], max_dist, bd["tri_packed"],
                bd["n_tri"])
            inf = jnp.asarray(jnp.inf, jnp.float32)
            tp = jnp.full((N,), inf).at[rows].set(tp_c, mode="drop")
            tn = jnp.full((N,), inf).at[rows].set(tn_c, mode="drop")
        else:
            tp, tn = segment_triangle_hits_pallas(
                out, normals, max_dist, bd["tri_packed"], bd["n_tri"])
        hit_p = out + tp[:, None] * normals
        hit_n = out - tn[:, None] * normals
        take_p = tp <= tn
        hit = jnp.where(take_p[:, None], hit_p, hit_n)
        has = jnp.isfinite(jnp.minimum(tp, tn))
        out = jnp.where((free & has)[:, None], hit, out)
        frozen = frozen | (free & ~has)
        return out, frozen, free & ~has

    def cast(idx):
        o = out[idx]
        d = normals[idx]
        tp, tn = segment_triangle_hits(o, d, max_dist, bd["tri_a"],
                                       bd["tri_b"], bd["tri_c"])
        hit_p = o + tp[:, None] * d
        hit_n = o - tn[:, None] * d
        # closest of the two directional hits; on an exact tie the
        # reference searches the full segment from the +normal end
        # (findIntersection bPS.C:720-741), which then hits the +side
        # point first — equivalent to taking the +normal hit
        take_p = tp <= tn
        hit = jnp.where(take_p[:, None], hit_p, hit_n)
        has = jnp.isfinite(jnp.minimum(tp, tn))
        return hit, has

    N = points.shape[0]
    rows = bd.get("surf_rows")
    if rows is not None:
        # Same static compaction as the Pallas branch (free ⊆ the
        # classified candidate set, so non-candidates never read hit/has)
        hit_c, has_c = cast(jnp.minimum(rows, N - 1))
        hit = jnp.zeros((N, 3), out.dtype).at[rows].set(hit_c, mode="drop")
        has = jnp.zeros((N,), bool).at[rows].set(has_c, mode="drop")
    elif chunk is None or chunk >= N:
        hit, has = cast(jnp.arange(N))
    else:
        nc = -(-N // chunk)

        def body(c):
            idx = jnp.clip(c * chunk + jnp.arange(chunk), 0, N - 1)
            return cast(idx)

        hs = jax.lax.map(body, jnp.arange(nc))
        hit = hs[0].reshape(nc * chunk, 3)[:N]
        has = hs[1].reshape(nc * chunk)[:N]

    out = jnp.where((free & has)[:, None], hit, out)
    frozen = frozen | (free & ~has)
    return out, frozen, free & ~has
