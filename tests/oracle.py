"""Naive numpy oracle reimplementing the reference smoothMesh semantics.

Slow, loop-based, written directly from the algorithm descriptions in
SURVEY.md / the reference C++ (cited per function) — used only as a test
oracle to check the vectorized JAX kernels reproduce the serial
reference behaviour, including the sequential work-stack of the
face-angle constraint.
"""

import math

import numpy as np

ACOS_CLAMP = 0.99999


def centroidal(topo, points, cell_ctrs, do_boundary):
    """reference src/smoothMesh.C:96-166"""
    N = topo.n_points
    out = points.copy()
    for p in range(N):
        if not do_boundary and not topo.is_internal_point[p]:
            continue
        cells = topo.point_cells[p][topo.point_cells_mask[p]]
        if len(cells):
            out[p] = cell_ctrs[cells].mean(axis=0)
    return out


def step_limit(points, proposed, max_step, rel_frac):
    """reference src/smoothMesh.C:684-754 (doGlobalScaling=false)"""
    out = proposed.copy()
    for p in range(len(points)):
        step = proposed[p] - points[p]
        ln = np.linalg.norm(step)
        scale = max_step / (ln * rel_frac) if ln > max_step else 1.0
        out[p] = points[p] + rel_frac * scale * step
    return out


def edge_shortening_freeze(topo, points, proposed, min_edge, total_min,
                           frozen):
    """reference src/smoothMesh.C:602-652"""
    frozen = frozen.copy()
    for p in range(topo.n_points):
        if frozen[p]:
            continue
        neigh = topo.point_points[p][topo.point_points_mask[p]]
        cur = min(np.linalg.norm(points[n] - points[p]) for n in neigh)
        new = min(np.linalg.norm(points[n] - proposed[p]) for n in neigh)
        if total_min and min(cur, new) < min_edge:
            frozen[p] = True
        elif new < min_edge and new < cur:
            frozen[p] = True
    return frozen


def _angle(c, p1, p2):
    v1 = p1 - c
    v2 = p2 - c
    v1 = v1 / np.linalg.norm(v1)
    v2 = v2 / np.linalg.norm(v2)
    return math.acos(max(-ACOS_CLAMP, min(ACOS_CLAMP, float(np.dot(v1, v2)))))


def edge_angle_freeze(topo, points, proposed, min_angle_deg, frozen):
    """reference src/smoothMesh.C:837-930"""
    frozen = frozen.copy()
    small = math.pi * min_angle_deg / 180.0
    for p in range(topo.n_points):
        if frozen[p]:
            continue
        min_c = math.inf
        min_n = math.inf
        for s in range(topo.point_faces.shape[1]):
            if not topo.point_faces_mask[p, s]:
                continue
            n1 = topo.wedge_prev[p, s]
            n2 = topo.wedge_next[p, s]
            c = _angle(points[p], points[n1], points[n2])
            n = min(
                _angle(proposed[p], points[n1], points[n2]),
                _angle(proposed[p], proposed[n1], proposed[n2]),
                _angle(proposed[p], points[n1], proposed[n2]),
                _angle(proposed[p], proposed[n1], points[n2]),
            )
            min_c = min(min_c, c)
            min_n = min(min_n, n)
        if min_n < small and min_n < min_c:
            frozen[p] = True
    return frozen


def _face_center(topo, points, f, subst):
    pts = topo.face_points[f][topo.face_mask[f]]
    acc = np.zeros(3)
    for p in pts:
        acc += subst.get(p, points[p])
    return acc / len(pts)


def _minmax_face_angle_edge(topo, points, cell_ctrs, e, subst):
    """reference calcMinMaxFaceAngleForEdge src/smoothMesh.C:1135-1231"""
    e0i, e1i = topo.edges[e]
    e0 = subst.get(e0i, points[e0i])
    e1 = subst.get(e1i, points[e1i])
    cc = 0.5 * (e0 + e1)
    ev = (e1 - e0) / np.linalg.norm(e1 - e0)

    def proj_unit(x):
        cf = cc - x
        p = x + np.dot(cf, ev) * ev
        d = p - cc
        return d / np.linalg.norm(d)

    fslots = np.where(topo.edge_faces_mask[e])[0]
    pvec = {}
    for s in fslots:
        f = topo.edge_faces[e, s]
        pvec[s] = proj_unit(_face_center(topo, points, f, subst))
    mn, mx = 2 * math.pi, 0.0
    for cslot in np.where(topo.edge_cells_mask[e])[0]:
        cvec = proj_unit(cell_ctrs[topo.edge_cells[e, cslot]])
        p0 = pvec[topo.edge_cell_f0[e, cslot]]
        p1 = pvec[topo.edge_cell_f1[e, cslot]]
        a = (
            math.acos(max(-ACOS_CLAMP, min(ACOS_CLAMP, float(np.dot(p0, cvec)))))
            + math.acos(max(-ACOS_CLAMP, min(ACOS_CLAMP, float(np.dot(cvec, p1)))))
        )
        mn = min(mn, a)
        mx = max(mx, a)
    return mn, mx


def _minmax_face_angle_point(topo, points, cell_ctrs, p, subst):
    mn, mx = 2 * math.pi, 0.0
    for e in topo.point_edges[p][topo.point_edges_mask[p]]:
        a, b = _minmax_face_angle_edge(topo, points, cell_ctrs, e, subst)
        mn = min(mn, a)
        mx = max(mx, b)
    return mn, mx


def face_angle_freeze(topo, points, cell_ctrs, proposed, min_deg, max_deg,
                      frozen):
    """Stack-based propagation exactly as the reference
    (src/smoothMesh.C:1320-1437)."""
    frozen = frozen.copy()
    small = math.pi * min_deg / 180.0
    large = math.pi * max_deg / 180.0

    cur_min = np.full(topo.n_points, np.inf)
    cur_max = np.zeros(topo.n_points)
    emins = np.zeros(topo.n_edges)
    emaxs = np.zeros(topo.n_edges)
    for e in range(topo.n_edges):
        emins[e], emaxs[e] = _minmax_face_angle_edge(topo, points, cell_ctrs,
                                                     e, {})
    for e in range(topo.n_edges):
        for p in topo.edges[e]:
            cur_min[p] = min(cur_min[p], emins[e])
            cur_max[p] = max(cur_max[p], emaxs[e])

    stack = list(range(topo.n_points))
    while stack:
        p = stack.pop()
        if cur_min[p] > small and cur_max[p] < large:
            continue
        ncoords = points[p] if frozen[p] else proposed[p]
        if not np.array_equal(ncoords, points[p]):
            mn, mx = _minmax_face_angle_point(topo, points, cell_ctrs, p,
                                              {p: ncoords})
            if (mn < small and mn < cur_min[p]) or (
                    mx > large and mx > cur_max[p]):
                ncoords = points[p]
                frozen[p] = True
        for q in topo.point_points[p][topo.point_points_mask[p]]:
            if frozen[q]:
                continue
            if np.array_equal(proposed[q], points[q]):
                continue
            mn, mx = _minmax_face_angle_point(
                topo, points, cell_ctrs, p, {p: ncoords, q: proposed[q]})
            if (mn < small and mn < cur_min[p]) or (
                    mx > large and mx > cur_max[p]):
                frozen[q] = True
                stack.append(q)
    return frozen


def closest_points_blend(topo, points, centroidal_pts):
    """reference aspectRatioSmoothing serial path src/smoothMesh.C:313-593"""
    out = centroidal_pts.copy()
    for p in range(topo.n_points):
        neigh = topo.point_points[p][topo.point_points_mask[p]]
        internal = topo.is_internal_point[p]
        cand = [n for n in neigh
                if internal or not topo.is_internal_point[n]]
        lengths = [np.linalg.norm(points[n] - points[p]) for n in cand]
        order = np.argsort(lengths, kind="stable")
        picks = [cand[i] for i in order[:3]]
        if len(picks) < 2:
            continue
        c1 = points[picks[0]] - points[p]
        c2 = points[picks[1]] - points[p]
        l1, l2 = np.linalg.norm(c1), np.linalg.norm(c2)
        if len(picks) >= 3:
            l3 = np.linalg.norm(points[picks[2]] - points[p])
        else:
            l3 = 1e30
        # share-a-cell test
        ca = set(topo.point_cells[picks[0]][topo.point_cells_mask[picks[0]]])
        cb = set(topo.point_cells[picks[1]][topo.point_cells_mask[picks[1]]])
        if ca & cb:
            continue
        r1 = l2 / l1
        r2 = l3 / l2
        if internal:
            if r1 < 1.5 and r2 > 1.5:
                frac = min(1.0, max(0.0, (r2 - 1.5) / 1.5))
            else:
                frac = 0.0
        else:
            frac = min(1.0, max(0.0, r1 - 1.0))
        if frac > 0:
            mid = points[p] + 0.5 * (c1 + c2)
            out[p] = (1 - frac) * centroidal_pts[p] + frac * mid
    return out


# ---------------------------------------------------------------------------
# Boundary-layer treatment (reference orthogonalBoundaryBlending.C)
# ---------------------------------------------------------------------------

def point_hops(topo, seed_mask, is_connected, max_iter):
    """reference calculatePointHopsToBoundary oBB.C:52-134"""
    hops = np.full(topo.n_points, -1, dtype=int)
    for p in range(topo.n_points):
        if seed_mask[p] and is_connected[p]:
            hops[p] = 0
    new_hops = np.full(topo.n_points, -1, dtype=int)
    for _ in range(max_iter):
        for p in range(topo.n_points):
            if hops[p] >= 0 or not topo.is_internal_point[p]:
                continue
            mx = -1
            for q in topo.point_points[p][topo.point_points_mask[p]]:
                mx = max(mx, hops[q])
            if mx >= 0:
                new_hops[p] = mx + 1
        for p in range(topo.n_points):
            if new_hops[p] > hops[p]:
                hops[p] = new_hops[p]
    return hops


def propagate_outer(topo, normals, layer_surface, hops, max_iter):
    """reference propagateOuterNeighInfo oBB.C:244-391 (serial)"""
    normals = normals.copy()
    UNDEF_V = np.array([1e30, 1e30, 1e30])
    outer_map = np.full(topo.n_points, -1, dtype=int)
    labels = np.full(topo.n_points, -1, dtype=int)
    for it in range(1, max_iter + 1):
        for p in range(topo.n_points):
            if hops[p] != it:
                continue
            n_lo = 0
            neigh = -1
            for q in topo.point_points[p][topo.point_points_mask[p]]:
                if hops[q] == it - 1:
                    n_lo += 1
                    neigh = q
            if n_lo != 1:
                continue
            if not topo.is_internal_point[neigh] and not layer_surface[neigh]:
                continue
            prev = np.where(labels == neigh)[0]
            if len(prev):
                normals[p] = UNDEF_V
                normals[prev[0]] = UNDEF_V
                continue
            outer_map[p] = neigh
            normals[p] = normals[neigh]
            labels[p] = neigh
    for p in range(topo.n_points):
        if np.all(normals[p] == UNDEF_V[0]) and np.all(normals[p] > 1e29):
            normals[p] = 0.0
            outer_map[p] = -1
    return outer_map, normals


def blend_orthogonal(topo, points, new_points, hops, normals, outer_coords,
                     max_blend, edge_len, expansion, min_layers, max_layers):
    """reference blendWithOrthogonalPoints oBB.C:507-567
    (max_layers carries the call-site +1)"""
    out = new_points.copy()
    for p in range(topo.n_points):
        if np.all(normals[p] == 0.0):
            continue
        if not topo.is_internal_point[p]:
            continue
        n_hops = hops[p]
        if n_hops < 1:
            continue
        length = edge_len * expansion ** min(n_hops - 1, max_layers)
        slope = -max_blend / (max_layers - min_layers)
        y0 = -slope * max_layers
        y = y0 + slope * n_hops
        blend = max(0.0, min(y, max_blend))
        ortho = outer_coords[p] + length * normals[p]
        out[p] = blend * ortho + (1 - blend) * new_points[p]
    return out


# ---------------------------------------------------------------------------
# Full-iteration composition pieces (round 2): geometry, normals,
# boundary projections — enough to run a complete reference iteration
# (smoothMesh.C:2257-2437) in loop-level numpy.
# ---------------------------------------------------------------------------

def face_geometry(topo, points):
    """OpenFOAM face centres/area vectors (primitiveMesh fan
    decomposition; see smoothmesh_tpu.geometry.face_centres_areas)."""
    F = topo.n_faces
    centres = np.zeros((F, 3))
    areas = np.zeros((F, 3))
    for f in range(F):
        pts = points[topo.face_points[f][topo.face_mask[f]]]
        n = len(pts)
        vm = pts.mean(axis=0)
        if n == 3:
            centres[f] = (pts[0] + pts[1] + pts[2]) / 3.0
            areas[f] = 0.5 * np.cross(pts[1] - pts[0], pts[2] - pts[0])
            continue
        sum_n = np.zeros(3)
        sum_a = 0.0
        sum_ac = np.zeros(3)
        for i in range(n):
            p = pts[i]
            nxt = pts[(i + 1) % n]
            c = p + nxt + vm
            nv = np.cross(nxt - p, vm - p)
            a = np.linalg.norm(nv)
            sum_n += nv
            sum_a += a
            sum_ac += a * c
        if sum_a > 1e-18:
            centres[f] = sum_ac / (3.0 * sum_a)
            areas[f] = 0.5 * sum_n
        else:
            centres[f] = vm
    return centres, areas


def cell_centres(topo, points):
    """OpenFOAM cell centres (face-pyramid decomposition)."""
    fc, fa = face_geometry(topo, points)
    C = topo.n_cells
    out = np.zeros((C, 3))
    for c in range(C):
        faces = topo.cell_faces[c][topo.cell_faces_mask[c]]
        ce = fc[faces].mean(axis=0)
        vol3 = 0.0
        num = np.zeros(3)
        for f in faces:
            sign = 1.0 if topo.owner[f] == c else -1.0
            pyr3 = sign * np.dot(fa[f], fc[f] - ce)
            vol3 += pyr3
            num += pyr3 * (0.75 * fc[f] + 0.25 * ce)
        out[c] = num / vol3 if abs(vol3) > 1e-30 else ce
    return out


def accumulate_normals(topo, points, prev_normals):
    """Stateful boundary point normals (oBB.C:141-233, called per
    iteration at smoothMesh.C:2266 without reset)."""
    _fc, fa = face_geometry(topo, points)
    normals = prev_normals.copy()
    n_faces = np.zeros(topo.n_points, dtype=int)
    add = np.zeros((topo.n_points, 3))
    for f in range(topo.n_faces):
        pid = topo.face_patch[f]
        if pid < 0:
            continue
        if topo.patch_types[pid] in ("processor", "empty"):
            continue
        mag = np.linalg.norm(fa[f])
        unit = fa[f] / max(mag, 1e-30)
        for p in topo.face_points[f][topo.face_mask[f]]:
            add[p] -= unit
            n_faces[p] += 1
    normals += add
    is_sharp = np.zeros(topo.n_points, dtype=bool)
    for p in range(topo.n_points):
        if n_faces[p] < 1:
            continue
        mag = np.linalg.norm(normals[p])
        if mag < 0.1:
            normals[p] = 0.0
            is_sharp[p] = True
        elif mag > 0:
            normals[p] /= mag
    return normals, is_sharp


def _project_to_segment(p, a, b):
    d = b - a
    L2 = np.dot(d, d)
    t = 0.0 if L2 < 1e-300 else np.clip(np.dot(p - a, d) / L2, 0.0, 1.0)
    q = a + t * d
    return q, np.linalg.norm(p - q)


def project_boundary(topo, setup, points, proposed, normals, is_sharp,
                     frozen, max_dist):
    """Priority projection of boundary points (bPS.C:843-945)."""
    out = proposed.copy()
    frozen = frozen.copy()
    ea = setup.target_edge_points[setup.target_edges[:, 0]]
    eb = setup.target_edge_points[setup.target_edges[:, 1]]
    estr = setup.target_edge_strings

    # feature-edge projection sums (bPS.C:623-677), from CURRENT coords
    sums = np.zeros((topo.n_points, 3))
    counts = np.zeros(topo.n_points, dtype=int)
    for p in range(topo.n_points):
        if not setup.is_feature_edge[p]:
            continue
        for w in range(setup.feat_neigh.shape[1]):
            if not setup.feat_neigh_mask[p, w]:
                continue
            q = setup.feat_neigh[p, w]
            best = None
            bestd = np.inf
            for e in range(len(ea)):
                if setup.point_strings[p] >= 0 and \
                        estr[e] != setup.point_strings[p]:
                    continue
                proj, d = _project_to_segment(points[q], ea[e], eb[e])
                if d < bestd:
                    bestd, best = d, proj
            if best is not None:
                sums[p] += best
                counts[p] += 1

    no_hit = np.zeros(topo.n_points, dtype=bool)
    for p in range(topo.n_points):
        if topo.is_internal_point[p]:
            continue
        if setup.is_corner[p]:
            out[p] = setup.corner_targets[p]
        elif setup.is_feature_edge[p]:
            if counts[p] > 0:
                out[p] = sums[p] / counts[p]
        elif is_sharp[p] and not setup.is_corner[p]:
            frozen[p] = True
        elif setup.is_smoothing_surface[p]:
            hit = _raycast(out[p], normals[p], max_dist,
                           setup.surf_tri_a, setup.surf_tri_b,
                           setup.surf_tri_c)
            if hit is None:
                frozen[p] = True
                no_hit[p] = True
            else:
                out[p] = hit
    return out, frozen, no_hit


def _raycast(o, d, max_dist, ta, tb, tc):
    best_t = np.inf
    best = None
    for i in range(len(ta)):
        e1 = tb[i] - ta[i]
        e2 = tc[i] - ta[i]
        pv = np.cross(d, e2)
        det = np.dot(e1, pv)
        if abs(det) <= 1e-12:
            continue
        inv = 1.0 / det
        s = o - ta[i]
        u = np.dot(s, pv) * inv
        qv = np.cross(s, e1)
        v = np.dot(d, qv) * inv
        t = np.dot(e2, qv) * inv
        if u < -1e-9 or v < -1e-9 or u + v > 1 + 1e-9:
            continue
        if abs(t) <= max_dist and abs(t) < abs(best_t):
            best_t = t
            best = o + t * d
    return best


def project_prismatic(topo, setup, maps, new_points, normals, is_sharp,
                      points, blend_frac):
    """projectPrismaticInternalPointsToSurfaces (oBB.C:573-633)."""
    out = new_points.copy()
    for p in range(topo.n_points):
        if not (setup.is_smoothing_surface[p] and setup.is_connected[p]):
            continue
        if maps.inner_map[p] < 0:
            continue
        if setup.is_feature_edge[p] or setup.is_corner[p] or is_sharp[p]:
            continue
        if np.all(normals[p] == 0.0):
            continue
        inner = points[maps.inner_map[p]]
        nv = out[p] - inner
        pvec = nv - np.dot(nv, normals[p]) * normals[p]
        proj = out[p] - pvec
        out[p] = blend_frac * proj + (1 - blend_frac) * out[p]
    return out
