"""Quality-constraint freeze kernels (the reference's L5 layer).

  - ``restrict_edge_shortening``          (reference src/smoothMesh.C:602-652)
  - ``restrict_min_edge_angle_decrease``  (reference src/smoothMesh.C:766-930)
  - ``restrict_face_angle_deterioration`` (reference src/smoothMesh.C:938-1437)

Each returns an updated boolean freeze mask; frozen points revert to
their current coordinates at the end of the iteration (reference
src/smoothMesh.C:2384-2392).

TPU-native design notes:
  - The reference's face-angle constraint propagates freezes through a
    sequential work-stack (src/smoothMesh.C:1347-1434).  Freezing is
    monotone ("freeze if the move deteriorates angles"), so the stack
    computes a closure that is order-independent; here it is computed as
    a parallel fixed point: evaluate all (point, moved-neighbour) pairs
    at once, OR the new freezes, repeat until no change
    (``lax.while_loop``).  See SURVEY.md hard part #1.
  - ``findCellFacePair``'s per-evaluation linear search becomes the
    precompiled ``edge_cell_f0/f1`` slot tables.
  - All angle evaluations use the reference's exact clamped-acos with
    MAX = 0.99999 so freeze decisions agree bit-for-bit near thresholds.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

VSMALL = 1e-30
ACOS_CLAMP = 0.99999
TWO_PI = 2.0 * math.pi


def restrict_edge_shortening(points, proposed, td, min_edge_length,
                             total_min_freeze, frozen):
    """Freeze points whose shortest edge would shrink below threshold."""
    pp = td["point_points"]
    mask = td["point_points_mask"]
    neigh = points[pp]                                   # (N, W, 3)
    cur_len = jnp.linalg.norm(neigh - points[:, None, :], axis=-1)
    new_len = jnp.linalg.norm(neigh - proposed[:, None, :], axis=-1)
    big = jnp.asarray(jnp.inf, points.dtype)
    cur_min = jnp.min(jnp.where(mask, cur_len, big), axis=1)
    new_min = jnp.min(jnp.where(mask, new_len, big), axis=1)

    if total_min_freeze:
        fr = jnp.minimum(cur_min, new_min) < min_edge_length
    else:
        fr = (new_min < min_edge_length) & (new_min < cur_min)
    return frozen | fr


def _edge_edge_angle(c, p1, p2):
    """Angle at c between rays to p1 and p2 (reference edgeEdgeAngle,
    src/smoothMesh.C:766-786): normalized dot, clamped acos."""
    v1 = p1 - c
    v2 = p2 - c
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), VSMALL)
    v2 = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True), VSMALL)
    cos_a = jnp.sum(v1 * v2, axis=-1)
    return jnp.arccos(jnp.clip(cos_a, -ACOS_CLAMP, ACOS_CLAMP))


def restrict_min_edge_angle_decrease(points, proposed, td, min_angle_rad,
                                     frozen):
    """Freeze points whose minimum edge-edge wedge angle would decrease
    below ``min_angle`` (reference calc_min_edge_angles +
    restrictMinEdgeAngleDecrease, src/smoothMesh.C:837-930).

    Per (point, face) wedge the minimum over five evaluations: current,
    and the four moved/unmoved endpoint combinations.
    """
    mask = td["point_faces_mask"]                     # (N, W)
    prev = td["wedge_prev"]
    nxt = td["wedge_next"]

    cp0 = points[:, None, :]
    cp1 = points[prev]
    cp2 = points[nxt]
    np0 = proposed[:, None, :]
    np1 = proposed[prev]
    np2 = proposed[nxt]

    c_angle = _edge_edge_angle(cp0, cp1, cp2)
    n_angle = jnp.minimum(
        jnp.minimum(_edge_edge_angle(np0, cp1, cp2),
                    _edge_edge_angle(np0, np1, np2)),
        jnp.minimum(_edge_edge_angle(np0, cp1, np2),
                    _edge_edge_angle(np0, np1, cp2)),
    )
    big = jnp.asarray(jnp.inf, points.dtype)
    min_c = jnp.min(jnp.where(mask, c_angle, big), axis=1)
    min_n = jnp.min(jnp.where(mask, n_angle, big), axis=1)

    fr = (min_n < min_angle_rad) & (min_n < min_c)
    return frozen | fr


# ---------------------------------------------------------------------------
# Face-angle constraint
# ---------------------------------------------------------------------------

def _subst(ids, coords, s1, c1, s2, c2):
    """coords[...] with point s1 at c1 and s2 at c2 (ids broadcastable).

    ``s1``/``s2`` are per-batch substituted point ids (-1 disables);
    ``c1``/``c2`` their coordinates.  Shapes: ids (..., K), coords
    (..., K, 3), s* (...,), c* (..., 3).
    """
    m1 = (ids == s1[..., None]) & (s1[..., None] >= 0)
    m2 = (ids == s2[..., None]) & (s2[..., None] >= 0)
    out = jnp.where(m1[..., None], c1[..., None, :], coords)
    out = jnp.where(m2[..., None], c2[..., None, :], out)
    return out


def _acos_c(x):
    return jnp.arccos(jnp.clip(x, -ACOS_CLAMP, ACOS_CLAMP))


def _pair_metric(a, b, u_space):
    """The reference's acos(a) + acos(b) face-angle sum, or its
    monotone u-space twin (the tile engine's encoding, see
    ops/tiledstep._e_body): u = 1 - cos(A+B) when sin(A+B) >= 0 else
    3 + cos(A+B).  Both are strictly increasing in the angle, so
    min/max/threshold comparisons agree; u-space is used when the
    current per-point angles come from the Pallas stages (Mosaic has
    no acos) so current and proposed values share one representation.
    """
    if not u_space:
        return _acos_c(a) + _acos_c(b)
    a = jnp.clip(a, -ACOS_CLAMP, ACOS_CLAMP)
    b = jnp.clip(b, -ACOS_CLAMP, ACOS_CLAMP)
    sa = jnp.sqrt(1.0 - a * a)
    sb = jnp.sqrt(1.0 - b * b)
    cos_s = a * b - sa * sb
    sin_s = sa * b + a * sb
    return jnp.where(sin_s >= 0, 1.0 - cos_s, 3.0 + cos_s)


def angle_to_u(theta: float) -> float:
    """u-space image of an angle threshold in [0, pi]."""
    return 1.0 - math.cos(theta)


def simple_face_centres(points, td):
    """Per-face vertex means (reference calcFaceCenter
    src/smoothMesh.C:1103-1130 without substitutions) — the linear base
    that per-evaluation substitutions correct incrementally."""
    fp = td["face_points"]
    m = td["face_mask"][..., None].astype(points.dtype)
    n = td["face_npoints"].astype(points.dtype)[:, None]
    return jnp.sum(points[fp] * m, axis=1) / jnp.maximum(n, 1.0)


def face_angles_for_edges(points, cell_ctrs, td, edge_ids, s1, c1, s2, c2,
                          fc_base=None, with_subst=True, u_space=False):
    """Min/max projected face-face angle per edge with substitutions.

    Vectorized ``calcMinMaxFaceAngleForEdge`` (reference
    src/smoothMesh.C:1135-1231): project adjacent face centres (simple
    vertex mean, reference calcFaceCenter :1103-1130) and *current* cell
    centres onto the edge-normal plane; per adjacent cell the angle is
    the sum of the two face->cell-centre angles; reduce min/max over
    cells.

    TPU design note: substituted face centres are computed as
    ``base + [point in face] * (new - old)/n`` corrections on the
    precomputed vertex-mean centres (they are linear in the vertices),
    avoiding the (B, WF, WP, 3) coordinate gathers that dominate the
    naive formulation.  ``fc_base`` may be passed in to amortize the
    base computation across evaluations of the same point field.

    edge_ids: (B,), s1/s2: (B,) point ids (-1 = no substitution),
    c1/c2: (B, 3).  Returns (min_angle (B,), max_angle (B,)).
    """
    dtype = points.dtype
    edges = td["edges"][edge_ids]                       # (B, 2)
    e_pts = points[edges]                               # (B, 2, 3)
    if with_subst:
        e_pts = _subst(edges, e_pts, s1, c1, s2, c2)
    e0, e1 = e_pts[:, 0], e_pts[:, 1]
    c_ctr = 0.5 * (e0 + e1)
    e_vec = e1 - e0
    e_vec = e_vec / jnp.maximum(
        jnp.linalg.norm(e_vec, axis=-1, keepdims=True), VSMALL)

    if fc_base is None:
        fc_base = simple_face_centres(points, td)

    fids = td["edge_faces"][edge_ids]                   # (B, WF)
    f_ctr = fc_base[fids]                               # (B, WF, 3)
    if with_subst:
        # Substitution corrections: membership gathers are the dominant
        # row traffic; skipped entirely on the no-substitution path
        f_n = td["face_npoints"][fids].astype(dtype)    # (B, WF)
        f_pts_ids = td["face_points"][fids]             # (B, WF, WP) ints
        f_pmask = td["face_mask"][fids]
        for sid, sc in ((s1, c1), (s2, c2)):
            has = sid >= 0
            inf = jnp.any(
                (f_pts_ids == sid[:, None, None]) & f_pmask, axis=2
            ) & has[:, None]                            # (B, WF)
            delta = (sc - points[jnp.maximum(sid, 0)])  # (B, 3)
            f_ctr = f_ctr + (
                inf.astype(dtype) / jnp.maximum(f_n, 1.0)
            )[..., None] * delta[:, None, :]

    def project_unit(x):
        # Project x onto the plane through c_ctr normal to e_vec, then
        # return the unit vector from c_ctr (reference :1189-1195).
        cf = c_ctr[:, None, :] - x
        dot = jnp.sum(cf * e_vec[:, None, :], axis=-1, keepdims=True)
        p = x + dot * e_vec[:, None, :]
        d = p - c_ctr[:, None, :]
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                               VSMALL)

    p_vecs = project_unit(f_ctr)                        # (B, WF, 3)

    cids = td["edge_cells"][edge_ids]                   # (B, WC)
    c_mask = td["edge_cells_mask"][edge_ids]
    cell_c = cell_ctrs[cids]                            # (B, WC, 3)
    c_vecs = project_unit(cell_c)                       # (B, WC, 3)

    f0 = td["edge_cell_f0"][edge_ids]                   # (B, WC) slots
    f1 = td["edge_cell_f1"][edge_ids]
    p0 = jnp.take_along_axis(p_vecs, f0[..., None], axis=1)
    p1 = jnp.take_along_axis(p_vecs, f1[..., None], axis=1)
    ang = _pair_metric(jnp.sum(p0 * c_vecs, axis=-1),
                       jnp.sum(c_vecs * p1, axis=-1), u_space)  # (B, WC)

    big_ang = 4.0 if u_space else TWO_PI
    min_a = jnp.min(jnp.where(c_mask, ang, big_ang), axis=1)
    max_a = jnp.max(jnp.where(c_mask, ang, 0.0), axis=1)
    return min_a, max_a


def _map_chunks(fn, n, chunk):
    """Evaluate fn(idx) over clipped index chunks of 0..n-1 and stitch.

    Bounds peak memory of the face-angle evaluations: fn sees ``chunk``
    indices at a time (tail indices are clipped duplicates of n-1, whose
    outputs are sliced away).  chunk=None runs one full batch.
    """
    if chunk is None or chunk >= n:
        return fn(jnp.arange(n))
    nc = -(-n // chunk)

    def body(c):
        idx = jnp.clip(c * chunk + jnp.arange(chunk), 0, n - 1)
        return fn(idx)

    outs = jax.lax.map(body, jnp.arange(nc))
    return jax.tree.map(
        lambda o: o.reshape((nc * chunk,) + o.shape[2:])[:n], outs)


def current_face_angles_per_point(points, cell_ctrs, td, chunk=None,
                                  fc_base=None):
    """Per-point current min/max face angles (reference
    calcCurrentMinMaxFaceAnglesForEdges + mapCurrentMinMaxFaceAnglesToPoints,
    src/smoothMesh.C:938-975, :1252-1270).

    The per-edge pass is cheap (~100 floats of intermediates per edge),
    so it gets its own wide chunk policy — kernel-dispatch overhead of
    many small lax.map chunks dwarfs the compute otherwise.
    """
    E = td["edges"].shape[0]
    chunk = None if E <= (1 << 20) else (1 << 20)

    base = simple_face_centres(points, td) if fc_base is None else fc_base

    def eval_edges(eidx):
        no_id = jnp.full(eidx.shape, -1, dtype=td["edges"].dtype)
        zero = jnp.zeros(eidx.shape + (3,), dtype=points.dtype)
        return face_angles_for_edges(points, cell_ctrs, td,
                                     eidx.astype(td["edges"].dtype),
                                     no_id, zero, no_id, zero,
                                     fc_base=base, with_subst=False)

    min_e, max_e = _map_chunks(eval_edges, E, chunk)
    # Padded edge rows (sharded stacked topologies) must not poison the
    # per-point reduction
    valid = td["edge_valid"]
    min_e = jnp.where(valid, min_e, TWO_PI)
    max_e = jnp.where(valid, max_e, 0.0)
    # Edge -> point reduction as a GATHER over point_edges (a point's
    # edges are exactly the edges containing it): TPU scatters
    # serialize and run ~20x slower than gathers.
    pe = td["point_edges"]
    pm = td["point_edges_mask"]
    min_p = jnp.min(jnp.where(pm, min_e[pe], TWO_PI), axis=1)
    max_p = jnp.max(jnp.where(pm, max_e[pe], 0.0), axis=1)
    return min_p, max_p


def restrict_face_angle_deterioration(points, cell_ctrs, proposed, td,
                                      min_angle_rad, max_angle_rad, frozen,
                                      chunk=None, fc_base=None,
                                      cur_minmax=None, u_space=False,
                                      transposed=False, n_points=None,
                                      eligible=None):
    """Freeze points (and neighbours) whose moves deteriorate face-face
    angles already outside [min_angle, max_angle].

    Parallel fixed point of the reference's stack propagation
    (src/smoothMesh.C:1320-1437): per sweep, every point p evaluates the
    effect of each moving neighbour q on p's angles (with p at its
    current effective position) and freezes offending neighbours; sweeps
    repeat until the freeze mask stops changing.

    ``fc_base`` / ``cur_minmax`` let the tile engine supply the
    vertex-mean face centres and the per-point current min/max angles
    it already computed (ops/tiledstep.py), skipping the per-edge pass.
    ``transposed=True`` means points/proposed/cell_ctrs/fc_base arrive
    ALREADY transposed as (3, >=N)/(3, >=C)/(3, >=F) (the tile engine's
    planar layout, possibly lane-padded — padding columns are never
    indexed since all gather ids are valid entity ids).  This skips
    four full-array relayouts per call; requires fc_base and cur_minmax.
    """
    dtype = points.dtype
    if transposed and (fc_base is None or cur_minmax is None):
        raise ValueError("transposed mode needs fc_base and cur_minmax")
    if fc_base is None:
        fc_base = simple_face_centres(points, td)
    if cur_minmax is not None:
        cur_min_p, cur_max_p = cur_minmax
    else:
        cur_min_p, cur_max_p = current_face_angles_per_point(
            points, cell_ctrs, td, chunk=chunk, fc_base=fc_base)
    if u_space:
        # all angle-valued quantities (cur_minmax and every evaluation
        # below) live in the monotone u encoding; thresholds map along
        min_angle_rad = angle_to_u(min_angle_rad)
        max_angle_rad = angle_to_u(max_angle_rad)
    big_ang = 4.0 if u_space else TWO_PI
    # Cross-path noise guard: with cur_minmax from the Pallas stages
    # and the substituted evaluations from this XLA code, evaluations
    # whose configuration is mathematically unchanged come out equal
    # only up to ~1e-6 cross-path float32 noise — without a guard the
    # strict new<cur comparisons flip randomly there (the single-path
    # case compares bit-identical values).  1e-5 in u units ignores
    # only sub-noise "deteriorations".
    det_eps = 1e-5 if (u_space and cur_minmax is not None) else 0.0
    # Points already in good range never freeze anyone (reference :1367)
    active = (cur_min_p <= min_angle_rad) | (cur_max_p >= max_angle_rad)
    if eligible is not None:
        # halo-sharded evaluation (parallel/halo.py): only points with
        # a complete local stencil (owned points) may run self tests /
        # originate pair freezes; their evaluations are exact, and the
        # freeze targets they produce (themselves or any local
        # neighbour) are OR-combined across shards by the caller
        active = active & eligible

    # padded lanes of the planar form are never indexed (gather ids are
    # valid entity ids), so ``moving`` may stay lane-padded
    if transposed:
        _wm = min(points.shape[1], proposed.shape[1])
        moving = jnp.any(proposed[:3, :_wm] != points[:3, :_wm], axis=0)
    else:
        moving = jnp.any(proposed != points, axis=-1)

    def deteriorates(new_min, new_max):
        return (
            ((new_min < min_angle_rad) & (new_min < cur_min_p - det_eps))
            | ((new_max > max_angle_rad) & (new_max > cur_max_p + det_eps))
        )

    # Full evaluations happen only for "active" points (the reference
    # skips in-range points up-front :1367-1369); the active set is
    # compacted with nonzero and processed in fixed-size chunks inside a
    # while_loop, so the cost is proportional to how many points are
    # actually near the angle thresholds — the common converged-mesh
    # case costs just the per-edge pass above.
    N = n_points if transposed else points.shape[0]
    any_active = jnp.any(active)
    # Packed tables (device.FA_PACKED_KEYS) when staged; otherwise
    # derived from the legacy separate arrays (manually built tds).
    pps_signed = td["pps_signed"] if "pps_signed" in td else None
    if pps_signed is None:
        pps_signed = jnp.where(td["point_points_mask"],
                               td["point_points"], -1)
    WP = pps_signed.shape[1]
    edges_arr = td["edges"]
    E = edges_arr.shape[0]
    # Eval/agg chunk width.  ``chunk`` (driver.default_face_angle_chunk)
    # exists to BOUND peak memory at huge N; when it is None (mesh fits
    # the budget unchunked) the serial while-loop step count is the
    # cost that matters — each full eval pass runs ceil(E_active/Ke)
    # sequential steps of a heavy register-level body, so a small Ke
    # multiplies fixed per-step latency (round-3 stress profile:
    # ~1.7 ms/step at K=16384; a 4096 default paid ~4x the steps).
    # MEASURED NEGATIVE (2026-08-19): K=65536 regressed 64^3 stress to
    # 568.8 ms/iter (was 296.7) — dirty sweeps after the first pass
    # have tiny active sets, and every sweep still pays at least one
    # FULL-chunk-width eval, so an oversized K multiplies the
    # per-sweep floor; jit warmup also grew to 800 s.  MEASURED
    # (2026-08-20, post packed-eval + DIRTY_CAP): narrowing the SWEEP
    # chunk to 8192 while keeping the first pass at 16384 took 64^3
    # stress 162.8 (loaded host) -> 143.9 ms/iter (quiet) — sweeps pay
    # the per-sweep full-chunk-width floor, so the narrower width wins
    # now that the first pass has its own knob (_k_first below).
    _k_default = int(os.environ.get("SMOOTHMESH_FA_EVAL_CHUNK", "8192"))
    # Pair-slot fori_loop instead of Python unrolling (bit-identical;
    # ~WPx smaller lowered module — see eval_edges_chunk).  Off by
    # default until the runtime effect is measured on device.
    _SLOT_SCAN = os.environ.get("SMOOTHMESH_FA_SLOT_SCAN", "0") == "1"
    # Combined self+pair first pass (SMOOTHMESH_FA_COMBINED=1): one eval
    # pass computes all WP pair bits AND the self bit (bit WP) per
    # (edge, side), replacing the separate 1-slot self eval pass over
    # all active edges.  Self bits are evaluated under the INCOMING
    # freeze mask (same state today's self phase sees); pair bits
    # depend on the mask only through the two endpoints' effective
    # coordinates, so after the self agg only edges with a NEWLY
    # self-frozen endpoint hold stale pair bits — exactly those are
    # re-evaluated (list-driven) before the first pair agg, restoring
    # bit-exact equality with the two-pass form.  Opt-in pending device
    # measurement.  Needs the self bit in word 0 (WP + 1 <= 32).
    _COMBINED = (os.environ.get("SMOOTHMESH_FA_COMBINED", "0") == "1"
                 and WP + 1 <= 32)
    # Measurement-only (experiments/fabreakdown.py): truncate the fixed
    # point after a named phase — none | prep | self | pair0 | pair1 |
    # sweep1 | full.  Trace-time static; "full" (default) is production
    # behavior with zero overhead.  Truncated returns fold a cheap data
    # dependency on the phase's outputs so XLA cannot DCE the work.
    _PHASE_CAP = os.environ.get("SMOOTHMESH_FA_PHASE_CAP", "full")
    # Packed-row eval tables (SMOOTHMESH_FA_PACKED_EVAL): the eval is
    # gather-ROW-bound (r5 fabreakdown: pair0 +290 ms at 64^3 stress ~=
    # active_edges x ~124 gather rows / ~220M rows/s), and TPU gathers
    # are padded-row-FETCH bound (r2 gatherbench: ~110-140 GB/s of
    # padded rows) — a (N, W<=128) row gather costs about the same as a
    # 1D gather but delivers W components.  Packing the per-point
    # (cur, prop, cur_min, cur_max), per-face (fc, inv_fn) and per-cell
    # (cc) float data into row tables built once per call cuts the eval
    # to ~34 gather rows/edge.  Bit-exact: the same values are gathered
    # and combined by the same ops (prop is stored, not delta, so
    # eff = where(frz, cur, prop) stays bit-identical; dq = prop_q -
    # cur_q equals the global delta_T values).  MEASURED (2026-08-20):
    # 64^3 stress 348.0 -> 188.8 ms/iter.  "1" on, "0" off, default
    # auto: on below SMOOTHMESH_FA_PACK_MAX_PTS points (the tables are
    # O(N+F+C) resident through the FA call; their worst-case
    # lane-padded footprint at very large N is unmeasured on this
    # runtime, so huge meshes keep the per-component path).
    _pe = os.environ.get("SMOOTHMESH_FA_PACKED_EVAL", "auto")
    if _pe == "auto":
        _PACKED_EVAL = N <= int(os.environ.get(
            "SMOOTHMESH_FA_PACK_MAX_PTS", str(4_200_000)))
    else:
        _PACKED_EVAL = _pe == "1"
    Ke = min(chunk if chunk else _k_default, E)
    Kp = min(chunk if chunk else _k_default, N)
    # First-pass eval chunk: the FULL pass over active edges runs
    # ceil(E_active/K) serial while-loop steps whose fixed per-step
    # latency dominates (round-3: ~1.7 ms/step at K=16384), so a wider
    # K pays off there — while dirty sweeps, whose active sets are tiny
    # after the first pass, pay at least ONE full-chunk-width eval per
    # sweep and measurably regress with wide K (the K=65536-everywhere
    # negative above).  Splitting the widths captures both: wide first
    # pass, narrow sweeps.  An explicit ``chunk`` (the driver's HBM cap
    # at large N) bounds both.
    _k_first = int(os.environ.get("SMOOTHMESH_FA_FIRST_CHUNK", "16384"))
    Ke_first = min(chunk if chunk else _k_first, E)

    # Active sets are compacted to exact entry lists with jnp.nonzero
    # and streamed in fixed-size chunks.  MEASURED NEGATIVE ALTERNATIVE
    # (round 3): 128-entry-BLOCK-granularity compaction (nonzero over
    # n/128 block predicates, rows masked by the original predicate)
    # regressed stress mode 365 -> 2055 ms/iter at 64^3 — dirty bits
    # after the first sweep scatter roughly one-per-block, so every
    # dirty sweep ballooned to a near-full eval pass.  Exact compaction
    # keeps sweeps O(dirty); its nonzero cost is the price.
    def chunked(body_fn, init, idx_arr, n_valid, K):
        def cond(s):
            c, _ = s
            return c * K < n_valid

        def body(s):
            c, carry = s
            start = c * K
            idx = jax.lax.dynamic_slice(idx_arr, (start,), (K,))
            rowv = (start + jnp.arange(K)) < n_valid
            return c + 1, body_fn(idx, rowv, carry)

        _, out = jax.lax.while_loop(cond, body, (jnp.asarray(0), init))
        return out

    # Transposed coordinate tables: all per-chunk work below runs on
    # dense (K,) vectors (TPU tiles pad the last two dims to (8,128);
    # (K, 4, 3)-shaped intermediates inside the while body waste ~40x
    # memory and dominated the profile).
    if transposed:
        # lane-padded widths may differ (pts4 is >= 2 window spans;
        # stage outputs are nb*KB) — align on the smaller, which still
        # covers every valid entity id
        _w = min(points.shape[1], proposed.shape[1])
        points_T = points[:3, :_w]
        proposed_T = proposed[:3, :_w]
        fcb_T = fc_base[:3]
        cc_T = cell_ctrs[:3]
    else:
        points_T = points.T
        proposed_T = proposed.T
        fcb_T = fc_base.T
        cc_T = cell_ctrs.T
    delta_T = proposed_T - points_T       # per-point move (3, N)
    WF = td["edge_faces"].shape[1]
    WC = td["edge_cells"].shape[1]
    # gather-count reductions (the eval is gather-bound): face-point
    # ids with the validity mask folded in as -1 (halves the fp
    # gathers), and (f0, f1, cell-mask) packed into one int32 per
    # edge-cell slot (3 gathers -> 1)
    fps_signed = td["fps_signed"] if "fps_signed" in td else None
    if fps_signed is None:
        fps_signed = jnp.where(td["face_mask"], td["face_points"], -1)
    _sb = max(WF, 1).bit_length()
    ecf_packed = td["ecf_packed"] if "ecf_packed" in td else None
    if ecf_packed is None:
        ecf_packed = (td["edge_cell_f0"]
                      + (td["edge_cell_f1"] << _sb)
                      + (td["edge_cells_mask"].astype(jnp.int32)
                         << (2 * _sb)))
    WPf = fps_signed.shape[1]
    pe_flat = td["pe_flat"] if "pe_flat" in td else None
    if pe_flat is None:
        pe_flat = jnp.where(td["point_edges_mask"],
                            td["point_edges_side"] * E
                            + td["point_edges"], -1)

    # ---- det-bitmask buffers ------------------------------------------
    # The deterioration test on a point's NEW min/max over its edges
    # decomposes per edge:  min_e mn_e < thr  <=>  exists e: mn_e < thr
    # (and symmetrically for the max), with
    #   thr_mn(p) = min(min_angle_rad, cur_min_p[p] - det_eps)
    #   thr_mx(p) = max(max_angle_rad, cur_max_p[p] + det_eps).
    # So instead of carrying T=2*(WP+1) float (2E,) min/max buffers and
    # re-aggregating point minima from them (52 scatter rows + 156
    # gather rows per chunk — measured to dominate stress-mode
    # iterations), each (edge, side) evaluation stores one PACKED det
    # bit per substitution slot; the agg phases OR the bitmasks over a
    # point's edges (WE gathers per chunk) and unpack.  Bit-exact with
    # the float-buffer form: the per-edge comparisons are the same
    # comparisons, and "min over edges < thr" is "any edge < thr".
    def _n_words(T):
        return -(-T // 32)

    def eval_edges_chunk(frozen_cur, eidx, rowv, bufs, t_slots,
                         ptabs=None):
        if ptabs is not None:
            # Packed-row gathers (SMOOTHMESH_FA_PACKED_EVAL): one row
            # gather per entity instead of one gather per component.
            Pf, Ff, Cc = ptabs
            epv = edges_arr[eidx]                        # (K, 2)
            ep = [epv[:, 0], epv[:, 1]]
            pfv = [Pf[ep[s]] for s in (0, 1)]            # 2 x (K, 8)
            cur_ep = [[pfv[s][:, c] for c in range(3)] for s in (0, 1)]
            frz = [frozen_cur[ep[s]] for s in (0, 1)]
            eff_ep = [[jnp.where(frz[s], pfv[s][:, c], pfv[s][:, 3 + c])
                       for c in range(3)] for s in (0, 1)]
            efv = td["edge_faces"][eidx]                 # (K, WF)
            fids = [efv[:, w] for w in range(WF)]
            ffv = [Ff[fids[w]] for w in range(WF)]       # WF x (K, 4)
            inv_fn = [ffv[w][:, 3] for w in range(WF)]
            fc0 = [[ffv[w][:, c] for c in range(3)] for w in range(WF)]
            fpv = [fps_signed[fids[w]] for w in range(WF)]
            fp_ids = [[fpv[w][:, j] for j in range(WPf)]
                      for w in range(WF)]
            ecv = td["edge_cells"][eidx]                 # (K, WC)
            cids = [ecv[:, u] for u in range(WC)]
            ecfv = ecf_packed[eidx]                      # (K, WC)
            ecf = [ecfv[:, u] for u in range(WC)]
            ccv = [Cc[cids[u]] for u in range(WC)]       # WC x (K, 3)
            cc = [[ccv[u][:, c] for c in range(3)] for u in range(WC)]
            qv = [pps_signed[ep[s]] for s in (0, 1)]     # 2 x (K, WP)
            q_all = [[qv[s][:, t] for t in range(WP)] for s in (0, 1)]
            thrs = [(jnp.minimum(min_angle_rad, pfv[s][:, 6] - det_eps),
                     jnp.maximum(max_angle_rad, pfv[s][:, 7] + det_eps))
                    for s in (0, 1)]
        else:
            ep = [edges_arr[:, s][eidx] for s in (0, 1)]     # 2 x (K,)
            cur_ep = [[points_T[c, ep[s]] for c in range(3)]
                      for s in (0, 1)]
            frz = [frozen_cur[ep[s]] for s in (0, 1)]
            eff_ep = [[jnp.where(frz[s], cur_ep[s][c],
                                 proposed_T[c, ep[s]]) for c in range(3)]
                      for s in (0, 1)]
            fids = [td["edge_faces"][:, w][eidx] for w in range(WF)]
            f_n = [td["face_npoints"][fids[w]].astype(dtype)
                   for w in range(WF)]
            inv_fn = [1.0 / jnp.maximum(f_n[w], 1.0) for w in range(WF)]
            fc0 = [[fcb_T[c, fids[w]] for c in range(3)]
                   for w in range(WF)]
            fp_ids = [[fps_signed[:, j][fids[w]] for j in range(WPf)]
                      for w in range(WF)]
            cids = [td["edge_cells"][:, u][eidx] for u in range(WC)]
            ecf = [ecf_packed[:, u][eidx] for u in range(WC)]
            cc = [[cc_T[c, cids[u]] for c in range(3)] for u in range(WC)]
            # validity folded into the id as -1 (fps_signed-style):
            # halves the q gather rows (mask gathers disappear; -1 never
            # matches a real fp/endpoint id and clamps harmlessly in
            # delta_T reads)
            q_all = [[pps_signed[:, t][ep[s]] for t in range(WP)]
                     for s in (0, 1)]
            thrs = [(jnp.minimum(min_angle_rad,
                                 cur_min_p[ep[s]] - det_eps),
                     jnp.maximum(max_angle_rad,
                                 cur_max_p[ep[s]] + det_eps))
                    for s in (0, 1)]
        c_mask = [(e >> (2 * _sb)) > 0 for e in ecf]
        f0 = [e & ((1 << _sb) - 1) for e in ecf]
        f1 = [(e >> _sb) & ((1 << _sb) - 1) for e in ecf]

        def dot3(a, b):
            return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

        out = list(bufs)
        nw = _n_words(len(t_slots))
        # Slot-scan mode (SMOOTHMESH_FA_SLOT_SCAN=1): run the WP pair
        # substitution slots as a lax.fori_loop instead of Python
        # unrolling.  The slot evaluations are independent and the bit
        # OR is order-free, so results are bit-identical; the lowered
        # module shrinks ~WPx at every pair-eval site (the face-angle
        # machinery is 78% of the step module and dominates the remote
        # compiler's warmup — docs/bench_r04_datapoints.json).
        pair_scan = (_SLOT_SCAN and nw == 1
                     and tuple(t_slots) == tuple(range(WP)))
        for s in (0, 1):
            p_eff = eff_ep[s]
            cur_p = cur_ep[s]
            other = 1 - s
            dp = [p_eff[c] - cur_p[c] for c in range(3)]
            thr_mn, thr_mx = thrs[s]

            def slot_bit(q_id, _s=s, _other=1 - s, _p_eff=eff_ep[s],
                         _cur_p=cur_ep[s], _dp=dp, _thr_mn=thr_mn,
                         _thr_mx=thr_mx):
                """Det bit for one substitution slot of side ``_s``:
                q_id (K,) neighbour ids (-1 invalid), or None for the
                self test (no neighbour substitution)."""
                if q_id is not None:
                    q_ok = q_id >= 0
                    # q_id == -1 wraps to the last (pad) column/row of
                    # delta_T / Pf; the where() discards it
                    if ptabs is not None:
                        qpf = ptabs[0][q_id]         # (K, 8)
                        dq = [jnp.where(q_ok,
                                        qpf[:, 3 + c] - qpf[:, c], 0.0)
                              for c in range(3)]
                    else:
                        dq = [jnp.where(q_ok, delta_T[c, q_id], 0.0)
                              for c in range(3)]
                    # endpoints with substitution (q may be the other
                    # endpoint; q is never p)
                    q_is_other = (q_ok & (q_id == ep[_other])).astype(
                        dtype)
                    end_o = [cur_ep[_other][c] + q_is_other * dq[c]
                             for c in range(3)]
                else:  # self test
                    q_ok = None
                    dq = None
                    end_o = cur_ep[_other]
                e0c = _p_eff if _s == 0 else end_o
                e1c = end_o if _s == 0 else _p_eff
                c_ctr = [0.5 * (e0c[c] + e1c[c]) for c in range(3)]
                ev = [e1c[c] - e0c[c] for c in range(3)]
                ev_n = jnp.maximum(jnp.sqrt(dot3(ev, ev)), VSMALL)
                ev = [ev[c] / ev_n for c in range(3)]

                def proj_unit(x):
                    # x: 3 x (K,) -> unit vector from c_ctr in the
                    # edge-normal plane
                    cf = [c_ctr[c] - x[c] for c in range(3)]
                    dt = dot3(cf, ev)
                    d = [x[c] + dt * ev[c] - c_ctr[c] for c in range(3)]
                    dn = jnp.maximum(jnp.sqrt(dot3(d, d)), VSMALL)
                    return [d[c] / dn for c in range(3)]

                pv = []
                for w in range(WF):
                    if q_id is not None:
                        in_q = jnp.zeros_like(q_ok)
                        for j in range(WPf):
                            # fp_ids has invalid slots as -1; q_id >= 0
                            in_q = in_q | (fp_ids[w][j] == q_id)
                        in_q = (in_q & q_ok).astype(dtype) * inv_fn[w]
                        fc = [fc0[w][c] + _dp[c] * inv_fn[w]
                              + in_q * dq[c] for c in range(3)]
                    else:
                        fc = [fc0[w][c] + _dp[c] * inv_fn[w]
                              for c in range(3)]
                    pv.append(proj_unit(fc))

                mn_t = jnp.full_like(c_ctr[0], big_ang)
                mx_t = jnp.zeros_like(c_ctr[0])
                for u in range(WC):
                    cv = proj_unit(cc[u])
                    p0 = [sum(jnp.where(f0[u] == w, pv[w][c], 0.0)
                              for w in range(WF)) for c in range(3)]
                    p1 = [sum(jnp.where(f1[u] == w, pv[w][c], 0.0)
                              for w in range(WF)) for c in range(3)]
                    ang = _pair_metric(dot3(p0, cv), dot3(cv, p1),
                                       u_space)
                    mn_t = jnp.where(c_mask[u], jnp.minimum(mn_t, ang),
                                     mn_t)
                    mx_t = jnp.where(c_mask[u], jnp.maximum(mx_t, ang),
                                     mx_t)

                return ((mn_t < _thr_mn) | (mx_t > _thr_mx)).astype(
                    jnp.int32)

            if pair_scan:
                qs = jnp.stack(q_all[s])               # (WP, K)

                def slot_body(t, w0):
                    return w0 | (slot_bit(qs[t]) << (t % 32))

                words = [jax.lax.fori_loop(
                    0, WP, slot_body,
                    jnp.zeros(eidx.shape, jnp.int32))]
            else:
                words = [jnp.zeros(eidx.shape, jnp.int32)
                         for _ in range(nw)]
                for ti, t in enumerate(t_slots):
                    bit = slot_bit(q_all[s][t] if t < WP else None)
                    words[ti // 32] = words[ti // 32] | (bit << (ti % 32))
            # packed det words over (2E,): one write per side per word
            tgt = jnp.where(rowv, s * E + eidx, 2 * E)
            for w in range(nw):
                out[w] = out[w].at[tgt].set(words[w], mode="drop")
        return tuple(out)

    def _point_det_from_bufs(idx, bufs, T):
        """(Kp, T) det bools: OR of the packed edge det words over each
        point's edge set, unpacked."""
        pf = pe_flat[idx]                                # (Kp, WE)
        pmask = pf >= 0
        flat = jnp.maximum(pf, 0)                        # (Kp, WE)
        WE = pf.shape[1]
        acc = []
        for wd in range(_n_words(T)):
            a = jnp.zeros(idx.shape, jnp.int32)
            for w in range(WE):
                v = bufs[wd][flat[:, w]]
                a = a | jnp.where(pmask[:, w], v, 0)
            acc.append(a)
        det = [((acc[t // 32] >> (t % 32)) & 1).astype(bool)
               for t in range(T)]
        return jnp.stack(det, axis=1)                    # (Kp, T)

    # Phase 1 — self tests run to completion FIRST: the reference's
    # stack performs each point's self test before its pair evals, so a
    # self-frozen point's pair evaluations always see it at its current
    # coordinates (src/smoothMesh.C:1379-1400 before :1402-1433).
    def self_agg_chunk(idx, rowv, state):
        frozen_cur, bufs = state
        if _COMBINED:  # self bit rides bit WP of the combined words
            det = _point_det_from_bufs(idx, bufs, WP + 1)[:, WP]
        else:
            det = _point_det_from_bufs(idx, bufs, 1)[:, 0]
        self_det = det & rowv & moving[idx] & ~frozen_cur[idx]
        new_frozen = frozen_cur.at[
            jnp.where(self_det, idx, N)].set(True, mode="drop")
        return new_frozen, bufs

    # Phase 2 — pair sweeps to a fixed point
    def pair_agg_chunk(idx, rowv, state):
        frozen_cur, changed, bufs = state
        det = _point_det_from_bufs(idx, bufs, WP)
        det &= rowv[:, None]
        bs = pps_signed[idx]
        b_pp = jnp.maximum(bs, 0)
        q_moving = moving[b_pp] & ~frozen_cur[b_pp]
        bad = det & (bs >= 0) & q_moving
        new_frozen = frozen_cur.at[
            jnp.where(bad, b_pp, N).reshape(-1)].set(True, mode="drop")
        changed = changed | jnp.any(bad)
        return new_frozen, changed, bufs

    def _new_bufs(T):
        # un-evaluated (inactive) edge rows keep det bits 0 = no freeze
        return tuple(jnp.zeros((2 * E,), jnp.int32)
                     for _ in range(_n_words(T)))

    def run_all(frozen):
        # ---- edge-centric substituted evaluation ----
        # Every (p, q, e) evaluation the reference performs has p as an
        # endpoint of e.  So instead of gathering e's geometry once per
        # (p, q) pair, each ACTIVE edge (an edge with an active
        # endpoint) loads its geometry once and evaluates all 2*(WP+1)
        # substitution combinations (endpoint side x neighbour slot,
        # plus the self test) in registers — ~8x fewer gather rows than
        # the point-centric form.
        #
        # This prep (two pred gathers over E + two nonzero compactions)
        # costs ~19 ms/iter at 64^3, so it lives INSIDE the
        # any_active cond: in-band meshes (the common converged regime)
        # skip it entirely (round-3 profile, experiments/profilestep.py).
        if _PHASE_CAP == "none":
            return frozen
        active_e = ((active[edges_arr[:, 0]] | active[edges_arr[:, 1]])
                    & td["edge_valid"])
        ae_idx = jnp.nonzero(active_e, size=E, fill_value=0)[0]
        n_active_e = jnp.sum(active_e)
        act_idx = jnp.nonzero(active, size=N, fill_value=0)[0]
        n_active = jnp.sum(active)
        if _PHASE_CAP == "prep":
            return frozen | ((n_active_e + n_active
                              + ae_idx[-1] + act_idx[-1]) < 0)

        if _PACKED_EVAL:
            # Row tables for the packed-row eval, built once per FA
            # call (inside the any_active cond: in-band meshes never
            # pay).  Pad rows are never gathered (all ids are valid
            # entity ids; q_id == -1 wraps to the last row and the
            # where() discards it).
            def _fit1(a, L):
                if a.shape[0] == L:
                    return a
                if a.shape[0] > L:
                    return a[:L]
                return jnp.pad(a, (0, L - a.shape[0]))

            _pw = points_T.shape[1]
            _fw = fcb_T.shape[1]
            Pf = jnp.stack(
                [points_T[0], points_T[1], points_T[2],
                 proposed_T[0], proposed_T[1], proposed_T[2],
                 _fit1(cur_min_p, _pw), _fit1(cur_max_p, _pw)], axis=1)
            inv_fn_g = 1.0 / jnp.maximum(
                _fit1(td["face_npoints"].astype(dtype), _fw), 1.0)
            Ff = jnp.stack([fcb_T[0], fcb_T[1], fcb_T[2], inv_fn_g],
                           axis=1)
            Cc = jnp.stack([cc_T[0], cc_T[1], cc_T[2]], axis=1)
            PT = (Pf, Ff, Cc)
        else:
            PT = None

        def self_phase(frozen):
            bufs = chunked(
                lambda ei, rv, b: eval_edges_chunk(frozen, ei, rv, b,
                                                   (WP,), PT),
                _new_bufs(1), ae_idx, n_active_e, Ke_first)
            frozen, _ = chunked(
                self_agg_chunk, (frozen, bufs), act_idx, n_active, Kp)
            return frozen

        # Pair sweeps to a fixed point with DIRTY-SET re-evaluation: an
        # edge's substituted evaluations depend on the freeze state only
        # through its endpoints' effective coordinates, so after the
        # first full pass only edges with a NEWLY frozen endpoint can
        # produce different values.  Their buffer rows are updated in
        # place (the (2E,) buffers are loop carry) and only points
        # incident to dirty edges re-aggregate.  Freezing is monotone
        # and .set(True) is idempotent, so this reaches the exact same
        # fixed point as re-evaluating everything — sweeps after the
        # first cost O(dirty).
        pef_tab = pe_flat[:N]
        WE = pef_tab.shape[1]
        # List-driven dirty sweeps: the dirty sets derive ENTIRELY from
        # the (few) newly frozen points — dirty edges are their incident
        # edges, dirty points are them + their edge-neighbours — so the
        # sweep compacts the newly-frozen POINT list (one nonzero over
        # N) and builds both lists by small gathers, instead of
        # materializing (E,)/(N,) dirty masks and compacting them
        # (nonzero over E + WE dense (N,) gathers per sweep — measured
        # ~64 ms/iter of stress-mode compactions).  Duplicates in the
        # lists are harmless (evaluations are deterministic in
        # frozen_cur, which is constant through the eval phase, and
        # freeze writes are idempotent); extra incident edges outside
        # active_e only ever refresh buffer rows no active point reads.
        # Falls back to the mask-based sweep when more than K_NEW points
        # froze in one sweep (typically only the first).
        import os as _os

        # 8192 default (r5 measured: 64^3 stress 188.8 -> 162.8 ms/iter
        # vs the old 32768 — the sweeps' fixed compaction machinery is
        # K_NEW-sized).  Sweeps that freeze more than K_NEW points fall
        # back to the exact mask-based sweep, so this is purely a
        # fast-path width.
        K_NEW = min(int(_os.environ.get("SMOOTHMESH_FA_DIRTY_CAP",
                                        "8192")), N)

        def sweep_fast(state):
            frozen_cur, newly, bufs = state
            L = newly.shape[0]
            newly_n = (newly & (jnp.arange(L) < N)) if L > N else newly
            n_new = jnp.sum(newly_n)
            new_idx = jnp.nonzero(newly_n, size=K_NEW, fill_value=0)[0]
            nrow = jnp.arange(K_NEW) < n_new
            # dirty edges = edges incident to newly frozen points,
            # compacted to a contiguous prefix so the chunked
            # while-loop runs ceil(n_de / Ke) steps
            pfv = pef_tab[new_idx]                       # (K_NEW, WE)
            dev = ((pfv >= 0) & nrow[:, None]).reshape(-1)
            ev = jnp.maximum(pfv, 0)
            de_flat = jnp.where(ev >= E, ev - E, ev).reshape(-1)
            pos = jnp.nonzero(dev, size=K_NEW * WE, fill_value=0)[0]
            de_list = de_flat[pos]
            n_de = jnp.sum(dev)
            bufs = chunked(
                lambda ei, rv, b: eval_edges_chunk(frozen_cur, ei, rv, b,
                                                   tuple(range(WP)), PT),
                bufs, de_list, n_de, min(Ke, K_NEW * WE))
            # dirty points = newly frozen points + their edge
            # neighbours, filtered to the active set
            bs2 = pps_signed[new_idx]                    # (K_NEW, WP)
            dp_flat = jnp.concatenate(
                [new_idx[:, None], jnp.maximum(bs2, 0)],
                axis=1).reshape(-1)
            dpv = jnp.concatenate(
                [nrow[:, None], (bs2 >= 0) & nrow[:, None]],
                axis=1).reshape(-1)
            dpv = dpv & active[dp_flat]
            posp = jnp.nonzero(dpv, size=K_NEW * (WP + 1),
                               fill_value=0)[0]
            dp_list = dp_flat[posp]
            n_dp = jnp.sum(dpv)
            frozen_new, _, bufs = chunked(
                pair_agg_chunk, (frozen_cur, jnp.asarray(False), bufs),
                dp_list, n_dp, min(Kp, K_NEW * (WP + 1)))
            return (frozen_new, frozen_new & ~frozen_cur, bufs)

        def sweep_slow(state):
            frozen_cur, newly, bufs = state
            dirty_e = (newly[edges_arr[:, 0]] | newly[edges_arr[:, 1]]) \
                & active_e
            de_idx = jnp.nonzero(dirty_e, size=E, fill_value=0)[0]
            n_de = jnp.sum(dirty_e)
            bufs = chunked(
                lambda ei, rv, b: eval_edges_chunk(frozen_cur, ei, rv, b,
                                                   tuple(range(WP)), PT),
                bufs, de_idx, n_de, Ke)
            # dirty points = points with a dirty incident edge: GATHER
            # over point_edges (scatter-max over the 2E edge endpoints
            # is ~20x slower per row on TPU).  One COLUMN of the
            # (N, WE) table at a time: the 2D gather's (N, WE) bool
            # intermediate tiles to (8,128) with 21x padding — 4.9 GB
            # of HLO temp at 10M points (the 216^3 OOM); WE dense (N,)
            # gathers produce the same OR at ~40 MB per temp.
            dirty_p = jnp.zeros((N,), dtype=bool)
            for _k in range(WE):
                pc = pef_tab[:, _k]
                ec = jnp.maximum(pc, 0)
                ec = jnp.where(ec >= E, ec - E, ec)
                dirty_p = dirty_p | jnp.where(pc >= 0, dirty_e[ec], False)
            dirty_p = dirty_p & active[:N]
            dp_idx = jnp.nonzero(dirty_p, size=N, fill_value=0)[0]
            n_dp = jnp.sum(dirty_p)
            frozen_new, _, bufs = chunked(
                pair_agg_chunk, (frozen_cur, jnp.asarray(False), bufs),
                dp_idx, n_dp, Kp)
            return (frozen_new, frozen_new & ~frozen_cur, bufs)

        def sweep_body(state):
            _, newly, _ = state
            L = newly.shape[0]
            newly_n = (newly & (jnp.arange(L) < N)) if L > N else newly
            return jax.lax.cond(jnp.sum(newly_n) <= K_NEW,
                                sweep_fast, sweep_slow, state)

        def sweep_cond(state):
            _, newly, _ = state
            return jnp.any(newly)

        if _COMBINED:
            # One pass computes pair bits 0..WP-1 and the self bit WP
            # for every active edge under the INCOMING mask.
            bufs = chunked(
                lambda ei, rv, b: eval_edges_chunk(frozen, ei, rv, b,
                                                   tuple(range(WP + 1)),
                                                   PT),
                _new_bufs(WP + 1), ae_idx, n_active_e, Ke_first)
            frozen_s, _ = chunked(
                self_agg_chunk, (frozen, bufs), act_idx, n_active, Kp)
            newly_self = frozen_s & ~frozen
            if newly_self.shape[0] > N:
                newly_self = newly_self & (
                    jnp.arange(newly_self.shape[0]) < N)

            # Pair bits are stale exactly on edges with a newly
            # self-frozen endpoint; refresh those rows under frozen_s
            # (no agg).  Self bits of refreshed rows are overwritten
            # with zeros (t_slots excludes WP) — they are never read
            # again.  List-driven like sweep_fast, with the mask-based
            # fallback when more than K_NEW points self-froze.
            def reeval_fast(bufs):
                n_new = jnp.sum(newly_self)
                new_idx = jnp.nonzero(newly_self, size=K_NEW,
                                      fill_value=0)[0]
                nrow = jnp.arange(K_NEW) < n_new
                pfv = pef_tab[new_idx]                   # (K_NEW, WE)
                dev = ((pfv >= 0) & nrow[:, None]).reshape(-1)
                ev = jnp.maximum(pfv, 0)
                de_flat = jnp.where(ev >= E, ev - E, ev).reshape(-1)
                pos = jnp.nonzero(dev, size=K_NEW * WE, fill_value=0)[0]
                de_list = de_flat[pos]
                n_de = jnp.sum(dev)
                return chunked(
                    lambda ei, rv, b: eval_edges_chunk(
                        frozen_s, ei, rv, b, tuple(range(WP)), PT),
                    bufs, de_list, n_de, min(Ke, K_NEW * WE))

            def reeval_slow(bufs):
                dirty_e = (newly_self[edges_arr[:, 0]]
                           | newly_self[edges_arr[:, 1]]) & active_e
                de_idx = jnp.nonzero(dirty_e, size=E, fill_value=0)[0]
                n_de = jnp.sum(dirty_e)
                return chunked(
                    lambda ei, rv, b: eval_edges_chunk(
                        frozen_s, ei, rv, b, tuple(range(WP)), PT),
                    bufs, de_idx, n_de, Ke)

            def reeval(bufs):
                return jax.lax.cond(jnp.sum(newly_self) <= K_NEW,
                                    reeval_fast, reeval_slow, bufs)

            bufs = jax.lax.cond(jnp.any(newly_self), reeval,
                                lambda b: b, bufs)
            frozen = frozen_s
        else:
            frozen = self_phase(frozen)
            if _PHASE_CAP == "self":
                return frozen
            # first full pair pass over all active edges
            bufs = chunked(
                lambda ei, rv, b: eval_edges_chunk(frozen, ei, rv, b,
                                                   tuple(range(WP)), PT),
                _new_bufs(WP), ae_idx, n_active_e, Ke_first)
            if _PHASE_CAP == "pair0":
                return frozen | (bufs[0].max() < 0)
        frozen_new, _, bufs = chunked(
            pair_agg_chunk, (frozen, jnp.asarray(False), bufs),
            act_idx, n_active, Kp)
        if _PHASE_CAP == "pair1":
            return frozen_new
        state0 = (frozen_new, frozen_new & ~frozen, bufs)
        if _PHASE_CAP == "sweep1":
            state1 = jax.lax.cond(sweep_cond(state0), sweep_body,
                                  lambda st: st, state0)
            return state1[0]
        frozen, _, _ = jax.lax.while_loop(
            sweep_cond, sweep_body, state0)
        return frozen

    return jax.lax.cond(any_active, run_all, lambda f: f, frozen)
