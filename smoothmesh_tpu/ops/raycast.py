"""Pallas TPU ray-cast kernel for boundary-point surface snapping.

Replaces the XLA formulation of ``boundary.segment_triangle_hits``
(which materializes (points x triangles) intermediates in HBM) with a
Pallas kernel: the whole target triangle soup stays resident in VMEM
(reference surfaces are small — hundreds to a few thousand triangles,
SURVEY.md hard part #3) while point blocks stream through, so HBM
traffic is O(points + triangles) instead of O(points x triangles).

Semantics identical to the jnp path (Möller–Trumbore, nearest |t| per
sign within max_dist); falls back to the jnp path off-TPU or when the
soup is too large for VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_POINTS = 256
TRI_TILE = 256
_EPS = 1e-12


def _kernel(o_ref, d_ref, tri_ref, lim_ref, tpos_ref, tneg_ref, *, n_tri):
    # o/d: (BP, 3); tri: (Tpad, 9) [a | e1 | e2]; lim: (1, 1)
    # Triangles are processed in TRI_TILE slices so VMEM intermediates
    # stay (BP, TRI_TILE)-sized.
    import jax.lax as lax
    from jax.experimental import pallas as pl

    max_dist = lim_ref[0, 0]
    inf = jnp.float32(jnp.inf)

    ox = o_ref[:, 0:1]
    oy = o_ref[:, 1:2]
    oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz = d_ref[:, 2:3]

    n_tiles = tri_ref.shape[1] // TRI_TILE

    def body(k, carry):
        tpos, tneg = carry
        # tri_ref is (9, Tpad): component rows, triangles along lanes
        sl = pl.ds(k * TRI_TILE, TRI_TILE)
        ax = tri_ref[0:1, sl]
        ay = tri_ref[1:2, sl]
        az = tri_ref[2:3, sl]
        e1x = tri_ref[3:4, sl]
        e1y = tri_ref[4:5, sl]
        e1z = tri_ref[5:6, sl]
        e2x = tri_ref[6:7, sl]
        e2y = tri_ref[7:8, sl]
        e2z = tri_ref[8:9, sl]

        # p = d x e2
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = 1.0 / jnp.where(jnp.abs(det) > _EPS, det, 1.0)
        sx = ox - ax
        sy = oy - ay
        sz = oz - az
        u = (sx * px + sy * py + sz * pz) * inv
        # q = s x e1
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv

        tri_ids = (k * TRI_TILE
                   + jax.lax.broadcasted_iota(jnp.int32, t.shape, 1))
        # f32 barycentric crack tolerance (see
        # boundary.segment_triangle_hits): 1e-9 is sub-ulp at f32 and
        # drops rays hitting exactly on shared triangle edges
        ok = ((jnp.abs(det) > _EPS) & (u >= -1e-5) & (v >= -1e-5)
              & (u + v <= 1 + 1e-5) & (tri_ids < n_tri))
        t = jnp.where(ok, t, inf)
        tpos = jnp.minimum(
            tpos, jnp.min(jnp.where((t >= 0) & (t <= max_dist), t, inf),
                          axis=1, keepdims=True))
        tneg = jnp.minimum(
            tneg, jnp.min(jnp.where((t < 0) & (t >= -max_dist), -t, inf),
                          axis=1, keepdims=True))
        return tpos, tneg

    init = (jnp.full((o_ref.shape[0], 1), inf),
            jnp.full((o_ref.shape[0], 1), inf))
    tpos, tneg = lax.fori_loop(0, n_tiles, body, init)
    tpos_ref[:, :] = tpos
    tneg_ref[:, :] = tneg


@functools.partial(jax.jit, static_argnames=("n_tri", "interpret"))
def _cast(orig, direction, max_dist, tri_packed, n_tri, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = orig.shape[0]
    nb = -(-B // BLOCK_POINTS)
    grid = (nb,)
    lim = jnp.asarray(max_dist, jnp.float32).reshape(1, 1)

    tpos, tneg = pl.pallas_call(
        functools.partial(_kernel, n_tri=n_tri),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_POINTS, 3), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_POINTS, 3), lambda i: (i, 0)),
            pl.BlockSpec(tri_packed.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_POINTS, 1), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_POINTS, 1), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(orig, direction, tri_packed, lim)
    return tpos[:, 0], tneg[:, 0]


def pack_triangles(ta, tb, tc) -> np.ndarray:
    """(T, 9) [vertex a | edge1 | edge2], padded to a lane multiple."""
    ta = np.asarray(ta, np.float32)
    tb = np.asarray(tb, np.float32)
    tc = np.asarray(tc, np.float32)
    packed = np.concatenate([ta, tb - ta, tc - ta], axis=1)
    T = len(packed)
    pad = (-T) % TRI_TILE
    if pad:
        packed = np.pad(packed, ((0, pad), (0, 0)))
    return np.ascontiguousarray(packed.T)  # (9, Tpad): lanes = triangles


def segment_triangle_hits_pallas(orig, direction, max_dist, tri_packed,
                                 n_tri):
    """Pallas-accelerated twin of boundary.segment_triangle_hits.

    tri_packed: output of :func:`pack_triangles` (may live on device).
    Returns (t_pos, t_neg) with +inf where no hit, in float32.
    """
    interpret = jax.default_backend() != "tpu"
    B = orig.shape[0]
    padB = (-B) % BLOCK_POINTS
    o = jnp.asarray(orig, jnp.float32)
    d = jnp.asarray(direction, jnp.float32)
    if padB:
        o = jnp.pad(o, ((0, padB), (0, 0)))
        d = jnp.pad(d, ((0, padB), (0, 0)), constant_values=1.0)
    tp, tn = _cast(o, d, max_dist, tri_packed, int(n_tri), interpret)
    return tp[:B], tn[:B]
