"""Shared-point halo combines over the device mesh.

The TPU-native replacement for OpenFOAM's
``syncTools::syncPointList(mesh, field, combineOp, nullValue)`` (see
SURVEY.md §5 for the complete call-site inventory).  Each mesh shard
owns a block of points; points shared between shards occupy fixed
"shared slots".  A combine is: gather each shard's contribution for
every slot, reduce across the device axis with the requested op, and
scatter the combined value back into each shard's local field.

Runs inside ``shard_map`` over a 1-D device mesh axis; sums/maxes ride
XLA collectives (psum/pmax) over ICI.  Order-sensitive combines
(minMagSqr with the reference's deterministic tie-break, reference
``isCloserPoint`` src/smoothMesh.C:246-272) use an all_gather and a
fixed shard-order fold so every shard computes bit-identical results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _vsmall(dtype) -> float:
    """OpenFOAM VSMALL (smoothMeshCommon.H): ~smallest positive normal
    of the coordinate type.  1e-300 for doubles; the float32 engine path
    uses the f32 analog so the comparison doesn't flush to 0."""
    return 1e-37 if jnp.dtype(dtype) == jnp.float32 else 1e-300


def is_smaller_by_vector_elements(v1, v2):
    """Element-wise lexicographic vector compare (reference
    ``isSmallerByVectorElements``, src/smoothMesh.C:222-239): true when
    the first differing component of ``v1`` is smaller.  Inputs
    (..., 3); returns (...) bool."""
    x1, y1, z1 = v1[..., 0], v1[..., 1], v1[..., 2]
    x2, y2, z2 = v2[..., 0], v2[..., 1], v2[..., 2]
    return (x1 < x2) | ((x1 == x2) & ((y1 < y2)
                                      | ((y1 == y2) & (z1 < z2))))


def is_closer_point(p1, p2):
    """Reference ``isCloserPoint`` (src/smoothMesh.C:246-272), literal:
    p1 is closer than p2 when they differ and mag(p1)-mag(p2) < VSMALL,
    or the magnitudes tie within VSMALL and p1 is element-wise smaller.
    (With VSMALL ~= the smallest normal, the first branch already
    accepts exact ties; the element-wise branch matters only in the
    denormal window — kept for literal parity.)"""
    eq = jnp.all(p1 == p2, axis=-1)
    d = jnp.linalg.norm(p1, axis=-1) - jnp.linalg.norm(p2, axis=-1)
    vs = _vsmall(p1.dtype)
    return ~eq & ((d < vs) | ((jnp.abs(d) < vs)
                              & is_smaller_by_vector_elements(p1, p2)))


def _big(dtype) -> float:
    return 1e18 if jnp.dtype(dtype) == jnp.float32 else 1e150


class PointSync:
    """Halo combiner for one shard's point fields.

    Parameters
    ----------
    slot_local: (S,) local point index per shared slot; out-of-range
        (== n_points_padded) when this shard does not hold the point.
    valid: (S,) bool — this shard holds the slot's point.
    axis: shard_map mesh axis name.
    """

    def __init__(self, slot_local, valid, owner_is_me=None,
                 axis: str = "shard"):
        self.slot = slot_local
        self.valid = valid
        self.owner_is_me = owner_is_me
        self.axis = axis

    # -- helpers ------------------------------------------------------------
    def _gather(self, field, null):
        safe = jnp.minimum(self.slot, field.shape[0] - 1)
        v = field[safe]
        mask = self.valid
        if v.ndim > mask.ndim:
            mask = mask[:, None]
        return jnp.where(mask, v, null)

    def _scatter(self, field, combined):
        # slot == len(field)+pad for absent points -> dropped
        return field.at[self.slot].set(combined, mode="drop")

    # -- combines (op, null) matching syncTools call sites ------------------
    def sum(self, field):
        """plusEqOp (vector or scalar/label sums)."""
        v = self._gather(field, jnp.zeros((), field.dtype))
        tot = jax.lax.psum(v, self.axis)
        return self._scatter(field, tot)

    def or_(self, field):
        """orEqOp<bool>, null false."""
        v = self._gather(field, False)
        tot = jax.lax.pmax(v.astype(jnp.int32), self.axis) > 0
        return self._scatter(field, tot)

    def max(self, field, null):
        """maxEqOp (e.g. hop counts with null UNDEF_LABEL=-1)."""
        v = self._gather(field, jnp.asarray(null, field.dtype))
        tot = jax.lax.pmax(v, self.axis)
        return self._scatter(field, tot)

    def _gather_all(self, field, null):
        v = self._gather(field, null)
        return jax.lax.all_gather(v, self.axis)      # (D, S, ...)

    def min_mag_sqr(self, field):
        """minMagSqrEqOp<vector>: smaller-magnitude-squared wins, with
        exact ties broken by the element-wise coordinate compare of
        ``isSmallerByVectorElements`` (reference src/smoothMesh.C:
        222-239).  The reference's combine op is strict (tie result
        depends on MPI exchange order); adding the coordinate tie-break
        makes the combine a total order, so every shard — and the
        serial run — agrees bit-for-bit even on symmetric meshes where
        exact-magnitude ties are common."""
        big = _big(field.dtype)
        null = jnp.asarray(big, field.dtype)
        allv = self._gather_all(field, null)          # (D, S, 3)

        def fold(i, acc):
            cand = allv[i]
            m2c = jnp.sum(cand * cand, -1)
            m2a = jnp.sum(acc * acc, -1)
            take = (m2c < m2a) | (
                (m2c == m2a) & is_smaller_by_vector_elements(cand, acc))
            return jnp.where(take[:, None], cand, acc)

        combined = jax.lax.fori_loop(1, allv.shape[0], fold, allv[0])
        return self._scatter(field, combined)

    def max_mag_sqr(self, field):
        """maxMagSqrEqOp<vector> (propagated layer normals)."""
        null = jnp.zeros((), field.dtype)
        allv = self._gather_all(field, null)

        def fold(i, acc):
            cand = allv[i]
            take = (jnp.sum(cand * cand, -1) > jnp.sum(acc * acc, -1))
            return jnp.where(take[:, None], cand, acc)

        combined = jax.lax.fori_loop(1, allv.shape[0], fold, allv[0])
        return self._scatter(field, combined)

    # -- reference aspect-ratio cascade ------------------------------------
    def closest_points(self, c1, c2, c3, has_common):
        """The three-position global merge of findClosestPoints
        (reference src/smoothMesh.C:389-479): per position, combine
        min-magnitude over shards; where the combined candidate is
        closer than the local one (``isCloserPoint``), shift the local
        chain down and clear the shared-cell flag."""
        closer = is_closer_point

        # Position 1
        g1 = self.min_mag_sqr(c1)
        take = closer(g1, c1)
        c3 = jnp.where(take[:, None], c2, c3)
        c2 = jnp.where(take[:, None], c1, c2)
        c1 = jnp.where(take[:, None], g1, c1)
        has_common = jnp.where(take, False, has_common)
        # Position 2
        g2 = self.min_mag_sqr(c2)
        take = closer(g2, c2)
        c3 = jnp.where(take[:, None], c2, c3)
        c2 = jnp.where(take[:, None], g2, c2)
        has_common = jnp.where(take, False, has_common)
        # Position 3
        g3 = self.min_mag_sqr(c3)
        take = closer(g3, c3)
        c3 = jnp.where(take[:, None], g3, c3)
        # Shared-cell flag is OR-combined (reference :472-478)
        has_common = self.or_(has_common)
        return c1, c2, c3, has_common

    def consensus(self, field):
        """Broadcast the owning shard's value of every shared point to
        all holders.

        Not a reference sync site: the reference tolerates tiny
        per-rank divergence of shared-point proposals (its closest-point
        cascade is not a true global merge).  We instead pin each shared
        point to its owner's proposal so the sharded mesh stays
        bit-consistent — identical to the reference whenever the
        reference is itself consistent.
        """
        if self.owner_is_me is None:
            raise ValueError("PointSync built without owner flags")
        v = self._gather(field, jnp.zeros((), field.dtype))
        mask = self.owner_is_me
        if v.ndim > mask.ndim:
            mask = mask[:, None]
        tot = jax.lax.psum(jnp.where(mask, v, 0), self.axis)
        return self._scatter(field, tot)

    # -- global scalar reductions (returnReduce) ----------------------------
    def all_max(self, x):
        return jax.lax.pmax(x, self.axis)

    def all_min(self, x):
        return jax.lax.pmin(x, self.axis)

    def all_sum(self, x):
        return jax.lax.psum(x, self.axis)


class HaloDenseSync(PointSync):
    """PointSync with OVERLAP (halo) decomposition semantics, for the
    dense ``iteration_body`` under the halo-sharded driver
    (parallel/halo.py).

    Every owned point's smoothing stencil is locally complete (the halo
    invariant), so the partial-sum / min-candidate combines of the
    disjoint decomposition all reduce to OWNER CONSENSUS: the owner's
    local result is already the exact global value, and replicated
    copies simply adopt it.  Freeze ORs inherit the plain
    ``PointSync.or_`` (reference orEqOp, src/smoothMesh.C:2374-2380):
    the caller masks stage-S decisions to owned points (replica
    stencils are incomplete there), while face-angle NEIGHBOR freezes
    (a shard may freeze a replica it doesn't own, reference stack
    semantics :1389-1419) must survive the combine unmasked.
    """

    def __init__(self, slot_local, valid, owner_is_me, owned,
                 axis: str = "shard"):
        super().__init__(slot_local, valid, owner_is_me, axis=axis)
        self.owned = owned

    def sum(self, field):
        return self.consensus(field)

    def max(self, field, null):
        return self.consensus(field)

    def min_mag_sqr(self, field):
        return self.consensus(field)

    def max_mag_sqr(self, field):
        return self.consensus(field)

    def closest_points(self, c1, c2, c3, has_common):
        """The owner's local closest-point chain is already the global
        result (complete pointPoints); replicas adopt it wholesale —
        no shift-down merge needed."""
        return (self.consensus(c1), self.consensus(c2),
                self.consensus(c3), self.consensus(has_common))

    def consensus(self, field):
        v = self._gather(field, jnp.zeros((), field.dtype))
        mask = self.owner_is_me
        if v.ndim > mask.ndim:
            mask = mask[:, None]
        zero = jnp.zeros((), field.dtype)
        tot = jax.lax.psum(
            jnp.where(mask, v, zero).astype(
                jnp.float32 if field.dtype == jnp.bool_ else field.dtype),
            self.axis)
        return self._scatter(field, tot.astype(field.dtype))
