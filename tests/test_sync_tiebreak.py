"""Exact-tie semantics of the shared-point min-magnitude combine.

The reference breaks closest-point ties with an element-wise coordinate
compare (``isCloserPoint`` / ``isSmallerByVectorElements``,
src/smoothMesh.C:222-272).  Our ``PointSync.min_mag_sqr`` extends the
strict ``minMagSqrEqOp`` with the same coordinate compare as a total
order, so every shard — and the serial order — agrees bit-for-bit even
on symmetric meshes where exact magnitude ties are common.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from smoothmesh_tpu.parallel.sync import (
    PointSync,
    is_closer_point,
    is_smaller_by_vector_elements,
)


def test_is_smaller_by_vector_elements():
    a = jnp.asarray([[0.0, 9.0, 9.0],   # x smaller -> True
                     [1.0, 0.0, 9.0],   # x equal, y smaller -> True
                     [1.0, 2.0, 0.0],   # x,y equal, z smaller -> True
                     [1.0, 2.0, 3.0],   # identical -> False
                     [2.0, 0.0, 0.0]])  # x larger -> False
    b = jnp.asarray([[1.0, 0.0, 0.0],
                     [1.0, 2.0, 0.0],
                     [1.0, 2.0, 3.0],
                     [1.0, 2.0, 3.0],
                     [1.0, 9.0, 9.0]])
    out = np.asarray(is_smaller_by_vector_elements(a, b))
    assert out.tolist() == [True, True, True, False, False]


def test_is_closer_point():
    a = jnp.asarray([[1.0, 0.0, 0.0],   # strictly closer -> True
                     [0.0, 1.0, 0.0],   # exact tie, differs -> True
                     [1.0, 0.0, 0.0],   # identical -> False
                     [2.0, 0.0, 0.0]])  # farther -> False
    b = jnp.asarray([[2.0, 0.0, 0.0],
                     [1.0, 0.0, 0.0],
                     [1.0, 0.0, 0.0],
                     [1.0, 0.0, 0.0]])
    out = np.asarray(is_closer_point(a, b))
    assert out.tolist() == [True, True, False, False]


def _oracle_min_mag_sqr(cands, valid):
    """Total-order fold the combine must implement: strict mag^2 min,
    exact ties broken by element-wise coordinate comparison."""
    best = None
    for d in range(cands.shape[0]):
        if not valid[d]:
            continue
        c = cands[d]
        if best is None:
            best = c
            continue
        m2c, m2b = np.dot(c, c), np.dot(best, best)
        if m2c < m2b or (m2c == m2b and tuple(c) < tuple(best)):
            best = c
    return best


def _run_min_mag_sqr(field, slot, valid):
    D = field.shape[0]
    mesh = Mesh(np.array(jax.devices()[:D]), ("shard",))

    def body(f, s, v):
        sync = PointSync(s[0], v[0])
        return sync.min_mag_sqr(f[0])[None]

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P("shard"),) * 3,
        out_specs=P("shard")))
    return np.asarray(fn(jnp.asarray(field), jnp.asarray(slot),
                         jnp.asarray(valid)))


def test_min_mag_sqr_exact_tie_agreement():
    rng = np.random.default_rng(7)
    D, S, N = 4, 6, 8
    # Candidate table: per (shard, slot) a vector; engineered exact
    # magnitude ties with different coordinates on several slots.
    cands = rng.normal(size=(D, S, 3))
    # slot 0: permutations of the same components (identical mag^2)
    base = np.array([3.0, -4.0, 12.0])
    for d in range(D):
        cands[d, 0] = np.roll(base, d) * (-1) ** d
    # slot 1: exact same vector everywhere
    cands[:, 1] = np.array([1.0, 2.0, 2.0])
    # slot 2: sign flips (same magnitude, coordinate compare decides)
    cands[:, 2] = np.array([5.0, 0.0, 0.0]) * \
        np.array([1, -1, 1, -1])[:, None]
    valid = np.ones((D, S), dtype=bool)
    valid[2, 3] = False           # one shard missing a slot
    valid[:, 4] = [True, False, False, False]   # single-holder slot

    field = np.zeros((D, N, 3))
    slot = np.tile(np.arange(S), (D, 1))
    for d in range(D):
        for s in range(S):
            if valid[d, s]:
                field[d, s] = cands[d, s]
            else:
                slot[d, s] = N      # OOB sentinel (absent)

    out = _run_min_mag_sqr(field, slot, valid)
    for s in range(S):
        expect = _oracle_min_mag_sqr(cands[:, s], valid[:, s])
        for d in range(D):
            if valid[d, s]:
                # every holder agrees bit-for-bit with the oracle
                assert np.array_equal(out[d, s], expect), (s, d)


def test_min_mag_sqr_order_independent_on_ties():
    # Reversing the shard order of the candidates must not change the
    # combined value (the strict fold WOULD keep shard 0's candidate).
    D, S, N = 2, 1, 2
    a = np.array([0.0, 0.0, 5.0])
    b = np.array([0.0, 5.0, 0.0])   # same magnitude; a < b element-wise
    valid = np.ones((D, S), dtype=bool)
    slot = np.zeros((D, S), dtype=np.int64)

    for order in ([a, b], [b, a]):
        field = np.zeros((D, N, 3))
        field[0, 0], field[1, 0] = order
        out = _run_min_mag_sqr(field, slot, valid)
        assert np.array_equal(out[0, 0], a)
        assert np.array_equal(out[1, 0], a)
