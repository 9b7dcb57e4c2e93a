"""Trimmed device topology (driver.PLANAR_TD_KEYS).

The default tile-engine path stages only the td keys that
iteration_body_planar actually reads (half the device-topology bytes at
scale).  These tests pin the key set by re-deriving it with a recording
dict, and check the upgrade path for consumers of the full dict.
"""
import numpy as np
import pytest

from smoothmesh_tpu.device import to_device
from smoothmesh_tpu.driver import PLANAR_TD_KEYS, Smoother, \
    iteration_body_planar
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
from smoothmesh_tpu.params import SmoothingParams


def _small_engine_smoother():
    mesh = perturb(hex_block(n=(8, 8, 8), grading=(2.0, 1.0, 0.5)),
                   amplitude=0.004, seed=3)
    return Smoother(mesh, SmoothingParams(centroidal_iters=4, rel_tol=0.0),
                    dtype=np.float32, use_tile_engine=True)


class _Recording(dict):
    def __init__(self, base):
        super().__init__(base)
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return dict.__getitem__(self, k)


def test_planar_td_keys_exact():
    """PLANAR_TD_KEYS == the keys the planar body reads — no drift."""
    sm = _small_engine_smoother()
    td = _Recording(to_device(sm.topo))
    pts4 = sm.engine.pts4(sm.points)
    iteration_body_planar(pts4, td, sm.params, sm._scale,
                          sm.face_angle_chunk, sm.engine,
                          sm.engine.arrays)
    assert td.used == PLANAR_TD_KEYS


def test_trimmed_td_runs_and_upgrades():
    sm = _small_engine_smoother()
    if sm.engine is None:
        pytest.skip("tile engine unavailable")
    assert sm._td_trimmed
    assert set(sm.td) == PLANAR_TD_KEYS
    sm.iter_batch = 2
    rs = sm.steps(2)
    assert len(rs) == 2 and np.isfinite(rs[-1].residual)
    # quality() needs the full dict -> transparent upgrade
    rep = sm.quality()
    assert not sm._td_trimmed
    assert set(sm.td) > PLANAR_TD_KEYS
    assert rep["min_volume"] > 0
    # and the batch still runs after the upgrade (td is a jit argument)
    rs2 = sm.steps(2)
    assert len(rs2) == 2


def test_trimmed_matches_full():
    """Trimmed-td steps produce bit-identical points to full-td steps."""
    sm1 = _small_engine_smoother()
    sm2 = _small_engine_smoother()
    sm2._ensure_full_td()
    sm1.iter_batch = sm2.iter_batch = 2
    sm1.steps(2)
    sm2.steps(2)
    np.testing.assert_array_equal(np.asarray(sm1.points),
                                  np.asarray(sm2.points))
