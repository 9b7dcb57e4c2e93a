"""Fused per-iteration stages on the select engine (ops/tiled.py).

Each stage is one Pallas kernel over consumer blocks of the reordered
mesh; the math is identical to the XLA reference implementations in
:mod:`smoothmesh_tpu.geometry` / :mod:`smoothmesh_tpu.ops.smoothing`
(which remain the float64/CPU reference path).  Stages communicate via
PLANAR (C, N_pad) f32 arrays:

  F: faces  <- points            face centres/areas + vertex means
     (geometry.face_centres_areas, reference primitiveMesh geometry)
  C: cells  <- face geometry     cell centres + volumes
     (geometry.cell_centres_vols)
  P: points <- cell centres + point coords
     centroidal + aspect-ratio + step limiter -> proposal
     (ops/smoothing.py, reference src/smoothMesh.C:96-754)

Remaining ops (constraints, layers, boundary) still run on the XLA
path; stages are adopted incrementally (driver.use_tile_engine).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from smoothmesh_tpu.ops import tiled
from smoothmesh_tpu.ops.tiled import (
    KB,
    LANES,
    FieldSpec,
    select,
    split_terms,
    stage_call,
    to_planar,
    from_planar,
    ghosts_planar,
    win_stack_for,
)

ROOT_VSMALL = 1e-18
VSMALL = 1e-30
BIGF = 1e18


def _nb(n: int) -> int:
    return -(-n // KB)


def _planar_extra(arr: np.ndarray) -> np.ndarray:
    """Host (Nc, W) -> padded planar (W, nb*KB) float32 extra input."""
    a = np.asarray(arr, np.float32)
    Nc, W = a.shape
    pad = _nb(Nc) * KB - Nc
    if pad:
        a = np.pad(a, ((0, pad), (0, 0)))
    return np.ascontiguousarray(a.T)


def _planar_extra_i32(arr: np.ndarray) -> np.ndarray:
    a = np.asarray(arr, np.int32)
    Nc, W = a.shape
    pad = _nb(Nc) * KB - Nc
    if pad:
        a = np.pad(a, ((0, pad), (0, 0)))
    return np.ascontiguousarray(a.T)


def _extra_spec(w: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec((w, KB), lambda b, win: (0, b),
                        memory_space=pltpu.VMEM)


class TiledEngine:
    """Select-engine stages compiled for one topology.

    All pool/code metadata is static (host, numpy); the stage methods
    are pure jittable functions over planar device arrays.
    """

    def __init__(self, topo, interpret: bool = False):
        self.topo = topo
        self.interpret = interpret
        t = topo

        # ---- stage F: faces <- points --------------------------------
        self.f_pool, (self.f_codes,) = tiled.build_pool(
            t.n_faces, [(t.face_points, t.face_mask)], t.n_points)
        self.f_mask = jnp.asarray(_planar_extra(t.face_mask))
        self.f_field = FieldSpec("pts", self.f_pool, 3)
        self._stage_f = stage_call(
            self._f_body, _nb(t.n_faces), [self.f_field],
            [self.f_codes.width], [6, 3],
            extra_in_specs=[_extra_spec(t.face_mask.shape[1])],
            interpret=interpret)
        self._f_win = jnp.asarray(win_stack_for([self.f_field]))
        self._f_codes_dev = jnp.asarray(self.f_codes.codes)
        self._f_gids = jnp.asarray(self.f_pool.ghost_ids)

        # ---- stage C: cells <- face geometry -------------------------
        self.c_pool, (self.c_codes,) = tiled.build_pool(
            t.n_cells, [(t.cell_faces, t.cell_faces_mask)], t.n_faces)
        cell_ids = np.arange(t.n_cells, dtype=np.int64)[:, None]
        sign = np.where(t.owner[t.cell_faces] == cell_ids, 1.0, -1.0)
        sign = np.where(t.cell_faces_mask, sign, 0.0)
        self.c_sign = jnp.asarray(_planar_extra(sign))
        self.c_field = FieldSpec("fgeom", self.c_pool, 6)
        self._stage_c = stage_call(
            self._c_body, _nb(t.n_cells), [self.c_field],
            [self.c_codes.width], [4],
            extra_in_specs=[_extra_spec(sign.shape[1])],
            interpret=interpret)
        self._c_win = jnp.asarray(win_stack_for([self.c_field]))
        self._c_codes_dev = jnp.asarray(self.c_codes.codes)
        self._c_gids = jnp.asarray(self.c_pool.ghost_ids)

    # ---- kernel bodies ---------------------------------------------------

    def _f_body(self, ctx, mask_ref):
        """OpenFOAM face centres/areas + vertex means (geometry
        .face_centres_areas) for one block of faces."""
        W = self.f_codes.width
        pT = split_terms(ctx.poolT["pts"])
        cr = ctx.codes[0]
        px, py, pz, m = [], [], [], []
        for w in range(W):
            v = select(pT, cr[w, :][None, :], 3)
            mw = mask_ref[w, :][None, :]
            px.append(v[0])
            py.append(v[1])
            pz.append(v[2])
            m.append(mw)
        n = sum(m)
        inv_n = 1.0 / jnp.maximum(n, 1.0)
        vmx = sum(px[w] * m[w] for w in range(W)) * inv_n
        vmy = sum(py[w] * m[w] for w in range(W)) * inv_n
        vmz = sum(pz[w] * m[w] for w in range(W)) * inv_n

        sum_nx = sum_ny = sum_nz = 0.0
        sum_a = 0.0
        sum_acx = sum_acy = sum_acz = 0.0
        for w in range(W):
            is_last = m[w] * (1.0 - (m[(w + 1) % W] if w + 1 < W
                                     else jnp.zeros_like(m[0])))
            has_next = m[w] - is_last
            nxx = has_next * (px[(w + 1) % W] if w + 1 < W else 0.0) \
                + is_last * px[0]
            nxy = has_next * (py[(w + 1) % W] if w + 1 < W else 0.0) \
                + is_last * py[0]
            nxz = has_next * (pz[(w + 1) % W] if w + 1 < W else 0.0) \
                + is_last * pz[0]
            # c = p + nxt + vm ; n_vec = cross(nxt - p, vm - p)
            cx = px[w] + nxx + vmx
            cy = py[w] + nxy + vmy
            cz = pz[w] + nxz + vmz
            ax_ = nxx - px[w]
            ay_ = nxy - py[w]
            az_ = nxz - pz[w]
            bx_ = vmx - px[w]
            by_ = vmy - py[w]
            bz_ = vmz - pz[w]
            nvx = ay_ * bz_ - az_ * by_
            nvy = az_ * bx_ - ax_ * bz_
            nvz = ax_ * by_ - ay_ * bx_
            a = jnp.sqrt(nvx * nvx + nvy * nvy + nvz * nvz)
            sum_nx = sum_nx + nvx * m[w]
            sum_ny = sum_ny + nvy * m[w]
            sum_nz = sum_nz + nvz * m[w]
            sum_a = sum_a + a * m[w]
            sum_acx = sum_acx + a * cx * m[w]
            sum_acy = sum_acy + a * cy * m[w]
            sum_acz = sum_acz + a * cz * m[w]

        good = sum_a > ROOT_VSMALL
        inv3a = 1.0 / (3.0 * jnp.maximum(sum_a, VSMALL))
        fcx = jnp.where(good, sum_acx * inv3a, vmx)
        fcy = jnp.where(good, sum_acy * inv3a, vmy)
        fcz = jnp.where(good, sum_acz * inv3a, vmz)
        zero = jnp.zeros_like(sum_a)
        fax = jnp.where(good, 0.5 * sum_nx, zero)
        fay = jnp.where(good, 0.5 * sum_ny, zero)
        faz = jnp.where(good, 0.5 * sum_nz, zero)

        ctx.out[0][:] = jnp.concatenate(
            [fcx, fcy, fcz, fax, fay, faz], axis=0)
        ctx.out[1][:] = jnp.concatenate([vmx, vmy, vmz], axis=0)

    def _c_body(self, ctx, sign_ref):
        """OpenFOAM cell centres/volumes (geometry.cell_centres_vols)
        for one block of cells."""
        W = self.c_codes.width
        pT = split_terms(ctx.poolT["fgeom"])
        cr = ctx.codes[0]
        fc = []
        fa = []
        sg = []
        for w in range(W):
            v = select(pT, cr[w, :][None, :], 6)
            fc.append(v[0:3])
            fa.append(v[3:6])
            sg.append(sign_ref[w, :][None, :])
        m = [jnp.abs(s) for s in sg]           # sign is 0 on padded slots
        n = sum(m)
        inv_n = 1.0 / jnp.maximum(n, 1.0)
        ce = [sum(fc[w][c] * m[w] for w in range(W)) * inv_n
              for c in range(3)]

        vol3 = 0.0
        num = [0.0, 0.0, 0.0]
        for w in range(W):
            d = [fc[w][c] - ce[c] for c in range(3)]
            pyr3 = sg[w] * (fa[w][0] * d[0] + fa[w][1] * d[1]
                            + fa[w][2] * d[2])
            vol3 = vol3 + pyr3 * m[w]
            for c in range(3):
                pc = 0.75 * fc[w][c] + 0.25 * ce[c]
                num[c] = num[c] + (pyr3 * m[w]) * pc

        good = jnp.abs(vol3) > VSMALL
        inv = 1.0 / jnp.where(good, vol3, 1.0)
        ccx = jnp.where(good, num[0] * inv, ce[0])
        ccy = jnp.where(good, num[1] * inv, ce[1])
        ccz = jnp.where(good, num[2] * inv, ce[2])
        ctx.out[0][:] = jnp.concatenate([ccx, ccy, ccz, vol3 / 3.0],
                                        axis=0)

    # ---- public stage functions (jittable) -------------------------------

    def face_geometry(self, pts_planar: jnp.ndarray):
        """-> (geom6 (6, F_pad) [fc|fa], vm3 (3, F_pad))."""
        gh = ghosts_planar(pts_planar, self._f_gids)
        return self._stage_f(self._f_win, [self._f_codes_dev],
                             {"pts": (pts_planar, gh)}, self.f_mask)

    def cell_centres_vols(self, geom6: jnp.ndarray):
        """-> cc4 (4, C_pad) [cc|3*vol... vol]."""
        gh = ghosts_planar(geom6, self._c_gids)
        return self._stage_c(self._c_win, [self._c_codes_dev],
                             {"fgeom": (geom6, gh)}, self.c_sign)

    def cell_centres_dense(self, points: jnp.ndarray) -> jnp.ndarray:
        """Convenience twin of geometry.cell_centres: (N,3) -> (C,3)."""
        pp = to_planar(points.astype(jnp.float32))
        geom6, _vm = self.face_geometry(pp)
        cc4 = self.cell_centres_vols(geom6)
        return from_planar(cc4[:3], self.topo.n_cells)
