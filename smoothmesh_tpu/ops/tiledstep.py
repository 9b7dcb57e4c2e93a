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
import os
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


def _planar_u16(arr: np.ndarray, width: int) -> np.ndarray:
    """Host (Nc, W) uint16 -> planar (W, width) int16 meta rows."""
    a = np.asarray(arr, np.uint16)
    Nc, W = a.shape
    if Nc < width:
        a = np.pad(a, ((0, width - Nc), (0, 0)))
    return np.ascontiguousarray(a.T).view(np.int16)


def u_to_angle(u: jnp.ndarray) -> jnp.ndarray:
    """Invert the kernel-side monotone map u(theta) (see _e_body)."""
    return jnp.where(
        u <= 2.0,
        jnp.arccos(jnp.clip(1.0 - u, -1.0, 1.0)),
        2.0 * np.pi - jnp.arccos(jnp.clip(u - 3.0, -1.0, 1.0)))


def _share_cell_bits(topo) -> np.ndarray:
    """share[p, w1] bitmask over w2: neighbours pp[p,w1] and pp[p,w2]
    share at least one cell (replaces ops/smoothing._share_cell's
    on-device set intersection with a static table)."""
    pp = topo.point_points
    ppm = topo.point_points_mask
    pc = topo.point_cells.astype(np.int64)
    pcm = topo.point_cells_mask
    N, W = pp.shape
    bits = np.zeros((N, W), np.int64)
    if W > 31:
        raise ValueError("point_points wider than 31 slots")
    step = max(1, (1 << 24) // max(W * W * pc.shape[1] ** 2, 1))
    for s in range(0, N, step):
        sl = slice(s, min(s + step, N))
        a = pc[pp[sl]]                               # (B, W, Wc)
        am = pcm[pp[sl]] & ppm[sl][..., None]
        eq = (a[:, :, None, :, None] == a[:, None, :, None, :])
        eq &= am[:, :, None, :, None] & am[:, None, :, None, :]
        share = eq.any(axis=(3, 4))                  # (B, W, W)
        bits[sl] = (share << np.arange(W)[None, None, :]).sum(-1)
    return bits.astype(np.int32)


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

    def __init__(self, topo, interpret: bool = False,
                 ghost_rows: Optional[dict] = None,
                 windows: Optional[dict] = None):
        self.topo = topo
        self.interpret = interpret
        # Forced per-pool ghost-row minima and window counts: shards of
        # one mesh must build shape-identical engine arrays to stack
        # under shard_map (parallel/halo.py builds engines twice:
        # probe, then forced to the per-pool max over shards).
        self._gr = ghost_rows or {}
        self._nw = dict(windows or {})
        # experiment hook: SMOOTHMESH_POOL_WINDOWS="c=4,r=4" forces
        # per-pool window counts (value "auto" = cost-model choice)
        env_nw = os.environ.get("SMOOTHMESH_POOL_WINDOWS", "")
        for kv in filter(None, env_nw.split(",")):
            k, _, v = kv.partition("=")
            self._nw.setdefault(k.strip(),
                                v if v == "auto" else int(v))
        gr = self._gr.get
        nw = self._nw.get
        # All device arrays live here and are passed through jit as
        # ARGUMENTS (closure constants embed as HLO literals and
        # overflow the remote compiler at 1M+ cells — CLAUDE.md).
        self.arrays = {}
        A = self.arrays
        t = topo

        # ---- stage F: faces <- points --------------------------------
        # Static per-consumer data rides ONE folded int16 meta array
        # per stage (tiled.py meta packing note): select codes carry
        # their valid mask in bit 15, so the old separate planar f32
        # mask arrays (tile-padded to 8 sublanes each) are gone.
        self.f_pool, (self.f_codes,) = tiled.build_pool(
            t.n_faces, [(t.face_points, t.face_mask)], t.n_points,
            min_ghost_rows=gr("f", 1), n_windows=nw("f"))
        self.f_field = FieldSpec("pts", self.f_pool, 3)
        f_fold = tiled.pick_fold(self.f_codes.width)
        self._stage_f = stage_call(
            self._f_body, _nb(t.n_faces), [self.f_field], [6, 3],
            meta_rows=self.f_codes.width, meta_fold=f_fold,
            interpret=interpret)
        A["f_meta"] = jnp.asarray(tiled.fold_meta(self.f_codes.codes,
                                                  f_fold))
        A["f_win"] = jnp.asarray(win_stack_for([self.f_field]))
        A["f_gids"] = jnp.asarray(self.f_pool.ghost_ids)

        # ---- stage C: cells <- face geometry -------------------------
        self.c_pool, (self.c_codes,) = tiled.build_pool(
            t.n_cells, [(t.cell_faces, t.cell_faces_mask)], t.n_faces,
            min_ghost_rows=gr("c", 1), n_windows=nw("c"))
        cell_ids = np.arange(t.n_cells, dtype=np.int64)[:, None]
        neg = (t.owner[t.cell_faces] != cell_ids) & t.cell_faces_mask
        # owner sign rides bit 14 of the c codes (mask is bit 15); the
        # code value itself must then fit 14 bits.  cell_faces pools
        # are the most local of all stages, so this holds in practice;
        # a violation falls back to the XLA path via ValueError (the
        # driver catches engine-construction ValueErrors).
        cmax = int(np.asarray(self.c_codes.codes, np.int32).max() & 0x7FFF) \
            if self.c_codes.codes.size else 0
        if cmax >= (1 << 14):
            raise ValueError(
                f"stage-C pool code {cmax} >= 2^14; cannot pack owner "
                "sign into the c meta")
        negp = np.zeros(self.c_codes.codes.shape, np.uint16)
        negp[:, :t.n_cells] = neg.T
        c_packed = self.c_codes.codes.view(np.uint16) | (negp << 14)
        self.c_field = FieldSpec("fgeom", self.c_pool, 6)
        c_fold = tiled.pick_fold(self.c_codes.width)
        self._stage_c = stage_call(
            self._c_body, _nb(t.n_cells), [self.c_field], [4],
            meta_rows=self.c_codes.width, meta_fold=c_fold,
            interpret=interpret)
        A["c_meta"] = jnp.asarray(tiled.fold_meta(
            c_packed.view(np.int16), c_fold))
        A["c_win"] = jnp.asarray(win_stack_for([self.c_field]))
        A["c_gids"] = jnp.asarray(self.c_pool.ghost_ids)

        # ---- stage P: points <- cell centres + neighbour points ------
        self.p_cc_pool, (self.p_cc_codes,) = tiled.build_pool(
            t.n_points, [(t.point_cells, t.point_cells_mask)], t.n_cells,
            min_ghost_rows=gr("p_cc", 1), n_windows=nw("p_cc"))
        self.p_pp_pool, (self.p_pp_codes,) = tiled.build_pool(
            t.n_points, [(t.point_points, t.point_points_mask)],
            t.n_points, min_ghost_rows=gr("p_pp", 1),
            n_windows=nw("p_pp"))
        Wcc = self.p_cc_codes.width
        Wpp = self.p_pp_codes.width
        if Wpp > 15:
            raise ValueError(
                f"point_points width {Wpp} > 15: share bitmask does not "
                "fit the int16 meta rows")
        # share-a-cell bitmasks fit 15 bits (Wpp <= 15); the
        # is-internal flag rides bit 15 of share row 0
        share = _share_cell_bits(t).astype(np.uint16)
        share[:, 0] |= t.is_internal_point.astype(np.uint16) << 15
        # p meta rows: [cc codes | pp codes | share]
        self._pm_pp = Wcc
        self._pm_share = Wcc + Wpp
        p_rows = Wcc + 2 * Wpp
        p_meta = np.concatenate([
            self.p_cc_codes.codes,
            self.p_pp_codes.codes,
            _planar_u16(share, self.p_cc_codes.codes.shape[1]),
        ], axis=0)
        self._p_fold = tiled.pick_fold(p_rows)
        self._p_rows = p_rows
        A["p_meta"] = jnp.asarray(tiled.fold_meta(p_meta, self._p_fold))
        # full planar-width flag rows (zero-padded) for the
        # planar-carry iteration glue: row 0 = is-internal, row 1 =
        # valid; padding lanes read as not-internal/not-valid
        pv = getattr(t, "point_valid_rows", None)
        if pv is None:
            pv = np.ones(t.n_points, bool)
        A["p_flags_w"] = to_planar(jnp.asarray(np.stack(
            [t.is_internal_point, pv], axis=1).astype(np.float32)))
        # 3-comp pool: _p_body never selects the volume row of cc4
        # (25% less MXU select work + ghost-gather width)
        self.p_cc_field = FieldSpec("cc", self.p_cc_pool, 3)
        self.p_pp_field = FieldSpec("pts4", self.p_pp_pool, 4)
        A["p_win"] = jnp.asarray(win_stack_for(
            [self.p_cc_field, self.p_pp_field]))
        A["p_cc_gids"] = jnp.asarray(self.p_cc_pool.ghost_ids)
        A["p_pp_gids"] = jnp.asarray(self.p_pp_pool.ghost_ids)
        self._p_stage_cache = {}

        # ---- stage S: freeze constraints over the same pp pool -------
        # 3-comp pools: _s_body only selects coordinates (pts4's flag
        # row and prop4's cur-min row are never read)
        self.s_cur_field = FieldSpec("cur4", self.p_pp_pool, 3)
        self.s_prop_field = FieldSpec("prop4", self.p_pp_pool, 3)
        A["s_win"] = jnp.asarray(win_stack_for(
            [self.s_cur_field, self.s_prop_field]))
        self._init_stage_s()
        self._init_stage_e()

    def _init_stage_s(self):
        t = self.topo
        # wedge prev/next as SLOTS into point_points (values are always
        # edge-neighbours of the point, so the lookup is total)
        pp = t.point_points.astype(np.int64)
        ppm = t.point_points_mask
        pfm = t.point_faces_mask

        def to_slots(tab):
            match = (tab.astype(np.int64)[:, :, None] == pp[:, None, :])
            match &= ppm[:, None, :] & pfm[:, :, None]
            ok = match.any(axis=2)
            if not np.array_equal(ok, pfm):
                raise AssertionError("wedge neighbour not in point_points")
            return match.argmax(axis=2)

        # s meta rows: [pp codes | packed wedges].  A wedge row packs
        # prev slot (bits 0-4), next slot (bits 5-9) and the
        # point_faces mask (bit 15) into one int16 — replacing two
        # planar int32 slot arrays + one planar f32 mask (~1.9 GB of
        # tile-padded HBM at 10M cells).
        wedge = (to_slots(t.wedge_prev).astype(np.uint16)
                 | (to_slots(t.wedge_next).astype(np.uint16) << 5)
                 | (pfm.astype(np.uint16) << 15))
        self._sm_wedge = self.p_pp_codes.width
        s_rows = self.p_pp_codes.width + pfm.shape[1]
        s_meta = np.concatenate([
            self.p_pp_codes.codes,
            _planar_u16(wedge, self.p_pp_codes.codes.shape[1]),
        ], axis=0)
        self._s_fold = tiled.pick_fold(s_rows)
        self._s_rows = s_rows
        self.arrays["s_meta"] = jnp.asarray(
            tiled.fold_meta(s_meta, self._s_fold))
        self._s_stage_cache = {}

    def _get_stage_s(self, min_edge, total_min_freeze, min_angle_rad,
                     edge_angle_on):
        key = (float(min_edge), bool(total_min_freeze),
               float(min_angle_rad), bool(edge_angle_on))
        if key not in self._s_stage_cache:
            t = self.topo
            body = functools.partial(
                self._s_body, min_edge=key[0], total_min_freeze=key[1],
                cos_min_angle=float(np.cos(key[2])),
                edge_angle_on=key[3])
            self._s_stage_cache[key] = stage_call(
                body, _nb(t.n_points),
                [self.s_cur_field, self.s_prop_field], [1],
                meta_rows=self._s_rows, meta_fold=self._s_fold,
                extra_in_specs=[
                    _extra_spec(4),
                    _extra_spec(4),
                    _extra_spec(1),
                ],
                interpret=self.interpret)
        return self._s_stage_cache[key]

    def _get_stage_p(self, max_step, rel_step_frac, do_boundary):
        key = (float(max_step), float(rel_step_frac), bool(do_boundary))
        if key not in self._p_stage_cache:
            t = self.topo
            body = functools.partial(
                self._p_body, max_step=key[0], rel_step_frac=key[1],
                do_boundary=key[2])
            self._p_stage_cache[key] = stage_call(
                body, _nb(t.n_points),
                [self.p_cc_field, self.p_pp_field], [4],
                meta_rows=self._p_rows, meta_fold=self._p_fold,
                extra_in_specs=[
                    _extra_spec(4),
                ],
                interpret=self.interpret)
        return self._p_stage_cache[key]

    # ---- kernel bodies ---------------------------------------------------

    def _f_body(self, ctx):
        """OpenFOAM face centres/areas + vertex means (geometry
        .face_centres_areas) for one block of faces."""
        W = self.f_codes.width
        pT = split_terms(ctx.poolT["pts"])
        px, py, pz, m = [], [], [], []
        for w in range(W):
            code, valid = tiled.unpack_code(ctx.meta[w, :][None, :])
            v = select(pT, code, 3)
            px.append(v[0])
            py.append(v[1])
            pz.append(v[2])
            m.append(valid.astype(jnp.float32))
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

    def _c_body(self, ctx):
        """OpenFOAM cell centres/volumes (geometry.cell_centres_vols)
        for one block of cells."""
        W = self.c_codes.width
        pT = split_terms(ctx.poolT["fgeom"])
        fc = []
        fa = []
        sg = []
        m = []
        for w in range(W):
            raw = ctx.meta[w, :][None, :].astype(jnp.int32)
            code = jnp.bitwise_and(raw, 0x3FFF)
            mask = (raw < 0).astype(jnp.float32)       # bit 15
            negb = jnp.bitwise_and(jnp.right_shift(raw, 14), 1)
            v = select(pT, code, 6)
            fc.append(v[0:3])
            fa.append(v[3:6])
            # sign is 0 on padded slots, else +/-1 by face ownership
            sg.append(mask * (1.0 - 2.0 * negb.astype(jnp.float32)))
            m.append(mask)
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

    def _p_body(self, ctx, own4_ref, *, max_step, rel_step_frac,
                do_boundary):
        """Fused centroidal + aspect-ratio + step limiter for one block
        of points (ops/smoothing.py: centroidal_smoothing,
        _closest_three, _share_cell, aspect_ratio_smoothing,
        constrain_max_step_length; reference src/smoothMesh.C:96-754).

        Meta rows: [cc codes | pp codes | share bits]; the is-internal
        flag is bit 15 of share row 0.
        Outputs (4, KB): [proposal xyz | min current edge length].
        """
        Wc = self.p_cc_codes.width
        Wp = self.p_pp_codes.width
        ccT = split_terms(ctx.poolT["cc"])
        ppT = split_terms(ctx.poolT["pts4"])
        meta = ctx.meta

        own = [own4_ref[c, :][None, :] for c in range(3)]
        internal = (meta[self._pm_share, :][None, :]
                    .astype(jnp.int32) < 0).astype(jnp.float32)
        big = BIGF
        inf = jnp.float32(np.inf)

        # -- centroidal ------------------------------------------------
        elig_own = jnp.maximum(internal, 1.0 if do_boundary else 0.0)
        sx = sy = sz = cnt = 0.0
        for w in range(Wc):
            code, valid = tiled.unpack_code(meta[w, :][None, :])
            v = select(ccT, code, 3)
            m = valid.astype(jnp.float32) * elig_own
            sx = sx + v[0] * m
            sy = sy + v[1] * m
            sz = sz + v[2] * m
            cnt = cnt + m
        has = cnt > 0
        inv = 1.0 / jnp.maximum(cnt, 1.0)
        cent = [jnp.where(has, sx * inv, own[0]),
                jnp.where(has, sy * inv, own[1]),
                jnp.where(has, sz * inv, own[2])]

        # -- closest three (with boundary filtering) -------------------
        rel = []        # per slot [dx, dy, dz]
        lens_m = []     # masked length (inf where padded)
        lens_e = []     # eligibility-filtered length
        for w in range(Wp):
            code, m = tiled.unpack_code(
                meta[self._pm_pp + w, :][None, :])
            v = select(ppT, code, 4)
            dx = v[0] - own[0]
            dy = v[1] - own[1]
            dz = v[2] - own[2]
            L = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            n_int = v[3] > 0.5
            elig = m & ((internal > 0.5) | ~n_int)
            rel.append([dx, dy, dz])
            lens_m.append(jnp.where(m, L, inf))
            lens_e.append(jnp.where(elig, L, inf))

        cur_min = lens_m[0]
        for w in range(1, Wp):
            cur_min = jnp.minimum(cur_min, lens_m[w])

        picks = []          # (vec3, slot, found)
        lcur = list(lens_e)
        for _ in range(3):
            best_l = lcur[0]
            best_w = jnp.zeros_like(best_l, jnp.int32)
            for w in range(1, Wp):
                better = lcur[w] < best_l
                best_l = jnp.where(better, lcur[w], best_l)
                best_w = jnp.where(better, w, best_w)
            found = best_l < inf
            vec = []
            for c in range(3):
                x = 0.0
                for w in range(Wp):
                    x = x + jnp.where(best_w == w, rel[w][c], 0.0)
                vec.append(jnp.where(found, x, big))
            picks.append((vec, jnp.where(found, best_w, -1), found))
            lcur = [jnp.where(best_w == w, inf, lcur[w])
                    for w in range(Wp)]

        (c1, w1, f1), (c2, w2, f2), (c3, _w3, _f3) = picks
        # share-a-cell test via the static bitmask (strip the intern
        # flag riding bit 15 of row 0)
        bits1 = 0
        for w in range(Wp):
            sh = jnp.bitwise_and(
                meta[self._pm_share + w, :][None, :].astype(jnp.int32),
                0x7FFF)
            bits1 = bits1 + jnp.where(w1 == w, sh, 0)
        has_common = (jnp.bitwise_and(
            jnp.right_shift(bits1, jnp.maximum(w2, 0)), 1) > 0)
        has_common &= f1 & f2

        def norm3(v):
            return jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])

        l1 = norm3(c1)
        l2 = norm3(c2)
        l3 = norm3(c3)
        ratio1 = l2 / jnp.maximum(l1, VSMALL)
        ratio2 = l3 / jnp.maximum(l2, VSMALL)
        frac_int = jnp.clip((ratio2 - 1.5) / 1.5, 0.0, 1.0)
        frac_int = jnp.where((ratio1 < 1.5) & (ratio2 > 1.5), frac_int,
                             0.0)
        frac_bnd = jnp.clip(ratio1 - 1.0, 0.0, 1.0)
        frac = jnp.where(internal > 0.5, frac_int, frac_bnd)
        zero1 = ((c1[0] == 0.0) & (c1[1] == 0.0) & (c1[2] == 0.0)) | \
            ((c2[0] == 0.0) & (c2[1] == 0.0) & (c2[2] == 0.0))
        frac = jnp.where(has_common | zero1, 0.0, frac)

        prop = []
        use_blend = frac > 0.0
        for c in range(3):
            mid = own[c] + 0.5 * (c1[c] + c2[c])
            blended = (1.0 - frac) * cent[c] + frac * mid
            prop.append(jnp.where(use_blend, blended, cent[c]))

        # -- step limiter ---------------------------------------------
        step = [prop[c] - own[c] for c in range(3)]
        slen = norm3(step)
        scale = jnp.where(
            slen > max_step,
            max_step / (jnp.maximum(slen, VSMALL) * rel_step_frac),
            1.0)
        out = [own[c] + (rel_step_frac * scale) * step[c]
               for c in range(3)]

        cur_min = jnp.where(cur_min < inf, cur_min, big)
        ctx.out[0][:] = jnp.concatenate(out + [cur_min], axis=0)

    def _init_stage_e(self):
        """Face-angle current pass: edges <- endpoints + vm + cc."""
        t = self.topo
        A = self.arrays
        self.e_pts_pool, (self.e_ep_codes,) = tiled.build_pool(
            t.n_edges, [(t.edges, None)], t.n_points,
            min_ghost_rows=self._gr.get("e_pts", 1),
            n_windows=self._nw.get("e_pts"))
        self.e_vm_pool, (self.e_ef_codes,) = tiled.build_pool(
            t.n_edges, [(t.edge_faces, t.edge_faces_mask)], t.n_faces,
            min_ghost_rows=self._gr.get("e_vm", 1),
            n_windows=self._nw.get("e_vm"))
        self.e_cc_pool, (self.e_ec_codes,) = tiled.build_pool(
            t.n_edges, [(t.edge_cells, t.edge_cells_mask)], t.n_cells,
            min_ghost_rows=self._gr.get("e_cc", 1),
            n_windows=self._nw.get("e_cc"))
        Wef = self.e_ef_codes.width
        Wec = self.e_ec_codes.width
        if Wef >= 128:
            raise ValueError(
                f"edge_faces width {Wef} >= 128: f0/f1 slot pair does "
                "not fit one int16 meta row")
        # e meta rows: [ep codes | ef codes | ec codes | f0|f1 packed]:
        # f0/f1 are slots into the ef pvecs (7 bits each); the
        # edge_cells mask is bit 15 of the ec code rows.
        self._em_ef = 2
        self._em_ec = 2 + Wef
        self._em_ff = 2 + Wef + Wec
        e_rows = 2 + Wef + 2 * Wec
        ff = (np.where(t.edge_cells_mask, t.edge_cell_f0, 0)
              .astype(np.uint16)
              | (np.where(t.edge_cells_mask, t.edge_cell_f1, 0)
                 .astype(np.uint16) << 7))
        e_meta = np.concatenate([
            self.e_ep_codes.codes,
            self.e_ef_codes.codes,
            self.e_ec_codes.codes,
            _planar_u16(ff, self.e_ep_codes.codes.shape[1]),
        ], axis=0)
        self._e_fold = tiled.pick_fold(e_rows)
        A["e_meta"] = jnp.asarray(tiled.fold_meta(e_meta, self._e_fold))
        # 3-comp pools: _e_body reads only coordinates of endpoints and
        # cell centres
        self.e_pts_field = FieldSpec("pts4", self.e_pts_pool, 3)
        self.e_vm_field = FieldSpec("vm", self.e_vm_pool, 3)
        self.e_cc_field = FieldSpec("cc", self.e_cc_pool, 3)
        self._stage_e = stage_call(
            self._e_body, _nb(t.n_edges),
            [self.e_pts_field, self.e_vm_field, self.e_cc_field], [2],
            meta_rows=e_rows, meta_fold=self._e_fold,
            interpret=self.interpret)
        A["e_win"] = jnp.asarray(win_stack_for(
            [self.e_pts_field, self.e_vm_field, self.e_cc_field]))
        A["e_pts_gids"] = jnp.asarray(self.e_pts_pool.ghost_ids)
        A["e_vm_gids"] = jnp.asarray(self.e_vm_pool.ghost_ids)
        A["e_cc_gids"] = jnp.asarray(self.e_cc_pool.ghost_ids)

        # stage R: per-point u-space min/max over point_edges
        self.r_pool, (self.r_codes,) = tiled.build_pool(
            t.n_points, [(t.point_edges, t.point_edges_mask)], t.n_edges,
            min_ghost_rows=self._gr.get("r", 1),
            n_windows=self._nw.get("r"))
        self.r_field = FieldSpec("ue", self.r_pool, 2)
        r_fold = tiled.pick_fold(self.r_codes.width)
        self._stage_r = stage_call(
            self._r_body, _nb(t.n_points), [self.r_field], [2],
            meta_rows=self.r_codes.width, meta_fold=r_fold,
            interpret=self.interpret)
        A["r_meta"] = jnp.asarray(tiled.fold_meta(self.r_codes.codes,
                                                  r_fold))
        A["r_win"] = jnp.asarray(win_stack_for([self.r_field]))
        A["r_gids"] = jnp.asarray(self.r_pool.ghost_ids)

    def _e_body(self, ctx):
        """Per-edge min/max projected face-face angle in u-space
        (face_angles_for_edges without substitutions, reference
        calcMinMaxFaceAngleForEdge src/smoothMesh.C:1135-1231).

        u(theta) = 1 - cos(theta) for sin >= 0 else 3 + cos(theta):
        strictly increasing on [0, 2pi], so u-space min/max equal
        angle-space min/max; the driver converts the reduced per-point
        values back with arccos (acos does not lower to Mosaic).
        """
        WEF = self.e_ef_codes.width
        WEC = self.e_ec_codes.width
        ptsT = split_terms(ctx.poolT["pts4"])
        vmT = split_terms(ctx.poolT["vm"])
        ccT = split_terms(ctx.poolT["cc"])
        meta = ctx.meta

        ep0, _ = tiled.unpack_code(meta[0, :][None, :])
        ep1, _ = tiled.unpack_code(meta[1, :][None, :])
        e0 = select(ptsT, ep0, 3)
        e1 = select(ptsT, ep1, 3)
        ctr = [0.5 * (a + b) for a, b in zip(e0, e1)]
        ev = [b - a for a, b in zip(e0, e1)]
        en = jnp.maximum(jnp.sqrt(sum(v * v for v in ev)), VSMALL)
        ev = [v / en for v in ev]

        def proj_unit(x):
            cf = [ctr[c] - x[c] for c in range(3)]
            dt = sum(cf[c] * ev[c] for c in range(3))
            d = [x[c] + dt * ev[c] - ctr[c] for c in range(3)]
            dn = jnp.maximum(jnp.sqrt(sum(v * v for v in d)), VSMALL)
            return [d[c] / dn for c in range(3)]

        pvecs = []
        for w in range(WEF):
            code, _ = tiled.unpack_code(
                meta[self._em_ef + w, :][None, :])
            vm = select(vmT, code, 3)
            pvecs.append(proj_unit(vm))

        def slot_sel3(vals, slot):
            return [sum(jnp.where(slot == w, vals[w][c], 0.0)
                        for w in range(WEF)) for c in range(3)]

        u_min = jnp.full_like(e0[0], 4.0)
        u_max = jnp.zeros_like(e0[0])
        for u in range(WEC):
            code, okb = tiled.unpack_code(
                meta[self._em_ec + u, :][None, :])
            cc = select(ccT, code, 3)
            cv = proj_unit(cc)
            ffr = meta[self._em_ff + u, :][None, :].astype(jnp.int32)
            f0 = jnp.bitwise_and(ffr, 0x7F)
            f1 = jnp.bitwise_and(jnp.right_shift(ffr, 7), 0x7F)
            p0 = slot_sel3(pvecs, f0)
            p1 = slot_sel3(pvecs, f1)
            a = jnp.clip(sum(p0[c] * cv[c] for c in range(3)),
                         -0.99999, 0.99999)
            b = jnp.clip(sum(cv[c] * p1[c] for c in range(3)),
                         -0.99999, 0.99999)
            sa = jnp.sqrt(1.0 - a * a)
            sb = jnp.sqrt(1.0 - b * b)
            cos_s = a * b - sa * sb
            sin_s = sa * b + a * sb
            uv = jnp.where(sin_s >= 0, 1.0 - cos_s, 3.0 + cos_s)
            ok = okb
            u_min = jnp.where(ok, jnp.minimum(u_min, uv), u_min)
            u_max = jnp.where(ok, jnp.maximum(u_max, uv), u_max)
        ctx.out[0][:] = jnp.concatenate([u_min, u_max], axis=0)

    def _r_body(self, ctx):
        W = self.r_codes.width
        ueT = split_terms(ctx.poolT["ue"])
        u_min = None
        u_max = None
        for w in range(W):
            code, ok = tiled.unpack_code(ctx.meta[w, :][None, :])
            v = select(ueT, code, 2)
            mn = jnp.where(ok, v[0], 4.0)
            mx = jnp.where(ok, v[1], 0.0)
            u_min = mn if u_min is None else jnp.minimum(u_min, mn)
            u_max = mx if u_max is None else jnp.maximum(u_max, mx)
        ctx.out[0][:] = jnp.concatenate([u_min, u_max], axis=0)

    def _s_body(self, ctx, own_cur_ref, own_prop_ref, frozen_in_ref,
                *, min_edge, total_min_freeze, cos_min_angle,
                edge_angle_on):
        """Edge-shortening + edge-angle freezes for one point block
        (ops/constraints.restrict_edge_shortening /
        restrict_min_edge_angle_decrease; reference
        src/smoothMesh.C:602-652, :766-930).

        Angle comparisons run in the cosine domain: acos is strictly
        decreasing, so every reference comparison of clamped-acos
        angles maps to the reversed comparison of clamped cosines —
        bit-identical freeze decisions without transcendentals.

        Meta rows: [pp codes | packed wedges (prev|next<<5|mask<<15)].
        """
        Wp = self.p_pp_codes.width
        WF = self.topo.point_faces_mask.shape[1]
        curT = split_terms(ctx.poolT["cur4"])
        propT = split_terms(ctx.poolT["prop4"])
        meta = ctx.meta
        own_c = [own_cur_ref[c, :][None, :] for c in range(3)]
        own_p = [own_prop_ref[c, :][None, :] for c in range(3)]
        inf = jnp.float32(np.inf)

        ncur = []
        nprop = []
        cur_min = None
        new_min = None
        for w in range(Wp):
            code, m = tiled.unpack_code(meta[w, :][None, :])
            cv = select(curT, code, 3)
            pv = select(propT, code, 3)
            ncur.append(cv)
            nprop.append(pv)
            dxc = [cv[c] - own_c[c] for c in range(3)]
            dxn = [cv[c] - own_p[c] for c in range(3)]
            lc = jnp.sqrt(sum(d * d for d in dxc))
            ln = jnp.sqrt(sum(d * d for d in dxn))
            lc = jnp.where(m, lc, inf)
            ln = jnp.where(m, ln, inf)
            cur_min = lc if cur_min is None else jnp.minimum(cur_min, lc)
            new_min = ln if new_min is None else jnp.minimum(new_min, ln)

        if total_min_freeze:
            fr = jnp.minimum(cur_min, new_min) < min_edge
        else:
            fr = (new_min < min_edge) & (new_min < cur_min)

        if edge_angle_on:
            def slot_sel(vals, slot):
                return [sum(jnp.where(slot == w, vals[w][c], 0.0)
                            for w in range(Wp)) for c in range(3)]

            def cosang(ctr, p1, p2):
                v1 = [p1[c] - ctr[c] for c in range(3)]
                v2 = [p2[c] - ctr[c] for c in range(3)]
                n1 = jnp.sqrt(sum(v * v for v in v1))
                n2 = jnp.sqrt(sum(v * v for v in v2))
                d = sum(a * b for a, b in zip(v1, v2))
                d = d / (jnp.maximum(n1, VSMALL) * jnp.maximum(n2,
                                                              VSMALL))
                return jnp.clip(d, -0.99999, 0.99999)

            max_c = jnp.full_like(cur_min, -2.0)
            max_n = jnp.full_like(cur_min, -2.0)
            for k in range(WF):
                wr = meta[self._sm_wedge + k, :][None, :] \
                    .astype(jnp.int32)
                ps = jnp.bitwise_and(wr, 31)
                ns = jnp.bitwise_and(jnp.right_shift(wr, 5), 31)
                ok = wr < 0
                cp1 = slot_sel(ncur, ps)
                cp2 = slot_sel(ncur, ns)
                np1 = slot_sel(nprop, ps)
                np2 = slot_sel(nprop, ns)
                cos_c = cosang(own_c, cp1, cp2)
                cos_n = jnp.maximum(
                    jnp.maximum(cosang(own_p, cp1, cp2),
                                cosang(own_p, np1, np2)),
                    jnp.maximum(cosang(own_p, cp1, np2),
                                cosang(own_p, np1, cp2)))
                max_c = jnp.where(ok, jnp.maximum(max_c, cos_c), max_c)
                max_n = jnp.where(ok, jnp.maximum(max_n, cos_n), max_n)
            fr = fr | ((max_n > cos_min_angle) & (max_n > max_c))

        frozen = jnp.maximum(frozen_in_ref[0, :][None, :],
                             fr.astype(jnp.float32))
        ctx.out[0][:] = frozen

    # ---- public stage functions (jittable) -------------------------------

    def face_geometry(self, arr, pts_planar: jnp.ndarray):
        """-> (geom6 (6, F_pad) [fc|fa], vm3 (3, F_pad))."""
        gh = ghosts_planar(pts_planar, arr["f_gids"])
        return self._stage_f(arr["f_win"], arr["f_meta"],
                             {"pts": (pts_planar, gh)})

    def cell_centres_vols(self, arr, geom6: jnp.ndarray):
        """-> cc4 (4, C_pad) [cc | vol]."""
        gh = ghosts_planar(geom6, arr["c_gids"])
        return self._stage_c(arr["c_win"], arr["c_meta"],
                             {"fgeom": (geom6, gh)})

    def predictor(self, arr, pts4_planar: jnp.ndarray, cc4: jnp.ndarray,
                  max_step: float, rel_step_frac: float,
                  do_boundary: bool, gh_pp=None):
        """Centroidal + AR + limiter -> (4, N_pad) [proposal | curmin].

        pts4_planar: (4, N_pad) [x|y|z|is_internal] current points.
        cc4: (4, C_pad) from cell_centres_vols.
        """
        fn = self._get_stage_p(max_step, rel_step_frac, do_boundary)
        cc3 = cc4[:3]
        gh_cc = ghosts_planar(cc3, arr["p_cc_gids"])
        if gh_pp is None:
            gh_pp = ghosts_planar(pts4_planar, arr["p_pp_gids"])
        return fn(arr["p_win"], arr["p_meta"],
                  {"cc": (cc3, gh_cc), "pts4": (pts4_planar, gh_pp)},
                  pts4_planar)

    def freeze_constraints(self, arr, pts4_planar: jnp.ndarray,
                           prop4: jnp.ndarray, frozen_in: jnp.ndarray,
                           min_edge: float, total_min_freeze: bool,
                           min_angle_rad: float, edge_angle_on: bool,
                           gh_pp=None):
        """Edge-shortening + edge-angle freeze mask -> (1, N_pad) f32.

        frozen_in: (1, N_pad) f32 0/1 mask to OR into.  ``gh_pp``: the
        predictor's (4, ...) pts4 ghost gather, reused for the current
        coordinates (same pool ids) — saves one XLA gather.
        """
        fn = self._get_stage_s(min_edge, total_min_freeze,
                               min_angle_rad, edge_angle_on)
        cur3 = pts4_planar[:3]
        prop3 = prop4[:3]
        gh_cur = (gh_pp[:3] if gh_pp is not None
                  else ghosts_planar(cur3, arr["p_pp_gids"]))
        gh_prop = ghosts_planar(prop3, arr["p_pp_gids"])
        return fn(arr["s_win"], arr["s_meta"],
                  {"cur4": (cur3, gh_cur),
                   "prop4": (prop3, gh_prop)},
                  pts4_planar, prop4, frozen_in)

    def face_angles_per_point(self, arr, pts4_planar: jnp.ndarray,
                              vm3: jnp.ndarray, cc4: jnp.ndarray):
        """Current per-point min/max face angles in U-SPACE (dense (N,)
        pair) — twin of ops/constraints.current_face_angles_per_point
        up to the monotone u encoding.
        """
        pts3 = pts4_planar[:3]
        cc3 = cc4[:3]
        gh_p = ghosts_planar(pts3, arr["e_pts_gids"])
        gh_v = ghosts_planar(vm3, arr["e_vm_gids"])
        gh_c = ghosts_planar(cc3, arr["e_cc_gids"])
        ue = self._stage_e(
            arr["e_win"], arr["e_meta"],
            {"pts4": (pts3, gh_p), "vm": (vm3, gh_v),
             "cc": (cc3, gh_c)})
        gh_u = ghosts_planar(ue, arr["r_gids"])
        up = self._stage_r(arr["r_win"], arr["r_meta"],
                           {"ue": (ue, gh_u)})
        n = self.topo.n_points
        # u-space values: feed restrict_face_angle_deterioration with
        # u_space=True so current and proposed evaluations share the
        # representation (use u_to_angle for human-readable radians)
        return (up[0, :n], up[1, :n])

    def pts4(self, points: jnp.ndarray, intern=None) -> jnp.ndarray:
        """(N, 3) -> (4, N_pad) planar with the is-internal flag.

        ``intern``: per-shard internal-point mask override.  REQUIRED
        under shard_map: a TiledEngine used as the stacked template
        (parallel/halo.build_stacked_engines) must stay a pure
        shape-parameterized program — closing over this engine's own
        ``topo.is_internal_point`` would bake SHARD 0's flags into
        every shard's trace.
        """
        if intern is None:
            intern = jnp.asarray(self.topo.is_internal_point)
        return to_planar(jnp.concatenate(
            [points.astype(jnp.float32),
             intern.astype(jnp.float32)[:, None]], axis=1))

    def cell_centres_dense(self, points: jnp.ndarray) -> jnp.ndarray:
        """Convenience twin of geometry.cell_centres: (N,3) -> (C,3)."""
        pp = to_planar(points.astype(jnp.float32))
        geom6, _vm = self.face_geometry(self.arrays, pp)
        cc4 = self.cell_centres_vols(self.arrays, geom6)
        return from_planar(cc4[:3], self.topo.n_cells)
