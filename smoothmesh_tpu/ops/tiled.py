"""The TPU select engine: span+ghost pools and in-kernel one-hot selects.

Why this exists (round-2 measurements, experiments/gatherbench*.py):
XLA's gather on TPU fetches one PADDED row (>= 512 B) per index —
~220 M rows/s ceiling regardless of payload — and every hot kernel in
the smoothing iteration is gather-bound (CLAUDE.md perf model).  The
engine restructures each gather as:

  1. HOST (static, per topology): consumers are processed in blocks of
     KB contiguous entities of the spatially-reordered mesh
     (mesh/tiling.permute_mesh).  Each block's source entities are
     covered by [W INDEPENDENTLY-PLACED aligned windows of the source
     array — the top-W most-populated SPAN_UNIT-aligned buckets] +
     [a small per-block list of scattered "ghost" entities].  W is
     chosen per pool (2/4/8) to balance ghost-gather rows against MXU
     select rows: a ghost row costs ~a full window of select work
     (experiments/sim_windows.py; at 128^3 the 2-contiguous-window
     design left ~34M ghost gather rows/iter, multi-window cuts it
     ~3-4x).  Every table entry gets a pool-local code =
     pool_row * 128 + lane.
  2. DEVICE, per iteration: ghosts are gathered once per (stage, field)
     with one plain XLA gather (ghost counts are a few % of the refs)
     and handed to the kernel as a blocked input; span windows stream
     in via prefetch-driven index_maps (contiguous, full-bandwidth).
  3. IN KERNEL: pool = [windows | ghosts] in VMEM; entries are selected
     by one-hot matmuls on the MXU (bf16 terms — 3 terms reproduce f32
     exactly, since one-hot products select term values exactly) plus a
     VPU masked lane-reduce.

Field layout is PLANAR: (C, N_pad) — components on sublanes, entities
on lanes.  Consumer-side arrays (codes, outputs) then map to native
(W, KB)/(C, KB) blocks with no in-kernel relayouts; only the 40-row
pool assembly reshapes/transposes (small).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
KB = 2048                    # consumers per block (uniform, all stages)
SPAN_UNIT = KB               # entities per span window == one block
SPAN_ROWS = SPAN_UNIT // LANES
N_WINDOWS = 2                # default window count / planar-width guarantee
WINDOW_CANDIDATES = (2, 4, 8)
# Cost of one extra window, in ghost-row equivalents, for the "auto"
# window chooser.  MEASURED (2026-08-17, v5e): the MXU select cost
# scales with n_pool_rows = W*SPAN_ROWS + gr, so an extra window costs
# ~SPAN_ROWS select rows; auto-picking W=8 nearly everywhere regressed
# the bench at BOTH 64^3 (65.2 -> 84.9 ms/iter) and 128^3 (585 -> 646
# ms/iter) vs W=2 — the ghost-gather savings (0.6-0.7us/block-row) do
# not pay for 6x16 extra select rows.  Hence the default is a flat
# W=2; pass n_windows="auto" (or an int) only for pools measured to be
# ghost-dominated.
WINDOW_COST = 16.0


def pad_n(n: int) -> int:
    """Padded entity count of a planar (C, N_pad) array."""
    return -(-n // KB) * KB


def planar_width(n: int) -> int:
    """Planar column count: padded, and always >= the span coverage
    (N_WINDOWS windows) so window fetches never run off the array."""
    return max(pad_n(n), N_WINDOWS * SPAN_UNIT)


# ---------------------------------------------------------------------------
# Host-side pool compilation
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PoolSpec:
    """Pool structure for one (consumer blocking, source array) pair."""

    win: np.ndarray          # (nb, W) int32 span-window indices
    ghost_ids: np.ndarray    # (nb, n_ghost_rows*128) int32 source entity ids
    n_ghost_rows: int
    n_src: int

    @property
    def n_windows(self) -> int:
        return self.win.shape[1]

    @property
    def n_pool_rows(self) -> int:
        return self.n_windows * SPAN_ROWS + self.n_ghost_rows


@dataclasses.dataclass
class TableCodes:
    """Pool-local select codes for one padded (Nc, W) table: planar
    (W, Nc_pad) int16 with code = pool_row * 128 + lane in bits 0-14
    and the table's VALID mask in bit 15 (raw int16 < 0 <=> valid).

    Packing the mask into the sign bit removes the separate planar f32
    mask arrays entirely — at 10M cells those were ~3.5 GB of device
    HBM (each (W, N) f32 mask also pads its sublane dim to the (8,128)
    tile).  Kernels unpack with :func:`unpack_code`.
    """

    codes: np.ndarray
    width: int


def build_pool(n_consumers: int,
               tables: Sequence[Tuple[np.ndarray, Optional[np.ndarray]]],
               n_src: int,
               ghost_row_cap: int = 64,
               min_ghost_rows: int = 1,
               n_windows=None
               ) -> Tuple[PoolSpec, List[TableCodes]]:
    """Compute the shared pool + per-table codes for one source array.

    ``tables``: (table, mask) pairs indexing the same source array;
    they share the per-block pools (union of source sets).
    ``min_ghost_rows`` forces a lower bound on the ghost-row count and
    ``n_windows`` forces the window count, so pools built for different
    shards of one mesh end up shape-identical (required to stack engine
    arrays under shard_map).

    Each block's W windows are placed INDEPENDENTLY at its top-W
    most-populated SPAN_UNIT-aligned source buckets; remaining sources
    become ghosts.  ``n_windows`` may be an int (forced), None
    (default ``N_WINDOWS``), or "auto" (pick the WINDOW_CANDIDATES
    member minimizing max ghost rows + WINDOW_COST * W — see the
    WINDOW_COST calibration note above).
    """
    nb = -(-n_consumers // KB)
    Nc_pad = nb * KB

    padded = []
    for tab, mask in tables:
        tab = np.asarray(tab, np.int64)
        Nc, W = tab.shape
        m = np.ones((Nc, W), bool) if mask is None else np.asarray(mask, bool)
        if Nc < Nc_pad:
            tab = np.pad(tab, ((0, Nc_pad - Nc), (0, 0)))
            m = np.pad(m, ((0, Nc_pad - Nc), (0, 0)))
        padded.append((tab, m & (tab >= 0)))

    # per-block unique sources + SPAN_UNIT bucket histograms
    blocks = []
    for b in range(nb):
        sl = slice(b * KB, (b + 1) * KB)
        srcs = np.concatenate([t[sl][m[sl]] for t, m in padded]) \
            if padded else np.zeros(0, np.int64)
        srcs = np.unique(srcs)
        buckets, counts = np.unique(srcs // SPAN_UNIT, return_counts=True)
        blocks.append((srcs, buckets, counts))

    def max_ghosts(W: int) -> int:
        g = 0
        for srcs, buckets, counts in blocks:
            if len(counts) <= W:
                continue
            cov = int(counts[np.argpartition(counts, -W)[-W:]].sum())
            g = max(g, len(srcs) - cov)
        return g

    if n_windows is None:
        n_windows = N_WINDOWS
    elif n_windows == "auto":
        best_cost = None
        for Wc in WINDOW_CANDIDATES:
            gr = -(-max_ghosts(Wc) // LANES)
            cost = gr + WINDOW_COST * Wc
            if best_cost is None or cost < best_cost:
                best_cost, n_windows = cost, Wc
    W_win = int(n_windows)

    win = np.zeros((nb, W_win), dtype=np.int64)
    sel_lists: List[np.ndarray] = []
    ghost_lists: List[np.ndarray] = []
    g_max = 0
    for b, (srcs, buckets, counts) in enumerate(blocks):
        if not len(srcs):
            sel_lists.append(np.zeros(0, np.int64))
            ghost_lists.append(np.zeros(0, np.int64))
            continue
        if len(buckets) > W_win:
            sel = np.sort(buckets[np.argpartition(counts, -W_win)[-W_win:]])
        else:
            sel = buckets
        sel_lists.append(sel)
        win[b, :len(sel)] = sel
        win[b, len(sel):] = sel[-1]
        pos = np.searchsorted(sel, srcs // SPAN_UNIT)
        in_win = sel[np.clip(pos, 0, len(sel) - 1)] == srcs // SPAN_UNIT
        ghosts = srcs[~in_win]
        ghost_lists.append(ghosts)
        g_max = max(g_max, len(ghosts))

    # Ghost block shape is (C, GR*128): the tiled dims are
    # (sublane=C [padded to 8 by Mosaic], lane=GR*128), so GR only
    # needs lane granularity — keep it minimal.  Oversizing GR inflates
    # the per-iteration XLA ghost gathers (nb * GR * 128 rows) ~8x.
    n_ghost_rows = max(-(-g_max // LANES), 1, min_ghost_rows)
    if n_ghost_rows > ghost_row_cap:
        raise ValueError(
            f"pool needs {n_ghost_rows} ghost rows > cap {ghost_row_cap}; "
            "mesh ordering lacks locality for this consumer blocking")
    ghost_ids = np.zeros((nb, n_ghost_rows * LANES), dtype=np.int64)
    for b, g in enumerate(ghost_lists):
        ghost_ids[b, :len(g)] = g

    pool = PoolSpec(win=win.astype(np.int32),
                    ghost_ids=ghost_ids.astype(np.int32),
                    n_ghost_rows=n_ghost_rows, n_src=n_src)

    ghost_base = W_win * SPAN_UNIT
    all_codes = []
    for tab, m in padded:
        W = tab.shape[1]
        codes = np.zeros((Nc_pad, W), dtype=np.int64)
        for b in range(nb):
            sl = slice(b * KB, (b + 1) * KB)
            t = tab[sl]
            sel = sel_lists[b]
            bkt = t // SPAN_UNIT
            if len(sel):
                pos = np.clip(np.searchsorted(sel, bkt), 0, len(sel) - 1)
                in_span = sel[pos] == bkt
            else:
                pos = np.zeros_like(t)
                in_span = np.zeros(t.shape, bool)
            gl = ghost_lists[b]
            gslot = np.searchsorted(gl, t) if len(gl) else np.zeros_like(t)
            gslot = np.clip(gslot, 0, max(len(gl) - 1, 0))
            c = np.where(in_span, pos * SPAN_UNIT + t - bkt * SPAN_UNIT,
                         ghost_base + gslot)
            codes[sl] = np.where(m[sl], c, 0)
            bad = ~in_span & m[sl]
            if np.any(bad) and not np.array_equal(gl[gslot[bad]], t[bad]):
                raise AssertionError("ghost slot resolution failed")
        # int16 halves the largest per-block kernel DMA (wide tables
        # stream (W, KB) code blocks every stage call) and the code
        # HBM footprint (~3.6 GB at 10M cells).  Codes are bounded by
        # n_pool_rows*128 <= (8*16 + ghost_row_cap)*128 = 24576 < 2^15.
        assert codes.max() < 2 ** 15
        packed = codes.astype(np.uint16) | (m.astype(np.uint16) << 15)
        all_codes.append(TableCodes(
            codes=np.ascontiguousarray(packed.T).view(np.int16), width=W))
    return pool, all_codes


def pool_stats(pool: PoolSpec) -> Dict[str, float]:
    g = (pool.ghost_ids > 0).sum(axis=1)
    return {
        "pool_rows": pool.n_pool_rows,
        "ghost_rows": pool.n_ghost_rows,
        "mean_ghosts": float(g.mean()),
        "max_ghosts": int(g.max()),
        "ghost_frac_of_kb": float(g.mean()) / KB,
    }


# ---------------------------------------------------------------------------
# Device-side planar layout + ghosts
# ---------------------------------------------------------------------------

def to_planar(x: jnp.ndarray) -> jnp.ndarray:
    """(N, C) -> (C, planar_width(N))."""
    N = x.shape[0]
    return jnp.pad(x, ((0, planar_width(N) - N), (0, 0))).T


def from_planar(p: jnp.ndarray, n: int) -> jnp.ndarray:
    return p[:, :n].T


def ghosts_planar(x_planar: jnp.ndarray, ghost_ids: jnp.ndarray
                  ) -> jnp.ndarray:
    """(C, nb*GR*128) ghost array from a planar source.

    ghost_ids: (nb, GR*128) device array of source entity ids.
    """
    return x_planar[:, ghost_ids.reshape(-1)]


# ---------------------------------------------------------------------------
# Meta packing: one folded int16 array per consumer class
# ---------------------------------------------------------------------------
#
# All static per-consumer tables of a stage (select codes, packed slot
# pairs, bitmasks) are stored as row-slices of ONE (R, nb*KB) int16
# "meta" array instead of separate arrays: TPU HBM stores every array
# in (16, 128) int16 tiles, so a standalone 4-row code table occupies
# 4x its logical bytes.  When R itself is not a multiple of 16 the
# array is additionally FOLDED: fold consecutive consumer blocks are
# stacked vertically, storage (R*fold, ceil(nb/fold)*KB), making the
# sublane dim tile-exact.  The per-block DMA is unchanged — the
# BlockSpec fetches block b at rows [(b%fold)*R, +R), cols
# [(b//fold)*KB, +KB).

I16_TILE = 16


def pick_fold(rows: int) -> int:
    """Vertical fold factor for a meta array of ``rows`` rows.

    MEASURED CONSTRAINT (2026-08-19, v5e Mosaic): a BlockSpec's
    sublane block size must be divisible by 8 OR equal to the array's
    full sublane extent — a (4, KB) block of a folded (16, nb/4*KB)
    array is rejected at lowering.  Folding would need dynamic
    in-kernel sublane offsets instead (untested on Mosaic), so metas
    stay UNFOLDED: block rows == array rows is always legal, and the
    residual HBM tile padding (R rows -> next multiple of 16 int16
    rows, at most ~1.1 GB across all metas at 10M cells) is accepted.
    """
    return 1


def fold_meta(meta: np.ndarray, fold: int) -> np.ndarray:
    """(R, nb*KB) -> (R*fold, ceil(nb/fold)*KB) vertical block fold."""
    meta = np.asarray(meta, np.int16)
    R, Wc = meta.shape
    nb = Wc // KB
    if fold == 1:
        return np.ascontiguousarray(meta)
    nbp = -(-nb // fold) * fold
    if nbp != nb:
        meta = np.pad(meta, ((0, 0), (0, (nbp - nb) * KB)))
    m4 = meta.reshape(R, nbp // fold, fold, KB)
    return np.ascontiguousarray(
        m4.transpose(2, 0, 1, 3)).reshape(fold * R, (nbp // fold) * KB)


def unpack_code(raw_row: jnp.ndarray):
    """(1, KB) int16 meta row -> (code int32 (1, KB), valid bool).

    Bit 15 is the valid flag (int16 sign bit), bits 0-14 the value.
    """
    r = raw_row.astype(jnp.int32)
    return jnp.bitwise_and(r, 0x7FFF), r < 0


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------

def assemble_poolT(window_refs, ghost_ref, ncomp: int):
    """Build the (C*128, PR) transposed pool from window/ghost refs.

    window_refs: N_WINDOWS refs of (C, SPAN_UNIT); ghost_ref
    (C, GR*128) or None.  Row order: windows then ghosts — matching the
    host-side code layout.
    """
    comps = []
    for c in range(ncomp):
        chunks = [w[c, :].reshape(SPAN_ROWS, LANES) for w in window_refs]
        if ghost_ref is not None:
            gr = ghost_ref.shape[1] // LANES
            chunks.append(ghost_ref[c, :].reshape(gr, LANES))
        comps.append(jnp.concatenate(chunks, axis=0).T)   # (128, PR)
    return jnp.concatenate(comps, axis=0)                 # (C*128, PR)


BF16_TERMS = 3


def split_terms(poolT: jnp.ndarray, terms: int = BF16_TERMS
                ) -> jnp.ndarray:
    """K-stacked bf16 split: (C*128, PR) f32 -> (C*128, terms*PR) bf16.

    3 terms reproduce f32 exactly under one-hot select (each one-hot
    product picks a term value exactly; the f32 accumulator sums the
    non-overlapping mantissa pieces exactly).  Stacking the terms along
    the contraction dim turns select's 3 narrow K=PR MXU dots into ONE
    K=terms*PR dot: PR is typically ~36 rows vs the 128-deep systolic
    array, so the stacked form triples K-utilization for the same
    FLOPs — measured whole-engine win at 64^3: 65.2 -> 47.6 ms/iter
    (4.21M -> 5.77M point-updates/s).
    """
    out = []
    rem = poolT
    for t in range(terms):
        h = rem.astype(jnp.bfloat16)
        if t < terms - 1:
            rem = rem - h.astype(jnp.float32)
        out.append(h)
    return jnp.concatenate(out, axis=1)


def select(poolT_stack: jnp.ndarray, code: jnp.ndarray,
           ncomp: int, terms: int = BF16_TERMS) -> List[jnp.ndarray]:
    """Select per-entry pool values.

    poolT_stack: (C*128, terms*PR) bf16 from :func:`split_terms`.
    code: (1, KB) int32 pool-local codes.  Returns ncomp arrays of
    (1, KB) f32.
    """
    PR = poolT_stack.shape[1] // terms
    code = code.astype(jnp.int32)    # codes are stored/streamed int16
    rows = code // LANES
    lanes = code % LANES
    # one-hot replicated once per bf16 term along K (compare form: a
    # vector modulo does not reliably lower to Mosaic)
    riota = jax.lax.broadcasted_iota(jnp.int32, (terms * PR, KB), 0)
    oh = functools.reduce(
        jnp.logical_or,
        [riota == rows + t * PR for t in range(terms)]
    ).astype(jnp.bfloat16)
    tmp = jax.lax.dot(poolT_stack, oh,
                      preferred_element_type=jnp.float32)  # (C*128, KB)
    pick = jax.lax.broadcasted_iota(jnp.int32, (LANES, KB), 0) == lanes
    return [
        jnp.sum(jnp.where(pick, tmp[c * LANES:(c + 1) * LANES, :], 0.0),
                axis=0, keepdims=True)
        for c in range(ncomp)
    ]


# ---------------------------------------------------------------------------
# Generic stage assembly
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class FieldSpec:
    """One pooled input field of a stage."""

    name: str
    pool: PoolSpec
    ncomp: int


def stage_call(kernel_body, nb: int,
               fields: Sequence[FieldSpec],
               n_out_comps: Sequence[int],
               meta_rows: int = 0,
               meta_fold: int = 1,
               extra_in_specs: Sequence = (),
               interpret: bool = False):
    """Build a jit-able stage function.

    kernel_body(ctx, *extra_refs) runs per consumer block with
      ctx.pool(name)        -> (C*128, PR) f32 poolT
      ctx.meta              -> (meta_rows, KB) int16 meta ref block
                               (codes + packed static rows; see
                               unpack_code / the meta packing note)
      ctx.out[j]            -> (C_j, KB) f32 output ref block
    The returned function is called as
      fn(win_stack, meta, field_arrays {name: (planar, ghosts)},
         extras...) -> list of planar outputs (C_j, nb*KB).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_f = len(fields)
    n_meta = 1 if meta_rows else 0
    field_nw = [f.pool.n_windows for f in fields]
    win_base = np.concatenate([[0], np.cumsum(field_nw)]).astype(int)

    def kernel(win_ref, *refs):
        meta_ref = refs[0] if n_meta else None
        off = n_meta
        win_refs = [refs[off + win_base[i]: off + win_base[i + 1]]
                    for i in range(n_f)]
        off += int(win_base[-1])
        ghost_refs = refs[off: off + n_f]
        off += n_f
        extra_refs = refs[off: off + len(extra_in_specs)]
        out_refs = refs[off + len(extra_in_specs):]

        class Ctx:
            pass

        ctx = Ctx()
        pools = {}
        for i, f in enumerate(fields):
            pools[f.name] = assemble_poolT(
                [w for w in win_refs[i]], ghost_refs[i], f.ncomp)
        ctx.poolT = pools
        ctx.meta = meta_ref
        ctx.out = out_refs
        kernel_body(ctx, *extra_refs)

    in_specs = []
    if n_meta:
        if meta_fold == 1:
            meta_idx = lambda b, win: (0, b)            # noqa: E731
        else:
            meta_idx = lambda b, win: (b % meta_fold,   # noqa: E731
                                       b // meta_fold)
        in_specs.append(pl.BlockSpec(
            (meta_rows, KB), meta_idx, memory_space=pltpu.VMEM))
    for i, f in enumerate(fields):
        for w in range(field_nw[i]):
            in_specs.append(pl.BlockSpec(
                (f.ncomp, SPAN_UNIT),
                lambda b, win, r=int(win_base[i]) + w: (0, win[r, b]),
                memory_space=pltpu.VMEM))
    for i, f in enumerate(fields):
        in_specs.append(pl.BlockSpec(
            (f.ncomp, f.pool.n_ghost_rows * LANES),
            lambda b, win, i=i: (0, b), memory_space=pltpu.VMEM))
    in_specs.extend(extra_in_specs)

    out_specs = tuple(
        pl.BlockSpec((c, KB), lambda b, win: (0, b),
                     memory_space=pltpu.VMEM)
        for c in n_out_comps)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((c, nb * KB), jnp.float32)
        for c in n_out_comps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
    )

    def fn(win_stack, meta, field_arrays, *extras):
        args = [meta] if n_meta else []
        for f in fields:
            planar, _ = field_arrays[f.name]
            args.extend([planar] * f.pool.n_windows)
        for f in fields:
            _, ghosts = field_arrays[f.name]
            args.append(ghosts)
        args.extend(extras)
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes if len(out_shapes) > 1 else out_shapes[0],
            grid_spec=grid_spec,
            interpret=interpret,
        )(win_stack, *args)

    return fn


def win_stack_for(fields: Sequence[FieldSpec]) -> np.ndarray:
    """(sum n_windows, nb) prefetch array of window indices, rows
    ordered field-major then window."""
    return np.concatenate(
        [f.pool.win.T for f in fields], axis=0).astype(np.int32)


# ---------------------------------------------------------------------------
# Standalone tiled gather (engine self-test + benchmark surface)
# ---------------------------------------------------------------------------

def tiled_gather(x: jnp.ndarray, pool: PoolSpec, codes: TableCodes,
                 n_consumers: int, interpret: bool = False) -> jnp.ndarray:
    """Gather x[table] through the select engine.

    x: (N, C) dense source values.  Returns (n_consumers, W, C).
    Reference semantics identical to x[table] with masked entries
    arbitrary.  This is the engine's unit-test surface — production
    stages fuse their math into the kernel body instead.
    """
    C = x.shape[1]
    W = codes.width
    nb = codes.codes.shape[1] // KB

    xp = to_planar(x.astype(jnp.float32))
    gids = jnp.asarray(pool.ghost_ids)
    gh = ghosts_planar(xp, gids).reshape(C, -1)
    # ghosts as (C, nb*GR*128) planar with per-block blocks (C, GR*128)
    field = FieldSpec("x", pool, C)

    def body(ctx):
        pT = split_terms(ctx.poolT["x"])
        for w in range(W):
            code, _valid = unpack_code(ctx.meta[w, :][None, :])
            vals = select(pT, code, C)
            for c in range(C):
                ctx.out[w * C + c][:] = vals[c]

    fold = pick_fold(W)
    fn = stage_call(body, nb, [field], [1] * (W * C),
                    meta_rows=W, meta_fold=fold, interpret=interpret)
    outs = fn(jnp.asarray(win_stack_for([field])),
              jnp.asarray(fold_meta(codes.codes, fold)),
              {"x": (xp, gh)})
    res = jnp.stack([jnp.stack([outs[w * C + c][0] for c in range(C)],
                               axis=-1) for w in range(W)], axis=1)
    return res[:n_consumers]
