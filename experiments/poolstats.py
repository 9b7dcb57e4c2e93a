"""Per-stage pool/ghost statistics vs mesh size (host-only).

The 160^3 profile (/tmp/prof_160.log) shows ghost gathers dominating
large-mesh iterations (e.g. a 21.8M-row gather from the face array =
nb_edges * GR * 128 with GR=28).  This prints, for each engine pool,
the ghost-row count and mean/max ghosts per block, plus the span the
windows would need to cover each block's sources — the data for sizing
per-stage windows.

Run: JAX_PLATFORMS=cpu python experiments/poolstats.py 64 96 128
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from smoothmesh_tpu.driver import Smoother  # noqa: E402
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb  # noqa: E402
from smoothmesh_tpu.ops import tiled  # noqa: E402
from smoothmesh_tpu.params import SmoothingParams  # noqa: E402


def span_stats(topo, tables, n_src):
    """Distribution of per-block source spans (in SPAN_UNITs)."""
    from smoothmesh_tpu.ops.tiled import KB, SPAN_UNIT
    n_consumers = tables[0][0].shape[0]
    nb = -(-n_consumers // KB)
    spans = []
    for b in range(nb):
        sl = slice(b * KB, (b + 1) * KB)
        srcs = []
        for tab, mask in tables:
            t = np.asarray(tab[sl], np.int64)
            m = np.ones_like(t, bool) if mask is None else mask[sl]
            srcs.append(t[m & (t >= 0)])
        s = np.concatenate(srcs)
        if not len(s):
            spans.append(0)
            continue
        # windows are SPAN_UNIT-aligned: span in units covering p5..p95
        lo, hi = np.percentile(s, [2, 98])
        spans.append(int(hi - lo) / SPAN_UNIT)
    spans = np.array(spans)
    return {"span_p50": round(float(np.median(spans)), 1),
            "span_p90": round(float(np.percentile(spans, 90)), 1),
            "span_max": round(float(spans.max()), 1)}


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [64]
    for N in sizes:
        base = hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5))
        ms = min(np.diff(np.unique(base.points[:, a])).min()
                 for a in range(3))
        mesh = perturb(base, amplitude=0.25 * ms, seed=3)
        sm = Smoother(mesh, SmoothingParams(centroidal_iters=1),
                      dtype=np.float32, use_tile_engine=True)
        eng = sm.engine
        t = sm.topo
        pools = {
            "f(pts->face)": (eng.f_pool,
                             [(t.face_points, t.face_mask)], t.n_points),
            "c(fgeom->cell)": (eng.c_pool,
                               [(t.cell_faces, t.cell_faces_mask)],
                               t.n_faces),
            "p_cc": (eng.p_cc_pool,
                     [(t.point_cells, t.point_cells_mask)], t.n_cells),
            "p_pp": (eng.p_pp_pool,
                     [(t.point_points, t.point_points_mask)], t.n_points),
            "e_pts": (eng.e_pts_pool, [(t.edges, None)], t.n_points),
            "e_vm(face->edge)": (eng.e_vm_pool,
                                 [(t.edge_faces, t.edge_faces_mask)],
                                 t.n_faces),
            "e_cc": (eng.e_cc_pool,
                     [(t.edge_cells, t.edge_cells_mask)], t.n_cells),
            "r": (eng.r_pool,
                  [(t.point_edges, t.point_edges_mask)], t.n_edges),
        }
        print(f"== N={N}: pts={t.n_points} faces={t.n_faces} "
              f"cells={t.n_cells} edges={t.n_edges}", flush=True)
        total_rows = 0
        for name, (pool, tabs, n_src) in pools.items():
            st = tiled.pool_stats(pool)
            sp = span_stats(t, tabs, n_src)
            nb = pool.ghost_ids.shape[0]
            rows = nb * pool.n_ghost_rows * 128
            total_rows += rows
            print(f"  {name:18s} GR={pool.n_ghost_rows:3d} "
                  f"mean_g={st['mean_ghosts']:7.0f} "
                  f"max_g={st['max_ghosts']:6d} "
                  f"gather_rows={rows/1e6:6.2f}M  {sp}", flush=True)
        print(f"  TOTAL ghost gather rows/iter ~ {total_rows/1e6:.1f}M")


if __name__ == "__main__":
    main()
