"""Simulate multi-window pool ghost counts (design study for ops/tiled).

Current pools cover each consumer block's sources with N_WINDOWS=2
CONTIGUOUS 2048-entity windows; everything else is a ghost fetched by a
slow XLA gather (~220M rows/s).  At 128^3 the ghost gathers total
~33.8M rows/iter (experiments/poolstats.py) because several stages have
per-block source footprints that 2 contiguous windows cannot cover.

This sims the alternative: W INDEPENDENTLY-PLACED windows of U entities
(top-W most-populated U-aligned buckets per block).  Prints, per stage
and (U, W), the resulting max/mean ghost rows -> total gather rows.

Run: JAX_PLATFORMS=cpu python experiments/sim_windows.py 64 96
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from smoothmesh_tpu.driver import Smoother  # noqa: E402
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb  # noqa: E402
from smoothmesh_tpu.params import SmoothingParams  # noqa: E402

KB = 2048
LANES = 128


def block_sources(tables, nb):
    """Per-block sorted unique source ids."""
    out = []
    for b in range(nb):
        sl = slice(b * KB, (b + 1) * KB)
        srcs = []
        for tab, mask in tables:
            t = np.asarray(tab[sl], np.int64)
            m = np.ones_like(t, bool) if mask is None else \
                np.asarray(mask[sl], bool)
            srcs.append(t[m & (t >= 0)])
        s = np.unique(np.concatenate(srcs)) if srcs else np.zeros(0, np.int64)
        out.append(s)
    return out


def sim(blocks, U, W):
    """Ghost stats with top-W U-buckets per block."""
    ghosts = []
    for s in blocks:
        if not len(s):
            ghosts.append(0)
            continue
        b = s // U
        _, counts = np.unique(b, return_counts=True)
        top = np.sort(counts)[::-1][:W]
        ghosts.append(len(s) - int(top.sum()))
    g = np.array(ghosts)
    gr = -(-g.max() // LANES) if len(g) else 0
    return int(g.max()), float(g.mean()), int(gr)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [64]
    for N in sizes:
        base = hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5))
        ms = min(np.diff(np.unique(base.points[:, a])).min()
                 for a in range(3))
        mesh = perturb(base, amplitude=0.25 * ms, seed=3)
        sm = Smoother(mesh, SmoothingParams(centroidal_iters=1),
                      dtype=np.float32, use_tile_engine=True)
        t = sm.topo
        stages = {
            "f(pts->face)": ([(t.face_points, t.face_mask)], t.n_faces),
            "c(fgeom->cell)": ([(t.cell_faces, t.cell_faces_mask)],
                               t.n_cells),
            "p_cc": ([(t.point_cells, t.point_cells_mask)], t.n_points),
            "p_pp": ([(t.point_points, t.point_points_mask)], t.n_points),
            "e_pts": ([(t.edges, None)], t.n_edges),
            "e_vm(face->edge)": ([(t.edge_faces, t.edge_faces_mask)],
                                 t.n_edges),
            "e_cc": ([(t.edge_cells, t.edge_cells_mask)], t.n_edges),
            "r": ([(t.point_edges, t.point_edges_mask)], t.n_points),
        }
        print(f"== N={N}", flush=True)
        for name, (tabs, n_consumers) in stages.items():
            nb = -(-n_consumers // KB)
            blocks = block_sources(tabs, nb)
            line = f"  {name:18s}"
            for U, W in [(2048, 2), (2048, 4), (2048, 8),
                         (512, 8), (512, 16), (512, 24), (256, 16),
                         (256, 32)]:
                mx, mean, gr = sim(blocks, U, W)
                cov = U * W
                line += f" | U{U}xW{W}(cov{cov//1024}k):GR={gr}"
            print(line, flush=True)
            # detail for the chosen candidates
            for U, W in [(2048, 2), (512, 16), (256, 32)]:
                mx, mean, gr = sim(blocks, U, W)
                rows = nb * gr * LANES
                print(f"      U={U} W={W}: max_g={mx} mean_g={mean:.0f} "
                      f"GR={gr} rows={rows/1e6:.2f}M", flush=True)


if __name__ == "__main__":
    main()
