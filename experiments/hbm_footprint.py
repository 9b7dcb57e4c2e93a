#!/usr/bin/env python
"""Estimate device HBM footprint of a Smoother at a given N_side.

Builds the full single-chip Smoother on CPU (no TPU traffic) and sums
the nbytes of every array the jitted step consumes (points, topology
dict, engine arrays).  Linear-in-points extrapolation from two sizes
gives the 216^3 (10.08M-cell) fit check before committing hours to the
upload (CLAUDE.md lever 4 / VERDICT r2 item 2 stretch).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/hbm_footprint.py [n_side ...]
"""
import sys

import numpy as np


def measure(n_side: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from smoothmesh_tpu.driver import Smoother
    from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
    from smoothmesh_tpu.params import SmoothingParams

    base = hex_block(n=(n_side,) * 3, grading=(2.0, 1.0, 0.5))
    min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                      for a in range(3))
    mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
    sm = Smoother(mesh, SmoothingParams(centroidal_iters=1, rel_tol=0.0),
                  dtype=np.float32, use_tile_engine=True)

    def nb(x):
        try:
            return x.nbytes
        except AttributeError:
            return 0

    td = sum(nb(v) for v in sm.td.values())
    eng = (sum(nb(v) for v in sm.engine.arrays.values())
           if sm.engine is not None else 0)
    pts = nb(sm.points) + nb(sm.smoothing_surface) + nb(sm.normals)
    per_key = sorted(
        [(k, nb(v)) for k, v in
         (list(sm.td.items())
          + (list(sm.engine.arrays.items()) if sm.engine else []))],
        key=lambda kv: -kv[1])[:12]
    return {"n_side": n_side, "n_points": sm.topo.n_points,
            "td_bytes": td, "engine_bytes": eng, "state_bytes": pts,
            "total_bytes": td + eng + pts, "top": per_key}


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [48, 64]
    rows = [measure(n) for n in sizes]
    for r in rows:
        print(f"N={r['n_side']}^3 pts={r['n_points']:,} "
              f"td={r['td_bytes']/2**20:,.1f}MB "
              f"engine={r['engine_bytes']/2**20:,.1f}MB "
              f"total={r['total_bytes']/2**20:,.1f}MB "
              f"({r['total_bytes']/r['n_points']:.1f} B/pt)")
        for k, v in r["top"]:
            print(f"    {k:<16} {v/2**20:9.1f} MB")
    if len(rows) >= 2:
        a, b = rows[-2], rows[-1]
        slope = ((b["total_bytes"] - a["total_bytes"])
                 / (b["n_points"] - a["n_points"]))
        icept = b["total_bytes"] - slope * b["n_points"]
        for target in (192, 216):
            npts = (target + 1) ** 3
            est = slope * npts + icept
            print(f"extrapolate N={target}^3 ({npts:,} pts): "
                  f"{est/2**30:.2f} GB")


if __name__ == "__main__":
    main()
