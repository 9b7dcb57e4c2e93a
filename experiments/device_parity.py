"""On-device engine-vs-XLA parity (VERDICT r2 weak #7 / item 10).

The tile engine's Pallas kernels are semantics-tested in interpret
mode on CPU (tests/test_tiledstep.py); this script closes the
Mosaic-vs-interpret gap by running ONE full default-constraint
iteration both ways on the REAL TPU from identical f32 inputs and
comparing the results.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/device_parity.py
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from smoothmesh_tpu.driver import Smoother
    from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
    from smoothmesh_tpu.params import SmoothingParams

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    base = hex_block(n=(n, n, n), grading=(2.0, 1.0, 0.5))
    min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                      for a in range(3))
    mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
    params = SmoothingParams(centroidal_iters=2, rel_tol=0.0)

    out = {}
    pts = {}
    for engine in (True, False):
        sm = Smoother(mesh, params, dtype=np.float32,
                      use_tile_engine=engine)
        sm.iter_batch = 1
        t0 = time.time()
        rs = sm.steps(2)
        pts[engine] = sm.denormalize()
        out["engine" if engine else "xla"] = {
            "residuals": [r.residual for r in rs],
            "n_frozen": [r.n_frozen for r in rs],
            "wall_s": round(time.time() - t0, 2),
            "backend": str(jax.devices()[0]),
        }

    scale = float(np.abs(pts[True]).max())
    diff = float(np.abs(pts[True] - pts[False]).max())
    out["max_point_diff"] = diff
    out["rel_diff"] = diff / scale
    out["frozen_match"] = (out["engine"]["n_frozen"]
                           == out["xla"]["n_frozen"])
    print(json.dumps(out, indent=1))
    # documented cross-path f32 bound (docs/f32_drift.md: ~1e-6/step
    # relative noise between formulations)
    assert out["rel_diff"] < 1e-4, out
    assert out["frozen_match"], out
    print("DEVICE PARITY OK")


if __name__ == "__main__":
    main()
