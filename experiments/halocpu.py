"""Dense-halo boundary+layer per-iteration timing at D=1/2/4/8 virtual
CPU shards (VERDICT r4 item 5: "first measure what exists: 64^3
boundary+layer halo at 2/4/8 virtual shards (CPU is fine)").

The engine-less dense path is what a CPU backend would actually run
(interpret-mode Pallas is not a real datapoint), so use_tile_engine is
False here; the on-device D=1 number (bench.py SMOOTHMESH_BENCH_BOUNDARY
+ SMOOTHMESH_BENCH_SHARDED) covers the engine leg.

Usage:  python experiments/halocpu.py [N_SIDE] [shard counts...]
Env:    HALOCPU_ITERS (default 8; dense CPU iterations are ~seconds)
"""

import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb  # noqa: E402
from smoothmesh_tpu.params import SmoothingParams  # noqa: E402
from smoothmesh_tpu.parallel.halo import HaloSmoother  # noqa: E402

sys.path.insert(0, "/root/repo")


def dome_geometry():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    return bench._dome_geometry()


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    shard_counts = ([int(a) for a in sys.argv[2:]]
                    if len(sys.argv) > 2 else [1, 2, 4, 8])
    iters = int(os.environ.get("HALOCPU_ITERS", "8"))

    patches = {"top": ["zmax"],
               "rest": ["xmin", "xmax", "ymin", "ymax", "zmin"]}
    base = hex_block(n=(n_side,) * 3, grading=(2.0, 1.0, 0.5),
                     patches=patches)
    min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                      for a in range(3))
    mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
    geo = dome_geometry()

    out = {"n_side": n_side, "n_points": mesh.n_points, "iters": iters,
           "mode": "boundary+layers dense halo (engine-less, f32)",
           "per_shard_count": {}}
    for D in shard_counts:
        params = SmoothingParams(
            centroidal_iters=iters, rel_tol=0.0,
            smoothing_patches=("top",), layer_patches=("top",),
            min_angle=15.0, ray_miss_fatal=False)
        t0 = time.time()
        sm = HaloSmoother(mesh, params, n_devices=D,
                          use_tile_engine=False, dtype=np.float32)
        sm.enable_boundary_smoothing(*geo)
        setup_s = time.time() - t0
        # iter_batch must divide the measured window (partial windows
        # compute a full batch)
        sm.iter_batch = min(sm.iter_batch, iters)
        t0 = time.time()
        sm.steps(sm.iter_batch)
        warm_s = time.time() - t0
        windows = []
        r = None
        for _ in range(3):
            t0 = time.time()
            r = sm.steps(iters)[-1]
            jax.block_until_ready(sm.points_dense)
            windows.append(time.time() - t0)
        best = min(windows)
        out["per_shard_count"][D] = {
            "setup_s": round(setup_s, 1),
            "warmup_s": round(warm_s, 1),
            "window_s": [round(w, 2) for w in windows],
            "per_iter_ms": round(1e3 * best / iters, 1),
            "points_per_s": round(mesh.n_points * iters / best, 1),
            "final_residual": float(r.residual),
        }
        print(json.dumps({str(D): out["per_shard_count"][D]}),
              flush=True)
        del sm
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
