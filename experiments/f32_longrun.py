"""Long-run f32-vs-f64 drift (VERDICT r2 weak #5 / item 6).

Extends docs/f32_drift.md beyond 20 iterations: run (a) the golden
tc3 constraint-stress case for its full 150-iteration parameter set,
and (b) the 24^3 bench-family mesh to relTol=0.02 convergence, each
with the f64 CPU XLA path (the oracle-pinned reference leg, in a CPU
subprocess — the axon TPU silently degrades f64) and the f32
tile-engine path on the TPU, comparing iterations-to-converge,
per-checkpoint residual/freeze trajectories, and final quality.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/f32_longrun.py
Single leg (used internally): ... f32_longrun.py leg <case> <f64|f32>
"""

import json
import os
import subprocess
import sys

import numpy as np


def build_case(name):
    from smoothmesh_tpu import testcases as tcs
    from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
    from smoothmesh_tpu.params import SmoothingParams

    if name == "tc3":
        tc = tcs.tc3()
        return tc.mesh, tc.params
    base = hex_block(n=(24, 24, 24), grading=(2.0, 1.0, 0.5))
    ms = min(np.diff(np.unique(base.points[:, a])).min()
             for a in range(3))
    return (perturb(base, amplitude=0.25 * ms, seed=3),
            SmoothingParams(centroidal_iters=2000, rel_tol=0.02))


def run_leg(case, f64: bool, out_path: str):
    import jax

    if f64:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from smoothmesh_tpu.driver import Smoother

    mesh, params = build_case(case)
    sm = Smoother(mesh, params,
                  dtype=np.float64 if f64 else np.float32,
                  use_tile_engine=False if f64 else None)
    traj = []
    done = 0
    while done < params.centroidal_iters:
        rs = sm.steps(min(params.centroidal_iters - done, 50))
        if not rs:
            break
        done += len(rs)
        traj.extend((r.iteration, r.residual, r.n_frozen) for r in rs)
        if rs[-1].residual < params.rel_tol:
            break
    q = sm.quality()
    np.save(out_path + ".npy", sm.denormalize())
    with open(out_path, "w") as f:
        json.dump({"traj": traj, "quality": q,
                   "device": str(jax.devices()[0])}, f, default=float)


def compare(case):
    legs = {}
    for leg in ("f64", "f32"):
        path = f"/tmp/longrun_{case}_{leg}.json"
        env = dict(os.environ)
        # The axon TPU tunnel occasionally drops with a transient
        # "TPU backend error (Internal)" mid-run; retry the whole leg.
        for attempt in range(3):
            try:
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "leg", case,
                     leg, path],
                    check=True, env=env,
                    cwd=os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__))))
                break
            except subprocess.CalledProcessError:
                if attempt == 2:
                    raise
                print(f"leg {case}/{leg} failed (attempt {attempt + 1}); "
                      "retrying", flush=True)
        with open(path) as f:
            legs[leg] = json.load(f)
        legs[leg]["pts"] = np.load(path + ".npy")
    t64, t32 = legs["f64"]["traj"], legs["f32"]["traj"]
    n = min(len(t64), len(t32))
    rows = []
    for i in sorted(set([0, 4, 9, 19, 49, 99, 149, 249, 499, 999, n - 1])):
        if 0 <= i < n:
            rows.append({"iter": t64[i][0],
                         "residual_f64": round(t64[i][1], 6),
                         "residual_f32": round(t32[i][1], 6),
                         "dfrozen": t32[i][2] - t64[i][2]})
    out = {
        "case": case,
        "device_f64": legs["f64"]["device"],
        "device_f32": legs["f32"]["device"],
        "iters_to_stop_f64": len(t64),
        "iters_to_stop_f32": len(t32),
        "final_point_drift": float(np.abs(
            legs["f32"]["pts"] - legs["f64"]["pts"]).max()),
        "max_abs_dfrozen": max(
            (abs(a[2] - b[2]) for a, b in zip(t64, t32)), default=0),
        "checkpoints": rows,
        "final_quality_f64": legs["f64"]["quality"],
        "final_quality_f32": legs["f32"]["quality"],
    }
    print(json.dumps(out, indent=1, default=float), flush=True)
    return out


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "leg":
        run_leg(sys.argv[2], sys.argv[3] == "f64", sys.argv[4])
        return
    results = [compare("tc3"), compare("bench24")]
    with open("/tmp/f32_longrun.json", "w") as f:
        json.dump(results, f, indent=1, default=float)


if __name__ == "__main__":
    main()
