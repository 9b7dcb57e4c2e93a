"""f32 (TPU path) vs f64 (CPU reference path) drift study — VERDICT r1
item 6.

Runs the same mid-size mesh with ALL constraints through (a) the f64
CPU XLA path and (b) the f32 path (tile engine when on TPU, XLA
otherwise), for K iterations, and reports per-iteration max point
drift, freeze-set disagreements, and final quality-metric deltas.
Writes docs/f32_drift.md.

Run on TPU:  python experiments/f32_drift.py
(CPU f64 leg always runs on the host CPU backend.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

cache = os.path.expanduser("~/.jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

N = int(os.environ.get("N", "24"))
ITERS = int(os.environ.get("ITERS", "20"))


def run_leg(dtype, use_tile):
    import jax.numpy as jnp  # noqa: F401

    from smoothmesh_tpu.driver import Smoother
    from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
    from smoothmesh_tpu.params import SmoothingParams

    base = hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5))
    min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                      for a in range(3))
    mesh = perturb(base, amplitude=0.25 * min_spacing, seed=3)
    params = SmoothingParams(centroidal_iters=ITERS, rel_tol=0.0)
    sm = Smoother(mesh, params, dtype=dtype, use_tile_engine=use_tile)
    traj = []
    frozen_counts = []
    for _ in range(ITERS):
        r = sm.step()
        traj.append(sm.denormalize())
        frozen_counts.append(r.n_frozen)
    q = sm.quality()
    return traj, frozen_counts, q


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}")
    t64, f64c, q64 = run_leg(np.float64, use_tile=False)
    t32, f32c, q32 = run_leg(np.float32, use_tile=None)

    lines = [
        "# f32 (TPU path) vs f64 (CPU reference path) drift",
        "",
        f"Mesh: {N}^3 graded hex, 25%-of-min-spacing perturbation, all",
        f"default constraints, {ITERS} iterations.  f32 leg ran on "
        f"`{backend}` (tile engine auto); f64 leg on the XLA path.",
        "",
        "| iter | max point drift | n_frozen f64 | n_frozen f32 |",
        "|---|---|---|---|",
    ]
    for i, (a, b) in enumerate(zip(t64, t32)):
        d = np.abs(a - b).max()
        lines.append(f"| {i + 1} | {d:.3e} | {f64c[i]} | {f32c[i]} |")
    lines += ["", "Final quality metric deltas (f32 - f64):", ""]
    for k in sorted(set(q64) & set(q32)):
        try:
            dv = float(q32[k]) - float(q64[k])
        except (TypeError, ValueError):
            continue
        lines.append(f"- `{k}`: {float(q64[k]):.6g} -> "
                     f"{float(q32[k]):.6g} (delta {dv:+.3e})")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "f32_drift.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[-12:]))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
