"""Profile one batched dispatch at 64^3 and print top ops by self time.

Round-3 lever 1: the measured ~40 ms/iter gap between chained stages
(60.4 ms) and the batched dispatch (~109 ms) is unexplained.  This
captures an xplane trace of the steady-state planar fori batch and
aggregates device op self-times via tensorboard_plugin_profile.
"""

import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

cache = os.path.expanduser("~/.jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from smoothmesh_tpu.driver import Smoother  # noqa: E402
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb  # noqa: E402
from smoothmesh_tpu.params import SmoothingParams  # noqa: E402

N = int(os.environ.get("N", "64"))
LOGDIR = os.environ.get("LOGDIR", "/tmp/smprof")
BOUNDARY = os.environ.get("BOUNDARY") == "1"   # bench boundary mode
STRESS = os.environ.get("STRESS") == "1"       # bench stress mode

patches = ({"top": ["zmax"],
            "rest": ["xmin", "xmax", "ymin", "ymax", "zmin"]}
           if BOUNDARY else "default")
base = hex_block(n=(N, N, N), grading=(2.0, 1.0, 0.5), patches=patches)
min_spacing = min(np.diff(np.unique(base.points[:, a])).min()
                  for a in range(3))
mesh = perturb(base,
               amplitude=(0.6 if STRESS else 0.25) * min_spacing, seed=3)
if BOUNDARY:
    import bench

    params = SmoothingParams(centroidal_iters=1, rel_tol=0.0,
                             smoothing_patches=("top",),
                             layer_patches=("top",),
                             min_angle=15.0, ray_miss_fatal=False)
elif STRESS:
    params = SmoothingParams(centroidal_iters=1, rel_tol=0.0,
                             min_angle=15.0)
else:
    params = SmoothingParams(centroidal_iters=1, rel_tol=0.0)
sm = Smoother(mesh, params, dtype=np.float32)
if BOUNDARY:
    sm.enable_boundary_smoothing(*bench._dome_geometry())

# warm up: compile + 2 steady dispatches
sm.steps(sm.iter_batch)
sm.steps(sm.iter_batch)
print("warm; tracing one dispatch", flush=True)

os.makedirs(LOGDIR, exist_ok=True)
with jax.profiler.trace(LOGDIR):
    rs = sm.steps(sm.iter_batch)
    jax.block_until_ready(sm.points)
print(f"dispatch wall: {sum(r.wall_ms for r in rs):.1f} ms "
      f"({len(rs)} iters)", flush=True)

# ---- parse the trace ----
files = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"),
                  recursive=True)
files.sort(key=os.path.getmtime)
xplane = files[-1]
print("xplane:", xplane)


os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

xs = xplane_pb2.XSpace()
xs.ParseFromString(open(xplane, "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    ev_names = dict(plane.event_metadata)
    agg = {}
    for line in plane.lines:
        for ev in line.events:
            md = ev_names.get(ev.metadata_id)
            name = md.name if md else str(ev.metadata_id)
            a = agg.setdefault((line.name, name), [0, 0])
            a[0] += ev.duration_ps
            a[1] += 1
    print(f"\n== plane {plane.name}")
    print(f"{'ms':>9} {'count':>6}  line | op")
    for (ln, name), (ps, cnt) in sorted(
            agg.items(), key=lambda kv: -kv[1][0])[:70]:
        print(f"{ps/1e9:9.3f} {cnt:>6}  {ln[:14]} | {name[:100]}")
