"""smoothmesh_tpu — a TPU-native unstructured-mesh smoothing engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
tkeskita/smoothMesh (an OpenFOAM mesh-quality-improvement utility,
reference at /root/reference): iterative centroidal smoothing of 3D
polyhedral mesh points with aspect-ratio midpoint blending, heuristic
quality-control freezes (edge length / edge angle / face angle),
orthogonal boundary-layer blending and boundary-point projection onto
target surface/edge meshes — all without changing mesh topology.

Architecture (TPU-first, not a port):
  - ``io``        host-side OpenFOAM polyMesh + OBJ readers/writers
  - ``mesh``      mesh generation (blockMesh-style hex blocks) and the
                  topology compiler that turns a polyMesh into padded
                  int32 index arrays + masks (static shapes for XLA)
  - ``geometry``  on-device geometry: OpenFOAM-compatible face/cell
                  centres recomputed each iteration from points
  - ``ops``       the smoothing + constraint kernels (vectorized JAX,
                  Pallas for the fused hot paths)
  - ``parallel``  mesh partitioner + shared-point halo combines over a
                  ``jax.sharding.Mesh`` (the TPU analog of OpenFOAM's
                  syncTools::syncPointList over MPI)
  - ``driver``    the jitted iteration loop, convergence, checkpointing
  - ``quality``   checkMesh-equivalent mesh-quality metrics
  - ``cli``       the reference-compatible command-line interface
"""

__version__ = "0.1.0"

from smoothmesh_tpu.params import SmoothingParams  # noqa: F401
