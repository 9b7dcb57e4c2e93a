from smoothmesh_tpu.mesh.blockmesh import hex_block  # noqa: F401
from smoothmesh_tpu.mesh.topology import MeshTopology, compile_topology  # noqa: F401
