from smoothmesh_tpu.utils.debug import export_edges_as_stl  # noqa: F401
