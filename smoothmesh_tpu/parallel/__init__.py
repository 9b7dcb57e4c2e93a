from smoothmesh_tpu.parallel.partition import partition_cells, build_shards  # noqa: F401
from smoothmesh_tpu.parallel.sync import PointSync  # noqa: F401
