from smoothmesh_tpu.ops.smoothing import (  # noqa: F401
    centroidal_smoothing,
    aspect_ratio_smoothing,
    constrain_max_step_length,
    calculate_residual,
)
from smoothmesh_tpu.ops.constraints import (  # noqa: F401
    restrict_edge_shortening,
    restrict_min_edge_angle_decrease,
    restrict_face_angle_deterioration,
)
