"""Model registry.

The framework's "models" are its smoothing engines — the flagship
single-chip :class:`Smoother` and the multi-chip
:class:`ShardedSmoother` (domain-decomposition SPMD, this domain's
analog of data/tensor parallelism — SURVEY.md §2.3).
"""

from smoothmesh_tpu.driver import Smoother  # noqa: F401
from smoothmesh_tpu.parallel.sharded import ShardedSmoother  # noqa: F401

REGISTRY = {
    "smoother": Smoother,
    "sharded": ShardedSmoother,
}


def get_model(name: str):
    return REGISTRY[name]
