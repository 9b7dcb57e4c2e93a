"""Test configuration: run on CPU with 8 virtual devices and float64.

Mirrors the reference's testing model (SURVEY.md §4): distributed
behaviour is exercised with local virtual devices standing in for a
real multi-chip mesh, just as the reference uses `mpirun -np 3` on one
machine to stand in for a cluster.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Hard override: the ambient axon site customization pins
# jax_platforms=axon (the TPU tunnel) regardless of the environment
# variable; the TPU silently degrades float64, so tests must force the
# real CPU backend through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
