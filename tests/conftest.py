"""Test configuration: run everything on 8 fake CPU devices.

Per SURVEY.md SS4 "Distributed": ``xla_force_host_platform_device_count=8``
gives 8 virtual CPU devices so pjit sharding and collective math are tested
without TPU hardware; the same tests run unchanged on a real slice.
Must run before jax initialises, hence module-level in conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) forces jax_platforms="axon,cpu" via the
# config API, which outranks the env var — force it back to pure CPU so the
# 8 fake devices materialise.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", False)

assert jax.device_count() == 8, (
    f"expected 8 fake CPU devices, got {jax.devices()} — check XLA_FLAGS"
)
