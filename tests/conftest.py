"""Test configuration: run everything on 8 fake CPU devices.

Per SURVEY.md SS4 "Distributed": ``xla_force_host_platform_device_count=8``
gives 8 virtual CPU devices so pjit sharding and collective math are tested
without TPU hardware; the same tests run unchanged on a real slice.
Must run before jax initialises, hence module-level in conftest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_debug_nans", False)
