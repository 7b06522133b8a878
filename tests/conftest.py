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
# (jax_debug_nans stays at its default False here; the sanitizer tier —
# tests/test_sanitizers.py — enables it locally where it is the subject.)

# Persistent XLA compilation cache: the test host has ONE core and a full
# D0 forward costs ~45-70 s to compile, which dominates the fast tier. With
# the on-disk cache, warm `pytest -q` runs skip every recompile (cold run
# after a model change still pays for the changed graphs only).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.device_count() == 8, (
    f"expected 8 fake CPU devices, got {jax.devices()} — check XLA_FLAGS"
)

import dataclasses  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def slim_d0():
    """One shared jitted-init detector for compile-heavy fast-tier tests.

    Full B0 backbone, slim BiFPN/heads (width 16, depth 2), 128px, 6
    classes. Session-scoped + jitted so the ~45 s init compile happens at
    most once per run and not at all on warm runs (persistent cache).
    Returns (model, cfg, variables).
    """
    import jax.numpy as jnp

    from efficientdet_tpu.configs import ModelConfig
    from efficientdet_tpu.models.detector import EfficientDet

    cfg = ModelConfig.for_phi(0, num_classes=6, image_size=128)
    cfg = dataclasses.replace(
        cfg, bifpn_width=16, bifpn_depth=2, head_depth=2
    )
    model = EfficientDet(config=cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )
    return model, cfg, variables
