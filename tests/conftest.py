"""Test configuration: virtual 8-device CPU mesh + persistent compile cache.

The container registers an `axon` TPU platform via sitecustomize and pins
`jax_platforms` to it, so env vars alone don't stick — we override the config
after import, before any backend is initialised.

CPU XLA compiles of the tiny-but-structurally-complete models are the
dominant test cost (~minutes cold); the persistent compilation cache makes
re-runs near-instant.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
# silence XLA AOT cache-loading machine-feature warnings
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_TEST_CACHE_DIR", "/root/.cache/jax_test_comp_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
