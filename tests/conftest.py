"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container registers an `axon` TPU platform via sitecustomize and pins
`jax_platforms` to it, so env vars alone don't stick — we override the config
after import, before any backend is initialised.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
