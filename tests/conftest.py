"""Test bootstrap: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4). The env must be set
before any JAX backend initializes; the sitecustomize in this image imports
jax at interpreter start but does not initialize backends, so overriding here
works as long as no test module touched a device at import time.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    ds = jax.devices()
    assert len(ds) == 8, f"expected 8 virtual CPU devices, got {ds}"
    return ds
