"""Test config: run on CPU with 8 virtual devices so sharding tests work
without TPU hardware; keep f64 (FrontISTR parity requires it).

The container's sitecustomize force-registers the axon TPU backend and
overwrites JAX_PLATFORMS at interpreter startup, so we must override through
jax.config (reliable) in addition to the env var.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted")
