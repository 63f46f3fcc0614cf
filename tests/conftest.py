"""Test configuration: force an 8-device virtual CPU mesh and float64.

Tests never touch the real TPU chip — sharding is exercised on a virtual CPU
mesh (`xla_force_host_platform_device_count=8`), and golden-value numerics run
in float64 (which CPU executes natively). Production/bench paths run float32
on TPU; dtype-sensitive tests assert both.
"""

import os

# The harness boots with JAX_PLATFORMS=axon and a sitecustomize that calls
# jax.config.update("jax_platforms", "axon,cpu") — env vars alone cannot
# override it, so force the config back to CPU after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
