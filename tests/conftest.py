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

import gc  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Executable-map guard (round 4, VERDICT r3 item 1). Root cause of the
# full-suite SIGSEGV/SIGABRT at ~40 min: every XLA-CPU-compiled executable
# holds a few mmap'd JIT-code regions for as long as it lives in jax's
# global jit caches; a full run accumulates tens of thousands of maps and
# crosses the kernel's per-process limit (`vm.max_map_count` = 65530 here),
# after which the next mmap inside LLVM fails and the process aborts with
# no Python-level error (measured: run died at 64.4k maps, in whatever test
# compiled next — hence the "order-dependent" crash location). The guard
# clears the caches (which releases the maps — verified) whenever the
# process approaches the limit; cost is a handful of recompiles per run.
_MAP_GUARD_THRESHOLD = 35_000


@pytest.fixture(autouse=True)
def _executable_map_guard():
    yield
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > _MAP_GUARD_THRESHOLD:
        jax.clear_caches()
        gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
