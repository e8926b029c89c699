"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The container's sitecustomize pins JAX to the axon TPU platform via env
vars *before* any conftest runs, so plain env overrides are ignored.
``jax.config.update`` after import (but before first backend use) still
works, as does XLA_FLAGS (read lazily at backend init). Real-TPU
behaviour is exercised by bench.py and the driver's compile checks, not
the unit suite.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="module", autouse=True)
def _release_compiled_programs():
    """Drop jit caches between test modules.

    XLA:CPU JIT-compiles every program into the process and never
    releases the code; after ~200 tests' worth of solver-scale
    programs the NEXT large compile segfaults inside
    _cached_compilation (LLVM JIT resource exhaustion — reproduced
    deterministically at the same test, and moved with the test count).
    Releasing executables per module keeps the whole suite comfortably
    under the limit at the cost of some cross-module recompiles.
    """
    yield
    jax.clear_caches()
