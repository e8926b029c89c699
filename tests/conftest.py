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

# ---------------------------------------------------------------------------
# Test tiers. The FULL suite is the merge gate (green mandatory per
# session — CLAUDE.md); the fast tier is the iteration gate:
#
#     python -m pytest tests/ -q -m "not slow"      (4m48s, 296 tests)
#     python -m pytest tests/ -q                    (~34 min, 492 tests)
#
# 'slow' is the union of two rules:
#   * categorical (module/class lists below): reference-parity shims
#     (x64 oracle fits), subprocess/gloo bootstraps, subprocess
#     fit-server rounds, executed notebooks, demixer training — slow
#     by construction, so FUTURE tests in those files/classes are
#     caught automatically;
#   * measured (tests/slow_tests.txt): every test that cost >= 4 s on
#     the single-core CI host in the full-suite duration run — the
#     long tail of cross-impl equality fits. The file's header says
#     how to regenerate it; at the 4 s threshold every solver, kernel,
#     wire, and subsystem keeps at least one fast representative
#     (verified per-module when the list was cut; one ELBO test is
#     hand-kept fast since all its siblings crossed the threshold).
# ---------------------------------------------------------------------------

_SLOW_MODULES = {
    "test_reference_parity",  # patched-reference oracle fits (x64)
    "test_distributed",       # 2-process gloo subprocess bootstraps
    "test_examples",          # executes the committed notebooks
    "test_hw_smoke",          # subprocess probe harness
}

_SLOW_CLASSES = {
    # subprocess fit-server rounds (each spawns a daemon + compiles)
    ("test_serve", "TestServer"),
    ("test_serve", "TestMeshServer"),
    ("test_serve", "TestClosedLoopDesign"),
    ("test_serve", "TestAuthToken"),
    ("test_serve", "TestMetricsLog"),
    ("test_serve", "TestRunMainAgainstServer"),
    ("test_serve", "TestStreamPersistence"),
    ("test_demixer", "TestTraining"),
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: expensive tests (parity shims, subprocesses, notebooks,"
        " training) — excluded from the fast gate -m 'not slow'")


def _measured_slow_ids():
    import pathlib

    path = pathlib.Path(__file__).parent / "slow_tests.txt"
    ids = set()
    try:
        for ln in path.read_text().splitlines():
            ln = ln.split("#", 1)[0].strip()
            if ln:
                ids.add(ln)
    except OSError:
        pass
    return ids


def pytest_collection_modifyitems(config, items):
    measured = _measured_slow_ids()
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        cls = item.cls.__name__ if item.cls is not None else ""
        if (mod in _SLOW_MODULES or (mod, cls) in _SLOW_CLASSES
                or item.nodeid in measured):
            item.add_marker(pytest.mark.slow)


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
