"""Regression tests for the driver entry points (__graft_entry__.py).

Round 1's driver multichip check failed because dryrun_multichip
inherited the container's pinned axon TPU platform instead of forcing a
virtual CPU mesh (VERDICT.md Weak #1). These tests make sure both the
inline path (backend already an adequate CPU mesh — the conftest setup)
and the subprocess re-exec path (backend already initialised on an
inadequate platform — the driver scenario) can never silently regress.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_dryrun_multichip_inline():
    # conftest has already initialised an 8-device CPU backend, so this
    # exercises the in-process path end-to-end.
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_reexecs_when_backend_wrong():
    # Simulate the driver failure mode: the backend is already
    # initialised with too few devices when dryrun_multichip is called.
    # It must re-exec itself into a fresh process and still pass.
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1; "
        "import __graft_entry__ as g; g.dryrun_multichip(4)"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr
    assert "sharded CAVIaR ok" in res.stdout


def test_entry_compiles_and_runs():
    """The driver's single-chip compile check must never break: jit
    entry()'s step end-to-end (CPU falls back to the XLA kernels; the
    caviar data-tuple change once broke only this path because nothing
    exercised it)."""
    import jax
    import numpy as np

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    leaves = jax.tree_util.tree_leaves(out)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_trial_mesh_rejects_too_few_devices():
    from circuitmap_tpu.parallel import trial_mesh

    with pytest.raises(ValueError, match="needs 99 devices"):
        trial_mesh(99)
