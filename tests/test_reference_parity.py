"""Numerical parity against the actual reference implementation.

Loads the reference's solver modules directly from /root/reference
(read-only mount) through a shim package — bypassing its package
__init__, which needs pytorch-lightning — and compares fits on
identical data. Skipped when the reference tree is unavailable.

These tests pin down that the rebuild is the same *algorithm*, not just
a similar one: same PAVA pools, same per-update math, closely matching
posterior trajectories despite f32-vs-f64 and a different (equivalent)
Monte-Carlo estimator.
"""

import os
import shutil
import sys

import numpy as np
import pytest

from circuitmap_tpu.model import default_priors
from circuitmap_tpu.simulation import simulate
from circuitmap_tpu.utils.metrics import r2_score

REF = "/root/reference/circuitmap/optimise"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_pkg(tmp_path_factory):
    """Shim package exposing the reference solvers without its heavy deps."""
    root = tmp_path_factory.mktemp("refshim")
    pkg = root / "ref_optimise"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    for f in ("caviar.py", "pava.py", "cavi_sns.py"):
        shutil.copy(os.path.join(REF, f), pkg / f)
    # The reference's cavi_sns is unrunnable as shipped: update_lam's
    # loop body unpacks the PRNG key as ``current_key`` but then reads
    # and splits ``key`` (cavi_sns.py:138,146) — an UnboundLocalError on
    # any Python. Apply the evident one-line fix so the intended
    # algorithm can serve as the parity oracle.
    sns = (pkg / "cavi_sns.py").read_text()
    sns = sns.replace(
        "\t\tlam_vector, current_key = carry\n",
        "\t\tlam_vector, key = carry\n",
    )
    (pkg / "cavi_sns.py").write_text(sns)
    sys.path.insert(0, str(root))
    # importing the reference caviar module executes its module-level
    # ``config.update("jax_enable_x64", True)`` (reference caviar.py:12),
    # a process-global switch; restore the pre-import state afterwards so
    # the rest of the suite keeps its intended f32 semantics.
    import jax

    x64_before = jax.config.jax_enable_x64
    yield "ref_optimise"
    sys.path.remove(str(root))
    jax.config.update("jax_enable_x64", x64_before)


@pytest.fixture(scope="module")
def sim():
    np.random.seed(21)
    return simulate(N=30, trials=400, H=3, connection_prob=0.12,
                    spont_prob=0.01, gp_scale=1e-3, verbose=False)


class TestPavaParity:
    def test_isotonic_matches_reference(self, ref_pkg, rng):
        import importlib

        ref_pava = importlib.import_module(f"{ref_pkg}.pava")
        import jax.numpy as jnp
        from circuitmap_tpu.ops.pava import isotonic_regression

        for n in (2, 3, 5, 9):
            for _ in range(5):
                y = rng.normal(size=n)
                want = np.asarray(ref_pava._isotonic_regression(jnp.asarray(y)))
                got = np.asarray(isotonic_regression(jnp.asarray(y)))
                np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_gamma_variant_matches(self, ref_pkg, rng):
        import importlib

        ref_pava = importlib.import_module(f"{ref_pkg}.pava")
        import jax.numpy as jnp
        from circuitmap_tpu.ops.pava import isotonic_regression

        y = rng.normal(size=6)
        want = np.asarray(ref_pava._isotonic_regression(jnp.asarray(y), gamma=0.8))
        got = np.asarray(isotonic_regression(jnp.asarray(y), 0.8))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestCaviarParity:
    def test_posterior_agreement(self, ref_pkg, sim):
        """Ten CAVI iterations on identical data: same connectivity
        support, near-identical weights."""
        import importlib

        ref_caviar = importlib.import_module(f"{ref_pkg}.caviar")
        from circuitmap_tpu.solvers import caviar

        p = default_priors(30)
        ref_out = ref_caviar.caviar(
            sim["psc"], sim["stim_matrix"], p["mu"], p["beta"], p["shape"],
            p["rate"], p["phi"], p["phi_cov"], iters=10, fn_scan=False, seed=0,
        )
        our_out = caviar(
            sim["psc"], sim["stim_matrix"], p["mu"], p["beta"], p["shape"],
            p["rate"], p["phi"], p["phi_cov"], iters=10, fn_scan=False,
            seed=0, verbose=False,
        )
        mu_ref, mu_ours = np.asarray(ref_out[0]), np.asarray(our_out[0])
        lam_ref, lam_ours = np.asarray(ref_out[2]), np.asarray(our_out[2])

        assert r2_score(mu_ref, mu_ours) > 0.95
        np.testing.assert_array_equal(mu_ref != 0, mu_ours != 0)
        # spike posteriors agree in aggregate
        assert np.abs(lam_ref.mean() - lam_ours.mean()) < 0.02
        assert np.corrcoef(lam_ref.ravel(), lam_ours.ravel())[0, 1] > 0.95

    def test_noise_posterior_agreement(self, ref_pkg, sim):
        import importlib

        ref_caviar = importlib.import_module(f"{ref_pkg}.caviar")
        from circuitmap_tpu.solvers import caviar

        p = default_priors(30)
        ref_out = ref_caviar.caviar(
            sim["psc"], sim["stim_matrix"], p["mu"], p["beta"], p["shape"],
            p["rate"], p["phi"], p["phi_cov"], iters=5, fn_scan=False, seed=0,
        )
        our_out = caviar(
            sim["psc"], sim["stim_matrix"], p["mu"], p["beta"], p["shape"],
            p["rate"], p["phi"], p["phi_cov"], iters=5, fn_scan=False,
            seed=0, verbose=False,
        )
        # shape is deterministic (prior + K/2); rate is data-dependent
        assert float(ref_out[3]) == pytest.approx(float(our_out[3]))
        assert float(ref_out[4]) == pytest.approx(float(our_out[4]), rel=0.05)


class TestSnsParity:
    def test_posterior_agreement(self, ref_pkg, sim):
        import importlib

        ref_sns = importlib.import_module(f"{ref_pkg}.cavi_sns")
        from circuitmap_tpu.solvers import cavi_sns

        p = default_priors(30)
        ref_out = ref_sns.cavi_sns(
            sim["psc"], sim["stim_matrix"], p["mu"], p["beta"], p["alpha"],
            p["shape"], p["rate"], p["phi"], p["phi_cov"], iters=10,
            seed=1, save_histories=False,
        )
        our_out = cavi_sns(
            sim["psc"], sim["stim_matrix"], p["mu"], p["beta"], p["alpha"],
            p["shape"], p["rate"], p["phi"], p["phi_cov"], iters=10,
            seed=1, save_histories=False, verbose=False,
        )
        w_ref = np.asarray(ref_out[0]) * np.asarray(ref_out[2])
        w_ours = np.asarray(our_out[0]) * np.asarray(our_out[2])
        assert r2_score(w_ref, w_ours) > 0.9
