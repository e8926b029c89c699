"""Tests: ARD experimental solver + ELBO diagnostics."""

import numpy as np
import pytest

from circuitmap_tpu.model import Model, default_priors
from circuitmap_tpu.simulation import simulate
from circuitmap_tpu.solvers.experimental import mbcs_ard
from circuitmap_tpu.solvers.diagnostics import elbo_components, elbo_trajectory
from circuitmap_tpu.utils.metrics import r2_score


@pytest.fixture(scope="module")
def sim():
    np.random.seed(13)
    return simulate(N=30, trials=400, H=3, connection_prob=0.15,
                    spont_prob=0.0, gp_scale=1e-3, verbose=False)


class TestArd:
    def test_recovery_and_sparsity(self, sim):
        mu, beta, relevance, lam, sigma2, z = mbcs_ard(
            sim["psc"], sim["stim_matrix"], iters=30, verbose=False
        )
        mu = np.asarray(mu)
        true = sim["weights"]
        # ARD drives irrelevant weights towards zero via relevance
        assert r2_score(true, mu * (np.abs(mu) > 0.5)) > 0.6
        rel = np.asarray(relevance)
        # disconnected neurons should carry much higher relevance precision
        disc = true == 0
        assert np.median(rel[disc]) > 10 * np.median(rel[~disc])
        assert float(sigma2) > 0


class TestElbo:
    def test_components_finite_and_entropy_positive(self, sim):
        model = Model(30)
        model.fit(sim["psc"], sim["stim_matrix"], method="caviar",
                  fit_options={"iters": 10, "verbose": False,
                               "fn_scan": False})
        y = np.trapezoid(sim["psc"], axis=-1)
        comps = elbo_components(y, sim["stim_matrix"], model.state,
                                default_priors(30))
        assert np.isfinite(comps["elbo"])
        assert comps["spike_entropy"] >= 0
        assert comps["kl_weights"] >= 0
        assert comps["kl_noise"] >= 0

    def test_trajectory_improves(self, sim):
        model = Model(30)
        model.fit(sim["psc"], sim["stim_matrix"], method="caviar",
                  fit_options={"iters": 12, "verbose": False,
                               "fn_scan": False, "save_histories": True})
        y = np.trapezoid(sim["psc"], axis=-1)
        traj = elbo_trajectory(y, sim["stim_matrix"], model.history,
                               default_priors(30))
        elbos = [t["elbo"] for t in traj]
        assert len(elbos) == 12
        # variational fits should improve the bound overall
        assert elbos[-1] > elbos[0]
