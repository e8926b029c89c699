"""MBCS solver tests: FISTA lasso, isotonic receptive fields, recovery."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuitmap_tpu.simulation import simulate
from circuitmap_tpu.model import Model
from circuitmap_tpu.solvers.mbcs import (
    _fista_lasso,
    update_receptive_fields,
    isotonic_filtering,
)
from circuitmap_tpu.utils.metrics import r2_score


class TestFista:
    def test_recovers_sparse_positive(self, rng):
        K, N = 200, 40
        A = rng.random((K, N)) * (rng.random((K, N)) > 0.7)
        x = np.zeros(N)
        x[rng.choice(N, 5, replace=False)] = rng.uniform(5, 20, 5)
        y = A @ x + 0.01 * rng.normal(size=K)
        got = np.asarray(
            _fista_lasso(
                jnp.asarray(A, jnp.float32), jnp.asarray(y, jnp.float32),
                jnp.zeros(N, jnp.float32), jnp.asarray(1e-3, jnp.float32),
                max_iters=500, positive=True,
            )
        )
        assert np.all(got >= 0)
        assert r2_score(x, got) > 0.9

    def test_penalty_shrinks_support(self, rng):
        K, N = 100, 20
        A = rng.random((K, N)).astype(np.float32)
        y = (A @ rng.random(N)).astype(np.float32)
        weak = np.asarray(_fista_lasso(jnp.asarray(A), jnp.asarray(y),
                                       jnp.zeros(N, jnp.float32),
                                       jnp.asarray(1e-4, jnp.float32)))
        strong = np.asarray(_fista_lasso(jnp.asarray(A), jnp.asarray(y),
                                         jnp.zeros(N, jnp.float32),
                                         jnp.asarray(1.0, jnp.float32)))
        assert (strong != 0).sum() <= (weak != 0).sum()


class TestReceptiveFields:
    def test_monotone_and_bounded(self, rng):
        N, K = 6, 120
        powers = np.array([0.0, 45.0, 55.0, 65.0])
        stim = powers[rng.integers(0, 4, (N, K))]
        lam = rng.random((N, K)) * (stim > 0)
        rf, prior = update_receptive_fields(jnp.asarray(lam, jnp.float32),
                                            jnp.asarray(stim, jnp.float32),
                                            powers)
        rf = np.asarray(rf)
        assert rf.shape == (N, 4)
        assert np.all(np.diff(rf, axis=1) >= -1e-6)
        assert rf.min() >= 0 and rf.max() <= 1
        prior = np.asarray(prior)
        assert prior.shape == (N, K)
        # prior at zero-power trials equals rf at the zero knot
        np.testing.assert_allclose(prior[stim == 0],
                                   np.repeat(rf[:, 0], K)[
                                       (stim == 0).reshape(-1)], atol=1e-6)

    def test_filtering(self):
        mu = jnp.asarray([1.0, 2.0, 3.0])
        lam = jnp.asarray([[0.9, 0.9], [0.1, 0.1], [0.9, 0.0]])
        rf = jnp.asarray([[0.0, 0.5], [0.0, 0.5], [0.0, 0.1]])
        mu2, lam2 = isotonic_filtering(mu, lam, rf, minimum_spike_count=1,
                                       minimum_maximal_spike_prob=0.2)
        mu2 = np.asarray(mu2)
        assert mu2[0] == 1.0      # passes both
        assert mu2[1] == 0.0      # too few confident spikes
        assert mu2[2] == 0.0      # rf at max power too low


class TestMbcsEndToEnd:
    def test_recovery(self):
        np.random.seed(7)
        sim = simulate(N=30, trials=400, H=3, connection_prob=0.15,
                       spont_prob=0.0, gp_scale=1e-3, verbose=False)
        model = Model(30)
        model.fit(
            sim["psc"], sim["stim_matrix"], method="mbcs",
            fit_options={"iters": 10, "verbose": False, "seed": 0},
        )
        mu = model.state["mu"]
        true = sim["weights"]
        # MBCS is the legacy solver; expect decent but not CAVIaR-level fits
        assert r2_score(true, mu) > 0.5
        assert model.state["receptive_fields"].shape == (30, 4)
        assert model.history["mu"].shape == (10, 30)

    def test_analytic_noise_recovery(self):
        # exact-moments noise model: same fit quality, deterministic
        np.random.seed(7)
        sim = simulate(N=30, trials=400, H=3, connection_prob=0.15,
                       spont_prob=0.0, gp_scale=1e-3, verbose=False)
        model = Model(30)
        model.fit(
            sim["psc"], sim["stim_matrix"], method="mbcs",
            fit_options={"iters": 10, "verbose": False, "seed": 0,
                         "analytic_noise": True},
        )
        assert r2_score(sim["weights"], model.state["mu"]) > 0.5


class TestAnalyticNoiseMoments:
    def test_matches_mc_at_large_s(self):
        # the closed form is the S -> inf limit of update_noise_mc
        import jax
        from circuitmap_tpu.solvers.mbcs import (update_noise_analytic,
                                                 update_noise_mc)

        rng = np.random.default_rng(3)
        N, K = 25, 200
        lam = jnp.asarray(rng.uniform(0, 1, (N, K)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal(K).astype(np.float32))
        mu = jnp.asarray(
            (rng.standard_normal(N) * (rng.random(N) < 0.5)).astype(
                np.float32)
        )
        beta = jnp.asarray(rng.uniform(0.05, 0.2, N).astype(np.float32))
        sh_a, ra_a = update_noise_analytic(y, mu, beta, lam)
        sh_m, ra_m = update_noise_mc(jax.random.PRNGKey(0), y, mu, beta,
                                     lam, num_mc_samples=4000)
        # MC error at S=4000 ~ 1/sqrt(S); compare relative
        np.testing.assert_allclose(np.asarray(sh_a), np.asarray(sh_m),
                                   rtol=0.1, atol=0.05)
        np.testing.assert_allclose(np.asarray(ra_a), np.asarray(ra_m),
                                   rtol=0.1, atol=0.05)
