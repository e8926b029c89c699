"""The one-launch Pallas Newton kernel must match the XLA Laplace refit.

The kernel (ops/laplace_pallas.py) reproduces solvers/_laplace's damped
Newton + Armijo recursion with neurons along lanes. f32 op-order
differences (sequential vs tree reductions, FMA contraction) can flip
razor-edge Armijo acceptances on adversarial random stats, so the
standalone comparison is tolerance-based and anchored to f64 truth —
the kernel was measured CLOSER to f64 than the XLA f32 path on both
backends. In real fits the stats are smooth and the full trajectory is
numerically indistinguishable (gate-identical, |dmu| = 0 at 20 iters on
the standard sim — asserted below).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import importlib

# the package re-exports the caviar() function under the module's name,
# so attribute-style import resolves to the function — go via importlib
cv = importlib.import_module("circuitmap_tpu.solvers.caviar")
from circuitmap_tpu.model import default_priors
from circuitmap_tpu.ops.laplace_pallas import laplace_from_stats_pallas
from circuitmap_tpu.simulation import simulate
from circuitmap_tpu.solvers._laplace import laplace_from_stats, powercurve_stats
from circuitmap_tpu.utils.metrics import r2_score


def _random_stats(rng, N, P1=4):
    C = rng.integers(0, 300, (N, P1)).astype(np.float32)
    S = (C * rng.uniform(0, 1, (N, P1))).astype(np.float32)
    levels = np.concatenate(
        [[0.0], np.sort(rng.uniform(30.0, 80.0, P1 - 1))]
    ).astype(np.float32) if P1 != 4 else np.array(
        [0.0, 45.0, 55.0, 65.0], np.float32)
    phi_prior = np.tile(np.array([0.1, 5.0], np.float32), (N, 1))
    phi_cov = np.tile(
        np.array([[1e-1, 0.0], [0.0, 1e0]], np.float32), (N, 1, 1)
    )
    return tuple(
        jnp.asarray(x) for x in (S, C, levels, phi_prior, phi_cov)
    )


class TestKernelVsXla:
    @pytest.mark.parametrize("N", [7, 200, 1000, 2500])
    def test_stats_agreement(self, N):
        # 2500 exercises the multi-block lane grid (lane_block = 1024)
        args = _random_stats(np.random.default_rng(0), N)
        phi_x, cov_x = laplace_from_stats(*args)
        phi_p, cov_p = laplace_from_stats_pallas(*args, interpret=True)
        dphi = np.abs(np.asarray(phi_x) - np.asarray(phi_p))
        dcov = np.abs(np.asarray(cov_x) - np.asarray(cov_p))
        # bulk agreement is tight; the max is bounded by the solver's
        # own f32 sensitivity: xla-f32 deviates up to ~1.5e-3 from f64
        # on these adversarial random stats (the kernel measured
        # CLOSER to f64), so the cross-impl worst case on a razor-edge
        # Armijo flip can reach ~2x that
        assert np.quantile(dphi, 0.99) < 2e-4
        assert dphi.max() < 5e-3
        assert dcov.max() < 5e-3

    @pytest.mark.parametrize("P1", [2, 3, 6, 9])
    def test_level_table_sizes(self, P1):
        # single power level up to 8 levels (sublane padding boundary)
        args = _random_stats(np.random.default_rng(P1), 300, P1=P1)
        phi_x, _ = laplace_from_stats(*args)
        phi_p, _ = laplace_from_stats_pallas(*args, interpret=True)
        dphi = np.abs(np.asarray(phi_x) - np.asarray(phi_p))
        assert np.quantile(dphi, 0.99) < 2e-4
        assert dphi.max() < 5e-3

    def test_vmap_flattens_through_kernel(self):
        # batched callers flatten [B, N] -> [B*N] lanes through the
        # same kernel; each lane must match the unbatched kernel
        # exactly, and stay within the f32 envelope of the XLA form
        args = _random_stats(np.random.default_rng(1), 64)
        from circuitmap_tpu.ops.laplace_pallas import (
            laplace_from_stats_pallas_interpret_v,
        )

        def stack(x):
            return jnp.stack([x, x * 0.9 + 0.1 * jnp.mean(x)])

        S2, C2 = stack(args[0]), stack(args[1])
        pp2, pc2 = stack(args[3]), stack(args[4])
        out = jax.vmap(
            laplace_from_stats_pallas_interpret_v,
            in_axes=(0, 0, None, 0, 0),
        )(S2, C2, args[2], pp2, pc2)
        single = laplace_from_stats_pallas(
            S2[1], C2[1], args[2], pp2[1], pc2[1], interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out[0][1]), np.asarray(single[0]), rtol=0, atol=1e-6
        )
        ref = jax.vmap(laplace_from_stats, in_axes=(0, 0, None, 0, 0))(
            S2, C2, args[2], pp2, pc2
        )
        d = np.abs(np.asarray(out[0]) - np.asarray(ref[0]))
        assert np.quantile(d, 0.99) < 2e-4 and d.max() < 2e-3


class TestHoistedCounts:
    def test_counts_arg_exact(self):
        rng = np.random.default_rng(2)
        N, K = 30, 400
        lam = (rng.random((N, K)) < 0.1).astype(np.float32)
        powers = np.array([45.0, 55.0, 65.0], np.float32)
        stim = np.zeros((N, K), np.float32)
        tgt = rng.integers(0, N, (5, K))
        for h in range(5):
            stim[tgt[h], np.arange(K)] = rng.choice(powers, K)
        counts = np.stack([(stim == p).sum(1) for p in powers], 1).astype(
            np.float32
        )
        S1, C1, L1 = powercurve_stats(
            jnp.asarray(lam), jnp.asarray(stim), jnp.asarray(powers),
            total_trials=K,
        )
        S2, C2, L2 = powercurve_stats(
            jnp.asarray(lam), jnp.asarray(stim), jnp.asarray(powers),
            total_trials=K, counts=jnp.asarray(counts),
        )
        np.testing.assert_array_equal(np.asarray(S1), np.asarray(S2))
        np.testing.assert_array_equal(np.asarray(C1), np.asarray(C2))
        np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))

    def test_counts_without_total_uses_trial_axis(self):
        # no total_trials: bucket 0 must equal the mask-sum form's count
        # of every stim == 0 column
        lam = jnp.ones((2, 6), jnp.float32)
        stim = jnp.asarray([[0, 1, 1, 0, 0, 0], [1, 1, 1, 0, 0, 0]],
                           jnp.float32)
        powers = jnp.asarray([1.0], jnp.float32)
        counts = jnp.asarray([[2.0], [3.0]], jnp.float32)
        _, C_ref, _ = powercurve_stats(lam, stim, powers)
        _, C, _ = powercurve_stats(lam, stim, powers, counts=counts)
        np.testing.assert_array_equal(np.asarray(C), np.asarray(C_ref))


class TestFullFit:
    def test_fit_matches_xla_laplace(self):
        np.random.seed(5)
        sim = simulate(
            N=40, trials=501, H=5, connection_prob=0.1, verbose=False,
            spont_prob=0.01, gp_scale=1e-3,
        )
        p = default_priors(40)
        kw = dict(iters=20, verbose=False, analytic_mc=True, fn_scan=False,
                  seed=0)
        args = (sim["psc"], sim["stim_matrix"], p["mu"], p["beta"],
                p["shape"], p["rate"], p["phi"], p["phi_cov"])
        a = cv.caviar(*args, laplace_impl="xla", **kw)
        b = cv.caviar(*args, laplace_impl="pallas_interpret", **kw)
        mu_a, mu_b = np.asarray(a[0]), np.asarray(b[0])
        assert ((mu_a == 0) == (mu_b == 0)).all()
        np.testing.assert_allclose(mu_a, mu_b, rtol=0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(a[5]), np.asarray(b[5]), rtol=0, atol=1e-3
        )
        assert r2_score(sim["weights"], mu_b) > 0.95

    def test_sharded_fit_matches_xla_laplace(self):
        # the kernel must run correctly INSIDE shard_map (replicated on
        # the psum'd stats) — 8-device CPU mesh, interpret lowering
        from circuitmap_tpu.parallel import caviar_sharded, trial_mesh

        np.random.seed(5)
        sim = simulate(
            N=40, trials=501, H=5, connection_prob=0.1, verbose=False,
            spont_prob=0.01, gp_scale=1e-3,
        )
        p = default_priors(40)
        kw = dict(iters=10, verbose=False, analytic_mc=True, fn_scan=False,
                  seed=0, mesh=trial_mesh(8))
        args = (sim["psc"], sim["stim_matrix"], p["mu"], p["beta"],
                p["shape"], p["rate"], p["phi"], p["phi_cov"])
        a = caviar_sharded(*args, laplace_impl="xla", **kw)
        b = caviar_sharded(*args, laplace_impl="pallas_interpret", **kw)
        mu_a, mu_b = np.asarray(a[0]), np.asarray(b[0])
        assert ((mu_a == 0) == (mu_b == 0)).all()
        np.testing.assert_allclose(mu_a, mu_b, rtol=0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(a[5]), np.asarray(b[5]), rtol=0, atol=1e-3
        )

    def test_sns_fit_matches_xla_laplace(self):
        from circuitmap_tpu.solvers.cavi_sns import cavi_sns

        np.random.seed(5)
        sim = simulate(
            N=30, trials=400, H=5, connection_prob=0.1, verbose=False,
            spont_prob=0.01, gp_scale=1e-3,
        )
        p = default_priors(30)
        alpha_prior = np.full(30, 0.5, dtype=np.float32)
        kw = dict(iters=10, verbose=False, analytic_mc=True,
                  save_histories=False)
        args = (sim["psc"], sim["stim_matrix"], p["mu"], p["beta"],
                alpha_prior, p["shape"], p["rate"], p["phi"], p["phi_cov"])
        a = cavi_sns(*args, laplace_impl="xla", **kw)
        b = cavi_sns(*args, laplace_impl="pallas_interpret", **kw)
        np.testing.assert_allclose(
            np.asarray(a[0]), np.asarray(b[0]), rtol=0, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(a[6]), np.asarray(b[6]), rtol=0, atol=1e-3
        )
