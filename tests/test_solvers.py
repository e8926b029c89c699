"""Simulation-based recovery tests for the solvers.

Mirrors the reference's validation strategy (SURVEY.md §4): simulate
with known weights, fit, check recovery R² — plus contract checks on
the posterior state (shapes, gating invariants).
"""

import numpy as np
import pytest

from circuitmap_tpu.simulation import simulate
from circuitmap_tpu.model import Model
from circuitmap_tpu.solvers import cosamp
from circuitmap_tpu.utils.metrics import r2_score


@pytest.fixture(scope="module")
def sim():
    np.random.seed(42)
    return simulate(
        N=60, trials=600, H=6, connection_prob=0.1, spont_prob=0.02, verbose=False
    )


class TestCaviar:
    @pytest.fixture(scope="class")
    def fitted(self, sim):
        model = Model(60)
        model.fit(
            sim["psc"],
            sim["stim_matrix"],
            method="caviar",
            fit_options={"iters": 25, "verbose": False, "seed": 0},
        )
        return model

    def test_weight_recovery(self, sim, fitted):
        assert r2_score(sim["weights"], fitted.state["mu"]) > 0.8

    def test_materialize_gates_host_pull(self, sim, fitted):
        """fit(_materialize={...}) (the serve return_fields hook)
        pulls ONLY the named fields to host numpy; the rest stay
        device arrays with identical values (np.asarray on access).
        On a tunneled chip the un-pulled lam [N, K] is seconds of
        avoided wire per summary-only request."""
        import jax

        model = Model(60)
        model.fit(sim["psc"], sim["stim_matrix"], method="caviar",
                  fit_options={"iters": 25, "verbose": False, "seed": 0},
                  _materialize={"mu", "beta"})
        assert isinstance(model.state["mu"], np.ndarray)
        assert isinstance(model.state["beta"], np.ndarray)
        # lam stays device-resident (z may come back host-side from
        # the CPU reconnect path regardless — only assert the big one)
        assert isinstance(model.state["lam"], jax.Array)
        np.testing.assert_array_equal(model.state["mu"],
                                      fitted.state["mu"])
        np.testing.assert_array_equal(np.asarray(model.state["lam"]),
                                      fitted.state["lam"])
        # the knob is per-call: a later default fit pulls everything
        model.fit(sim["psc"], sim["stim_matrix"], method="caviar",
                  fit_options={"iters": 2, "verbose": False, "seed": 0})
        assert isinstance(model.state["lam"], np.ndarray)

    def test_connection_detection(self, sim, fitted):
        true_conn = set(np.flatnonzero(sim["weights"]))
        est_conn = set(np.flatnonzero(fitted.state["mu"]))
        # all true connections found; at most a few spurious ones
        assert true_conn <= est_conn
        assert len(est_conn - true_conn) <= 5

    def test_state_contract(self, fitted):
        s = fitted.state
        N, K = 60, 600
        assert s["mu"].shape == (N,)
        assert s["beta"].shape == (N,)
        assert s["lam"].shape == (N, K)
        assert s["phi"].shape == (N, 2)
        assert s["phi_cov"].shape == (N, 2, 2)
        assert s["z"].shape == (K,)
        assert np.isscalar(s["shape"]) or s["shape"].shape == ()
        assert fitted.trial_count == K
        assert fitted.time > 0

    def test_lam_in_unit_interval(self, fitted):
        lam = fitted.state["lam"]
        assert lam.min() >= 0.0 and lam.max() <= 1.0

    def test_disconnected_rows_zeroed(self, fitted):
        mu, lam = fitted.state["mu"], fitted.state["lam"]
        dead = mu == 0
        assert np.all(lam[dead] == 0.0)

    def test_untargeted_trials_have_no_spikes(self, sim, fitted):
        lam = fitted.state["lam"]
        assert np.all(lam[np.asarray(sim["stim_matrix"]) == 0] == 0.0)

    def test_histories(self, sim):
        model = Model(60)
        model.fit(
            sim["psc"],
            sim["stim_matrix"],
            method="caviar",
            fit_options={
                "iters": 3, "save_histories": True, "fn_scan": False,
                "verbose": False,
            },
        )
        assert model.history["mu"].shape == (3, 60)
        assert model.history["lam"].shape == (3, 60, 600)
        assert model.history["phi_cov"].shape == (3, 60, 2, 2)

    def test_trial_permutation_invariance(self, sim):
        """Posteriors do not depend on trial ORDER (SURVEY §4 property).

        Every trial-axis operation is a sum/count, so permuting the
        columns must leave mu/phi unchanged and permute lam/z
        correspondingly. Deterministic config (analytic_mc + identity
        neuron order) so the only divergence channel is float
        reassociation of the permuted reductions."""
        opts = dict(iters=15, verbose=False, analytic_mc=True,
                    update_order="identity", fn_scan=False)
        m1 = Model(60)
        m1.fit(sim["psc"], sim["stim_matrix"], method="caviar",
               fit_options=dict(opts))
        perm = np.random.default_rng(3).permutation(600)
        m2 = Model(60)
        m2.fit(sim["psc"][perm], sim["stim_matrix"][:, perm],
               method="caviar", fit_options=dict(opts))
        np.testing.assert_array_equal(m1.state["mu"] != 0,
                                      m2.state["mu"] != 0)
        np.testing.assert_allclose(m2.state["mu"], m1.state["mu"],
                                   rtol=0, atol=1e-3)
        np.testing.assert_allclose(m2.state["lam"][:, np.argsort(perm)],
                                   m1.state["lam"], rtol=0, atol=1e-2)
        np.testing.assert_allclose(m2.state["phi"], m1.state["phi"],
                                   rtol=0, atol=1e-2)


class TestCaviSns:
    @pytest.fixture(scope="class")
    def fitted(self, sim):
        model = Model(60)
        model.fit(
            sim["psc"],
            sim["stim_matrix"],
            method="cavi_sns",
            fit_options={
                "iters": 25, "verbose": False, "save_histories": False, "seed": 1,
            },
        )
        return model

    def test_weight_recovery(self, sim, fitted):
        # alpha-weighted posterior weight estimate
        est = fitted.state["mu"] * fitted.state["alpha"]
        assert r2_score(sim["weights"], est) > 0.5

    def test_state_contract(self, fitted):
        s = fitted.state
        assert s["alpha"].shape == (60,)
        assert s["alpha"].min() >= 0.0 and s["alpha"].max() <= 1.0
        assert s["lam"].shape == (60, 600)


class TestCosamp:
    def test_sparse_recovery(self, rng):
        # well-conditioned compressed sensing instance
        M, N, k = 120, 60, 5
        A = rng.normal(size=(M, N)) / np.sqrt(M)
        x = np.zeros(N)
        supp = rng.choice(N, k, replace=False)
        x[supp] = rng.uniform(1, 3, k)
        y = A @ x
        x_hat, elapsed = cosamp(A, y, k)
        np.testing.assert_allclose(x_hat, x, atol=1e-6)
        assert elapsed >= 0

    def test_zero_measurements(self):
        A = np.eye(4)
        x_hat, _ = cosamp(A, np.zeros(4), 2)
        np.testing.assert_array_equal(x_hat, np.zeros(4))


class TestBlockedSweep:
    def test_blocked_matches_recovery(self, sim):
        """block_size > 1 must recover the same connectivity."""
        from circuitmap_tpu.solvers import caviar
        from circuitmap_tpu.model import default_priors

        p = default_priors(60)
        args = (sim["psc"], sim["stim_matrix"], p["mu"], p["beta"], p["shape"],
                p["rate"], p["phi"], p["phi_cov"])
        kw = dict(iters=25, seed=0, verbose=False, analytic_mc=True)
        seq = caviar(*args, sweep_block_size=1, **kw)
        blk = caviar(*args, sweep_block_size=8, **kw)
        mu_s, mu_b = np.asarray(seq[0]), np.asarray(blk[0])
        assert r2_score(sim["weights"], mu_b) > 0.8
        # same support up to at most one borderline cell
        assert np.sum((mu_s != 0) != (mu_b != 0)) <= 1
        # agreement on weight values
        assert r2_score(mu_s, mu_b) > 0.95

    def test_block_size_not_dividing_n(self, sim):
        from circuitmap_tpu.solvers import caviar
        from circuitmap_tpu.model import default_priors

        p = default_priors(60)
        out = caviar(sim["psc"], sim["stim_matrix"], p["mu"], p["beta"],
                     p["shape"], p["rate"], p["phi"], p["phi_cov"],
                     iters=4, sweep_block_size=7, verbose=False,
                     fn_scan=False)
        assert np.asarray(out[2]).shape == (60, 600)


class TestCosampViaModel:
    def test_model_fit_cosamp(self, sim):
        model = Model(60)
        model.fit(sim["psc"], sim["stim_matrix"], method="cosamp",
                  fit_options={"k": 8})
        mu = model.state["mu"]
        assert mu.shape == (60,)
        assert (mu != 0).sum() <= 8
        # CoSaMP on charge recovers the strong connections roughly
        true_top = set(np.argsort(sim["weights"])[-3:])
        est_top = set(np.argsort(np.abs(mu))[-3:])
        assert len(true_top & est_top) >= 2
        # state contract: elapsed recorded, lam left at the prior (no
        # fabricated posterior for a point-estimate method)
        assert model.state["cosamp_time"] >= 0.0
        assert "lam" not in model.state  # not fabricated by cosamp

    def test_mesh_fit_option_rejected_clearly(self, sim):
        """Every other adapter accepts mesh=; cosamp must say WHY it
        can't, not TypeError from inside the solver (round-4 review)."""
        import pytest

        model = Model(60)
        with pytest.raises(ValueError, match="cosamp has no mesh"):
            model.fit(sim["psc"], sim["stim_matrix"], method="cosamp",
                      fit_options={"mesh": object(), "k": 8})


class TestPallasSweep:
    def test_interpret_full_fit_matches_xla(self, sim):
        """The pallas sweep (interpret mode on CPU) must reproduce the
        XLA sweep through a full fit."""
        from circuitmap_tpu.solvers import caviar
        from circuitmap_tpu.model import default_priors

        p = default_priors(60)
        args = (sim["psc"], sim["stim_matrix"], p["mu"], p["beta"], p["shape"],
                p["rate"], p["phi"], p["phi_cov"])
        kw = dict(iters=8, seed=0, verbose=False, analytic_mc=True,
                  fn_scan=False)
        ref = caviar(*args, sweep_impl="xla", **kw)
        pal = caviar(*args, sweep_impl="pallas_interpret", **kw)
        # f32 rounding drifts compound over 8 CAVI iterations (the
        # sweep impls reduce in different orders); bound loosely
        np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(pal[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ref[2]), np.asarray(pal[2]),
                                   rtol=1e-4, atol=1e-4)
        # the manual-DMA kernel (the TPU default) through the same fit
        dma = caviar(*args, sweep_impl="pallas_dma_interpret", **kw)
        np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(dma[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ref[2]), np.asarray(dma[2]),
                                   rtol=1e-4, atol=1e-4)

    def test_dma_kernel_matches_grid_kernel(self):
        """Raw-kernel equality: manual-DMA ring vs grid pipeline, with a
        K that exercises the 128-padding path."""
        import jax
        import jax.numpy as jnp
        from circuitmap_tpu.ops.sweep_pallas import (
            sweep_spikes_pallas, sweep_spikes_pallas_dma)

        N, K = 37, 259
        rng = np.random.default_rng(0)
        lam = jnp.asarray(rng.random((N, K)) * (rng.random((N, K)) < 0.2),
                          jnp.float32)
        y = jnp.asarray(rng.random(K), jnp.float32)
        stim = jnp.asarray(rng.choice([0., 45., 55., 65.], size=(N, K),
                                      p=[0.7, 0.1, 0.1, 0.1]), jnp.float32)
        mu = jnp.asarray(rng.random(N), jnp.float32)
        beta = jnp.asarray(rng.random(N) + 0.5, jnp.float32)
        powers = jnp.asarray([45., 55., 65.], jnp.float32)
        counts = jnp.sum(stim[:, None, :] == powers[None, :, None],
                         axis=-1).astype(jnp.float32)
        order = jnp.asarray(rng.permutation(N))
        mask = jnp.asarray((rng.random(K) > 0.1).astype(np.float32))
        args = (y, stim, mu, beta, lam, jnp.asarray(1.3, jnp.float32),
                mu * 0.1, beta * 2, mask, powers, counts, order,
                jnp.asarray(0.25, jnp.float32), jnp.asarray(3.0, jnp.float32),
                jnp.asarray(1.0, jnp.float32))
        ref = sweep_spikes_pallas(*args, interpret=True)
        for depth in (2, 4, 64):  # incl. depth > N
            out = sweep_spikes_pallas_dma(*args, interpret=True, depth=depth)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-6, atol=1e-7)

    def test_batched_kernel_matches_stacked_singles(self, rng):
        """The (B, N)-grid batched kernel == B single-map kernel calls."""
        import jax
        import jax.numpy as jnp
        from circuitmap_tpu.ops.sweep_pallas import (
            sweep_spikes_pallas,
            sweep_spikes_pallas_batched,
        )

        B, N, K, P = 3, 10, 64, 3
        powers = jnp.asarray([45.0, 55.0, 65.0])
        stim = jnp.asarray(
            powers[rng.integers(0, P, (B, N, K))] * (rng.random((B, N, K)) > 0.7)
        ).astype(jnp.float32)
        y = jnp.asarray(np.abs(rng.normal(size=(B, K))), jnp.float32)
        mu = jnp.asarray(rng.normal(size=(B, N)) ** 2, jnp.float32)
        beta = jnp.asarray(np.abs(rng.normal(size=(B, N))) + 0.1, jnp.float32)
        lam = jnp.asarray(rng.random((B, N, K)), jnp.float32) * (stim > 0)
        sig = jnp.asarray(np.abs(rng.normal(size=B)) + 0.5, jnp.float32)
        m0 = jnp.asarray(rng.random((B, N)) * 0.2, jnp.float32)
        m1 = jnp.asarray(rng.random((B, N)) * 10, jnp.float32)
        mask = jnp.ones((B, K), jnp.float32)
        counts = jnp.sum(
            stim[:, :, None, :] == powers[None, None, :, None], axis=-1
        ).astype(jnp.float32)
        order = jnp.stack(
            [jax.random.permutation(jax.random.PRNGKey(b), N) for b in range(B)]
        )
        msrmp = jnp.asarray([0.2, 0.3, 0.25], jnp.float32)

        batched = sweep_spikes_pallas_batched(
            y, stim, mu, beta, lam, sig, m0, m1, mask, powers, counts, order,
            msrmp, 3.0, 1.0, interpret=True,
        )
        for b in range(B):
            single = sweep_spikes_pallas(
                y[b], stim[b], mu[b], beta[b], lam[b], sig[b], m0[b], m1[b],
                mask[b], powers, counts[b], order[b], msrmp[b], 3.0, 1.0,
                interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(batched[b]), np.asarray(single), rtol=1e-6,
                atol=1e-7, err_msg=f"experiment {b}",
            )

    def test_custom_vmap_routes_to_batched(self, rng):
        """jax.vmap of the wrapped sweep lowers onto the batched kernel
        and matches per-map results, with mixed batched/unbatched args."""
        import jax
        import jax.numpy as jnp
        from circuitmap_tpu.ops.sweep_pallas import (
            sweep_spikes_pallas_interpret_v,
        )

        B, N, K, P = 2, 8, 32, 2
        powers = jnp.asarray([45.0, 65.0])
        stim = jnp.asarray(
            powers[rng.integers(0, P, (B, N, K))] * (rng.random((B, N, K)) > 0.6)
        ).astype(jnp.float32)
        y = jnp.asarray(np.abs(rng.normal(size=(B, K))), jnp.float32)
        mu = jnp.asarray(rng.random((B, N)) + 0.5, jnp.float32)
        beta = jnp.asarray(rng.random((B, N)) + 0.1, jnp.float32)
        lam = jnp.asarray(rng.random((B, N, K)), jnp.float32) * (stim > 0)
        m0 = jnp.asarray(rng.random((B, N)) * 0.2, jnp.float32)
        m1 = jnp.asarray(rng.random((B, N)) * 10, jnp.float32)
        mask = jnp.ones((B, K), jnp.float32)
        counts = jnp.sum(
            stim[:, :, None, :] == powers[None, None, :, None], axis=-1
        ).astype(jnp.float32)
        order = jnp.stack(
            [jax.random.permutation(jax.random.PRNGKey(b), N) for b in range(B)]
        )
        sig = jnp.asarray(1.3, jnp.float32)   # unbatched
        msrmp = jnp.asarray(0.25, jnp.float32)  # unbatched

        vm = jax.vmap(
            sweep_spikes_pallas_interpret_v,
            in_axes=(0, 0, 0, 0, 0, None, 0, 0, 0, None, 0, 0, None, None,
                     None),
        )(y, stim, mu, beta, lam, sig, m0, m1, mask, powers, counts, order,
          msrmp, jnp.asarray(3.0), jnp.asarray(1.0))
        for b in range(B):
            single = sweep_spikes_pallas_interpret_v(
                y[b], stim[b], mu[b], beta[b], lam[b], sig, m0[b], m1[b],
                mask[b], powers, counts[b], order[b], msrmp,
                jnp.asarray(3.0), jnp.asarray(1.0),
            )
            np.testing.assert_allclose(np.asarray(vm[b]), np.asarray(single),
                                       rtol=1e-6, atol=1e-7)


class TestStimWireFormats:
    """The host->device stim upload paths must reconstruct identically."""

    def _hologram_stim(self, N=97, K=411, H=6, seed=3):
        rng = np.random.default_rng(seed)
        stim = np.zeros((N, K), np.float32)
        for k in range(5, K):  # leave a few empty trials
            tgt = rng.choice(N, size=rng.integers(1, H + 1), replace=False)
            stim[tgt, k] = rng.choice([45.0, 55.0, 65.0])
        return stim

    def test_sparse_hologram_roundtrip(self):
        import jax.numpy as jnp
        from circuitmap_tpu.solvers._common import (
            _levels, _sparsify, prepare_stim, prepare_stim_and_init)

        stim = self._hologram_stim()
        _, levels = _levels(stim)
        assert _sparsify(stim, levels) is not None  # takes the sparse path
        dev, stim_np, powers, powers_dev = prepare_stim(stim, jnp.float32)
        np.testing.assert_array_equal(np.asarray(dev), stim)
        np.testing.assert_array_equal(powers, [45.0, 55.0, 65.0])

        active = jnp.asarray(
            (np.random.default_rng(0).random(stim.shape[1]) > 0.1)
            .astype(np.float32))
        dev2, lam_mask, lam0, _, _, _, pc = prepare_stim_and_init(
            stim, active, jnp.float32)
        # power counts from the sparse path match a dense recount
        expect_pc = np.stack(
            [(stim == p).sum(1) for p in (45.0, 55.0, 65.0)], 1)
        np.testing.assert_array_equal(pc, expect_pc)
        np.testing.assert_array_equal(np.asarray(dev2), stim)
        expect = (stim > 0) * 0.95 * np.asarray(active)[None, :]
        np.testing.assert_allclose(np.asarray(lam0), expect, rtol=1e-6)

    def test_sparse_matches_dense_bucket_path(self):
        import jax.numpy as jnp
        from circuitmap_tpu.solvers import _common

        stim = self._hologram_stim(N=64, K=200, H=5)
        dev_sparse, _, _, _ = _common.prepare_stim(stim, jnp.float32)
        # force the dense-bucket fallback by disabling sparsification
        dense = _common._sparsify(stim, _common._levels(stim)[1],
                                  max_fill=0.0)
        assert dense is None
        _, levels = _common._levels(stim)
        bucket = np.searchsorted(levels, stim).astype(np.int8)
        dev_dense = _common._stim_from_buckets(
            jnp.asarray(levels, jnp.float32), jnp.asarray(bucket))
        np.testing.assert_array_equal(np.asarray(dev_sparse),
                                      np.asarray(dev_dense))

    def test_explicit_powers_skip_unique(self):
        import jax.numpy as jnp
        from circuitmap_tpu.solvers._common import prepare_stim

        stim = self._hologram_stim(N=40, K=120, H=4)
        dev, _, powers, _ = prepare_stim(stim, jnp.float32,
                                      powers=[45.0, 55.0, 65.0])
        np.testing.assert_array_equal(np.asarray(dev), stim)
        np.testing.assert_array_equal(powers, [45.0, 55.0, 65.0])
        # duplicated powers are deduplicated, not double-counted
        dev2, _, powers2, _ = prepare_stim(stim, jnp.float32,
                                        powers=[45.0, 45.0, 55.0, 65.0])
        np.testing.assert_array_equal(powers2, [45.0, 55.0, 65.0])

    def test_mismatched_powers_raise(self):
        """A powers= list that doesn't cover the stim values must raise,
        not silently mis-bucket (50 used to become 55 on device; values
        above max power vanished to 0)."""
        import jax.numpy as jnp
        import pytest
        from circuitmap_tpu.solvers._common import prepare_stim

        stim = self._hologram_stim(N=40, K=120, H=4)
        stim[stim == 55.0] = 50.0  # value outside the supplied table
        with pytest.raises(ValueError, match="powers"):
            prepare_stim(stim, jnp.float32, powers=[45.0, 55.0, 65.0])
        stim2 = self._hologram_stim(N=40, K=120, H=4)
        stim2[3, 7] = 99.0  # above the max supplied power
        with pytest.raises(ValueError, match="powers"):
            prepare_stim(stim2, jnp.float32, powers=[45.0, 55.0, 65.0])

    def test_f64_stim_keeps_host_power_precision(self):
        """Host-side powers keep the stim matrix's own precision so the
        reconnection scan's exact comparisons still hit — regression:
        f32-rounded powers (45.7 -> 45.70000076) matched nothing in an
        f64 stim and silently disabled the scan."""
        import jax.numpy as jnp
        from circuitmap_tpu.solvers._common import prepare_stim

        rng = np.random.default_rng(0)
        stim = np.zeros((30, 200))  # float64
        for k in range(200):
            tgt = rng.choice(30, 3, replace=False)
            stim[tgt, k] = rng.choice([45.7, 55.3, 65.1])
        dev, stim_np, powers, powers_dev = prepare_stim(stim, jnp.float32)
        assert powers.dtype == np.float64
        np.testing.assert_array_equal(powers, [45.7, 55.3, 65.1])
        # every host power matches the host stim exactly
        for p in powers:
            assert (stim_np == p).sum() > 0
        # the device stim carries the f32-rounded level values
        np.testing.assert_array_equal(
            np.asarray(dev), stim.astype(np.float32))


class TestTraceWire:
    def test_int8_wire_matches_f32_fit(self):
        from circuitmap_tpu.model import default_priors
        from circuitmap_tpu.solvers import caviar

        np.random.seed(5)
        sim = simulate(N=40, trials=501, H=5, connection_prob=0.1,
                       verbose=False, spont_prob=0.01, gp_scale=1e-3)
        p = default_priors(40)
        kw = dict(iters=15, verbose=False, analytic_mc=True, fn_scan=False,
                  seed=0)
        args = (sim["psc"], sim["stim_matrix"], p["mu"], p["beta"],
                p["shape"], p["rate"], p["phi"], p["phi_cov"])
        a = caviar(*args, **kw)
        b = caviar(*args, trace_wire="int8", **kw)
        # int8 quantisation is ~0.4% of trace peak — recovery must agree
        r_a = r2_score(sim["weights"], np.asarray(a[0]))
        r_b = r2_score(sim["weights"], np.asarray(b[0]))
        assert abs(r_a - r_b) < 0.02
        assert r_b > 0.9

    def test_wire_validation(self):
        import jax.numpy as jnp

        from circuitmap_tpu.solvers._common import prepare_traces

        with pytest.raises(ValueError, match="trace_wire"):
            prepare_traces(np.zeros((2, 4)), jnp.float32, trace_wire="int2")
        with pytest.raises(ValueError, match="float64"):
            prepare_traces(np.zeros((2, 4)), jnp.float64, trace_wire="int8")
        with pytest.raises(ValueError, match="float64"):
            prepare_traces(np.zeros((2, 4)), jnp.float64, trace_wire="int4")
        with pytest.raises(ValueError, match="float64"):
            # 'f32' must not be silently ignored for f64 fits either
            prepare_traces(np.zeros((2, 4)), jnp.float64, trace_wire="f32")
        with pytest.raises(ValueError, match="finite"):
            prepare_traces(np.full((2, 4), np.nan), jnp.float32,
                           trace_wire="int8")

    def test_f16_wire_close(self):
        import jax.numpy as jnp

        from circuitmap_tpu.solvers._common import prepare_traces

        rng = np.random.default_rng(0)
        x = rng.standard_normal((8, 64)).astype(np.float32)
        out = np.asarray(prepare_traces(x, jnp.float32, trace_wire="f16"))
        np.testing.assert_allclose(out, x, rtol=2e-3, atol=2e-3)

    def test_int4_wires_match_host_reference(self):
        """The solver-side int4/int4d2 unpack must reproduce the shared
        host transform (demix.demixer.wire_transform) exactly — one
        wire semantics across the demixer and solver entries."""
        import jax.numpy as jnp

        from circuitmap_tpu.demix.demixer import wire_transform
        from circuitmap_tpu.solvers._common import prepare_traces

        rng = np.random.default_rng(1)
        for T in (900, 899):
            x = rng.standard_normal((6, T)).astype(np.float32)
            x[3] = 0.0  # zero-trace scale guard
            for wire, dec in (("int4", 1), ("int4d2", 2)):
                out = np.asarray(
                    prepare_traces(x, jnp.float32, trace_wire=wire))
                ref = wire_transform(x, 4, decimate=dec)
                np.testing.assert_allclose(out, ref, rtol=0, atol=1e-6)

    def test_packed_input_passthrough(self):
        """PackedInt4Traces solver inputs (HTTP psc_q4 bodies) feed the
        device unpack directly: exactly equal to the dense
        reconstruction through the f32 wire (dec=2) / the int4 wire's
        requantise identity (dec=1); f64 fits reject them; an explicit
        int4d2 request over non-pooled codes re-encodes."""
        import jax.numpy as jnp

        from circuitmap_tpu.solvers._common import prepare_traces
        from circuitmap_tpu.utils.quant import (PackedInt4Traces,
                                                encode_int4_traces)

        rng = np.random.default_rng(2)
        for T, dec in ((900, 1), (899, 2)):
            x = rng.standard_normal((6, T)).astype(np.float32)
            x[3] = 0.0
            packed, scale = encode_int4_traces(x, decimate=dec)
            cont = PackedInt4Traces(packed, scale, T, dec)
            out = np.asarray(prepare_traces(cont, jnp.float32))
            np.testing.assert_array_equal(out, cont.dense())
            if dec == 1:
                # requantise identity: same as the int4 wire on the recon
                via_wire = np.asarray(prepare_traces(
                    cont.dense(), jnp.float32, trace_wire="int4"))
                np.testing.assert_array_equal(out, via_wire)
            with pytest.raises(ValueError, match="float64"):
                prepare_traces(cont, jnp.float64)
        # explicit int4d2 over dec=1 codes: honoured via re-encode
        x = rng.standard_normal((4, 900)).astype(np.float32)
        packed, scale = encode_int4_traces(x, decimate=1)
        cont = PackedInt4Traces(packed, scale, 900, 1)
        np.testing.assert_array_equal(
            np.asarray(prepare_traces(cont, jnp.float32,
                                      trace_wire="int4d2")),
            np.asarray(prepare_traces(cont.dense(), jnp.float32,
                                      trace_wire="int4d2")))

    def test_int4_wire_fit_recovery(self):
        from circuitmap_tpu.model import default_priors
        from circuitmap_tpu.solvers import caviar

        np.random.seed(6)
        sim = simulate(N=40, trials=400, H=5, connection_prob=0.1,
                       verbose=False, spont_prob=0.01, gp_scale=1e-3)
        p = default_priors(40)
        kw = dict(iters=15, verbose=False, analytic_mc=True, fn_scan=False,
                  seed=0)
        args = (sim["psc"], sim["stim_matrix"], p["mu"], p["beta"],
                p["shape"], p["rate"], p["phi"], p["phi_cov"])
        a = caviar(*args, **kw)
        b = caviar(*args, trace_wire="int4d2", **kw)
        r_a = r2_score(sim["weights"], np.asarray(a[0]))
        r_b = r2_score(sim["weights"], np.asarray(b[0]))
        # the charge integral averages the quantisation noise out
        assert abs(r_a - r_b) < 0.02
        assert r_b > 0.9
