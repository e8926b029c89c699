"""Tests for the simulators: shapes, physical invariants, designs."""

import numpy as np
import pytest

from circuitmap_tpu.simulation import (
    simulate,
    simulate_continuous_experiment,
    blockwise_design,
    random_design,
    psc_kernel_bank,
    sample_gp,
)


class TestDesigns:
    def test_blockwise_shapes_and_powers(self):
        np.random.seed(0)
        stim = blockwise_design(30, 5, 100, [45, 55, 65])
        assert stim.shape == (30, 100)
        assert set(np.unique(stim)) <= {0.0, 45.0, 55.0, 65.0}
        # every trial stimulates exactly H targets (N divisible by H here)
        assert np.all((stim > 0).sum(0) == 5)

    def test_random_design(self):
        np.random.seed(0)
        stim = random_design(30, 5, 90, [45, 55, 65])
        assert stim.shape == (30, 90)
        # roughly balanced power representation
        trial_powers = stim.max(0)
        counts = [np.sum(trial_powers == p) for p in (45, 55, 65)]
        assert max(counts) - min(counts) <= 2


class TestKernels:
    def test_kernel_bank_positive_and_peaked(self):
        ke = psc_kernel_bank([20.0], [200.0], 900)[0]
        assert ke[0] == 0.0
        assert np.all(ke >= 0)
        peak = np.argmax(ke)
        assert 0 < peak < 400
        # decays after the peak
        assert np.all(np.diff(ke[peak:]) <= 1e-12)

    def test_gp_noise_stats(self):
        np.random.seed(0)
        g = sample_gp(trial_dur=200, gp_lengthscale=25, gp_scale=0.5, n_samples=400)
        assert g.shape == (400, 200)
        # marginal std approx gp_scale
        assert abs(g.std() - 0.5) < 0.05
        # neighbouring samples strongly correlated (smooth)
        c = np.corrcoef(g[:, 100], g[:, 105])[0, 1]
        assert c > 0.9


class TestSimulate:
    @pytest.fixture(scope="class")
    def sim(self):
        np.random.seed(1)
        return simulate(N=40, trials=200, H=5, connection_prob=0.1, verbose=False)

    def test_shapes(self, sim):
        assert sim["psc"].shape == (200, 900)
        assert sim["stim_matrix"].shape == (40, 200)
        assert sim["weights"].shape == (40,)
        assert sim["spks"].shape == (40, 200)
        assert sim["I"].shape == (200,)

    def test_spike_rate_monotone_in_power(self, sim):
        # aggregated over all neurons, spike rate should not decrease
        # with power (sigmoid power curves)
        stim, spks = sim["stim_matrix"], sim["spks"]
        rates = []
        for p in (45.0, 55.0, 65.0):
            mask = stim == p
            rates.append(spks[mask].mean())
        assert rates[0] <= rates[1] + 0.05 and rates[1] <= rates[2] + 0.05

    def test_connected_neurons_drive_traces(self, sim):
        # trials where a strongly connected neuron spiked should carry
        # more charge than trials with no connected spikes
        w = sim["weights"]
        conn = np.flatnonzero(w)
        charge = np.trapezoid(sim["psc"], axis=-1)
        conn_spikes = sim["spks"][conn].sum(0) > 0
        assert charge[conn_spikes].mean() > charge[~conn_spikes].mean() + 1.0

    def test_weights_respected_when_given(self):
        np.random.seed(2)
        w = np.zeros(20)
        w[[3, 7]] = [15.0, 25.0]
        sim = simulate(N=20, trials=100, H=4, weights=w, verbose=False)
        np.testing.assert_array_equal(sim["weights"], w)

    def test_kernel_taus_honoured(self):
        """simulate(kernel=...) must drive the synthesis, not be ignored."""
        np.random.seed(3)
        tau_r = np.full(20, 30.0)
        tau_d = np.full(20, 200.0)
        sim = simulate(N=20, trials=100, H=4, kernel=(tau_r, tau_d),
                       verbose=False)
        np.testing.assert_array_equal(sim["tau_r"], tau_r)
        np.testing.assert_array_equal(sim["tau_d"], tau_d)
        # scalar + dict form
        np.random.seed(3)
        sim2 = simulate(N=20, trials=100, H=4,
                        kernel={"tau_r": 30.0, "tau_d": 200.0}, verbose=False)
        np.testing.assert_array_equal(sim2["tau_r"], tau_r)
        # identical taus + identical np.random stream -> identical traces
        np.testing.assert_allclose(sim2["psc"], sim["psc"], rtol=1e-6)
        with np.testing.assert_raises(ValueError):
            simulate(N=20, trials=50, H=4, kernel=(tau_d, tau_r),
                     verbose=False)

    def test_supplied_stim_matrix(self):
        """Closed-loop extension: trials synthesised for a CHOSEN design
        over a circuit held fixed via weights/phi/kernel."""
        np.random.seed(6)
        pilot = simulate(N=20, trials=80, H=4, connection_prob=0.2,
                         verbose=False)
        truth = dict(weights=pilot["weights"], phi_0=pilot["phi_0"],
                     phi_1=pilot["phi_1"],
                     kernel=(pilot["tau_r"], pilot["tau_d"]))
        stim = np.zeros((20, 48))
        chosen = np.arange(8)  # concentrate on a chosen pool
        for k in range(48):
            stim[np.random.choice(chosen, 4, replace=False), k] = 65.0
        out = simulate(N=20, stim_matrix=stim, verbose=False, **truth)
        assert out["psc"].shape == (48, 900)
        np.testing.assert_array_equal(out["stim_matrix"], stim)
        np.testing.assert_array_equal(out["weights"], pilot["weights"])
        np.testing.assert_array_equal(out["tau_r"], pilot["tau_r"])
        # unstimulated neurons never spike; trials only target the pool
        assert out["spks"][8:].sum() == 0
        assert np.isfinite(out["psc"]).all()
        with np.testing.assert_raises(ValueError):
            simulate(N=20, stim_matrix=np.zeros((10, 5)), verbose=False)

    def test_reference_helper_parity(self):
        """The reference's small public helpers exist and agree:
        alpha / get_kernel(s) / eval_kernel (simulation.py:197-220)."""
        from circuitmap_tpu.simulation import (alpha, eval_kernel,
                                               get_kernel, get_kernels)

        assert alpha(50.0) == 1e4 / 2500.0
        k = get_kernel(30.0, 120.0)
        t = np.arange(900, dtype=float)
        vals = k(t, 200.0)
        assert vals[:201].sum() == 0 and vals[250] > 0
        ks = get_kernels([30.0, 40.0], [120.0, 150.0])
        assert len(ks) == 2
        # eval_kernel: peak-normalised, batched over neurons
        ev = np.asarray(eval_kernel(
            np.arange(900, dtype=np.float32),
            np.array([30.0, 40.0], np.float32),
            np.array([120.0, 150.0], np.float32),
            np.array([200.0, 300.0], np.float32)))
        assert ev.shape == (2, 900)
        np.testing.assert_allclose(ev.max(axis=1), 1.0, atol=1e-3)
        # matches the unnormalised closure up to its own peak
        np.testing.assert_allclose(ev[0], vals / vals.max(),
                                   rtol=2e-3, atol=2e-5)

    def test_all_zero_design_has_no_evoked_spikes(self):
        """A no-stim control block (all-zero supplied design) must not
        spike: with max_power == 0 the min-rate padding used to treat
        every unstimulated trial as a max-power trial and flip ~40% of
        them to phantom spikes with t=0 PSCs."""
        np.random.seed(6)
        pilot = simulate(N=15, trials=40, H=3, connection_prob=0.3,
                         verbose=False)
        truth = dict(weights=pilot["weights"], phi_0=pilot["phi_0"],
                     phi_1=pilot["phi_1"],
                     kernel=(pilot["tau_r"], pilot["tau_d"]))
        out = simulate(N=15, stim_matrix=np.zeros((15, 24)),
                       verbose=False, **truth)
        assert out["spks"].sum() == 0
        assert np.isfinite(out["psc"]).all()


class TestSuppliedPhi:
    def test_half_supplied_phi_is_honoured(self):
        """Supplying only phi_0 (or only phi_1) must not silently
        re-draw BOTH — closed-loop rounds hold the circuit fixed via
        these kwargs (round-4 review finding)."""
        from circuitmap_tpu.simulation import simulate

        N = 12
        phi0 = np.linspace(0.08, 0.12, N)
        np.random.seed(0)
        a = simulate(N=N, trials=60, H=3, phi_0=phi0, verbose=False)
        np.testing.assert_array_equal(a["phi_0"], phi0)
        phi1 = np.linspace(4.0, 6.0, N)
        np.random.seed(0)
        b = simulate(N=N, trials=60, H=3, phi_1=phi1, verbose=False)
        np.testing.assert_array_equal(b["phi_1"], phi1)


class TestWindowEdges:
    def test_fast_stim_rate_does_not_wrap_observed_windows(self):
        """stim_freq > 200 Hz puts the first window's baseline before
        frame 0; a raw fancy index silently WRAPPED those samples to
        the end of the timeline (round-4 review finding) — they must be
        zero-filled like the true_responses path."""
        from circuitmap_tpu.simulation import (
            simulate_continuous_experiment_without_spike_failures)

        np.random.seed(3)
        expt = simulate_continuous_experiment_without_spike_failures(
            N=8, exp_len=20000, stim_freq=250)
        first = int(expt["stim_times"][0])
        lead = 100 - first  # window samples before frame 0
        assert lead > 0  # the config really exercises the edge
        obs = expt["obs_responses"]
        np.testing.assert_array_equal(obs[0, :lead], 0.0)
        # in-range part of the window still matches the raw timeline
        np.testing.assert_array_equal(
            obs[0, lead:], expt["pscs"][:obs.shape[1] - lead])


class TestContinuous:
    @pytest.fixture(scope="class")
    def expt(self):
        np.random.seed(3)
        return simulate_continuous_experiment(
            N=30, expt_len=int(1e5), H=5, stim_freq=30, spont_rate=3,
            verbose=False,
        )

    def test_shapes(self, expt):
        nstim = len(expt["stim_times"])
        assert expt["obs_responses"].shape == (nstim, 900)
        assert expt["true_responses"].shape == (nstim, 900)
        assert expt["stim_matrix"].shape == (30, nstim)
        assert expt["pscs"].shape == (int(1e5),)

    def test_observed_tracks_truth(self, expt):
        # observed responses = truth + overlap + noise; correlation over
        # the strongest trials should be high
        t, o = expt["true_responses"], expt["obs_responses"]
        strongest = np.argsort(t.max(1))[-20:]
        cors = [
            np.corrcoef(t[i], o[i])[0, 1]
            for i in strongest
            if t[i].std() > 0
        ]
        assert np.median(cors) > 0.6

    def test_ar1_noise_autocorrelated(self):
        from circuitmap_tpu.simulation import _ar1_noise
        import jax.numpy as jnp
        np.random.seed(4)
        eps = np.random.randn(50_000).astype(np.float32)
        x = np.asarray(_ar1_noise(jnp.asarray(eps), 0.95))
        # oracle loop on a prefix
        want = np.zeros(1000)
        want[0] = eps[0]
        for t in range(1, 1000):
            want[t] = 0.95 * want[t - 1] + eps[t]
        np.testing.assert_allclose(x[:1000], want, rtol=2e-3, atol=2e-3)
        # stationary variance approx 1/(1-a^2)
        assert abs(x.var() * (1 - 0.95**2) - 1.0) < 0.1
