"""Unit tests for the device kernels in circuitmap_tpu.ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from circuitmap_tpu.ops import (
    isotonic_regression,
    isotonic_regression_batched,
    isotonic_fit_at_max,
    isotonic_fit_at_max_batched,
    integrated_charge,
    trial_activity_mask,
    sample_truncated_normal,
    truncated_normal_mean,
    spike_rates_by_power,
    spike_rates_by_power_batched,
    monotone_decay_filter,
)


def pava_oracle(y):
    """Independent O(n^2) pool-adjacent-violators oracle (non-decreasing)."""
    y = list(map(float, y))
    vals, wgts = [], []
    for v in y:
        vals.append(v)
        wgts.append(1.0)
        while len(vals) > 1 and vals[-2] / wgts[-2] > vals[-1] / wgts[-1]:
            v1, w1 = vals.pop(), wgts.pop()
            vals[-1] += v1
            wgts[-1] += w1
    out = []
    for v, w in zip(vals, wgts):
        out.extend([v / w] * int(w))
    return np.array(out)


class TestPava:
    @pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 20])
    def test_matches_oracle(self, rng, n):
        for _ in range(20):
            y = rng.normal(size=n)
            got = np.asarray(isotonic_regression(jnp.array(y)))
            np.testing.assert_allclose(got, pava_oracle(y), rtol=1e-5, atol=1e-6)

    def test_monotone_and_mean_preserving(self, rng):
        y = rng.normal(size=12)
        fit = np.asarray(isotonic_regression(jnp.array(y)))
        assert np.all(np.diff(fit) >= -1e-6)
        # atol guard: the mean can land arbitrarily close to zero
        np.testing.assert_allclose(fit.mean(), y.mean(), rtol=1e-5, atol=1e-7)

    def test_idempotent(self, rng):
        y = rng.normal(size=9)
        once = isotonic_regression(jnp.array(y))
        twice = isotonic_regression(once)
        np.testing.assert_allclose(np.asarray(once), np.asarray(twice), atol=1e-6)

    def test_fit_at_max_equals_full_fit_last(self, rng):
        for n in [1, 3, 4, 7]:
            y = rng.normal(size=n)
            full = np.asarray(isotonic_regression(jnp.array(y)))[-1]
            fast = float(isotonic_fit_at_max(jnp.array(y)))
            assert abs(full - fast) < 1e-5

    def test_batched(self, rng):
        Y = rng.normal(size=(6, 5))
        full = np.asarray(isotonic_regression_batched(jnp.array(Y), 1.0))
        for i in range(6):
            np.testing.assert_allclose(full[i], pava_oracle(Y[i]), rtol=1e-5, atol=1e-6)
        last = np.asarray(isotonic_fit_at_max_batched(jnp.array(Y)))
        np.testing.assert_allclose(last, full[:, -1], rtol=1e-5, atol=1e-6)

    def test_gamma_decay(self):
        # hand-computed two-point merge under gamma=0.5:
        # pools: v = 1 + 0.2*0.5 = 1.1, w = 1 + 0.25 = 1.25 -> level 0.88,
        # second position decays by gamma -> 0.44
        y = np.array([1.0, 0.2])
        fit = np.asarray(isotonic_regression(jnp.array(y), 0.5))
        np.testing.assert_allclose(fit, [0.88, 0.44], rtol=1e-5)

    def test_gamma_no_merge_on_constant(self):
        # under decay, a constant sequence is NOT a violation (the decayed
        # end of the previous pool sits below the next value), so the fit
        # is the identity
        y = np.ones(4)
        fit = np.asarray(isotonic_regression(jnp.array(y), 0.5))
        np.testing.assert_allclose(fit, y, rtol=1e-6)


class TestCharge:
    def test_integrated_charge_matches_trapz(self, rng):
        psc = rng.normal(size=(7, 30))
        got = np.asarray(integrated_charge(jnp.array(psc)))
        # f32 device sum vs f64 numpy: near-zero row sums need an atol
        np.testing.assert_allclose(
            got, np.trapezoid(psc, axis=-1), rtol=1e-5, atol=1e-5
        )

    def test_activity_mask(self, rng):
        psc = np.zeros((4, 10))
        psc[1] = 0.2
        psc[3] = 1.0
        mask = np.asarray(trial_activity_mask(jnp.array(psc), 1e-2))
        # sum of squares: row1 = 0.4 > 0.01, row3 = 10 > 0.01
        np.testing.assert_array_equal(mask, [False, True, False, True])


class TestTruncNorm:
    def test_sample_stats(self):
        key = jax.random.PRNGKey(0)
        mean = jnp.array([0.15, 5.0])
        sd = jnp.array([0.1, 1.0])
        samps = sample_truncated_normal(key, mean, sd, 20000)
        assert samps.shape == (20000, 2)
        assert float(jnp.min(samps)) > 0.0
        analytic = truncated_normal_mean(mean, sd)
        np.testing.assert_allclose(
            np.asarray(jnp.mean(samps, 0)), np.asarray(analytic), rtol=2e-2
        )

    def test_analytic_mean_limits(self):
        # far from the truncation boundary the truncated mean -> raw mean
        m = truncated_normal_mean(jnp.array([10.0]), jnp.array([1.0]))
        np.testing.assert_allclose(float(m[0]), 10.0, atol=1e-4)

    def test_analytic_mean_deep_negative_tail(self):
        """mean << 0 (relative to sd): f32 `1 - ndtr(alpha)` used to
        cancel catastrophically — wrong-signed at -5*sd, ~1e30 at
        -5.5*sd (round-4 review finding). The (0, inf)-truncated mean
        is always positive and for deep tails approaches sd^2/|mean|
        (Mills asymptote)."""
        means = jnp.array([-5.0, -5.5, -8.0, -20.0, -100.0])
        m = np.asarray(truncated_normal_mean(means, jnp.ones(5)))
        assert np.all(m > 0) and np.all(np.isfinite(m))
        # scipy.stats.truncnorm.mean ground truth at these params
        exact = [0.186504, 0.171410, 0.121368, 0.049753, 0.009998]
        np.testing.assert_allclose(m, exact, rtol=1e-2)
        np.testing.assert_allclose(m[:3], exact[:3], rtol=5e-4)


class TestSpikeRates:
    def test_matches_oracle(self, rng):
        K, P = 50, 3
        powers = np.array([45.0, 55.0, 65.0])
        stim = powers[rng.integers(0, P, size=K)] * (rng.random(K) > 0.3)
        lam = rng.random(K)
        got = np.asarray(
            spike_rates_by_power(jnp.array(stim), jnp.array(lam), jnp.array(powers))
        )
        want = np.zeros(P)
        for p in range(P):
            locs = stim == powers[p]
            if locs.sum():
                want[p] = lam[locs].mean()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_empty_bucket_is_zero(self):
        powers = jnp.array([45.0, 55.0])
        stim = jnp.array([45.0, 45.0, 0.0])
        lam = jnp.array([1.0, 0.5, 0.9])
        got = np.asarray(spike_rates_by_power(stim, lam, powers))
        np.testing.assert_allclose(got, [0.75, 0.0], rtol=1e-5)

    def test_batched_shape(self, rng):
        stim = jnp.array(rng.random((4, 20)))
        lam = jnp.array(rng.random((4, 20)))
        powers = jnp.array([0.25, 0.5, 0.75, 1.0])
        assert spike_rates_by_power_batched(stim, lam, powers).shape == (4, 4)


class TestMonotoneFilter:
    def _oracle(self, arr, start):
        out = arr.copy()
        for t in range(start, arr.shape[1]):
            out[:, t] = np.minimum(out[:, t], out[:, t - 1])
        return out

    def test_matches_host_loop(self, rng):
        arr = rng.normal(size=(5, 40)).astype(np.float32)
        got = np.asarray(monotone_decay_filter(jnp.array(arr), start=13))
        np.testing.assert_allclose(got, self._oracle(arr, 13), rtol=1e-6)

    def test_start_zero(self, rng):
        arr = rng.normal(size=(2, 10)).astype(np.float32)
        got = np.asarray(monotone_decay_filter(jnp.array(arr), start=0))
        want = np.minimum.accumulate(arr, axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestBlockedDmaSweep:
    """Blocked manual-DMA kernel == XLA blocked sweep with the matching
    block-consecutive order (exact, incl. N not a multiple of the block)."""

    def _inputs(self, N, K, seed=0):
        import jax.numpy as jnp
        rng = np.random.default_rng(seed)
        stim = np.zeros((N, K), np.float32)
        for k in range(K):
            stim[rng.choice(N, 3, replace=False), k] = rng.choice(
                [45.0, 55.0, 65.0])
        powers = jnp.asarray([45.0, 55.0, 65.0], jnp.float32)
        counts = np.stack([(stim == p).sum(1) for p in (45., 55., 65.)],
                          1).astype(np.float32)
        lam = (rng.random((N, K)) * (stim > 0)).astype(np.float32)
        args = dict(
            y=jnp.asarray(np.abs(rng.normal(size=K)), jnp.float32),
            stim=jnp.asarray(stim),
            mu=jnp.asarray(rng.uniform(0, 2, N), jnp.float32),
            beta=jnp.asarray(rng.uniform(0.1, 1, N), jnp.float32),
            lam=jnp.asarray(lam),
            sig=jnp.float32(1.3),
            m0=jnp.asarray(rng.uniform(0.05, 0.2, N), jnp.float32),
            m1=jnp.asarray(rng.uniform(3, 8, N), jnp.float32),
            lam_mask=jnp.asarray((rng.random(K) > 0.05), jnp.float32),
            powers=powers,
        )
        return args, jnp.asarray(counts)

    @pytest.mark.parametrize("N,K", [(64, 300), (60, 257)])
    def test_matches_xla_blocked(self, N, K):
        import jax.numpy as jnp
        from circuitmap_tpu.ops.sweep_pallas import (
            sweep_spikes_pallas_dma_blocked)
        from circuitmap_tpu.solvers.caviar import sweep_spikes

        B = 8
        args, counts = self._inputs(N, K)
        nb_pad = -(-N // B)
        rng = np.random.default_rng(7)
        border = jnp.asarray(rng.permutation(nb_pad), jnp.int32)

        got = sweep_spikes_pallas_dma_blocked(
            args["y"], args["stim"], args["mu"], args["beta"], args["lam"],
            args["sig"], args["m0"], args["m1"], args["lam_mask"],
            args["powers"], counts, border, jnp.float32(0.3),
            jnp.float32(3.0), jnp.float32(1.0),
            interpret=True, block_size=B)

        # reference: XLA blocked sweep on the row-padded problem with the
        # equivalent block-consecutive per-neuron order
        Npad = nb_pad * B
        pad = Npad - N
        def rpad(a, n=1):
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) \
                if pad else a
        order = (np.asarray(border)[:, None] * B
                 + np.arange(B)[None, :]).ravel()
        want = sweep_spikes(
            args["y"], rpad(args["stim"]), rpad(args["mu"]),
            rpad(args["beta"]), rpad(args["lam"]), args["sig"],
            rpad(args["m0"]), rpad(args["m1"]), args["lam_mask"],
            args["powers"], jnp.asarray(order), jnp.float32(0.3),
            jnp.float32(3.0), gate_active=jnp.asarray(True), block_size=B)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want)[:N],
                                   rtol=1e-5, atol=1e-6)

    def test_gate_inactive_passthrough(self):
        import jax.numpy as jnp
        from circuitmap_tpu.ops.sweep_pallas import (
            sweep_spikes_pallas_dma_blocked)
        from circuitmap_tpu.solvers.caviar import sweep_spikes

        N, K, B = 32, 200, 8
        args, counts = self._inputs(N, K, seed=3)
        border = jnp.arange(N // B, dtype=jnp.int32)
        got = sweep_spikes_pallas_dma_blocked(
            args["y"], args["stim"], args["mu"], args["beta"], args["lam"],
            args["sig"], args["m0"], args["m1"], args["lam_mask"],
            args["powers"], counts, border, jnp.float32(0.3),
            jnp.float32(3.0), jnp.float32(0.0),   # gate inactive
            interpret=True, block_size=B)
        want = sweep_spikes(
            args["y"], args["stim"], args["mu"], args["beta"], args["lam"],
            args["sig"], args["m0"], args["m1"], args["lam_mask"],
            args["powers"], jnp.arange(N), jnp.float32(0.3),
            jnp.float32(3.0), gate_active=jnp.asarray(False), block_size=B)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


class TestBlockedDmaFullFit:
    def test_full_fit_matches_xla_blocked(self):
        """caviar with sweep_impl='pallas_blocked_interpret' must match
        sweep_impl='xla' + the same blocked schedule... the orders differ
        (block-permuted vs neuron-permuted), so compare RECOVERY quality
        instead: both fits on the same sim land at the same support."""
        import jax.numpy as jnp
        from circuitmap_tpu.model import default_priors
        from circuitmap_tpu.simulation import simulate
        from circuitmap_tpu.solvers import caviar
        from circuitmap_tpu.utils.metrics import r2_score

        np.random.seed(21)
        sim = simulate(N=48, trials=400, H=5, connection_prob=0.1,
                       spont_prob=0.01, gp_scale=1e-3, verbose=False)
        p = default_priors(48)
        args = (sim["psc"], sim["stim_matrix"], p["mu"], p["beta"],
                p["shape"], p["rate"], p["phi"], p["phi_cov"])
        kw = dict(iters=12, seed=0, verbose=False, fn_scan=False,
                  analytic_mc=True, sweep_block_size=8)
        a = caviar(*args, sweep_impl="pallas_blocked_interpret", **kw)
        b = caviar(*args, sweep_impl="xla", **kw)
        r2a = r2_score(sim["weights"], np.asarray(a[0]))
        r2b = r2_score(sim["weights"], np.asarray(b[0]))
        assert r2a > 0.8 and r2b > 0.8
        np.testing.assert_array_equal(np.asarray(a[0]) != 0,
                                      np.asarray(b[0]) != 0)

    def test_identity_order_exact_match(self):
        """With update_order='identity' the blocked kernel and the XLA
        blocked sweep follow the SAME schedule -> full fits match."""
        import jax.numpy as jnp
        from circuitmap_tpu.model import default_priors
        from circuitmap_tpu.simulation import simulate
        from circuitmap_tpu.solvers import caviar

        np.random.seed(22)
        sim = simulate(N=48, trials=400, H=5, connection_prob=0.1,
                       spont_prob=0.01, gp_scale=1e-3, verbose=False)
        p = default_priors(48)
        args = (sim["psc"], sim["stim_matrix"], p["mu"], p["beta"],
                p["shape"], p["rate"], p["phi"], p["phi_cov"])
        kw = dict(iters=10, seed=0, verbose=False, fn_scan=False,
                  analytic_mc=True, sweep_block_size=8,
                  update_order="identity")
        a = caviar(*args, sweep_impl="pallas_blocked_interpret", **kw)
        b = caviar(*args, sweep_impl="xla", **kw)
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]),
                                   rtol=2e-4, atol=1e-4)


class TestSweepVmemRouting:
    """K-aware auto routing: past the Pallas ring's VMEM budget the
    sweep falls back to the XLA blocked schedule (the observed failure:
    a compile-time scoped-vmem OOM at N=1000/K=100096, block 8)."""

    def test_budget_helpers(self):
        from circuitmap_tpu.solvers.caviar import (
            _blocked_sweep_fits, _row_sweep_fits)
        assert _blocked_sweep_fits(20000, 8)       # the bench shape
        assert _blocked_sweep_fits(50000, 8)       # measured ok (SCALING)
        assert not _blocked_sweep_fits(100000, 8)  # the observed OOM
        # round-5 hardware bisect (direct kernel compiles on the chip):
        # lowers at K128=51200, scoped-vmem OOM from K128=52224 — the
        # round-4 analytic model wrongly admitted K in (52224, 67k)
        assert _blocked_sweep_fits(51200, 8)
        assert not _blocked_sweep_fits(52224, 8)
        assert not _blocked_sweep_fits(60000, 8)   # the N=5000 row OOM
        assert _row_sweep_fits(100000)
        assert _row_sweep_fits(200000)             # probed ok (round 5)
        assert not _row_sweep_fits(500000)

    def test_auto_routing_respects_budget(self, monkeypatch):
        import importlib

        # the package re-exports the caviar FUNCTION, which shadows the
        # submodule under `import ... as`; importlib returns the module
        mod = importlib.import_module("circuitmap_tpu.solvers.caviar")

        class _Dev:
            platform = "tpu"

        monkeypatch.setattr(mod.jax, "devices", lambda *a: [_Dev()])
        assert mod._resolve_sweep_impl("auto", 8, k=20000) == "pallas_blocked"
        assert mod._resolve_sweep_impl("auto", 8, k=100000) == "xla"
        assert mod._resolve_sweep_impl("auto", 1, k=100000) == "pallas"
        assert mod._resolve_sweep_impl("auto", 1, k=500000) == "xla"
        # k unknown (entry/profile paths): unchanged behaviour
        assert mod._resolve_sweep_impl("auto", 8) == "pallas_blocked"
        # explicit names stay verbatim (pinned-measurement contract)
        assert mod._resolve_sweep_impl("pallas_blocked", 8,
                                       k=100000) == "pallas_blocked"
        # joint resolver: auto block degrades 8 -> 1 (row kernel, 15x
        # faster than the XLA fallback at K=100k) -> xla
        assert mod._resolve_sweep("auto", "auto",
                                  k=20000) == (8, "pallas_blocked")
        assert mod._resolve_sweep("auto", "auto", k=100000) == (1, "pallas")
        assert mod._resolve_sweep("auto", "auto", k=500000) == (8, "xla")
        # a PINNED block size is never rewritten by auto
        assert mod._resolve_sweep("auto", 8, k=100000) == (8, "xla")
        assert mod._resolve_sweep("xla", "auto", k=20000) == (8, "xla")
