"""Batched multi-experiment fitting must match individual fits."""

import numpy as np
import pytest

from circuitmap_tpu.model import default_priors
from circuitmap_tpu.simulation import simulate
from circuitmap_tpu.solvers import caviar, caviar_many
from circuitmap_tpu.utils.metrics import r2_score


@pytest.fixture(scope="module")
def sims():
    out = []
    for seed in (31, 32, 33):
        np.random.seed(seed)
        # enough connections (~5) that one borderline miss can't dominate
        # the recovery metric on these deliberately tiny maps
        out.append(simulate(N=24, trials=240, H=3, connection_prob=0.2,
                            spont_prob=0.01, gp_scale=1e-3, verbose=False))
    return out


def test_matches_individual_fits(sims):
    p = default_priors(24)
    prior_args = (p["mu"], p["beta"], p["shape"], p["rate"], p["phi"],
                  p["phi_cov"])
    kw = dict(iters=10, fn_scan=False, analytic_mc=True)

    batch = caviar_many(
        np.stack([s["psc"] for s in sims]),
        np.stack([s["stim_matrix"] for s in sims]),
        *prior_args, seeds=[0, 1, 2], verbose=False, **kw,
    )
    for b, s in enumerate(sims):
        single = caviar(s["psc"], s["stim_matrix"], *prior_args, seed=b,
                        verbose=False, sweep_impl="xla", **kw)
        np.testing.assert_allclose(np.asarray(single[0]), batch[b]["mu"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(single[2]), batch[b]["lam"],
                                   rtol=1e-4, atol=1e-4)


def test_device_resident_input_matches_host_input(sims):
    """A jax.Array y_pscs (e.g. a batched demixer output) must stay on
    device — no host round trip — and fit identically to the same data
    fed from host (review fix: caviar_many used to np.asarray device
    inputs, pulling the whole [B, K, T] block through the tunnel)."""
    import jax.numpy as jnp

    p = default_priors(24)
    prior_args = (p["mu"], p["beta"], p["shape"], p["rate"], p["phi"],
                  p["phi_cov"])
    kw = dict(iters=4, fn_scan=False, analytic_mc=True, seeds=[0, 1, 2],
              verbose=False)
    host = np.stack([s["psc"] for s in sims]).astype(np.float32)
    stims = np.stack([s["stim_matrix"] for s in sims])
    a = caviar_many(host, stims, *prior_args, **kw)
    b = caviar_many(jnp.asarray(host), stims, *prior_args, **kw)
    for ra, rb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ra["mu"]),
                                      np.asarray(rb["mu"]))


def test_packed_input_matches_dense(sims):
    """A PackedInt4Traces batch body (the fit server's /fit_many int4
    wire) flattens to ONE device unpack — bit-identical to feeding the
    dense reconstruction."""
    from circuitmap_tpu.utils.quant import (PackedInt4Traces,
                                            encode_int4_traces)

    p = default_priors(24)
    prior_args = (p["mu"], p["beta"], p["shape"], p["rate"], p["phi"],
                  p["phi_cov"])
    kw = dict(iters=4, fn_scan=False, analytic_mc=True, seeds=[0, 1, 2],
              verbose=False)
    host = np.stack([s["psc"] for s in sims])
    stims = np.stack([s["stim_matrix"] for s in sims])
    B, K, T = host.shape
    packed, scale = encode_int4_traces(
        np.ascontiguousarray(host.reshape(B * K, T)), decimate=2)
    cont = PackedInt4Traces(packed, scale, T, 2, lead=(B, K))
    a = caviar_many(cont, stims, *prior_args, **kw)
    b = caviar_many(cont.dense(), stims, *prior_args, **kw)
    for ra, rb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ra["mu"]),
                                      np.asarray(rb["mu"]))
        np.testing.assert_array_equal(np.asarray(ra["lam"]),
                                      np.asarray(rb["lam"]))


def test_recovery_per_map(sims):
    # 12 iterations: small maps (N=24, 240 trials) are converged by then;
    # longer runs can over-prune borderline cells on this little data
    # (reference-faithful behaviour, see test_sharded.py fixture note)
    p = default_priors(24)
    batch = caviar_many(
        np.stack([s["psc"] for s in sims]),
        np.stack([s["stim_matrix"] for s in sims]),
        p["mu"], p["beta"], p["shape"], p["rate"], p["phi"], p["phi_cov"],
        iters=12, verbose=False,
    )
    for b, s in enumerate(sims):
        assert r2_score(s["weights"], batch[b]["mu"]) > 0.7


def test_compile_modes_agree(sims):
    """sequential (single-fit-program reuse, the no-mesh default) and
    batched (one vmapped program) must produce the same posteriors."""
    p = default_priors(24)
    prior_args = (p["mu"], p["beta"], p["shape"], p["rate"], p["phi"],
                  p["phi_cov"])
    stack = (np.stack([s["psc"] for s in sims]),
             np.stack([s["stim_matrix"] for s in sims]))
    kw = dict(iters=8, fn_scan=False, analytic_mc=True, seeds=[0, 1, 2],
              verbose=False)
    seq = caviar_many(*stack, *prior_args, compile_mode="sequential", **kw)
    bat = caviar_many(*stack, *prior_args, compile_mode="batched", **kw)
    for b in range(3):
        np.testing.assert_allclose(seq[b]["mu"], bat[b]["mu"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(seq[b]["lam"], bat[b]["lam"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(seq[b]["phi"], bat[b]["phi"],
                                   rtol=1e-4, atol=1e-4)


def test_compile_mode_validation(sims):
    p = default_priors(24)
    stack = (np.stack([s["psc"] for s in sims]),
             np.stack([s["stim_matrix"] for s in sims]))
    args = (*stack, p["mu"], p["beta"], p["shape"], p["rate"], p["phi"],
            p["phi_cov"])
    with pytest.raises(ValueError, match="compile_mode"):
        caviar_many(*args, compile_mode="bogus", verbose=False)
    from circuitmap_tpu.parallel import trial_mesh

    with pytest.raises(ValueError, match="sequential"):
        caviar_many(*args, compile_mode="sequential", mesh=trial_mesh(2),
                    verbose=False)


def test_mismatched_power_levels_rejected(sims):
    p = default_priors(24)
    stims = np.stack([s["stim_matrix"] for s in sims])
    stims[1] = stims[1] * 2.0  # different power levels
    with pytest.raises(ValueError, match="share the same power levels"):
        caviar_many(np.stack([s["psc"] for s in sims]), stims,
                    p["mu"], p["beta"], p["shape"], p["rate"], p["phi"],
                    p["phi_cov"], iters=2, verbose=False)


def test_reconnect_refits_batched_in_one_dispatch(sims, monkeypatch):
    """Post-reconnect power-curve refits must run as ONE vmapped dispatch
    covering every reconnected experiment (round-2 verdict #8), and the
    batched results must equal per-experiment refits."""
    import jax.numpy as jnp
    from circuitmap_tpu.solvers import batched as mod
    from circuitmap_tpu.solvers._laplace import laplace_phi_update_jit

    p = default_priors(24)
    prior_args = (p["mu"], p["beta"], p["shape"], p["rate"], p["phi"],
                  p["phi_cov"])

    # force a deterministic "reconnection" in experiments 0 and 2: flip a
    # couple of lam entries so the refit actually has something to do
    real_scan = mod.reconnect_from_spontaneous

    def fake_scan(y, stim, lam, mu, beta, z, **kwargs):
        b = fake_scan.calls
        fake_scan.calls += 1
        if b in (0, 2):
            lam = np.asarray(lam).copy()
            row = np.flatnonzero((np.asarray(stim) > 0).sum(1) > 3)[0]
            lam[row, np.asarray(stim)[row] > 0] = 0.9
            return mu, beta, lam, z, True
        return mu, beta, np.asarray(lam), z, False

    fake_scan.calls = 0
    monkeypatch.setattr(mod, "reconnect_from_spontaneous", fake_scan)

    calls = {"n": 0}
    real_many = mod._laplace_refit_many

    def counting_many(*args):
        calls["n"] += 1
        return real_many(*args)

    monkeypatch.setattr(mod, "_laplace_refit_many", counting_many)

    batch = mod.caviar_many(
        np.stack([s["psc"] for s in sims]),
        np.stack([s["stim_matrix"] for s in sims]),
        *prior_args, seeds=[0, 1, 2], verbose=False,
        iters=6, fn_scan=True, analytic_mc=True,
    )
    assert calls["n"] == 1, "refits must batch into a single dispatch"

    # equality vs the per-experiment eager refit on the same lam
    for b in (0, 2):
        stim = np.asarray(sims[b]["stim_matrix"])
        powers = np.unique(stim)[1:]
        phi_ref, phi_cov_ref = laplace_phi_update_jit(
            jnp.asarray(batch[b]["lam"], jnp.float32),
            jnp.asarray(stim, jnp.float32),
            jnp.asarray(p["phi"], jnp.float32),
            jnp.asarray(p["phi_cov"], jnp.float32),
            powers=jnp.asarray(powers, jnp.float32),
        )
        np.testing.assert_allclose(batch[b]["phi"], np.asarray(phi_ref),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(batch[b]["phi_cov"],
                                   np.asarray(phi_cov_ref),
                                   rtol=2e-4, atol=2e-5)
    # untouched experiment keeps its in-loop phi
    assert batch[1]["phi"].shape == (24, 2)


def test_blocked_kernel_matches_grid_path(sims):
    """caviar_many with sweep_block_size=8 (batched blocked kernel, here
    in interpret mode via monkeypatching the resolver) must recover the
    same support as the default path on identical data."""
    import jax.numpy as jnp
    from circuitmap_tpu.solvers import batched as mod

    p = default_priors(24)
    prior_args = (p["mu"], p["beta"], p["shape"], p["rate"], p["phi"],
                  p["phi_cov"])
    stack = (np.stack([s["psc"] for s in sims]),
             np.stack([s["stim_matrix"] for s in sims]))
    kw = dict(iters=10, fn_scan=False, analytic_mc=True, seeds=[0, 1, 2],
              verbose=False)

    default = mod.caviar_many(*stack, *prior_args, **kw)
    real_resolve = mod._resolve_sweep
    mod._resolve_sweep = lambda impl, block, k=None: (
        8, "pallas_blocked_interpret")
    try:
        blocked = mod.caviar_many(*stack, *prior_args,
                                  sweep_block_size=8, **kw)
    finally:
        mod._resolve_sweep = real_resolve
    for b in range(len(sims)):
        np.testing.assert_array_equal(default[b]["mu"] != 0,
                                      blocked[b]["mu"] != 0)
        np.testing.assert_allclose(default[b]["mu"], blocked[b]["mu"],
                                   rtol=0.05, atol=0.05)


def test_trace_wire_matches_plain_upload(sims):
    """caviar_many(trace_wire=) must recover the same support as the
    full-f32 upload (int4d2 is 1/16 of the f32 bytes; the charge
    integral averages the quantisation noise out)."""
    from circuitmap_tpu.solvers import batched as mod

    p = default_priors(24)
    prior_args = (p["mu"], p["beta"], p["shape"], p["rate"], p["phi"],
                  p["phi_cov"])
    stack = (np.stack([s["psc"] for s in sims]),
             np.stack([s["stim_matrix"] for s in sims]))
    kw = dict(iters=10, fn_scan=False, analytic_mc=True, seeds=[0, 1, 2],
              verbose=False)
    plain = mod.caviar_many(*stack, *prior_args, **kw)
    wired = mod.caviar_many(*stack, *prior_args, trace_wire="int4d2", **kw)
    for b in range(len(sims)):
        np.testing.assert_array_equal(plain[b]["mu"] != 0,
                                      wired[b]["mu"] != 0)
        np.testing.assert_allclose(plain[b]["mu"], wired[b]["mu"],
                                   rtol=0.1, atol=0.05)


@pytest.fixture(scope="module")
def ragged_sims():
    """Three maps of the same rig with DIFFERENT trial counts."""
    out = []
    for seed, k in ((41, 192), (42, 320), (43, 256)):
        np.random.seed(seed)
        out.append(simulate(N=24, trials=k, H=3, connection_prob=0.2,
                            spont_prob=0.01, gp_scale=1e-3, verbose=False))
    return out


class TestRagged:
    """Ragged batches: experiments with different trial counts padded
    to one shared K and fit with per-experiment traced k_true (the
    streaming solver's inert-padding contract)."""

    P = default_priors(24)
    PRIOR_ARGS = (P["mu"], P["beta"], P["shape"], P["rate"], P["phi"],
                  P["phi_cov"])

    @staticmethod
    def _lists(ragged_sims):
        return ([s["psc"] for s in ragged_sims],
                [s["stim_matrix"] for s in ragged_sims])

    def test_matches_individual_fits(self, ragged_sims):
        """Each ragged-batch posterior equals the same experiment fit
        alone (to the inert-padding tolerance: the 128-padded widths
        differ, 384 shared vs per-experiment)."""
        ys, sts = self._lists(ragged_sims)
        kw = dict(iters=10, fn_scan=False, analytic_mc=True)
        batch = caviar_many(ys, sts, *self.PRIOR_ARGS,
                            seeds=[0, 1, 2], verbose=False, **kw)
        for b, s in enumerate(ragged_sims):
            k_b = s["psc"].shape[0]
            assert batch[b]["lam"].shape == (24, k_b)
            assert batch[b]["z"].shape == (k_b,)
            single = caviar(s["psc"], s["stim_matrix"], *self.PRIOR_ARGS,
                            seed=b, verbose=False, sweep_impl="xla", **kw)
            np.testing.assert_allclose(np.asarray(single[0]),
                                       batch[b]["mu"],
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(single[2]),
                                       batch[b]["lam"],
                                       rtol=1e-4, atol=1e-4)

    def test_modes_agree(self, ragged_sims):
        ys, sts = self._lists(ragged_sims)
        kw = dict(iters=8, fn_scan=False, analytic_mc=True,
                  seeds=[0, 1, 2], verbose=False)
        seq = caviar_many(ys, sts, *self.PRIOR_ARGS,
                          compile_mode="sequential", **kw)
        bat = caviar_many(ys, sts, *self.PRIOR_ARGS,
                          compile_mode="batched", **kw)
        for b in range(3):
            np.testing.assert_allclose(seq[b]["mu"], bat[b]["mu"],
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(seq[b]["lam"], bat[b]["lam"],
                                       rtol=1e-4, atol=1e-4)

    def test_mesh_matches_local(self, ragged_sims):
        from circuitmap_tpu.parallel import trial_mesh

        ys, sts = self._lists(ragged_sims)
        kw = dict(iters=8, fn_scan=False, analytic_mc=True,
                  seeds=[0, 1, 2], verbose=False)
        local = caviar_many(ys, sts, *self.PRIOR_ARGS,
                            compile_mode="batched", **kw)
        mesh = caviar_many(ys, sts, *self.PRIOR_ARGS,
                           mesh=trial_mesh(4), **kw)
        for b in range(3):
            np.testing.assert_allclose(local[b]["mu"], mesh[b]["mu"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(local[b]["lam"], mesh[b]["lam"],
                                       rtol=1e-5, atol=1e-5)

    def test_fn_scan_reconnect_and_recovery(self, ragged_sims):
        """fn_scan=True exercises the ragged reconnect + the padded
        batched power-curve refit; recovery must hold per map."""
        ys, sts = self._lists(ragged_sims)
        batch = caviar_many(ys, sts, *self.PRIOR_ARGS, iters=15,
                            fn_scan=True, analytic_mc=True,
                            seeds=[0, 1, 2], verbose=False)
        for b, s in enumerate(ragged_sims):
            assert batch[b]["lam"].shape[1] == s["psc"].shape[0]
            r2 = r2_score(s["weights"], batch[b]["mu"])
            assert r2 > 0.9, f"map {b}: R2={r2:.3f}"

    def test_validation(self, ragged_sims):
        import jax.numpy as jnp

        ys, sts = self._lists(ragged_sims)
        with pytest.raises(ValueError, match="matching list"):
            caviar_many(ys, np.stack([s[:, :192] for s in sts]),
                        *self.PRIOR_ARGS, verbose=False)
        with pytest.raises(ValueError, match="stim must be"):
            caviar_many(ys, [sts[0], sts[0], sts[2]],
                        *self.PRIOR_ARGS, verbose=False)
        with pytest.raises(ValueError, match="traces must be"):
            caviar_many([ys[0], ys[1][:, :-1], ys[2]], sts,
                        *self.PRIOR_ARGS, verbose=False)
        with pytest.raises(ValueError, match="host trace arrays"):
            caviar_many([jnp.asarray(ys[0]), ys[1], ys[2]], sts,
                        *self.PRIOR_ARGS, verbose=False)

    def test_explicit_k_trues_matches_list(self, ragged_sims):
        """k_trues= over an already-padded stack (the fit server's
        ragged wire) equals the list form; garbage left in the padded
        TRACE columns is masked out on device."""
        ys, sts = self._lists(ragged_sims)
        kw = dict(iters=8, fn_scan=False, analytic_mc=True,
                  seeds=[0, 1, 2], verbose=False)
        ref = caviar_many(ys, sts, *self.PRIOR_ARGS, **kw)
        ks = [y.shape[0] for y in ys]
        k_pad = 384
        y_pad = np.full((3, k_pad, ys[0].shape[1]), 7.7, np.float32)
        s_pad = np.zeros((3, 24, k_pad), np.float32)
        for b in range(3):
            y_pad[b, :ks[b]] = ys[b]
            s_pad[b, :, :ks[b]] = sts[b]
        out = caviar_many(y_pad, s_pad, *self.PRIOR_ARGS,
                          k_trues=ks, **kw)
        for b in range(3):
            assert out[b]["lam"].shape == (24, ks[b])
            np.testing.assert_allclose(ref[b]["mu"], out[b]["mu"],
                                       rtol=1e-5, atol=1e-6)

    def test_explicit_k_trues_validation(self, ragged_sims):
        ys, sts = self._lists(ragged_sims)
        ks = [y.shape[0] for y in ys]
        y_pad = np.zeros((3, 384, ys[0].shape[1]), np.float32)
        s_pad = np.zeros((3, 24, 384), np.float32)
        for b in range(3):
            y_pad[b, :ks[b]] = ys[b]
            s_pad[b, :, :ks[b]] = sts[b]
        with pytest.raises(ValueError, match="k_trues must be"):
            caviar_many(y_pad, s_pad, *self.PRIOR_ARGS,
                        k_trues=[1, 2], verbose=False)
        with pytest.raises(ValueError, match="k_trues must be"):
            caviar_many(y_pad, s_pad, *self.PRIOR_ARGS,
                        k_trues=[192, 320, 999], verbose=False)
        bad = s_pad.copy()
        bad[1, :, 350:] = 55.0  # garbage power levels in the padding
        with pytest.raises(ValueError, match="must be zero"):
            caviar_many(y_pad, bad, *self.PRIOR_ARGS,
                        k_trues=ks, verbose=False)
        with pytest.raises(ValueError, match="not both"):
            caviar_many(ys, sts, *self.PRIOR_ARGS,
                        k_trues=ks, verbose=False)


class TestSolverFamilyMany:
    """sns_many / mbcs_many: the solver-family siblings of caviar_many
    (same compile_mode / mesh semantics, shared fan-out engine)."""

    P = default_priors(24)

    @staticmethod
    def _stack(sims):
        return (np.stack([s["psc"] for s in sims]),
                np.stack([s["stim_matrix"] for s in sims]))

    def test_sns_matches_individual_fits(self, sims):
        from circuitmap_tpu.solvers import sns_many
        from circuitmap_tpu.solvers.cavi_sns import cavi_sns

        p = self.P
        args = (p["mu"], p["beta"], p["alpha"], p["shape"], p["rate"],
                p["phi"], p["phi_cov"])
        kw = dict(iters=6, num_mc_samples=20, analytic_mc=True)
        batch = sns_many(*self._stack(sims), *args, seeds=[0, 1, 2],
                         verbose=False, **kw)
        for b, s in enumerate(sims):
            single = cavi_sns(s["psc"], s["stim_matrix"], *args, seed=b,
                              save_histories=False, verbose=False, **kw)
            np.testing.assert_allclose(np.asarray(single[0]),
                                       batch[b]["mu"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(single[2]),
                                       batch[b]["alpha"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(single[3]),
                                       batch[b]["lam"],
                                       rtol=1e-5, atol=1e-5)

    def test_mbcs_matches_individual_fits(self, sims):
        from circuitmap_tpu.solvers import mbcs_many
        from circuitmap_tpu.solvers.mbcs import mbcs

        p = self.P
        kw = dict(iters=6, analytic_noise=True)
        batch = mbcs_many(*self._stack(sims), p["mu"], p["beta"],
                          p["shape"], p["rate"], seeds=[0, 1, 2],
                          verbose=False, **kw)
        for b, s in enumerate(sims):
            single = mbcs(s["psc"], s["stim_matrix"], p["mu"], p["beta"],
                          p["shape"], p["rate"], seed=b,
                          save_histories=False, verbose=False, **kw)
            np.testing.assert_allclose(np.asarray(single[0]),
                                       batch[b]["mu"],
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(single[2]),
                                       batch[b]["lam"],
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(single[6]),
                                       batch[b]["receptive_fields"],
                                       rtol=1e-4, atol=1e-4)

    def test_modes_agree_and_mesh_matches_local(self, sims):
        from circuitmap_tpu.parallel import trial_mesh
        from circuitmap_tpu.solvers import mbcs_many, sns_many

        p = self.P
        stack = self._stack(sims)
        sns_args = (p["mu"], p["beta"], p["alpha"], p["shape"], p["rate"],
                    p["phi"], p["phi_cov"])
        kw = dict(iters=4, num_mc_samples=20, analytic_mc=True,
                  seeds=[0, 1, 2], verbose=False)
        seq = sns_many(*stack, *sns_args, compile_mode="sequential", **kw)
        bat = sns_many(*stack, *sns_args, compile_mode="batched", **kw)
        mesh = sns_many(*stack, *sns_args, mesh=trial_mesh(4), **kw)
        for b in range(3):
            np.testing.assert_allclose(seq[b]["mu"], bat[b]["mu"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(bat[b]["mu"], mesh[b]["mu"],
                                       rtol=1e-5, atol=1e-6)
        mkw = dict(iters=4, analytic_noise=True, seeds=[0, 1, 2],
                   verbose=False)
        seq = mbcs_many(*stack, p["mu"], p["beta"], p["shape"], p["rate"],
                        compile_mode="sequential", **mkw)
        mesh = mbcs_many(*stack, p["mu"], p["beta"], p["shape"], p["rate"],
                         mesh=trial_mesh(4), **mkw)
        for b in range(3):
            np.testing.assert_allclose(seq[b]["mu"], mesh[b]["mu"],
                                       rtol=1e-5, atol=1e-6)

    def test_ragged_sns_matches_individual_fits(self, ragged_sims):
        """Ragged sns_many IS the per-experiment single fits (the
        sequential true-shape contract) — bit-identical, true widths."""
        from circuitmap_tpu.solvers import sns_many
        from circuitmap_tpu.solvers.cavi_sns import cavi_sns

        p = self.P
        args = (p["mu"], p["beta"], p["alpha"], p["shape"], p["rate"],
                p["phi"], p["phi_cov"])
        kw = dict(iters=5, num_mc_samples=20, analytic_mc=True)
        ys = [s["psc"] for s in ragged_sims]
        sts = [s["stim_matrix"] for s in ragged_sims]
        batch = sns_many(ys, sts, *args, seeds=[0, 1, 2],
                         verbose=False, **kw)
        for b, s in enumerate(ragged_sims):
            single = cavi_sns(s["psc"], s["stim_matrix"], *args, seed=b,
                              save_histories=False, verbose=False, **kw)
            np.testing.assert_array_equal(np.asarray(single[0]),
                                          batch[b]["mu"])
            np.testing.assert_array_equal(np.asarray(single[3]),
                                          batch[b]["lam"])
            assert batch[b]["lam"].shape == (24, s["psc"].shape[0])

    def test_ragged_mbcs_matches_individual_fits(self, ragged_sims):
        from circuitmap_tpu.solvers import mbcs_many
        from circuitmap_tpu.solvers.mbcs import mbcs

        p = self.P
        kw = dict(iters=5, analytic_noise=True)
        ys = [s["psc"] for s in ragged_sims]
        sts = [s["stim_matrix"] for s in ragged_sims]
        batch = mbcs_many(ys, sts, p["mu"], p["beta"], p["shape"],
                          p["rate"], seeds=[0, 1, 2], verbose=False, **kw)
        for b, s in enumerate(ragged_sims):
            single = mbcs(s["psc"], s["stim_matrix"], p["mu"], p["beta"],
                          p["shape"], p["rate"], seed=b,
                          save_histories=False, verbose=False, **kw)
            np.testing.assert_array_equal(np.asarray(single[0]),
                                          batch[b]["mu"])
            np.testing.assert_array_equal(np.asarray(single[2]),
                                          batch[b]["lam"])
            assert batch[b]["z"].shape == (s["psc"].shape[0],)

    def test_ragged_sequential_only_guards(self, ragged_sims):
        from circuitmap_tpu.parallel import trial_mesh
        from circuitmap_tpu.solvers import mbcs_many, sns_many

        p = self.P
        ys = [s["psc"] for s in ragged_sims]
        sts = [s["stim_matrix"] for s in ragged_sims]
        sns_args = (p["mu"], p["beta"], p["alpha"], p["shape"],
                    p["rate"], p["phi"], p["phi_cov"])
        with pytest.raises(ValueError, match="sequential"):
            sns_many(ys, sts, *sns_args, mesh=trial_mesh(4),
                     verbose=False)
        with pytest.raises(ValueError, match="sequential"):
            sns_many(ys, sts, *sns_args, compile_mode="batched",
                     verbose=False)
        with pytest.raises(ValueError, match="powers"):
            sns_many(ys, sts, *sns_args, powers=[1.0], verbose=False)
        with pytest.raises(ValueError, match="trace_wire"):
            mbcs_many(ys, sts, p["mu"], p["beta"], p["shape"],
                      p["rate"], trace_wire="int8", verbose=False)
