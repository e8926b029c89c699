"""Tests for the false-negative reconnection scan (reference
reconnect_spont_cells, caviar.py:102-144).

Round-2 regression: the round-1 implementation computed spontaneous-hit
counts with numpy bool @ bool — a LOGICAL dot, capping every count at 1
— so the scan effectively never reconnected anything. These tests pin
the true counting semantics against an in-test sequential port of the
reference loop.
"""

import numpy as np
import pytest

from circuitmap_tpu.solvers.caviar import reconnect_from_spontaneous


def _reference_oracle(stim, mu, beta, z, msrmp, min_count):
    """Direct sequential port of the reference scan (caviar.py:102-144)
    on host numpy, used as the decision oracle."""
    mu, beta, z = mu.copy(), beta.copy(), z.copy()
    powers = np.unique(stim)[1:]
    disc = list(np.flatnonzero(mu == 0.0))
    reconnected = []
    while disc:
        if (z != 0).sum() <= min_count:
            break
        counts = [int(((stim[n] != 0) & (z != 0)).sum()) for n in disc]
        focus = disc[int(np.argmax(counts))]
        srates = np.zeros(powers.size)
        spike_count = 0
        for i, p in enumerate(powers):
            locs = np.flatnonzero(stim[focus] == p)
            if locs.size:
                srates[i] = np.mean(z[locs] != 0)
                spike_count += int((z[locs] != 0).sum())
        # isotonic fit at max power == max suffix mean
        pava = float((np.cumsum(srates[::-1]) / np.arange(1, srates.size + 1)).max())
        if pava >= msrmp and spike_count >= min_count:
            locs = np.flatnonzero((stim[focus] != 0) & (z != 0))
            mu[focus] = z[locs].mean()
            beta[focus] = (z[locs].std(ddof=1) / np.sqrt(locs.size)
                           if locs.size > 1 else np.nan)
            z[locs] = 0.0
            reconnected.append(focus)
        disc.remove(focus)
    return mu, beta, z, sorted(reconnected)


class TestReconnect:
    def test_counts_not_capped(self):
        """A cell whose trials host many spontaneous events must
        reconnect (fails under the round-1 bool@bool logical dot)."""
        N, K = 5, 60
        stim = np.zeros((N, K), dtype=np.float32)
        stim[0, :20] = 65.0          # candidate: 20 max-power trials
        stim[1, 20:25] = 65.0
        z = np.zeros(K)
        z[:10] = 3.0                 # 10 events on the candidate's trials
        mu = np.zeros(N)
        beta = np.ones(N)
        lam = np.zeros((N, K), dtype=np.float32)

        mu2, beta2, lam2, z2, rec = reconnect_from_spontaneous(
            None, stim, lam, mu, beta, z, msrmp=0.3, minimum_spike_count=3,
        )
        assert rec
        assert mu2[0] == pytest.approx(3.0)   # mean of absorbed events
        assert np.all(np.asarray(lam2)[0, :10] == 1.0)
        assert np.all(z2[:10] == 0.0)

    def test_low_rate_cell_stays_disconnected(self):
        N, K = 3, 100
        stim = np.zeros((N, K), dtype=np.float32)
        stim[0, :50] = 65.0
        z = np.zeros(K)
        z[:5] = 1.0                  # rate 0.1 < msrmp 0.3
        mu, beta = np.zeros(N), np.ones(N)
        lam = np.zeros((N, K), dtype=np.float32)
        mu2, _, _, z2, rec = reconnect_from_spontaneous(
            None, stim, lam, mu, beta, z, msrmp=0.3, minimum_spike_count=3,
        )
        assert not rec
        assert mu2[0] == 0.0
        assert np.all(z2[:5] == 1.0)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_sequential_reference_oracle(self, seed):
        """Vectorised greedy scan == the reference's sequential loop."""
        rng = np.random.default_rng(seed)
        N, K = 30, 300
        stim = rng.choice([0.0, 45.0, 55.0, 65.0], size=(N, K),
                          p=[0.85, 0.05, 0.05, 0.05]).astype(np.float32)
        mu = (rng.random(N) * (rng.random(N) > 0.5))
        beta = rng.random(N) + 0.1
        z = rng.random(K) * (rng.random(K) > 0.8)
        lam = np.zeros((N, K), dtype=np.float32)

        mu_o, beta_o, z_o, rec_o = _reference_oracle(
            stim, mu, beta, z, 0.3, 3)
        mu_n, beta_n, lam_n, z_n, _ = reconnect_from_spontaneous(
            None, stim, lam.copy(), mu.copy(), beta.copy(), z.copy(),
            msrmp=0.3, minimum_spike_count=3,
        )
        np.testing.assert_allclose(np.nan_to_num(np.asarray(mu_n)),
                                   np.nan_to_num(mu_o), rtol=1e-6)
        np.testing.assert_allclose(np.nan_to_num(np.asarray(beta_n)),
                                   np.nan_to_num(beta_o), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(z_n), z_o, rtol=1e-6)
        rec_n = sorted(set(np.flatnonzero(np.nan_to_num(np.asarray(mu_n)) != 0))
                       - set(np.flatnonzero(mu != 0)))
        assert rec_n == rec_o


def test_reconnect_hits_with_non_f32_powers():
    """f64 stim at a power not exactly representable in f32 (45.7) must
    still produce per-power hits — regression: f32-rounded host powers
    matched nothing in the f64 stim and silently disabled the scan."""
    from circuitmap_tpu.solvers.caviar import reconnect_from_spontaneous
    from circuitmap_tpu.solvers._common import prepare_stim
    import numpy as np

    rng = np.random.default_rng(0)
    N, K = 20, 300
    stim = np.zeros((N, K))
    for k in range(K):
        stim[rng.choice(N, 2, replace=False), k] = 45.7
    _, stim_np, powers, _ = prepare_stim(stim, np.float32)
    lam = np.zeros((N, K))
    z = np.zeros(K)
    z[stim_np[0] != 0] = 1.0  # neuron 0's trials all spontaneous-active
    mu_r, _, _, _, rec = reconnect_from_spontaneous(
        None, stim_np, lam, np.zeros(N), np.zeros(N), z,
        msrmp=0.3, minimum_spike_count=3, powers=powers, verbose=False)
    assert rec and mu_r[0] > 0


def test_device_scan_matches_host_scan():
    """The one-dispatch device reconnection scan must make exactly the
    greedy decisions of the host scan (same reconnect order, same
    mu/beta/lam/z updates, NaN sem included)."""
    import numpy as np
    import jax.numpy as jnp
    from circuitmap_tpu.solvers.caviar import (
        reconnect_from_spontaneous, _reconnect_and_refit_device)
    from circuitmap_tpu.solvers._common import prepare_stim

    rng = np.random.default_rng(3)
    N, K, P = 25, 400, 3
    stim = np.zeros((N, K), np.float32)
    for k in range(K):
        stim[rng.choice(N, 3, replace=False), k] = rng.choice([45., 55., 65.])
    _, stim_np, powers, _ = prepare_stim(stim, jnp.float32)
    mu = np.zeros(N); mu[5:] = rng.uniform(0.5, 2.0, N - 5)  # 0-4 candidates
    beta = rng.uniform(0.1, 1.0, N)
    lam = (rng.random((N, K)) < 0.05).astype(np.float32)
    lam[mu == 0] = 0.0
    z = np.zeros(K)
    # give neurons 0 and 2 reconnectable spontaneous activity; neuron 1
    # only a single event (exercises the NaN sem branch if picked)
    z[np.flatnonzero(stim_np[0] != 0)] = rng.uniform(0.5, 1.5,
                                                     (stim_np[0] != 0).sum())
    locs2 = np.flatnonzero(stim_np[2] != 0)[:8]
    z[locs2] = rng.uniform(0.5, 1.5, locs2.size)

    h_mu, h_beta, h_lam, h_z, h_rec = reconnect_from_spontaneous(
        None, stim_np, lam.copy(), mu.copy(), beta.copy(), z.copy(),
        msrmp=0.25, minimum_spike_count=3, powers=powers, verbose=False)

    phi = np.tile([0.1, 5.0], (N, 1)).astype(np.float32)
    phi_cov = np.tile(np.eye(2, dtype=np.float32)[None] * 0.1, (N, 1, 1))
    d = _reconnect_and_refit_device(
        jnp.asarray(stim), jnp.asarray(lam), jnp.asarray(mu, jnp.float32),
        jnp.asarray(beta, jnp.float32), jnp.asarray(z, jnp.float32),
        jnp.asarray(powers, jnp.float32), jnp.asarray(phi),
        jnp.asarray(phi_cov), jnp.asarray(phi), jnp.asarray(phi_cov),
        jnp.asarray(0.25, jnp.float32), jnp.asarray(3.0, jnp.float32))
    d_mu, d_beta, d_lam, d_z, _, _, n_rec = d

    assert bool(h_rec) == (int(n_rec) > 0)
    np.testing.assert_allclose(np.asarray(d_mu), h_mu, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_beta), h_beta, rtol=1e-4,
                               atol=1e-6, equal_nan=True)
    np.testing.assert_array_equal(np.asarray(d_lam), h_lam)
    np.testing.assert_allclose(np.asarray(d_z), h_z, rtol=1e-6, atol=1e-7)
