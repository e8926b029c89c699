"""Synthetic holographic-mapping experiments, TPU-first.

Two generators, mirroring the reference surface (simulation.py:25-195
and simulation.py:329-485):

  * ``simulate`` — trial-based: K independent [T]-sample PSC traces for
    a blockwise or random hologram design.
  * ``simulate_continuous_experiment`` — a full 20 kHz experiment
    timeline, later sliced into K x 900 response windows.

Host/device split: experiment *design* (hologram composition, spike
draws, latencies) stays in host numpy — it is tiny, inherently
sequential bookkeeping, and keeps ``np.random.seed`` reproducibility
for users of the reference. All *trace synthesis* runs on device:

  * per-trial PSCs via shifted-kernel gathers (the reference convolves a
    one-hot spike train per (neuron, trial) — simulation.py:17-23; a
    single spike means the convolution is just the kernel shifted, so a
    batched gather replaces K*N convolutions),
  * the continuous timeline via batched FFT convolution of per-neuron
    impulse trains (the reference loops jnp.convolve per connected
    neuron over the full timeline — simulation.py:431-433),
  * AR(1) noise as an associative scan (first-order linear recurrence;
    the reference uses a Python loop over every 20 kHz sample —
    simulation.py:466-471),
  * GP noise by spectral factorisation of the squared-exponential
    kernel (eigh once, then one matmul).

Only connected neurons are synthesised — disconnected rows multiply to
exactly zero in the reference too (weights[n] = 0), so skipping them is
a pure speedup at identical output.
"""

from __future__ import annotations

import itertools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Kernel primitives
# ---------------------------------------------------------------------------


def _resolve_kernel_taus(kernel, N, tau_r_min, tau_r_max,
                         tau_delta_min, tau_delta_max):
    """Per-neuron bi-exponential time constants: supplied or sampled.

    ``kernel`` supplies them instead of sampling — either a
    ``(tau_r, tau_d)`` pair or ``{"tau_r": ..., "tau_d": ...}``, each
    scalar or [N]. (In the reference a non-None kernel leaves
    ``psc_kernels`` undefined and crashes, simulation.py:81-86; here it
    is honoured, since the analytic synthesis is parameterised by
    exactly these constants.)
    """
    if kernel is None:
        tau_r = np.random.uniform(tau_r_min, tau_r_max, N)
        tau_d = tau_r + np.random.uniform(tau_delta_min, tau_delta_max, N)
        return tau_r, tau_d
    if isinstance(kernel, dict):
        tau_r, tau_d = kernel["tau_r"], kernel["tau_d"]
    else:
        tau_r, tau_d = kernel
    tau_r = np.broadcast_to(np.asarray(tau_r, dtype=float), (N,)).copy()
    tau_d = np.broadcast_to(np.asarray(tau_d, dtype=float), (N,)).copy()
    if np.any(tau_d <= tau_r):
        raise ValueError("kernel requires tau_d > tau_r elementwise")
    return tau_r, tau_d


def psc_kernel_bank(tau_r, tau_d, window):
    """Bi-exponential PSC kernels evaluated on [0, window). [N, window].

    Unnormalised: exp(-t/tau_d) - exp(-t/tau_r) (reference
    simulation.py:285-295). Normalisation happens at use sites, which
    differ (sum vs trapz of a truncation) between callers.
    """
    t = np.arange(window)[None, :]
    tau_r = np.asarray(tau_r)[:, None]
    tau_d = np.asarray(tau_d)[:, None]
    return np.exp(-t / tau_d) - np.exp(-t / tau_r)


@partial(jax.jit, static_argnames=("T",))
def _shifted_psc_batch(tau_r, tau_d, spk_times, amps, T):
    """Sum over neurons of amplitude-scaled, spike-time-shifted kernels.

    tau_r, tau_d: [n]; spk_times: [n, k] int; amps: [n, k]
    (weight * mult_noise * spike). Returns [k, T].

    Matches reference kernel_conv_trialwise (simulation.py:17-23): the
    shifted kernel is renormalised by the sum over the visible window,
    so late spikes keep unit area. Because the kernel is an analytic
    bi-exponential, the shift is evaluated directly as a broadcast over
    (t - spike_time) — pure elementwise VPU work. (A gather formulation
    of the same thing took XLA:TPU ~90 s to compile; this compiles in
    seconds and fuses.)
    """
    tgrid = jnp.arange(T, dtype=amps.dtype)

    def one(tr, td, st, amp):
        dt = tgrid[None, :] - st[:, None].astype(amps.dtype)  # [k, T]
        # clamp before exp: exp(+large) for pre-spike times overflows to
        # inf and inf * 0-mask is nan
        dtc = jnp.maximum(dt, 0.0)
        ke = (jnp.exp(-dtc / td) - jnp.exp(-dtc / tr)) * (dt >= 0)
        ke = ke / (jnp.sum(ke, axis=1, keepdims=True) + 1e-5)
        return ke * amp[:, None]

    return jnp.sum(jax.vmap(one)(tau_r, tau_d, spk_times, amps), axis=0)


def _latency_shape(power, scale=1e4):
    """Gamma shape parameter of the spike latency (simulation.py:197-198)."""
    return scale / (power**2)


def sample_spike_time(power, gamma_beta=1.5e1, min_latency=160):
    """Gamma-distributed spike latency after stim onset (simulation.py:208-209)."""
    return min_latency + np.random.gamma(_latency_shape(power), gamma_beta)


def alpha(power, scale=1e4):
    """Reference-named alias of the latency gamma shape
    (reference simulation.py:197-198)."""
    return _latency_shape(power, scale)


def get_kernel(tau_r, tau_d):
    """Bi-exponential PSC kernel closure (reference simulation.py:200-203)."""
    def func(t, delta):
        t = np.asarray(t, dtype=float)
        return (np.exp(-(t - delta) / tau_d)
                - np.exp(-(t - delta) / tau_r)) * (t > delta)
    return func


def get_kernels(tau_r, tau_d):
    """One kernel closure per (tau_r, tau_d) pair (reference
    simulation.py:205-206)."""
    return [get_kernel(tr, td) for tr, td in zip(tau_r, tau_d)]


def _eval_kernel_one(trange, tau_r, tau_d, delta, eps=1e-8):
    ke = (jnp.exp(-(trange - delta) / tau_d)
          - jnp.exp(-(trange - delta) / tau_r)) * (trange > delta)
    return ke / (jnp.max(ke) + eps)


# peak-normalised delayed kernels, batched over neurons — the jitted
# helper the reference exports under this name (simulation.py:217-220)
eval_kernel = jax.jit(jax.vmap(_eval_kernel_one, in_axes=(None, 0, 0, 0)))


def sample_gp(trial_dur=900, gp_lengthscale=25, gp_scale=0.01, n_samples=1):
    """Squared-exponential GP noise via spectral factorisation.

    Same distribution as the reference's full-covariance
    multivariate_normal (simulation.py:211-215) at a fraction of the
    cost: eigh once, one [n_samples, T] matmul.
    """
    t = np.arange(trial_dur)
    cov = np.exp(-((t[:, None] - t[None, :]) ** 2) / (2.0 * gp_lengthscale**2))
    w, Q = np.linalg.eigh(cov)
    half = Q * np.sqrt(np.clip(w, 0.0, None))[None, :]
    eps = np.random.randn(n_samples, trial_dur)
    return gp_scale * (eps @ half.T)


# ---------------------------------------------------------------------------
# Hologram designs
# ---------------------------------------------------------------------------


def blockwise_design(N, H, trials, powers, nreps=1, shuffle=True):
    """Blockwise ensemble design: random neuron partitions into H-spot
    holograms, swept over powers (reference simulation.py:45-63)."""
    powers = np.sort(np.asarray(powers))[::-1]
    rows = []
    while len(rows) < trials:
        order = np.random.choice(N, N, replace=False)
        holos = [order[i * H:(i + 1) * H] for i in range(int(np.ceil(N / H)))]
        for power, holo, _ in itertools.product(powers, holos, range(nreps)):
            if len(rows) >= trials:
                break
            row = np.zeros(N)
            row[holo] = power
            rows.append(row)
    stim = np.stack(rows, axis=1)
    if shuffle:
        stim = stim[:, np.random.choice(trials, trials, replace=False)]
    return stim


def random_design(N, H, trials, powers):
    """Random ensemble design with balanced power representation
    (reference simulation.py:65-77)."""
    powers = np.asarray(powers, dtype=float)
    per = int(np.ceil(trials / len(powers)))
    pool = np.repeat(powers, per)[:trials]
    power_order = np.random.permutation(pool)
    stim = np.zeros((N, trials))
    for k in range(trials):
        stim[np.random.choice(N, H), k] = power_order[k]
    return stim


def _pad_spikes_to_min_rate(spks, stim, max_power, min_rate):
    """Force each neuron's spike rate at max power up to ``min_rate`` by
    flipping zero trials (reference simulation.py:98-108).

    ``max_power == 0`` means the design never stimulates (e.g. a
    closed-loop no-stim control block supplied via ``stim_matrix=``):
    matching ``stim[n] == 0`` would treat every unstimulated trial as a
    max-power trial and flip ~min_rate of them to phantom spikes."""
    if max_power <= 0:
        return spks
    N = spks.shape[0]
    for n in range(N):
        locs = np.flatnonzero(stim[n] == max_power)
        if locs.size == 0:
            continue
        deficit = min_rate - spks[n, locs].mean()
        if deficit > 0:
            zeros = np.flatnonzero(spks[n, locs] == 0)
            need = min(int(np.ceil(deficit * locs.size)), zeros.size)
            if need:
                spks[n, locs[np.random.choice(zeros, need, replace=False)]] = 1.0
    return spks


def _sample_weights(
    N, connection_prob, frac_strong, strong_lower, strong_upper, weak_mean, min_weight
):
    """Sparse weights: a strong uniform tier and a weak shifted-exponential
    tier (reference simulation.py:116-126)."""
    n_conn = int(connection_prob * N)
    connected = np.random.choice(N, n_conn, replace=False)
    n_strong = int(np.ceil(frac_strong * n_conn))
    strong = np.random.choice(connected, n_strong, replace=False)
    weak = np.setdiff1d(connected, strong)
    weights = np.zeros(N)
    weights[strong] = np.random.uniform(strong_lower, strong_upper, n_strong)
    weights[weak] = np.random.exponential(weak_mean, weak.size) + min_weight
    return weights


# ---------------------------------------------------------------------------
# Trial-based simulator
# ---------------------------------------------------------------------------


def simulate(
    N=300,
    T=900,
    H=10,
    trials=1000,
    nreps=1,
    connection_prob=0.05,
    powers=[45, 55, 65],
    min_latency=160,
    gamma_beta=1.5e1,
    sigma=6e-4,
    frac_strongly_connected=0.2,
    strong_weight_lower=20,
    strong_weight_upper=40,
    weak_exp_mean=4,
    min_weight=9,
    phi_0_lower=0.2,
    phi_0_upper=0.25,
    phi_1_lower=10,
    phi_1_upper=15,
    mult_noise_log_var=0.01,
    tau_r_min=25,
    tau_r_max=60,
    tau_delta_min=75,
    tau_delta_max=250,
    weights=None,
    kernel=None,
    phi_0=None,
    phi_1=None,
    stim_matrix=None,
    gp_scale=4e-3,
    gp_lengthscale=50,
    spont_prob=0.05,
    design="blockwise",
    max_power_min_spike_rate=0.4,
    batch_size=500,
    neuron_batch_size=500,
    verbose=True,
):
    """Simulate a trial-based ensemble-stimulation experiment.

    Signature and returned dict keys mirror reference simulate
    (simulation.py:25-195): weights, phi_0, phi_1, mult_noise, sigma,
    stim_matrix, psc, gp_noise, kernel, spks, spk_times, spont_pscs, I.

    Extensions beyond the reference: ``stim_matrix=`` synthesises
    trials for a CALLER-SUPPLIED design (the closed-loop case — pair
    with ``weights=``/``phi_0=``/``phi_1=``/``kernel=`` to hold the
    circuit fixed across rounds; see examples/demo_closed_loop.py),
    and the returned ``tau_r``/``tau_d`` feed back as
    ``kernel=(tau_r, tau_d)`` to reuse the resolved kernel constants.
    """
    assert design in ("random", "blockwise")
    if verbose:
        print(
            f"Simulating N={N} T={T} H={H} trials={trials} "
            f"density={connection_prob} powers={powers} design={design}"
        )

    if stim_matrix is not None:
        # caller-supplied design: the closed-loop case — synthesise
        # trials for ensembles CHOSEN from an interim posterior, over a
        # circuit held fixed via weights=/phi_0=/phi_1=/kernel= (the
        # reference has no such path; its simulate always draws its own
        # design, simulation.py:45-77)
        stim_matrix = np.asarray(stim_matrix, dtype=float)
        if stim_matrix.ndim != 2 or stim_matrix.shape[0] != N:
            raise ValueError(
                f"stim_matrix must be [N={N}, K], got "
                f"{stim_matrix.shape}")
    elif design == "blockwise":
        stim_matrix = blockwise_design(N, H, trials, powers, nreps)
    else:
        stim_matrix = random_design(N, H, trials, powers)
    K = stim_matrix.shape[1]
    I = stim_matrix.max(axis=0)  # per-trial power, one pass over [N, K]

    # biophysics
    tau_r, tau_d = _resolve_kernel_taus(
        kernel, N, tau_r_min, tau_r_max, tau_delta_min, tau_delta_max
    )
    # sample only the MISSING opsin parameters: discarding a supplied
    # phi_0 because phi_1 was omitted (or vice versa) silently changes
    # the circuit between closed-loop rounds (round-4 review finding;
    # both-None keeps the original joint draw order for seed stability)
    if phi_0 is None and phi_1 is None:
        phi_0 = np.random.uniform(phi_0_lower, phi_0_upper, N)
        phi_1 = np.random.uniform(phi_1_lower, phi_1_upper, N)
    elif phi_0 is None:
        phi_0 = np.random.uniform(phi_0_lower, phi_0_upper, N)
    elif phi_1 is None:
        phi_1 = np.random.uniform(phi_1_lower, phi_1_upper, N)

    # spikes: sigmoid power curve, then min-rate padding at max power
    # (padding anchors at the design's own max power so a supplied
    # stim_matrix need not cover every level in ``powers``)
    drive = phi_0[:, None] * stim_matrix - phi_1[:, None]
    frates = 1.0 / (1.0 + np.exp(-drive)) * (stim_matrix > 0)
    spks = (np.random.rand(N, K) <= frates).astype(float)
    spks = _pad_spikes_to_min_rate(spks, stim_matrix,
                                   np.max(stim_matrix) if K else 0.0,
                                   max_power_min_spike_rate)

    spk_times = np.zeros((N, K))
    spiking = stim_matrix * spks
    nz = spiking > 0
    spk_times[nz] = sample_spike_time(spiking[nz], gamma_beta=gamma_beta,
                                      min_latency=min_latency)

    if weights is None:
        weights = _sample_weights(
            N, connection_prob, frac_strongly_connected, strong_weight_lower,
            strong_weight_upper, weak_exp_mean, min_weight,
        )
    connected = np.flatnonzero(weights != 0)

    mult_noise = np.random.lognormal(0, mult_noise_log_var, [N, K])

    # device synthesis over connected neurons only, trial-batched
    if verbose:
        print("Synthesising PSC traces on device...")
    amps = (weights[:, None] * mult_noise * spks)[connected]
    st_c = spk_times[connected].astype(np.int32)
    tr_c = jnp.asarray(tau_r[connected], dtype=jnp.float32)
    td_c = jnp.asarray(tau_d[connected], dtype=jnp.float32)

    chunks = []
    for k0 in range(0, K, batch_size):
        k1 = min(k0 + batch_size, K)
        chunks.append(
            _shifted_psc_batch(
                tr_c,
                td_c,
                jnp.asarray(st_c[:, k0:k1]),
                jnp.asarray(amps[:, k0:k1], dtype=jnp.float32),
                T,
            )
        )
    psc = np.concatenate([np.asarray(c) for c in chunks], axis=0)

    # spontaneous events: one random-kernel PSC on a random subset of trials
    spont_pscs = np.zeros((K, T))
    spont_trials = np.flatnonzero(np.random.rand(K) <= spont_prob)
    tgrid = np.arange(T)
    for k in spont_trials:
        tr = np.random.uniform(tau_r_min, tau_r_max)
        td = tr + np.random.uniform(tau_delta_min, tau_delta_max)
        delta = np.random.randint(1, T)
        dtc = np.maximum(tgrid - delta, 0.0)
        ke = (np.exp(-dtc / td) - np.exp(-dtc / tr)) * (tgrid > delta)
        if connected.size:
            w = np.random.uniform(weights[connected].min(),
                                  weights[connected].max())
        else:  # nothing connected (tiny N * connection_prob): unit-scale
            w = np.random.uniform(0.5, 1.5)
        spont_pscs[k] = w * ke / (np.trapezoid(ke) + 1e-5)

    gp_noise = sample_gp(trial_dur=T, n_samples=K, gp_scale=gp_scale,
                         gp_lengthscale=gp_lengthscale)
    noise = np.random.normal(0, sigma, [K, T])
    psc = psc + spont_pscs + gp_noise + noise

    return {
        "weights": weights,
        "phi_0": phi_0,
        "phi_1": phi_1,
        "mult_noise": mult_noise,
        "sigma": sigma,
        "stim_matrix": stim_matrix,
        "psc": psc,
        "gp_noise": gp_noise,
        "kernel": kernel,
        "spks": spks,
        "spk_times": spk_times,
        "spont_pscs": spont_pscs,
        "I": I,
        "tau_r": tau_r,
        "tau_d": tau_d,
    }


# ---------------------------------------------------------------------------
# Continuous-experiment simulator
# ---------------------------------------------------------------------------


def _windowed_slices(pscs, stim_times, window):
    """[K, W] stim-aligned windows of the timeline, zero-filled where a
    window falls off the recording edges. A raw fancy index would
    silently WRAP a negative offset to the END of the timeline (a fast
    stim rate puts the first window's baseline before frame 0 —
    the per-stim true_responses path already guards this; the observed
    windows must too)."""
    idx = stim_times[:, None] + window[None, :]
    valid = (idx >= 0) & (idx < pscs.shape[0])
    return np.where(valid, pscs[np.clip(idx, 0, pscs.shape[0] - 1)], 0.0)


def _ar1_noise(eps, coef):
    """x[t] = coef * x[t-1] + eps[t].

    A first-order linear recurrence == an IIR filter; scipy's lfilter
    evaluates it in one C pass over the timeline (the reference loops in
    Python per 20 kHz sample, simulation.py:466-471). Host by design —
    see _timeline_fft_conv.
    """
    from scipy.signal import lfilter

    return lfilter([1.0], [1.0, -float(coef)], np.asarray(eps))


def _timeline_fft_conv(impulses, kernels, expt_len):
    """Sum over neurons of (impulse train * kernel) via batched rFFT.

    impulses: [n, expt_len]; kernels: [n, W]. Linear convolution realised
    by zero-padding to expt_len + W; result truncated to expt_len.

    Host numpy by design: this is data *generation*, the timelines are
    tens of millions of samples, and host FFT keeps the simulator
    independent of accelerator compile paths (very large FFTs trip the
    axon remote-compile helper).
    """
    W = kernels.shape[1]
    L = expt_len + W
    F = np.fft.rfft(impulses, n=L) * np.fft.rfft(kernels, n=L)
    out = np.fft.irfft(np.sum(F, axis=0), n=L)
    return out[:expt_len]


@partial(jax.jit, static_argnames=("response_length",))
def _evoked_window_batch(tau_r, tau_d, divisors, spk_times, amps, response_length):
    """Ground-truth evoked responses for a batch of stims.

    tau_r/tau_d/divisors: [n] kernel params + trapz normalisers;
    spk_times/amps: [n, k]. Returns [k, response_length]: each neuron's
    kernel placed at its (context-offset) spike time. Mirrors
    get_true_evoked_resp (simulation.py:322-327); evaluated analytically
    by broadcasting (see _shifted_psc_batch for why not a gather).
    """
    tgrid = jnp.arange(response_length, dtype=amps.dtype)

    def one(tr, td, div, st, amp):
        dt = tgrid[None, :] - st[:, None].astype(amps.dtype)
        dtc = jnp.maximum(dt, 0.0)  # see _shifted_psc_batch: avoid inf*0
        ke = (jnp.exp(-dtc / td) - jnp.exp(-dtc / tr)) * (dt >= 0) / div
        return ke * amp[:, None]

    return jnp.sum(jax.vmap(one)(tau_r, tau_d, divisors, spk_times, amps), axis=0)


def simulate_continuous_experiment_without_spike_failures(
    N=100,
    connected_frac=0.2,
    exp_len=int(2e4),
    gamma_beta=1.5e1,
    min_latency=60,
    spont_rate=0.0005,
    mult_noise_log_var=0.01,
    response_length=900,
    noise_std=1e-2,
    tau_r_min=10,
    tau_r_max=40,
    tau_delta_min=250,
    tau_delta_max=300,
    power=50,
    sampling_freq=20000,
    stim_freq=10,
    weight_lower=2,
    weight_upper=10,
    seed=0,
    ar_coef=0.95,
    ar_std=1e-1,
):
    """Single-target continuous experiment where every stim evokes a spike.

    The reference's earlier variant (simulation.py:222-281): one random
    target per stim at a single power, deterministic spiking, peak-
    normalised kernels. Returns pscs / obs_responses / true_responses /
    tars / stim_times.
    """
    tau_r = np.random.uniform(tau_r_min, tau_r_max, N)
    tau_d = tau_r + np.random.uniform(tau_delta_min, tau_delta_max, N)

    isi = int(sampling_freq / stim_freq)
    stim_times = np.arange(isi, exp_len - response_length, isi, dtype=int)
    nstim = len(stim_times)
    spike_lat = sample_spike_time(power * np.ones(nstim), gamma_beta=gamma_beta,
                                  min_latency=min_latency)
    tars = np.random.choice(N, nstim)

    n_conn = int(connected_frac * N)
    connected = np.random.choice(N, n_conn, replace=False)
    weights = np.zeros(N)
    weights[connected] = np.random.uniform(weight_lower, weight_upper, n_conn)

    mult_noise = np.random.lognormal(0, mult_noise_log_var, nstim)

    # per-stim responses: peak-normalised kernel of the targeted neuron
    # placed at its (stim + latency) frame; evaluated analytically
    frames = (stim_times + spike_lat).astype(int)
    trange = np.arange(exp_len, dtype=np.float64)
    pscs_evoked = np.zeros(exp_len)
    true_resps = np.zeros((nstim, response_length))
    # response window, clipped at the recording edges (a fast stim rate
    # can put stim_times[0] - 100 before frame 0 — a raw slice would
    # silently wrap to the end of the timeline)
    win = np.arange(-100, response_length - 100)
    for s in range(nstim):
        n = tars[s]
        dt = trange - frames[s]
        dtc = np.maximum(dt, 0.0)
        ke = (np.exp(-dtc / tau_d[n]) - np.exp(-dtc / tau_r[n])) * (dt > 0)
        peak = ke.max()
        if peak > 0:
            ke = ke / peak
        contrib = ke * weights[n] * mult_noise[s]
        pscs_evoked += contrib
        idx = stim_times[s] + win
        valid = (idx >= 0) & (idx < exp_len)
        true_resps[s, valid] = contrib[idx[valid]]

    # spontaneous events
    nspont = int(spont_rate * exp_len)
    sponts = np.zeros(exp_len)
    if nspont:
        sp_t = np.random.choice(exp_len, nspont, replace=False)
        sp_tr = np.random.uniform(tau_r_min, tau_r_max, nspont)
        sp_td = sp_tr + np.random.uniform(tau_delta_min, tau_delta_max, nspont)
        sp_w = np.random.uniform(weight_lower, weight_upper, nspont)
        for s in range(nspont):
            dt = trange - sp_t[s]
            dtc = np.maximum(dt, 0.0)
            ke = (np.exp(-dtc / sp_td[s]) - np.exp(-dtc / sp_tr[s])) * (dt > 0)
            peak = ke.max()
            sponts += sp_w[s] * (ke / peak if peak > 0 else ke)

    eps = np.random.normal(0, ar_std, exp_len)
    ar1 = _ar1_noise(eps, ar_coef)
    pscs = pscs_evoked + sponts + ar1

    obs_resps = _windowed_slices(pscs, stim_times, win)
    return {
        "pscs": pscs,
        "obs_responses": obs_resps,
        "true_responses": true_resps,
        "tars": tars,
        "stim_times": stim_times,
        "weights": weights,
    }


def simulate_continuous_experiment(
    N=100,
    expt_len=int(2e4),
    gamma_beta=1.5e1,
    min_latency=60,
    powers=[45, 55, 65],
    mult_noise_log_var=0.05,
    response_length=900,
    noise_std=1e-2,
    tau_r_min=10,
    tau_r_max=40,
    tau_delta_min=250,
    tau_delta_max=300,
    sampling_freq=20000,
    stim_freq=10,
    weight_lower=2,
    weight_upper=10,
    seed=0,
    ar_coef=0.95,
    ar_std=3e-4,
    weights=None,
    frac_strongly_connected=0.2,
    strong_weight_lower=20,
    strong_weight_upper=40,
    weak_exp_mean=4,
    min_weight=7,
    phi_0_lower=0.2,
    phi_0_upper=0.25,
    phi_1_lower=10,
    phi_1_upper=15,
    kernel=None,
    phi_0=None,
    phi_1=None,
    H=10,
    nreps=1,
    connection_prob=0.1,
    spont_rate=3,
    kernel_window=3000,
    prior_context=100,
    ground_truth_eval_batch_size=1000,
    max_power_min_spike_rate=0.3,
    verbose=True,
):
    """Simulate a continuous 20 kHz mapping experiment.

    Returned dict keys mirror the reference (simulation.py:476-483):
    pscs, obs_responses, true_responses, stim_matrix, weights,
    spike_matrix.
    """
    if verbose:
        print(
            f"Simulating continuous experiment: N={N} H={H} "
            f"duration={expt_len / sampling_freq:.1f}s stim_freq={stim_freq}Hz "
            f"spont_rate={spont_rate}Hz powers={powers}"
        )

    tau_r, tau_d = _resolve_kernel_taus(
        kernel, N, tau_r_min, tau_r_max, tau_delta_min, tau_delta_max
    )

    if weights is None:
        weights = _sample_weights(
            N, connection_prob, frac_strongly_connected, strong_weight_lower,
            strong_weight_upper, weak_exp_mean, min_weight,
        )
    connected = np.flatnonzero(weights != 0)

    # stim timing + blockwise design
    isi = int(sampling_freq / stim_freq)
    stim_times = np.arange(isi, expt_len - response_length - isi, isi, dtype=int)
    nstim = len(stim_times)
    stim_matrix = blockwise_design(N, H, nstim, powers, nreps, shuffle=False)

    # sample only the MISSING opsin parameter (see simulate(): a
    # supplied value must never be silently re-drawn)
    if phi_0 is None and phi_1 is None:
        phi_0 = np.random.uniform(phi_0_lower, phi_0_upper, N)
        phi_1 = np.random.uniform(phi_1_lower, phi_1_upper, N)
    elif phi_0 is None:
        phi_0 = np.random.uniform(phi_0_lower, phi_0_upper, N)
    elif phi_1 is None:
        phi_1 = np.random.uniform(phi_1_lower, phi_1_upper, N)

    drive = phi_0[:, None] * stim_matrix - phi_1[:, None]
    frates = 1.0 / (1.0 + np.exp(-drive)) * (stim_matrix > 0)
    spks = (np.random.rand(N, nstim) <= frates).astype(float)
    spks = _pad_spikes_to_min_rate(spks, stim_matrix, np.max(powers),
                                   max_power_min_spike_rate)

    spike_times = np.zeros((N, nstim))
    targeted = stim_matrix > 0
    spike_times[targeted] = sample_spike_time(
        stim_matrix[targeted], gamma_beta=gamma_beta, min_latency=min_latency
    )

    # shuffle trial order (reference simulation.py:420-423)
    reorder = np.random.choice(nstim, nstim, replace=False)
    stim_matrix = stim_matrix[:, reorder]
    spike_times = spike_times[:, reorder]
    spks = spks[:, reorder]

    mult_noise = np.random.lognormal(0, mult_noise_log_var, [N, nstim])

    # --- evoked timeline: impulse trains conv kernels (connected only) ---
    if verbose:
        print("Synthesising evoked timeline (FFT conv)...")
    kernels_c = psc_kernel_bank(tau_r[connected], tau_d[connected], kernel_window)
    # normalise by trapz over the response window (reference simulation.py:285-289)
    divisors = np.trapezoid(kernels_c[:, :response_length], axis=1) + 1e-5
    kernels_c = kernels_c / divisors[:, None]

    impulses = np.zeros((len(connected), expt_len))
    frames = (spike_times + stim_times[None, :]).astype(int)
    for i, c in enumerate(connected):
        hit = spks[c] > 0
        np.add.at(
            impulses[i], frames[c, hit], weights[c] * mult_noise[c, hit]
        )
    impulses[:, 0] = 0.0  # reference guards the first bin (simulation.py:299-304)

    pscs = np.zeros(expt_len)
    nb = 8
    for i0 in range(0, len(connected), nb):
        pscs += _timeline_fft_conv(
            impulses[i0:i0 + nb], kernels_c[i0:i0 + nb], expt_len
        )

    # --- ground-truth per-stim responses ---
    if verbose:
        print("Extracting ground-truth evoked responses...")
    tr_c = jnp.asarray(tau_r[connected], dtype=jnp.float32)
    td_c = jnp.asarray(tau_d[connected], dtype=jnp.float32)
    div_c = jnp.asarray(divisors, dtype=jnp.float32)
    true_resps = []
    amps_c = (weights[:, None] * mult_noise * spks)[connected]
    st_c = (prior_context + spike_times[connected]).astype(np.int32)
    for k0 in range(0, nstim, ground_truth_eval_batch_size):
        k1 = min(k0 + ground_truth_eval_batch_size, nstim)
        true_resps.append(
            np.asarray(
                _evoked_window_batch(
                    tr_c,
                    td_c,
                    div_c,
                    jnp.asarray(st_c[:, k0:k1]),
                    jnp.asarray(amps_c[:, k0:k1], dtype=jnp.float32),
                    response_length,
                )
            )
        )
    true_resps = np.concatenate(true_resps, axis=0)

    # --- spontaneous events: windowed scatter-add ---
    nspont = int(spont_rate / sampling_freq * expt_len)
    if nspont:
        spont_times = np.random.choice(expt_len, nspont, replace=False)
        sp_tr = np.random.uniform(tau_r_min, tau_r_max, nspont)
        sp_td = sp_tr + np.random.uniform(tau_delta_min, tau_delta_max, nspont)
        sp_kerns = psc_kernel_bank(sp_tr, sp_td, kernel_window)
        sp_div = np.trapezoid(sp_kerns[:, :response_length], axis=1) + 1e-8
        sp_w = np.random.uniform(0.0, np.max(weights), nspont)
        sponts = np.zeros(expt_len + kernel_window)
        for s in range(nspont):
            # (t > delta) gating: kernel offset o lands at frame delta + o,
            # with offset 0 suppressed (kernel value there is 0 anyway)
            seg = sp_kerns[s][1: expt_len + kernel_window - spont_times[s]]
            sponts[spont_times[s] + 1: spont_times[s] + 1 + seg.size] += (
                sp_w[s] * seg / sp_div[s]
            )
        sponts = sponts[:expt_len]
    else:
        sponts = np.zeros(expt_len)

    # --- AR(1) noise (device associative scan) ---
    eps = np.random.normal(0, ar_std, expt_len)
    ar1 = _ar1_noise(eps, ar_coef)

    pscs = pscs + sponts + ar1

    # --- slice into K x response_length windows ---
    window = np.arange(-prior_context, response_length - prior_context)
    obs_resps = _windowed_slices(pscs, stim_times, window)

    return {
        "pscs": pscs,
        "obs_responses": obs_resps,
        "true_responses": true_resps,
        "stim_matrix": stim_matrix,
        "weights": weights,
        "spike_matrix": spks,
        "stim_times": stim_times,
    }
