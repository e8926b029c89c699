"""Batched PSC-template fitting: extract kernel parameters from data.

The reference demonstrates extracting PSC template parameters (rise
time, decay, onset, amplitude) from recorded traces by scipy-minimising
a sum-of-templates model one trace at a time
(examples/fit_sum_of_psc_templates.ipynb) — the parameters then
calibrate the NWD training-data simulator to a particular preparation.

Here the same model is fitted to EVERY trace simultaneously: one
vmapped Adam optimisation inside a single ``lax.scan``, positivity via
softplus reparameterisation. A helper converts the fitted population
into the tau ranges ``generate_psc_dataset`` consumes.

The template loss is highly multi-modal on superposed traces (several
overlapping PSCs), so the fit runs ``restarts`` independent inits — a
uniform onset grid plus peak-seeded onsets read off each trace — and
keeps the best restart per trace by final loss.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def sum_of_psc_templates(timepoints, tau_r, tau_diff, amp, onset):
    """Sum of bi-exponential PSC kernels. Each param: [n_kernels]."""
    dt = timepoints[None, :] - onset[:, None]
    dtc = jnp.maximum(dt, 0.0)
    tau_d = tau_r + tau_diff
    ke = (jnp.exp(-dtc / tau_d[:, None]) - jnp.exp(-dtc / tau_r[:, None])) * (
        dt > 0
    )
    return jnp.sum(amp[:, None] * ke, axis=0)


def _unpack(raw):
    """Softplus-positive parameters from unconstrained optimisation vars."""
    tau_r = jax.nn.softplus(raw[:, 0]) + 0.05
    tau_diff = jax.nn.softplus(raw[:, 1]) + 0.05
    amp = jax.nn.softplus(raw[:, 2])
    onset = raw[:, 3]
    return tau_r, tau_diff, amp, onset


@partial(jax.jit, static_argnames=("n_kernels", "steps"))
def _fit_batch(traces, timepoints, init_raw, n_kernels, steps, lr):
    """Adam on the template MSE, vmapped over traces, scanned over steps."""

    def loss_one(raw, trace):
        tau_r, tau_diff, amp, onset = _unpack(raw)
        model = sum_of_psc_templates(timepoints, tau_r, tau_diff, amp, onset)
        return jnp.mean(jnp.square(model - trace))

    grad_one = jax.grad(loss_one)

    def step(carry, _):
        raw, m, v, t = carry
        g = jax.vmap(grad_one)(raw, traces)
        t = t + 1.0
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mhat = m / (1.0 - 0.9**t)
        vhat = v / (1.0 - 0.999**t)
        raw = raw - lr * mhat / (jnp.sqrt(vhat) + 1e-8)
        return (raw, m, v, t), None

    init = (init_raw, jnp.zeros_like(init_raw), jnp.zeros_like(init_raw),
            jnp.asarray(0.0, traces.dtype))
    (raw, _, _, _), _ = jax.lax.scan(step, init, None, length=steps)
    final_loss = jax.vmap(loss_one)(raw, traces)
    return raw, final_loss


def _grid_init(K, n_kernels, timepoints_np, rng, jitter):
    """Uniform onset grid with gaussian jitter (the round-1 init)."""
    onsets0 = np.linspace(timepoints_np[0], timepoints_np[-1], n_kernels)
    raw0 = np.zeros((K, n_kernels, 4), dtype=np.float32)
    raw0[:, :, 0] = np.log(np.expm1(0.2))           # softplus^-1(0.2) ms rise
    raw0[:, :, 1] = np.log(np.expm1(0.3))           # 0.3 ms tau_diff
    raw0[:, :, 2] = np.log(np.expm1(0.5))           # 0.5 amplitude
    raw0[:, :, 3] = onsets0[None, :] + jitter * rng.standard_normal(
        (K, n_kernels))
    return raw0


def _peak_init(traces_np, timepoints_np, n_kernels, rng):
    """Per-trace onsets seeded at the trace's own peaks.

    Greedy non-max suppression picks the ``n_kernels`` largest samples
    at least ``T // (2 n_kernels)`` frames apart; amplitudes start at
    the trace value there. A bi-exponential with the default init taus
    peaks ~0.4 ms after onset, so onsets back off by that much.
    """
    K, T = traces_np.shape
    min_sep = max(1, T // (2 * n_kernels))
    dt_ms = float(timepoints_np[-1] - timepoints_np[0]) / max(T - 1, 1)
    raw0 = _grid_init(K, n_kernels, timepoints_np, rng, jitter=0.1)
    for k in range(K):
        order = np.argsort(traces_np[k])[::-1]
        picked = []
        for idx in order:
            if len(picked) == n_kernels:
                break
            if all(abs(int(idx) - j) >= min_sep for j in picked):
                picked.append(int(idx))
        if not picked:
            continue
        picked = np.sort(np.asarray(picked))
        n_got = picked.shape[0]
        raw0[k, :n_got, 3] = timepoints_np[picked] - 0.4
        amp = np.clip(traces_np[k, picked], 0.05, 50.0)
        raw0[k, :n_got, 2] = np.log(np.expm1(amp))
        # leftovers (trace flatter than n_kernels peaks) keep grid init,
        # but with near-zero amplitude so they don't fight the peaks
        raw0[k, n_got:, 2] = np.log(np.expm1(0.05))
        # avoid several kernels stacking on one peak: tiny onset jitter
        raw0[k, :n_got, 3] += 0.25 * dt_ms * rng.standard_normal(n_got)
    return raw0


@jax.jit
def _combine_restarts(raw, final_loss, raw_r, loss_r):
    """Per-trace best-of selection, one fused program (not 3 eager
    dispatches). A NaN incumbent loses to ANY later restart — otherwise
    a diverged first restart would poison jnp.minimum and reject every
    converged one after it.
    """
    better = (loss_r < final_loss) | jnp.isnan(final_loss)
    raw = jnp.where(better[:, None, None], raw_r, raw)
    return raw, jnp.where(better, loss_r, final_loss)


def fit_psc_templates(traces, timepoints=None, n_kernels=10, steps=800,
                      lr=0.05, seed=0, restarts=3):
    """Fit a sum of ``n_kernels`` PSC templates to each trace.

    traces: [K, T] (units arbitrary); timepoints defaults to
    ``linspace(-5, 40, T)`` ms as in the reference notebook. Runs
    ``restarts`` independent optimisations (grid-onset init, per-trace
    peak-seeded init, then re-jittered grids) and keeps the best
    restart per trace by final MSE — superposed traces land in local
    optima from any single init. Returns a dict with per-trace
    parameter arrays [K, n_kernels] (tau_r / tau_diff / amp / onset,
    ms), the reconstruction [K, T], and per-trace fit R².
    """
    traces_np = np.asarray(traces, dtype=np.float32)
    traces = jnp.asarray(traces_np)
    K, T = traces.shape
    if timepoints is None:
        timepoints = np.linspace(-5.0, 40.0, T)
    timepoints_np = np.asarray(timepoints, dtype=np.float32)
    timepoints = jnp.asarray(timepoints_np)

    rng = np.random.default_rng(seed)
    raw = final_loss = None
    for r in range(max(int(restarts), 1)):
        if r == 1:
            raw0 = _peak_init(traces_np, timepoints_np, n_kernels, rng)
        else:
            raw0 = _grid_init(K, n_kernels, timepoints_np, rng,
                              jitter=0.1 if r == 0 else 1.0 + r)
        raw_r, loss_r = _fit_batch(traces, timepoints, jnp.asarray(raw0),
                                   int(n_kernels), int(steps), float(lr))
        if raw is None:
            raw, final_loss = raw_r, loss_r
        else:
            raw, final_loss = _combine_restarts(raw, final_loss, raw_r,
                                                loss_r)

    tau_r, tau_diff, amp, onset = jax.vmap(_unpack)(raw)
    recon = jax.vmap(
        lambda r: sum_of_psc_templates(timepoints, *_unpack(r))
    )(raw)

    recon_np = np.asarray(recon)
    ss_tot = np.sum(
        (traces_np - traces_np.mean(axis=1, keepdims=True)) ** 2, axis=1
    )
    ss_res = np.sum((traces_np - recon_np) ** 2, axis=1)
    r2 = 1.0 - ss_res / np.maximum(ss_tot, 1e-12)

    return {
        "tau_r": np.asarray(tau_r),
        "tau_diff": np.asarray(tau_diff),
        "amp": np.asarray(amp),
        "onset": np.asarray(onset),
        "reconstruction": recon_np,
        "r2": r2,
    }


def suggest_datagen_ranges(fit, amp_threshold=0.1, srate=20000.0,
                           lo_pct=10, hi_pct=90):
    """Convert fitted template parameters (ms) into the frame-unit
    tau ranges ``generate_psc_dataset`` / ``NeuralDemixer.
    generate_training_data`` consume — the notebook's end product."""
    keep = fit["amp"] > amp_threshold
    ms_to_frames = srate / 1000.0
    tau_r = fit["tau_r"][keep] * ms_to_frames
    tau_diff = fit["tau_diff"][keep] * ms_to_frames
    return {
        "tau_r_lower": float(np.percentile(tau_r, lo_pct)),
        "tau_r_upper": float(np.percentile(tau_r, hi_pct)),
        "tau_diff_lower": float(np.percentile(tau_diff, lo_pct)),
        "tau_diff_upper": float(np.percentile(tau_diff, hi_pct)),
    }
