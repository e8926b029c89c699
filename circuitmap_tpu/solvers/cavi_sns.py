"""CAVI-SnS: spike-and-slab variational inference (Shababo et al. 2013 style).

The baseline solver the reference ships alongside CAVIaR
(optimise/cavi_sns.py:17-243). Adds an explicit per-neuron connection
probability ``alpha``; no PAVA gate and no spontaneous-activity model.

TPU execution model mirrors solvers/caviar.py: one jitted ``lax.scan``
over iterations; the three sequential coordinate sweeps (mu, alpha,
lam) each keep a running residual ``r = (mu * alpha) @ lam`` with
rank-1 updates, so a sweep is O(N·K) rather than the reference's
O(N²·K) masked re-reductions (cavi_sns.py:101-104, 120-122, 141-143);
the per-neuron truncated-normal MC collapses to batched means exactly
as in CAVIaR (logit∘sigmoid = identity, cavi_sns.py:161-164).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.nn import sigmoid

from ..ops.charge import integrated_charge
from ..ops.truncnorm import sample_truncated_normal, truncated_normal_mean
from ._common import (prepare_stim, prepare_traces,
                      warn_data_thin_design_dense,
                      warn_single_chip_envelope)
from ._laplace import _resolve_laplace_impl, laplace_phi_update
from .caviar import _validate_update_order

EPS = 1e-10


class SnsState(NamedTuple):
    mu: jnp.ndarray
    beta: jnp.ndarray
    alpha: jnp.ndarray
    lam: jnp.ndarray
    shape: jnp.ndarray
    rate: jnp.ndarray
    phi: jnp.ndarray
    phi_cov: jnp.ndarray
    key: jax.Array


def update_slab_scale(alpha, lam, shape, rate, beta_prior):
    """Closed-form beta update (cavi_sns.py:87-89)."""
    return 1.0 / jnp.sqrt(
        alpha * jnp.sum((shape / rate) * lam, axis=1) + 1.0 / (beta_prior * beta_prior)
    )


def sweep_means(y, mu, beta, alpha, lam, sig, mu_prior, beta_prior, order):
    """Sequential mu coordinate sweep (cavi_sns.py:91-111) with running residual."""
    r = (mu * alpha) @ lam
    ylam = lam @ (sig * y)  # [N] — hoisted: dot(sig*y, lam[n]) for every n

    def body(i, carry):
        mu, r = carry
        n = order[i]
        r_excl = r - mu[n] * alpha[n] * lam[n]
        new_mu_n = (beta[n] * beta[n]) * (
            alpha[n] * ylam[n]
            - alpha[n] * sig * jnp.dot(lam[n], r_excl)
            + mu_prior[n] / (beta_prior[n] * beta_prior[n])
        )
        r = r_excl + new_mu_n * alpha[n] * lam[n]
        return mu.at[n].set(new_mu_n), r

    mu, _ = lax.fori_loop(0, mu.shape[0], body, (mu, r))
    return mu


def sweep_connection_probs(y, mu, beta, alpha, lam, sig, alpha_prior, order):
    """Sequential alpha coordinate sweep (cavi_sns.py:113-127) with running residual."""
    r = (mu * alpha) @ lam
    ydot = lam @ y  # [N]
    lam_sum = jnp.sum(lam, axis=1)
    prior_logit = jnp.log((alpha_prior + EPS) / (1.0 - alpha_prior + EPS))

    def body(i, carry):
        alpha, r = carry
        n = order[i]
        r_excl = r - mu[n] * alpha[n] * lam[n]
        quad = (
            -2.0 * mu[n] * ydot[n]
            + 2.0 * mu[n] * jnp.dot(lam[n], r_excl)
            + (mu[n] * mu[n] + beta[n] * beta[n]) * lam_sum[n]
        )
        new_alpha_n = sigmoid(prior_logit[n] - 0.5 * sig * quad)
        r = r_excl + mu[n] * new_alpha_n * lam[n]
        return alpha.at[n].set(new_alpha_n), r

    alpha, _ = lax.fori_loop(0, alpha.shape[0], body, (alpha, r))
    return alpha


def sweep_spikes_sns(
    y, stim, mu, beta, alpha, lam, sig, m0, m1, lam_mask, order, minimum_spike_count
):
    """Sequential lam sweep (cavi_sns.py:129-159) with running residual.

    Gate: rows whose total posterior mass falls below the spike minimum
    are zeroed (cavi_sns.py:154) — no PAVA in this solver.
    """
    r = (mu * alpha) @ lam

    def body(i, carry):
        lam, r = carry
        n = order[i]
        stim_n = stim[n]
        r_excl = r - mu[n] * alpha[n] * lam[n]
        quad = (
            -2.0 * y * mu[n] * alpha[n]
            + 2.0 * mu[n] * alpha[n] * r_excl
            + (mu[n] * mu[n] + beta[n] * beta[n]) * alpha[n]
        )
        logit_drive = m0[n] * stim_n - m1[n]
        est = lam_mask * (stim_n > 0) * sigmoid(logit_drive - 0.5 * sig * quad)
        new_lam_n = est * (jnp.sum(est) >= minimum_spike_count)
        r = r_excl + mu[n] * alpha[n] * new_lam_n
        return lam.at[n].set(new_lam_n), r

    lam, _ = lax.fori_loop(0, lam.shape[0], body, (lam, r))
    return lam


def update_noise_sns(y, mu, beta, alpha, lam, shape_prior, rate_prior):
    """Gamma noise posterior with slab-weighted moments (cavi_sns.py:166-172)."""
    K = y.shape[0]
    w = mu * alpha
    pred = w @ lam
    # quadratic terms as row-weighted reductions of lam/lam^2 — one
    # fused pass over [N, K] instead of two (see caviar.update_noise)
    row_lam = jnp.sum(lam, axis=1)
    row_lam2 = jnp.sum(lam * lam, axis=1)
    rate = rate_prior + 0.5 * (
        jnp.sum(jnp.square(y - pred))
        - jnp.sum(w * w * row_lam2)
        + jnp.sum((mu * mu + beta * beta) * alpha * row_lam)
    )
    return shape_prior + 0.5 * K, rate


def _iteration(state: SnsState, data, hyper, static):
    y, stim, lam_mask, powers = data
    (mu_prior, beta_prior, alpha_prior, shape_prior, rate_prior,
     phi_prior, phi_cov_prior) = hyper

    key, k1, k2, k3, k_mc = jax.random.split(state.key, 5)
    N = stim.shape[0]
    sig0 = state.shape / state.rate

    # the reference randomizes each sweep's coordinate order
    # (cavi_sns.py:77/115/134); identity order exists for deterministic
    # parity runs (TestDeterministicSnsParity), like caviar's
    if static.get("update_order", "random") == "identity":
        _order = lambda _k: jnp.arange(N)  # noqa: E731
    else:
        _order = lambda _k: jax.random.permutation(_k, N)  # noqa: E731

    beta = update_slab_scale(state.alpha, state.lam, state.shape, state.rate, beta_prior)
    mu = sweep_means(
        y, state.mu, beta, state.alpha, state.lam, sig0, mu_prior, beta_prior,
        _order(k1),
    )
    alpha = sweep_connection_probs(
        y, mu, beta, state.alpha, state.lam, sig0, alpha_prior,
        _order(k2),
    )

    scale = jnp.diagonal(state.phi_cov, axis1=-2, axis2=-1)
    if static["analytic_mc"]:
        m = truncated_normal_mean(state.phi, scale)
    else:
        m = jnp.mean(
            sample_truncated_normal(k_mc, state.phi, scale, static["num_mc_samples"]),
            axis=0,
        )
    lam = sweep_spikes_sns(
        y, stim, mu, beta, alpha, state.lam, sig0, m[:, 0], m[:, 1], lam_mask,
        _order(k3), static["minimum_spike_count"],
    )

    shape, rate = update_noise_sns(y, mu, beta, alpha, lam, shape_prior, rate_prior)
    phi, phi_cov = laplace_phi_update(lam, stim, phi_prior, phi_cov_prior,
                                      powers=powers,
                                      impl=static.get("laplace_impl", "xla"))

    return SnsState(mu, beta, alpha, lam, shape, rate, phi, phi_cov, key)


@partial(
    jax.jit,
    static_argnames=(
        "iters", "num_mc_samples", "minimum_spike_count", "analytic_mc",
        "save_histories", "laplace_impl", "update_order",
    ),
)
def _run_sns(
    y, stim, lam0, lam_mask, powers,
    mu_prior, beta_prior, alpha_prior, shape_prior, rate_prior,
    phi_prior, phi_cov_prior, key,
    *, iters, num_mc_samples, minimum_spike_count, analytic_mc, save_histories,
    laplace_impl="xla", update_order="random",
):
    data = (y, stim, lam_mask, powers)
    hyper = (mu_prior, beta_prior, alpha_prior, shape_prior, rate_prior,
             phi_prior, phi_cov_prior)
    static = dict(
        num_mc_samples=num_mc_samples,
        minimum_spike_count=minimum_spike_count,
        analytic_mc=analytic_mc,
        laplace_impl=laplace_impl,
        update_order=update_order,
    )

    init = SnsState(
        mu=mu_prior, beta=beta_prior, alpha=alpha_prior, lam=lam0,
        shape=shape_prior, rate=rate_prior, phi=phi_prior, phi_cov=phi_cov_prior,
        key=key,
    )

    def step(state, _):
        new = _iteration(state, data, hyper, static)
        hist = (
            (new.mu, new.beta, new.alpha, new.lam, new.shape, new.rate,
             new.phi, new.phi_cov)
            if save_histories
            else None
        )
        return new, hist

    final, hists = lax.scan(step, init, None, length=iters)
    return final, hists


@jax.jit
def _sns_init(stim):
    """All-ones trial mask + 0.95-on-targeted lam init, one dispatch.

    The reference disables the activity mask for this solver
    (cavi_sns.py:24-25), hence ones rather than an xcorr mask.
    """
    lam_mask = jnp.ones((stim.shape[1],), stim.dtype)
    lam0 = jnp.where(stim > 0, jnp.asarray(0.95, stim.dtype), 0.0)
    return lam_mask, lam0


def cavi_sns(
    y_psc,
    stim,
    mu_prior,
    beta_prior,
    alpha_prior,
    shape_prior,
    rate_prior,
    phi_prior,
    phi_cov_prior,
    iters=50,
    num_mc_samples=100,
    seed=1,
    y_xcorr_thresh=1e-2,
    minimum_spike_count=3,
    save_histories=True,
    dtype=jnp.float32,
    analytic_mc=False,
    laplace_impl="auto",
    trace_wire=None,
    update_order="random",
    verbose=True,
):
    """Fit CAVI-SnS. Signature/return layout mirror reference cavi_sns.py:17-85.

    Returns ``(mu, beta, alpha, lam, shape, rate, phi, phi_cov, *eight
    history arrays)``. Note the reference disables the activity mask for
    this solver (cavi_sns.py:24-25) — all trials participate.
    """
    if verbose:
        print("Running CAVI-SnS (TPU-native).")

    warn_single_chip_envelope(*np.shape(stim), what="cavi_sns()",
                              dtype=dtype)
    y_psc = prepare_traces(y_psc, dtype, trace_wire=trace_wire)
    stim, stim_np, powers_np, powers_dev_np = prepare_stim(stim, dtype)
    warn_data_thin_design_dense(stim_np, what="cavi_sns()")
    y = integrated_charge(y_psc)
    # one fused program for mask + lam init (eager jnp ops cost a
    # tunnel dispatch each; cf. _common.prepare_stim_and_init)
    lam_mask, lam0 = _sns_init(stim)
    # device powers from the uploaded-stim level table (f64 contract)
    powers = jnp.asarray(powers_dev_np, dtype=dtype)

    final, hists = _run_sns(
        y, stim, lam0, lam_mask, powers,
        jnp.asarray(mu_prior, dtype),
        jnp.asarray(beta_prior, dtype),
        jnp.asarray(alpha_prior, dtype),
        jnp.asarray(shape_prior, dtype),
        jnp.asarray(rate_prior, dtype),
        jnp.asarray(phi_prior, dtype),
        jnp.asarray(phi_cov_prior, dtype),
        jax.random.PRNGKey(seed),
        iters=int(iters),
        num_mc_samples=int(num_mc_samples),
        minimum_spike_count=int(minimum_spike_count),
        analytic_mc=bool(analytic_mc),
        save_histories=bool(save_histories),
        laplace_impl=_resolve_laplace_impl(laplace_impl, dtype),
        update_order=_validate_update_order(str(update_order)),
    )

    if save_histories:
        hist_arrs = [np.asarray(h) for h in hists]
        # Reference history-shape contract (cavi_sns.py:54-55):
        # shape/rate histories are stored broadcast to (iters, K)
        # though the posteriors are scalars.
        k_hist = hist_arrs[3].shape[-1]  # lam history carries K
        for i in (4, 5):
            hist_arrs[i] = np.repeat(
                hist_arrs[i][:, None], k_hist, axis=1)
    else:
        hist_arrs = [None] * 8

    return (
        final.mu, final.beta, final.alpha, final.lam, final.shape, final.rate,
        final.phi, final.phi_cov, *hist_arrs,
    )
