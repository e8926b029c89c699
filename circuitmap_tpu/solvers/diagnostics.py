"""Convergence diagnostics: evidence lower bound for CAVIaR fits.

The reference tracks no objective at all — convergence is judged by
eyeballing history arrays (SURVEY.md §5 notes the ELBO is "worth
adding"). This module computes the variational lower bound of the
spike-and-slab charge model under the CAVIaR posterior family:

  y_k = sum_n w_n s_nk + z_k + eps_k,   eps ~ N(0, 1/tau)
  q(w_n) = N(mu_n, var_n),  q(s_nk) = Bern(lam_nk),  q(tau) = Gamma(a, b)

ELBO = E_q[log p(y | w, s, tau)] - KL(q(w) || p(w)) - KL(q(tau) || p(tau))
       + E_q[log p(s | phi)] + H[q(s)]

The spike prior uses the posterior-mean power curves (a standard
plug-in approximation; the phi KL term is omitted, so this is a lower
bound up to that constant-ish term). Use per iteration on history
arrays, or once post-fit.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.nn import log_sigmoid
from jax.scipy.special import digamma, gammaln


def _gauss_kl(mu_q, var_q, mu_p, var_p):
    return 0.5 * (
        jnp.log(var_p / var_q) + (var_q + (mu_q - mu_p) ** 2) / var_p - 1.0
    )


def _gamma_kl(a_q, b_q, a_p, b_p):
    return (
        (a_q - a_p) * digamma(a_q)
        - gammaln(a_q)
        + gammaln(a_p)
        + a_p * (jnp.log(b_q) - jnp.log(b_p))
        + a_q * (b_p - b_q) / b_q
    )


def elbo_components(y, stim, state, priors, z=None):
    """ELBO terms for a (possibly intermediate) CAVIaR state.

    y: [K] integrated charges; stim: [N, K]; ``state``/`priors`` are
    dicts with mu/beta/lam/shape/rate/phi (beta entries are variances,
    the caviar state contract). Returns a dict of scalars incl. 'elbo'.
    """
    mu = jnp.asarray(state["mu"])
    var = jnp.clip(jnp.asarray(state["beta"]), 1e-12, None)  # caviar: variance
    lam = jnp.asarray(state["lam"])
    a, b = jnp.asarray(state["shape"]), jnp.asarray(state["rate"])
    phi = jnp.asarray(state["phi"])
    y = jnp.asarray(y)
    stim = jnp.asarray(stim)
    if z is None:
        z = jnp.asarray(state.get("z", jnp.zeros_like(y)))
    K = y.shape[0]

    # expected log likelihood
    e_tau = a / b
    e_log_tau = digamma(a) - jnp.log(b)
    resid = y - z - mu @ lam
    row_lam = jnp.sum(lam, axis=1)
    row_lam2 = jnp.sum(lam * lam, axis=1)
    e_sq = (
        jnp.sum(resid * resid)
        - jnp.sum(mu * mu * row_lam2)
        + jnp.sum((mu * mu + var) * row_lam)
    )
    e_loglik = 0.5 * K * (e_log_tau - jnp.log(2 * jnp.pi)) - 0.5 * e_tau * e_sq

    # weight + noise KL terms
    kl_w = jnp.sum(
        _gauss_kl(mu, var, jnp.asarray(priors["mu"]),
                  jnp.square(jnp.asarray(priors["beta"])))
    )
    kl_tau = _gamma_kl(a, b, jnp.asarray(priors["shape"]),
                       jnp.asarray(priors["rate"]))

    # spike prior (plug-in power curves) + spike entropy
    drive = phi[:, 0:1] * stim - phi[:, 1:2]
    logp = lam * log_sigmoid(drive) + (1.0 - lam) * log_sigmoid(-drive)
    targeted = stim > 0
    e_log_prior_s = jnp.sum(jnp.where(targeted, logp, 0.0))
    lam_c = jnp.clip(lam, 1e-7, 1.0 - 1e-7)
    entropy_s = -jnp.sum(
        jnp.where(targeted,
                  lam_c * jnp.log(lam_c) + (1 - lam_c) * jnp.log(1 - lam_c),
                  0.0)
    )

    elbo = e_loglik - kl_w - kl_tau + e_log_prior_s + entropy_s
    return {
        "elbo": float(elbo),
        "expected_loglik": float(e_loglik),
        "kl_weights": float(kl_w),
        "kl_noise": float(kl_tau),
        "spike_prior": float(e_log_prior_s),
        "spike_entropy": float(entropy_s),
    }


def elbo_device(y, stim, state, hyper, k_true):
    """In-fit ELBO: pure-jnp scalar, traced inside the CAVI scan.

    Same bound as ``elbo_components`` but on the live ``CaviarState``
    (beta holds the posterior weight VARIANCE — the caviar state
    contract) with the solver's hyper tuple, and padding-safe: the
    trial axis may carry inert 128-alignment padding (zero y/lam/stim),
    which cancels from every sum; only the trial-count factor of the
    likelihood must use ``k_true``.
    """
    mu_prior, beta_prior, shape_prior, rate_prior, _phi_p, _phi_cov_p = hyper
    mu, var = state.mu, jnp.clip(state.beta, 1e-12, None)
    lam, a, b, phi, z = state.lam, state.shape, state.rate, state.phi, state.z

    e_tau = a / b
    e_log_tau = digamma(a) - jnp.log(b)
    resid = y - z - mu @ lam
    # row-weighted reductions: one fused [N, K] pass (caviar.update_noise)
    row_lam = jnp.sum(lam, axis=1)
    row_lam2 = jnp.sum(lam * lam, axis=1)
    e_sq = (
        jnp.sum(resid * resid)
        - jnp.sum(mu * mu * row_lam2)
        + jnp.sum((mu * mu + var) * row_lam)
    )
    e_loglik = (0.5 * k_true * (e_log_tau - jnp.log(2 * jnp.pi))
                - 0.5 * e_tau * e_sq)

    kl_w = jnp.sum(_gauss_kl(mu, var, mu_prior, jnp.square(beta_prior)))
    kl_tau = _gamma_kl(a, b, shape_prior, rate_prior)

    drive = phi[:, 0:1] * stim - phi[:, 1:2]
    targeted = stim > 0
    logp = lam * log_sigmoid(drive) + (1.0 - lam) * log_sigmoid(-drive)
    e_log_prior_s = jnp.sum(jnp.where(targeted, logp, 0.0))
    lam_c = jnp.clip(lam, 1e-7, 1.0 - 1e-7)
    entropy_s = -jnp.sum(
        jnp.where(targeted,
                  lam_c * jnp.log(lam_c) + (1 - lam_c) * jnp.log(1 - lam_c),
                  0.0)
    )
    return e_loglik - kl_w - kl_tau + e_log_prior_s + entropy_s


def elbo_trajectory(y, stim, history, priors):
    """ELBO per iteration from a save_histories=True fit."""
    iters = history["mu"].shape[0]
    out = []
    for it in range(iters):
        state = {k: history[k][it] for k in
                 ("mu", "beta", "lam", "shape", "rate", "phi")}
        # shape/rate histories follow the reference's (iters, K)
        # broadcast layout (caviar.py:58-59); the bound wants scalars
        for k in ("shape", "rate"):
            if np.ndim(state[k]) > 0:
                state[k] = np.asarray(state[k]).ravel()[0]
        state["z"] = history["z"][it] if "z" in history and history["z"] is not None \
            else np.zeros(np.asarray(y).shape[0])
        out.append(elbo_components(y, stim, state, priors))
    return out
