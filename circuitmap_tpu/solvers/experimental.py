"""Experimental solvers: MBCS with automatic relevance determination.

A working TPU-native equivalent of the reference's experimental module
(optimise/experimental/mbcs_spike_weighted_var_with_outliers_ARD.py:30-230),
which cannot run on modern JAX (it uses the removed ``jax.ops.
index_update`` and ``jax.experimental.loops`` APIs). The model pieces it
implemented are preserved:

  * ARD relevance precisions per neuron — the sparsity mechanism
    (reference update_relevance_ARD :142-150): alpha_n = 1 / E[w_n^2],
  * Gaussian weight posterior with relevance-weighted prior
    (update_mu_ARD :155-166),
  * soft-threshold outlier vector z with shrinking penalty,
  * sigmoid spike updates with running-residual coordinate sweeps.

Everything runs as one jitted ``lax.scan``.
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


class ArdState(NamedTuple):
    mu: jnp.ndarray
    beta: jnp.ndarray        # posterior sd per weight
    relevance: jnp.ndarray   # ARD precision per neuron
    lam: jnp.ndarray
    sigma2: jnp.ndarray      # scalar noise variance
    z: jnp.ndarray
    key: jax.Array


def _iteration(state: ArdState, data, static):
    y, stim, lam_mask = data
    N = stim.shape[0]

    # --- weight posterior under ARD prior: blocked Gaussian update ---
    gram = state.lam @ state.lam.T
    soft_var = jnp.sum(state.lam * (1.0 - state.lam), axis=-1)
    prec = (gram + jnp.diag(soft_var)) / state.sigma2 + jnp.diag(state.relevance)
    chol = jax.scipy.linalg.cho_factor(prec, lower=True)
    mu = jax.scipy.linalg.cho_solve(
        chol, state.lam @ (y - state.z)
    ) / state.sigma2
    # cov diagonal from one triangular solve (see caviar.update_weights)
    Linv = jax.scipy.linalg.solve_triangular(
        chol[0], jnp.eye(N, dtype=y.dtype), lower=True
    )
    beta = jnp.sqrt(jnp.sum(Linv * Linv, axis=0))

    # --- ARD relevance update: alpha_n = 1 / E[w_n^2] ---
    relevance = 1.0 / (mu * mu + beta * beta + 1e-8)
    relevance = jnp.minimum(relevance, static["relevance_cap"])

    # --- spike sweep with running residual ---
    key, k_order = jax.random.split(state.key)
    order = jax.random.permutation(k_order, N)
    resid_y = y - state.z
    r = mu @ state.lam
    sig = 1.0 / state.sigma2

    def body(i, carry):
        lam, r = carry
        n = order[i]
        r_excl = r - mu[n] * lam[n]
        quad = sig * (
            -2.0 * resid_y * mu[n] + 2.0 * mu[n] * r_excl
            + (mu[n] * mu[n] + beta[n] * beta[n])
        )
        est = lam_mask * (stim[n] > 0) * sigmoid(
            static["spike_prior_logit"] - 0.5 * quad
        )
        new_lam_n = est
        r = r_excl + mu[n] * new_lam_n
        return lam.at[n].set(new_lam_n), r

    lam, _ = lax.fori_loop(0, N, body, (state.lam, r))

    # --- spike-weighted noise variance (MC-free moment form) ---
    pred = mu @ lam
    resid = y - pred - state.z
    ew2 = jnp.sum((mu * mu + beta * beta)[:, None] * lam * (1.0 - lam), axis=0)
    sigma2 = (jnp.sum(resid * resid) + jnp.sum(ew2)) / y.shape[0] + 1e-8

    # --- outliers: soft threshold of the residual ---
    raw = y - pred
    z = jnp.maximum(raw - static["outlier_penalty"], 0.0)
    z = jnp.where(jnp.any(lam >= 0.5, axis=0), 0.0, z) * lam_mask

    return ArdState(mu, beta, relevance, lam, sigma2, z, key)


@partial(jax.jit, static_argnames=("iters", "relevance_cap", "outlier_penalty",
                                   "spike_prior_logit"))
def _run_ard(y, stim, lam0, lam_mask, key, *, iters, relevance_cap,
             outlier_penalty, spike_prior_logit):
    static = dict(relevance_cap=relevance_cap, outlier_penalty=outlier_penalty,
                  spike_prior_logit=spike_prior_logit)
    data = (y, stim, lam_mask)
    N, K = stim.shape
    init = ArdState(
        mu=jnp.zeros(N, y.dtype),
        beta=jnp.ones(N, y.dtype),
        relevance=jnp.ones(N, y.dtype),
        lam=lam0,
        sigma2=jnp.asarray(1.0, y.dtype),
        z=jnp.zeros(K, y.dtype),
        key=key,
    )

    def step(state, _):
        return _iteration(state, data, static), None

    final, _ = lax.scan(step, init, None, length=iters)
    return final


def mbcs_ard(
    y_psc,
    stim,
    iters=30,
    seed=0,
    relevance_cap=1e4,
    outlier_penalty=10.0,
    init_spike_prior=0.75,
    dtype=jnp.float32,
    verbose=True,
):
    """Fit the ARD variant. Returns (mu, beta, relevance, lam, sigma2, z).

    Neurons whose relevance saturates at ``relevance_cap`` are pruned
    (mu forced to ~0 by the prior) — ARD's automatic sparsity, replacing
    MBCS's L1 penalty.
    """
    if verbose:
        print("Running MBCS-ARD (experimental, TPU-native).")
    y_psc = jnp.asarray(np.asarray(y_psc, dtype=np.float32), dtype=dtype)
    stim_np = np.asarray(stim, dtype=np.float32)
    stim = jnp.asarray(stim_np, dtype=dtype)
    y = integrated_charge(y_psc)
    lam_mask = jnp.ones(y.shape[0], dtype=dtype)
    lam0 = jnp.where(stim > 0, jnp.asarray(init_spike_prior, dtype), 0.0)

    prior_logit = float(np.log(init_spike_prior / (1 - init_spike_prior)))
    final = _run_ard(
        y, stim, lam0, lam_mask, jax.random.PRNGKey(seed),
        iters=int(iters), relevance_cap=float(relevance_cap),
        outlier_penalty=float(outlier_penalty),
        spike_prior_logit=prior_logit,
    )
    return (final.mu, final.beta, final.relevance, final.lam, final.sigma2,
            final.z)
