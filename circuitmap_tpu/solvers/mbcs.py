"""MBCS: model-based compressed sensing with isotonic regularisation.

The reference's earlier-generation solver (optimise/mbcs.py:27-105):
Lasso-constrained weight updates, isotonic receptive fields as spike
priors, a Monte-Carlo spike-dependent noise model, and soft-threshold
outlier estimation. The reference leans on sklearn (Lasso,
IsotonicRegression) and host numpy; here the Lasso is a jitted FISTA
proximal solver, the receptive fields use the batched device PAVA, and
the MC noise model is one batched sampling op.

Note: the reference implementation crashes as shipped (undefined name
``indx`` at mbcs.py:103); this rebuild is the working equivalent.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.nn import sigmoid

from ..ops.charge import integrated_charge
from ..ops.pava import isotonic_regression_batched


# ---------------------------------------------------------------------------
# FISTA lasso (replaces sklearn.linear_model.Lasso, mbcs.py:157-213)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_iters", "positive"))
def _fista_lasso(A, y, x0, penalty, max_iters=200, positive=True):
    """min_x 0.5/K * ||y - A x||^2 + penalty * ||x||_1  (sklearn objective).

    A: [K, N]; accelerated proximal gradient with fixed step 1/L,
    L = largest eigenvalue of A.T A / K (power iteration).
    """
    K = A.shape[0]
    AtA = (A.T @ A) / K
    Aty = (A.T @ y) / K

    # power iteration for the Lipschitz constant
    def power_step(v, _):
        w = AtA @ v
        return w / (jnp.linalg.norm(w) + 1e-12), None

    v0 = jnp.ones(A.shape[1], dtype=A.dtype) / jnp.sqrt(A.shape[1])
    v, _ = lax.scan(power_step, v0, None, length=30)
    L = jnp.maximum(v @ (AtA @ v), 1e-8)
    step = 1.0 / L

    def prox(u):
        s = jnp.sign(u) * jnp.maximum(jnp.abs(u) - step * penalty, 0.0)
        return jnp.maximum(s, 0.0) if positive else s

    def fista_step(carry, _):
        x, x_prev, t = carry
        grad = AtA @ x - Aty
        x_new = prox(x - step * grad)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        momentum = x_new + (t - 1.0) / t_new * (x_new - x_prev)
        return (momentum, x_new, t_new), None

    init = (x0, x0, jnp.asarray(1.0, A.dtype))
    (x, x_last, _), _ = lax.scan(fista_step, init, None, length=max_iters)
    return x_last


def update_weights_constrained_l1(
    y, mu, lam, shape, rate, penalty=1.0, scale_factor=0.5, max_penalty_iters=10,
    max_lasso_iters=100, constrain_weights="positive", verbose=False, tol=1e-5,
):
    """Penalty-shrinking constrained Lasso weight update (mbcs.py:157-213).

    Shrinks the L1 penalty geometrically until the residual meets the
    noise-scale constraint sqrt(sum(rate/shape)).
    """
    A = jnp.asarray(lam).T  # [K, N]
    y = jnp.asarray(y)
    constr = float(np.sqrt(np.sum(np.asarray(rate) / np.asarray(shape))))
    flip = constrain_weights == "negative"
    if flip:
        A, mu = -A, -mu
    positive = constrain_weights in ("positive", "negative")

    coef = jnp.asarray(mu)
    prev_coef = None
    for it in range(max_penalty_iters):
        coef = _fista_lasso(
            A, y, coef, jnp.asarray(penalty, A.dtype),
            max_iters=int(max_lasso_iters), positive=positive,
        )
        err = float(jnp.linalg.norm(y - A @ coef))
        if verbose:
            print(f"  lasso penalty iter {it}: err={err:.4f} constr={constr:.4f}")
        if err <= constr:
            break
        # plateau check: stop only once shrinking the penalty stopped
        # changing the solution (the reference's |err - err_prev| check
        # compares against an un-updated err_prev=0, i.e. never fires;
        # comparing solutions is the intended behaviour without looping
        # uselessly once converged)
        if prev_coef is not None and it > 0 and bool(
            jnp.all(jnp.abs(coef - prev_coef) < tol)
        ) and not bool(jnp.all(coef == 0)):
            break
        prev_coef = coef
        penalty = penalty * scale_factor

    return (-coef if flip else coef)


# ---------------------------------------------------------------------------
# Isotonic receptive fields (replaces sklearn IsotonicRegression, mbcs.py:132-151)
# ---------------------------------------------------------------------------


def update_receptive_fields(lam, stim, powers_with_zero):
    """Isotonic fit of per-power spike rates, incl. the zero-power knot.

    Returns (receptive_field [N, P+1], spike_prior [N, K]) where the
    prior at each trial is the fitted value at that trial's power.
    """
    lam = jnp.asarray(lam)
    stim = jnp.asarray(stim)
    pw = jnp.asarray(powers_with_zero, dtype=lam.dtype)  # [P+1], pw[0] == 0

    onehot = (stim[:, None, :] == pw[None, :, None]).astype(lam.dtype)  # [N, P+1, K]
    counts = jnp.sum(onehot, axis=-1)
    rates = jnp.einsum("npk,nk->np", onehot, lam) / jnp.maximum(counts, 1.0)
    rates = rates.at[:, 0].set(0.0)  # zero power -> zero rate, as the reference

    rf = jnp.clip(isotonic_regression_batched(rates, 1.0), 0.0, 1.0)

    # spike prior per trial: fitted value at the trial's power bucket
    bucket = jnp.argmax(stim[:, None, :] == pw[None, :, None], axis=1)  # [N, K]
    spike_prior = jnp.take_along_axis(rf, bucket.reshape(rf.shape[0], -1), axis=1)
    return rf, spike_prior.reshape(stim.shape)


def isotonic_filtering(mu, lam, receptive_field, minimum_spike_count=1,
                       minimum_maximal_spike_prob=0.2):
    """Disconnect cells failing the max-power rate or spike-count floor
    (mbcs.py:118-130)."""
    keep = (receptive_field[:, -1] >= minimum_maximal_spike_prob) & (
        jnp.sum(lam >= 0.5, axis=1) >= minimum_spike_count
    )
    keep = keep.astype(mu.dtype)
    return mu * keep, lam * keep[:, None]


# ---------------------------------------------------------------------------
# Remaining updates
# ---------------------------------------------------------------------------


def update_slab_scale_mbcs(lam, shape, rate, beta_prior):
    """beta update with per-trial noise vector (mbcs.py:153-155)."""
    return 1.0 / jnp.sqrt(
        jnp.sum((shape / rate)[None, :] * lam, axis=1)
        + 1.0 / (beta_prior * beta_prior)
    )


@partial(jax.jit, static_argnames=("num_mc_samples",))
def update_noise_mc(key, y, mu, beta, lam, noise_scale=0.5, num_mc_samples=10,
                    eps=1e-4):
    """Monte-Carlo spike-dependent noise model (mbcs.py:107-116).

    Per-trial gamma parameters from sampled weights/spikes — one batched
    [S, N] x [S, N, K] contraction instead of the reference's Python
    averaging loop.
    """
    kw, ks = jax.random.split(key)
    std = beta * (mu != 0)
    w = mu[None, :] + std[None, :] * jax.random.normal(
        kw, (num_mc_samples,) + mu.shape, dtype=mu.dtype
    )
    s = (
        jax.random.uniform(ks, (num_mc_samples,) + lam.shape, dtype=lam.dtype)
        <= lam[None]
    ).astype(lam.dtype)
    ws = jnp.einsum("sn,snk->sk", w, s)
    mc_sq = jnp.mean(ws * ws, axis=0)
    mc_err = jnp.mean(jnp.square(y[None] - ws), axis=0)
    shape = noise_scale * noise_scale * mc_sq + 0.5
    rate = noise_scale * (mu @ lam) + 0.5 * mc_err + eps
    return shape, rate


def sweep_spikes_mbcs(y, stim, mu, beta, lam, shape, rate, lam_mask, spike_prior,
                      order):
    """Sequential lam sweep with isotonic receptive-field prior
    (mbcs.py:304-320). shape/rate are per-trial vectors here."""
    sig = shape / (2.0 * rate)  # [K]
    r = mu @ lam

    def body(i, carry):
        lam, r = carry
        n = order[i]
        active = (mu[n] != 0).astype(lam.dtype)
        r_excl = r - mu[n] * lam[n]
        quad = -2.0 * y * mu[n] + 2.0 * mu[n] * r_excl + (
            mu[n] * mu[n] + beta[n] * beta[n]
        )
        est = lam_mask * (stim[n] > 0) * active * sigmoid(spike_prior[n] - sig * quad)
        new_lam_n = jnp.where(active > 0, est, lam[n])
        r = r_excl + mu[n] * new_lam_n
        return lam.at[n].set(new_lam_n), r

    lam, _ = lax.fori_loop(0, lam.shape[0], body, (lam, r))
    return lam


def update_outliers(y, mu, lam, lam_mask, penalty=1.0, scale_factor=0.5,
                    max_penalty_iters=10, orthogonal=True, tol=0.05):
    """Soft-threshold outlier/spontaneous estimate (mbcs.py:215-257)."""
    resid = np.asarray(y - mu @ lam)
    lam_np = np.asarray(lam)
    mask = np.asarray(lam_mask)
    y_np = np.asarray(y)
    z = np.zeros_like(resid)
    for _ in range(max_penalty_iters):
        z = np.where(resid < penalty, 0.0, resid - penalty)
        z = np.maximum(z, 0.0)
        if orthogonal:
            z[np.any(lam_np >= 0.5, axis=0)] = 0.0
        z = z * mask
        err = np.sum(np.square(resid - z)) / np.sum(np.square(y_np))
        if err <= tol:
            break
        penalty *= scale_factor
    return z


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def mbcs(
    y_psc,
    stim,
    mu_prior,
    beta_prior,
    shape_prior,
    rate_prior,
    iters=50,
    num_mc_samples=100,
    seed=0,
    y_xcorr_thresh=0.05,
    penalty=5e0,
    scale_factor=0.5,
    max_penalty_iters=10,
    max_lasso_iters=100,
    warm_start_lasso=True,
    constrain_weights="positive",
    verbose=False,
    learn_noise=False,
    init_lam=None,
    learn_lam=True,
    delay_spont_estimation=1,
    minimum_spike_count=1,
    noise_scale=0.5,
    num_mc_samples_noise_model=10,
    minimum_maximal_spike_prob=0.2,
    orthogonal_outliers=True,
    outlier_penalty=5e1,
    init_spike_prior=0.75,
    outlier_tol=0.05,
    spont_rate=0,
    lam_mask_fraction=0.05,
    dtype=jnp.float32,
    save_histories=True,
):
    """Fit MBCS. Signature mirrors reference mbcs.py:27-32; returns
    ``(mu, beta, lam, shape, rate, z, receptive_fields, *six history arrays)``."""
    if verbose:
        print("Running MBCS (TPU-native).")

    y_psc_np = np.asarray(y_psc)
    y = integrated_charge(jnp.asarray(y_psc_np, dtype=dtype))
    K = y.shape[0]
    N = np.asarray(mu_prior).shape[0]

    # activity mask: energy threshold plus small-event suppression (mbcs.py:41-42)
    energy = np.sum(y_psc_np * y_psc_np, axis=-1)
    lam_mask_np = (energy > y_xcorr_thresh).astype(float)
    lam_mask_np[np.max(y_psc_np, axis=1) < lam_mask_fraction * np.max(y_psc_np)] = 0.0
    lam_mask = jnp.asarray(lam_mask_np, dtype=dtype)

    stim_np = np.asarray(stim)
    stim = jnp.asarray(stim_np, dtype=dtype)
    powers_with_zero = np.unique(stim_np)

    rng = np.random.default_rng(seed)
    mu = jnp.asarray(rng.lognormal(1.0, 1.0, N), dtype=dtype)
    beta = jnp.asarray(beta_prior, dtype=dtype)
    shape = jnp.full((K,), float(shape_prior), dtype=dtype)
    rate = jnp.full((K,), float(rate_prior), dtype=dtype)
    z = np.zeros(K)

    if init_lam is None:
        lam = jnp.where(stim > 0, jnp.asarray(init_spike_prior, dtype), 0.0)
        lam = lam * lam_mask
    else:
        lam = jnp.asarray(init_lam, dtype=dtype)

    key = jax.random.PRNGKey(seed)
    receptive_fields = None

    hists = {k: [] for k in ["mu", "beta", "lam", "shape", "rate", "z"]}

    for it in range(iters):
        beta = update_slab_scale_mbcs(lam, shape, rate, jnp.asarray(beta_prior, dtype))
        mu = update_weights_constrained_l1(
            y, mu, lam, shape, rate, penalty=penalty, scale_factor=scale_factor,
            max_penalty_iters=max_penalty_iters, max_lasso_iters=max_lasso_iters,
            constrain_weights=constrain_weights, verbose=verbose,
        )

        key, k_order, k_noise = jax.random.split(key, 3)
        order = jax.random.permutation(k_order, N)

        if receptive_fields is None:
            spike_prior = lam
        if learn_lam:
            lam = sweep_spikes_mbcs(
                y, stim, mu, beta, lam, shape, rate, lam_mask, spike_prior, order
            )
        receptive_fields, spike_prior = update_receptive_fields(
            lam, stim, powers_with_zero
        )
        mu, lam = isotonic_filtering(
            mu, lam, receptive_fields,
            minimum_spike_count=minimum_spike_count,
            minimum_maximal_spike_prob=minimum_maximal_spike_prob + spont_rate,
        )
        shape, rate = update_noise_mc(
            k_noise, y, mu, beta, lam, noise_scale=noise_scale,
            num_mc_samples=int(num_mc_samples_noise_model),
        )

        if it > delay_spont_estimation:
            z = update_outliers(
                y, mu, lam, lam_mask, penalty=outlier_penalty,
                scale_factor=scale_factor, max_penalty_iters=max_penalty_iters,
                orthogonal=orthogonal_outliers, tol=outlier_tol,
            )
            spont_rate = float(np.mean(z != 0))

        if save_histories:
            for name, val in zip(
                hists, [mu, beta, lam, shape, rate, z]
            ):
                hists[name].append(np.asarray(val))

    if save_histories:
        hist_arrs = [np.stack(hists[k]) for k in hists]
    else:
        hist_arrs = [None] * 6

    return (mu, beta, lam, shape, rate, jnp.asarray(z, dtype), receptive_fields,
            *hist_arrs)
