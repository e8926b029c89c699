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
from ._common import (prepare_stim, warn_data_thin_design_dense,
                      warn_single_chip_envelope)


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
    noise-scale constraint sqrt(sum(rate/shape)). Fully on device as a
    ``lax.while_loop`` so the whole MBCS fit traces into one program —
    no per-penalty-iteration host syncs. The plateau check stops once
    shrinking the penalty no longer changes the solution (the
    reference's |err - err_prev| check compares against an un-updated
    err_prev=0, i.e. never fires; comparing solutions is the intended
    behaviour without looping uselessly once converged).
    """
    del verbose  # one-program execution: no per-iteration host prints
    lam = jnp.asarray(lam)
    y = jnp.asarray(y)
    mu = jnp.asarray(mu)
    constr = jnp.sqrt(jnp.sum(jnp.asarray(rate) / jnp.asarray(shape)))
    flip = constrain_weights == "negative"
    A = (-lam if flip else lam).T  # [K, N]
    mu0 = -mu if flip else mu
    positive = constrain_weights in ("positive", "negative")

    def cond(carry):
        i, _, _, _, done = carry
        return (i < max_penalty_iters) & (~done)

    def body(carry):
        i, coef, _, pen, _ = carry
        new = _fista_lasso(A, y, coef, pen, max_iters=int(max_lasso_iters),
                           positive=positive)
        err = jnp.linalg.norm(y - A @ new)
        plateau = (
            (i > 0)
            & jnp.all(jnp.abs(new - coef) < tol)
            & ~jnp.all(new == 0)
        )
        done = (err <= constr) | plateau
        return i + 1, new, coef, pen * scale_factor, done

    init = (jnp.asarray(0), mu0, mu0, jnp.asarray(penalty, A.dtype),
            jnp.asarray(False))
    _, coef, _, _, _ = lax.while_loop(cond, body, init)
    return -coef if flip else coef


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

    # per-level fused reductions (no [N, P+1, K] one-hot temporary)
    P1 = pw.shape[0]
    S = jnp.stack(
        [jnp.sum(jnp.where(stim == pw[p], lam, 0.0), axis=-1)
         for p in range(P1)], axis=1)
    counts = jnp.stack(
        [jnp.sum((stim == pw[p]).astype(lam.dtype), axis=-1)
         for p in range(P1)], axis=1)
    rates = S / jnp.maximum(counts, 1.0)
    rates = rates.at[:, 0].set(0.0)  # zero power -> zero rate, as the reference

    rf = jnp.clip(isotonic_regression_batched(rates, 1.0), 0.0, 1.0)

    # spike prior per trial: fitted value at the trial's power bucket —
    # compare-selects, not a 20M-index table gather (TPU scalar-gather
    # path; see _common._select_levels)
    spike_prior = jnp.zeros(stim.shape, lam.dtype)
    for p in range(P1):
        spike_prior = spike_prior + jnp.where(
            stim == pw[p], rf[:, p][:, None], jnp.zeros((), lam.dtype))
    return rf, spike_prior


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


def update_noise_analytic(y, mu, beta, lam, noise_scale=0.5, eps=1e-4):
    """Exact moments of the spike-dependent noise model.

    The MC estimator above averages S draws of ``ws_k = sum_n w_n
    s_nk`` with independent ``w_n ~ N(mu_n, std_n^2)`` (std masked to
    connected weights) and ``s_nk ~ Bernoulli(lam_nk)`` — but both
    moments it estimates have closed forms:

        E[ws]        = sum_n mu_n lam_nk
        Var[ws]      = sum_n [(mu_n^2 + std_n^2) lam_nk
                              - mu_n^2 lam_nk^2]
        E[ws^2]      = E[ws]^2 + Var[ws]
        E[(y-ws)^2]  = y^2 - 2 y E[ws] + E[ws^2]

    Three [N, K] contractions (MXU matvecs) replace the [S, N, K]
    uniform draw + S-pass einsum — profiled 4.5 -> ~0.3 ms/iteration at
    the bench shape with S=10, and the estimate is the S -> inf limit
    (zero MC variance). Same trade as CAVIaR's ``analytic_mc``:
    deterministic, not bit-faithful to the reference's sampler, so it
    is OPT-IN via mbcs(analytic_noise=True).
    """
    std2 = beta * beta * (mu != 0)
    pred = mu @ lam
    second = (mu * mu + std2) @ lam
    sq_correction = (mu * mu) @ (lam * lam)
    var = second - sq_correction
    e_sq = pred * pred + var
    e_err = y * y - 2.0 * y * pred + e_sq
    shape = noise_scale * noise_scale * e_sq + 0.5
    rate = noise_scale * pred + 0.5 * e_err + eps
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
    """Soft-threshold outlier/spontaneous estimate (mbcs.py:215-257).

    Device ``lax.while_loop`` over the penalty-shrink schedule (no host
    round trips; the whole fit is one compiled program)."""
    y = jnp.asarray(y)
    lam = jnp.asarray(lam)
    resid = y - jnp.asarray(mu) @ lam
    explained = jnp.any(lam >= 0.5, axis=0)
    denom = jnp.sum(y * y)

    def cond(carry):
        i, err, _, _ = carry
        return (i < max_penalty_iters) & (err > tol)

    def body(carry):
        i, _, _, pen = carry
        z = jnp.maximum(jnp.where(resid < pen, 0.0, resid - pen), 0.0)
        if orthogonal:
            z = jnp.where(explained, 0.0, z)
        z = z * jnp.asarray(lam_mask)
        err = jnp.sum(jnp.square(resid - z)) / denom
        return i + 1, err, z, pen * scale_factor

    init = (jnp.asarray(0), jnp.asarray(jnp.inf, y.dtype),
            jnp.zeros_like(resid), jnp.asarray(penalty, y.dtype))
    _, _, z, _ = lax.while_loop(cond, body, init)
    return z


# ---------------------------------------------------------------------------
# Driver: the whole fit is one lax.scan under jit (one device dispatch;
# histories via scan ys), matching the execution model of the other solvers.
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "iters", "max_penalty_iters", "max_lasso_iters", "constrain_weights",
        "learn_lam", "delay_spont_estimation", "minimum_spike_count",
        "num_mc_samples_noise_model", "orthogonal_outliers", "save_histories",
        "analytic_noise",
    ),
)
def _run_mbcs(
    y, stim, lam0, lam_mask, powers_with_zero, mu0, beta_prior, shape0, rate0,
    key, penalty, scale_factor, outlier_penalty, minimum_maximal_spike_prob,
    spont_rate0, outlier_tol, noise_scale, *,
    iters, max_penalty_iters, max_lasso_iters, constrain_weights, learn_lam,
    delay_spont_estimation, minimum_spike_count, num_mc_samples_noise_model,
    orthogonal_outliers, save_histories, analytic_noise=False,
):
    N = stim.shape[0]
    K = y.shape[0]
    P1 = powers_with_zero.shape[0]

    init = (
        mu0,                                    # mu
        beta_prior,                             # beta
        lam0,                                   # lam
        shape0,                                 # shape [K]
        rate0,                                  # rate [K]
        jnp.zeros(K, dtype=y.dtype),            # z
        spont_rate0,                            # spont_rate
        lam0,                                   # spike_prior (it-0 rule)
        jnp.zeros((N, P1), dtype=y.dtype),      # receptive fields
        key,
    )

    def step(carry, it):
        mu, beta, lam, shape, rate, z, spont_rate, spike_prior, _, key = carry

        beta = update_slab_scale_mbcs(lam, shape, rate, beta_prior)
        mu = update_weights_constrained_l1(
            y, mu, lam, shape, rate, penalty=penalty,
            scale_factor=scale_factor, max_penalty_iters=max_penalty_iters,
            max_lasso_iters=max_lasso_iters,
            constrain_weights=constrain_weights,
        )

        key, k_order, k_noise = jax.random.split(key, 3)
        order = jax.random.permutation(k_order, N)

        if learn_lam:
            lam = sweep_spikes_mbcs(
                y, stim, mu, beta, lam, shape, rate, lam_mask, spike_prior,
                order,
            )
        rf, spike_prior = update_receptive_fields(lam, stim, powers_with_zero)
        mu, lam = isotonic_filtering(
            mu, lam, rf,
            minimum_spike_count=minimum_spike_count,
            minimum_maximal_spike_prob=minimum_maximal_spike_prob + spont_rate,
        )
        if analytic_noise:
            shape, rate = update_noise_analytic(
                y, mu, beta, lam, noise_scale=noise_scale,
            )
        else:
            shape, rate = update_noise_mc(
                k_noise, y, mu, beta, lam, noise_scale=noise_scale,
                num_mc_samples=num_mc_samples_noise_model,
            )

        gate = it > delay_spont_estimation
        z_new = update_outliers(
            y, mu, lam, lam_mask, penalty=outlier_penalty,
            scale_factor=scale_factor, max_penalty_iters=max_penalty_iters,
            orthogonal=orthogonal_outliers, tol=outlier_tol,
        )
        z = jnp.where(gate, z_new, z)
        spont_rate = jnp.where(
            gate, jnp.mean((z_new != 0.0).astype(y.dtype)), spont_rate
        )

        new_carry = (mu, beta, lam, shape, rate, z, spont_rate, spike_prior,
                     rf, key)
        hist = (mu, beta, lam, shape, rate, z) if save_histories else None
        return new_carry, hist

    final, hists = lax.scan(step, init, jnp.arange(iters))
    return final, hists


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
    analytic_noise=False,
):
    """Fit MBCS. Signature mirrors reference mbcs.py:27-32; returns
    ``(mu, beta, lam, shape, rate, z, receptive_fields, *six history arrays)``.

    ``analytic_noise=True`` substitutes the exact moments of the MC
    spike-dependent noise model (update_noise_analytic) — the S -> inf
    limit of the reference's sampler, deterministic and ~15x cheaper
    per iteration on TPU. Default False (reference-faithful sampling).

    Feed DEMIXED traces at scale: unlike CAVIaR, MBCS has no power-curve
    gating or reconnection machinery, and on raw contaminated traces at
    N=1000/K=20000 it collapses (measured R2 ~ 0 raw vs 0.976 demixed
    on the same sim; 0.991 at N=300/K=5000 demixed).
    """
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

    # compressed stim upload (sparse hologram / int8 buckets), as caviar
    warn_single_chip_envelope(*np.shape(stim), what="mbcs()", dtype=dtype)
    stim, stim_np, _powers_np, _powers_dev = prepare_stim(stim, dtype)
    warn_data_thin_design_dense(stim_np, what="mbcs()")
    # built from the uploaded-stim level table, not the original-precision
    # host powers — the two differ for f64 fits (_common f64 contract)
    powers_with_zero = np.concatenate([[0.0], _powers_dev])

    rng = np.random.default_rng(seed)
    mu0 = jnp.asarray(rng.lognormal(1.0, 1.0, N), dtype=dtype)

    if init_lam is None:
        lam0 = jnp.where(stim > 0, jnp.asarray(init_spike_prior, dtype), 0.0)
        lam0 = lam0 * lam_mask
    else:
        lam0 = jnp.asarray(init_lam, dtype=dtype)

    final, hists = _run_mbcs(
        y,
        stim,
        lam0,
        lam_mask,
        jnp.asarray(powers_with_zero, dtype),
        mu0,
        jnp.asarray(beta_prior, dtype),
        jnp.full((K,), float(shape_prior), dtype=dtype),
        jnp.full((K,), float(rate_prior), dtype=dtype),
        jax.random.PRNGKey(seed),
        jnp.asarray(penalty, dtype),
        jnp.asarray(scale_factor, dtype),
        jnp.asarray(outlier_penalty, dtype),
        jnp.asarray(minimum_maximal_spike_prob, dtype),
        jnp.asarray(spont_rate, dtype),
        jnp.asarray(outlier_tol, dtype),
        jnp.asarray(noise_scale, dtype),
        iters=int(iters),
        max_penalty_iters=int(max_penalty_iters),
        max_lasso_iters=int(max_lasso_iters),
        constrain_weights=str(constrain_weights),
        learn_lam=bool(learn_lam),
        delay_spont_estimation=int(delay_spont_estimation),
        minimum_spike_count=int(minimum_spike_count),
        num_mc_samples_noise_model=int(num_mc_samples_noise_model),
        orthogonal_outliers=bool(orthogonal_outliers),
        save_histories=bool(save_histories),
        analytic_noise=bool(analytic_noise),
    )
    (mu, beta, lam, shape, rate, z, _spont, _prior, receptive_fields,
     _key) = final

    if save_histories:
        hist_arrs = [np.asarray(h) for h in hists]
    else:
        hist_arrs = [None] * 6

    return (mu, beta, lam, shape, rate, z, receptive_fields, *hist_arrs)
