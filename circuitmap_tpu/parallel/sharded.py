"""Trial-sharded CAVIaR: the full solver under ``shard_map``.

Every CAVI update reduces over trials, so K shards over the mesh's
``trial`` axis and each reduction becomes a ``psum`` over ICI:

  * blocked weight update — the [N, N] Gram ``lam @ lam.T`` and the
    [N] data projections psum once per iteration; the N x N Cholesky
    solve is replicated (O(N^3) but N ~ 1e3: cheaper than moving it),
  * per-neuron lam sweep — each coordinate update is local elementwise
    work on the device's trial shard plus one [P+1] psum for the
    PAVA/spike-count gate,
  * noise + spontaneous updates — scalar psums,
  * power-curve Laplace update — a single [N, P+1] psum of bucket
    sufficient statistics (see solvers/_laplace.py); the Newton
    recursion itself is replicated and K-free.

Neuron-axis state (mu, beta, phi, phi_cov) is replicated: it is O(N)
and every device needs all of it every sweep step. Spike posteriors
``lam`` [N, K] — the big array — never leave their shard.

K is padded to a multiple of the mesh size; padded trials carry
``trial_valid = 0`` and are excluded from every reduction (they also
get lam_mask = 0, so they can never host spikes or spontaneous events).

The reference has no equivalent — its multi-device story is SLURM job
arrays with zero communication (generate_loho_cv_slurm_scripts.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.nn import sigmoid
from jax.sharding import PartitionSpec as P

from ..ops.charge import prepare_observations
from ..ops.pava import isotonic_fit_at_max
from ..solvers._common import (prepare_stim,
                               warn_data_thin_design_dense)
from ..solvers._laplace import _resolve_laplace_impl, laplace_from_stats_impl
from ..solvers.caviar import (
    CaviarState,
    powercurve_logit_means,
    reconnect_from_spontaneous,
    _resolve_sweep_block_size,
    _validate_update_order,
)
from .mesh import TRIAL_AXIS


def _psum(x):
    return lax.psum(x, TRIAL_AXIS)


# ---------------------------------------------------------------------------
# Sharded update rules
# ---------------------------------------------------------------------------


def _update_weights(y, lam, shape, rate, mu_prior, beta_prior):
    N = lam.shape[0]
    sig = shape / rate
    gram = _psum(lam @ lam.T)
    soft_var = _psum(jnp.sum(lam * (1.0 - lam), axis=-1))
    prior_prec = 1.0 / (beta_prior * beta_prior)
    M = sig * gram + jnp.diag(sig * soft_var + prior_prec)
    rhs = sig * _psum(lam @ y) + mu_prior * prior_prec
    chol = jax.scipy.linalg.cho_factor(M, lower=True)
    # diag(M^-1) from one triangular solve, mean from two matmuls with
    # the same explicit L^-1 (see solvers/caviar.py update_weights):
    # replicated work per device, no second back-substitution chain
    Linv = jax.scipy.linalg.solve_triangular(
        chol[0], jnp.eye(N, dtype=lam.dtype), lower=True
    )
    mean = Linv.T @ (Linv @ rhs)
    return mean, jnp.sum(Linv * Linv, axis=0)


def _update_noise(y, mu, beta, lam, shape_prior, rate_prior, k_global):
    pred = mu @ lam
    # quadratic terms as row-weighted reductions of lam/lam^2 — one
    # fused pass over the local [N, K/D] shard instead of two (see
    # solvers/caviar.py update_noise); still a single [3] psum
    row_lam = jnp.sum(lam, axis=1)
    row_lam2 = jnp.sum(lam * lam, axis=1)
    parts = jnp.stack(
        [
            jnp.sum(jnp.square(y - pred)),
            jnp.sum(mu * mu * row_lam2),
            jnp.sum((mu * mu + beta * beta) * row_lam),
        ]
    )
    a, b, c = _psum(parts)
    return shape_prior + 0.5 * k_global, rate_prior + 0.5 * (a - b + c)


def _sweep_spikes(
    y, stim, mu, beta, lam, sig, m0, m1, lam_mask, powers, power_counts,
    order, msrmp_eff, minimum_spike_count, gate_active, block_size=1,
):
    """Coordinate sweep with psum-reduced gate statistics.

    ``block_size`` = 1 is the reference-order sequential sweep: one
    [P+1] psum per neuron — N latency-bound collectives per iteration.
    ``block_size`` = B shares ONE [B, P+1] psum across a block of B
    neurons (Jacobi within the block, Gauss-Seidel across blocks — the
    single-device blocked formulation, solvers/caviar.py sweep_spikes),
    cutting the collective count per iteration from N to ceil(N/B). On
    real ICI the per-collective latency dominates the sharded sweep, so
    this is the lever that makes multi-chip sweeps scale.
    """
    r = mu @ lam
    guard = power_counts + 1e-4 * (power_counts == 0.0)  # [N, P]
    N = lam.shape[0]

    if block_size == 1:

        def body(i, carry):
            lam, mu_s, r = carry
            n = order[i]
            stim_n = stim[n]
            lam_n = lam[n]
            mu_n = mu_s[n]

            r_excl = r - mu_n * lam_n
            quad = sig * (
                -2.0 * y * mu_n + 2.0 * mu_n * r_excl + (mu_n * mu_n + beta[n] * beta[n])
            )
            est = lam_mask * (stim_n > 0) * sigmoid(m0[n] * stim_n - m1[n] - 0.5 * quad)

            onehot = (stim_n[None, :] == powers[:, None]).astype(est.dtype)  # [P, K_loc]
            local = jnp.concatenate([onehot @ est, jnp.sum(est)[None]])
            red = _psum(local)
            srates = red[:-1] / guard[n]
            ok = (isotonic_fit_at_max(srates) >= msrmp_eff) & (
                red[-1] >= minimum_spike_count
            )
            gate = jnp.where(gate_active, ok.astype(est.dtype), jnp.ones((), est.dtype))

            new_lam_n = est * gate
            new_mu_n = mu_n * gate
            lam = lam.at[n].set(new_lam_n)
            mu_s = mu_s.at[n].set(new_mu_n)
            r = r_excl + new_mu_n * new_lam_n
            return lam, mu_s, r

        lam, _, _ = lax.fori_loop(0, N, body, (lam, mu, r))
        return lam

    # ---- blocked sweep: one [B, P+1] psum per block of B neurons ----
    from ..ops.pava import isotonic_fit_at_max_batched

    B = block_size
    n_blocks = -(-N // B)
    pad = n_blocks * B - N
    # invalid lanes point one past the end; their writes are dropped
    order_pad = jnp.concatenate(
        [order, jnp.full((pad,), N, dtype=order.dtype)]
    ).reshape(n_blocks, B)

    def body(i, carry):
        lam, mu_s, r = carry
        idx = order_pad[i]
        valid_b = (idx < N).astype(lam.dtype)
        n = jnp.minimum(idx, N - 1)

        stim_b = stim[n]                       # [B, K_loc]
        lam_b = lam[n]
        mu_b = mu_s[n] * valid_b
        beta_b = beta[n]

        r_excl = r[None, :] - mu_b[:, None] * lam_b
        quad = sig * (
            -2.0 * y[None, :] * mu_b[:, None]
            + 2.0 * mu_b[:, None] * r_excl
            + (mu_b * mu_b + beta_b * beta_b)[:, None]
        )
        est = lam_mask[None, :] * (stim_b > 0) * sigmoid(
            m0[n][:, None] * stim_b - m1[n][:, None] - 0.5 * quad
        )

        onehot = (stim_b[:, None, :] == powers[None, :, None]).astype(
            est.dtype)                          # [B, P, K_loc]
        local = jnp.concatenate(
            [jnp.sum(onehot * est[:, None, :], axis=-1),
             jnp.sum(est, axis=-1)[:, None]], axis=1)   # [B, P+1]
        red = _psum(local)                      # ONE collective per block
        srates = red[:, :-1] / guard[n]
        ok = (isotonic_fit_at_max_batched(srates) >= msrmp_eff) & (
            red[:, -1] >= minimum_spike_count
        )
        gate = jnp.where(gate_active, ok.astype(est.dtype),
                         jnp.ones((B,), est.dtype))

        new_lam_b = est * gate[:, None]
        new_mu_b = mu_b * gate
        lam = lam.at[idx].set(new_lam_b, mode="drop")
        mu_s = mu_s.at[idx].set(new_mu_b, mode="drop")
        r = r + jnp.sum(
            valid_b[:, None] * (new_mu_b[:, None] * new_lam_b
                                - mu_b[:, None] * lam_b),
            axis=0,
        )
        return lam, mu_s, r

    lam, _, _ = lax.fori_loop(0, n_blocks, body, (lam, mu, r))
    return lam


def _update_spontaneous(
    y, mu, lam, z, it, penalty, lam_mask, scale_factor, tol, orthogonality, max_iters
):
    resid = y - mu @ lam
    explained = jnp.any(lam >= orthogonality, axis=0)
    denom = _psum(jnp.sum(y * y)) + 1e-5
    init_err = _psum(jnp.sum(y))

    def cond(carry):
        i, err, _, _ = carry
        return (i < max_iters) & (err > tol)

    def body(carry):
        i, _, _, pen = carry
        z = jnp.where(resid < pen, 0.0, resid - pen)
        z = jnp.maximum(z, 0.0)
        z = jnp.where(explained, 0.0, z) * lam_mask
        err = _psum(jnp.sum(jnp.square(resid - z))) / denom
        return i + 1, err, z, pen * scale_factor

    _, _, z, _ = lax.while_loop(cond, body, (it, init_err, z, penalty))
    return z


def _powercurve_stats_masked(lam, stim, levels, valid):
    # per-level fused masked reductions — the [N, P+1, K] one-hot this
    # replaces costs ~320 MB of traffic per iteration at the bench
    # shape (see solvers/_laplace.powercurve_stats)
    lam_v = lam * valid[None, :]
    P1 = levels.shape[0]
    S = jnp.stack(
        [jnp.sum(jnp.where(stim == levels[p], lam_v, 0.0), axis=-1)
         for p in range(P1)], axis=1)
    C = jnp.stack(
        [jnp.sum((stim == levels[p]).astype(lam.dtype) * valid[None, :],
                 axis=-1) for p in range(P1)], axis=1)
    return _psum(S), _psum(C)


# ---------------------------------------------------------------------------
# Sharded CAVI-SnS update rules
# ---------------------------------------------------------------------------


def _sns_update_slab_scale(alpha, lam, shape, rate, beta_prior):
    """Closed-form beta update; the lam row-sum psums (cf. solvers.cavi_sns)."""
    lam_sum = _psum(jnp.sum(lam, axis=1))
    return 1.0 / jnp.sqrt(
        alpha * (shape / rate) * lam_sum + 1.0 / (beta_prior * beta_prior)
    )


def _sns_sweep_means(y, mu, beta, alpha, lam, sig, mu_prior, beta_prior, order):
    """Sequential mu sweep; one scalar psum per coordinate step."""
    r = (mu * alpha) @ lam
    ylam = _psum(lam @ (sig * y))  # [N], hoisted

    def body(i, carry):
        mu, r = carry
        n = order[i]
        r_excl = r - mu[n] * alpha[n] * lam[n]
        dot = _psum(jnp.dot(lam[n], r_excl))
        new_mu_n = (beta[n] * beta[n]) * (
            alpha[n] * ylam[n] - alpha[n] * sig * dot
            + mu_prior[n] / (beta_prior[n] * beta_prior[n])
        )
        r = r_excl + new_mu_n * alpha[n] * lam[n]
        return mu.at[n].set(new_mu_n), r

    mu, _ = lax.fori_loop(0, mu.shape[0], body, (mu, r))
    return mu


def _sns_sweep_connection_probs(y, mu, beta, alpha, lam, sig, alpha_prior, order):
    """Sequential alpha sweep; one scalar psum per coordinate step."""
    eps = 1e-10
    r = (mu * alpha) @ lam
    ydot = _psum(lam @ y)
    lam_sum = _psum(jnp.sum(lam, axis=1))
    prior_logit = jnp.log((alpha_prior + eps) / (1.0 - alpha_prior + eps))

    def body(i, carry):
        alpha, r = carry
        n = order[i]
        r_excl = r - mu[n] * alpha[n] * lam[n]
        dot = _psum(jnp.dot(lam[n], r_excl))
        quad = (
            -2.0 * mu[n] * ydot[n]
            + 2.0 * mu[n] * dot
            + (mu[n] * mu[n] + beta[n] * beta[n]) * lam_sum[n]
        )
        new_alpha_n = sigmoid(prior_logit[n] - 0.5 * sig * quad)
        r = r_excl + mu[n] * new_alpha_n * lam[n]
        return alpha.at[n].set(new_alpha_n), r

    alpha, _ = lax.fori_loop(0, alpha.shape[0], body, (alpha, r))
    return alpha


def _sns_sweep_spikes(
    y, stim, mu, beta, alpha, lam, sig, m0, m1, lam_mask, order,
    minimum_spike_count,
):
    """Sequential lam sweep; the spike-count gate psums per step."""
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
        est = lam_mask * (stim_n > 0) * sigmoid(
            m0[n] * stim_n - m1[n] - 0.5 * sig * quad
        )
        total = _psum(jnp.sum(est))
        new_lam_n = est * (total >= minimum_spike_count)
        r = r_excl + mu[n] * alpha[n] * new_lam_n
        return lam.at[n].set(new_lam_n), r

    lam, _ = lax.fori_loop(0, lam.shape[0], body, (lam, r))
    return lam


def _sns_update_noise(y, mu, beta, alpha, lam, shape_prior, rate_prior, k_global):
    w = mu * alpha
    pred = w @ lam
    # row-weighted reductions: one fused pass over the local shard
    # instead of two (see solvers/cavi_sns.py update_noise_sns)
    row_lam = jnp.sum(lam, axis=1)
    row_lam2 = jnp.sum(lam * lam, axis=1)
    parts = jnp.stack([
        jnp.sum(jnp.square(y - pred)),
        jnp.sum(w * w * row_lam2),
        jnp.sum((mu * mu + beta * beta) * alpha * row_lam),
    ])
    a, b, c = _psum(parts)
    return shape_prior + 0.5 * k_global, rate_prior + 0.5 * (a - b + c)


def _sns_iteration(state, data, hyper, static):
    from ..ops.truncnorm import sample_truncated_normal, truncated_normal_mean
    from ..solvers.cavi_sns import SnsState

    y, stim, lam_mask, valid, levels, k_global = data
    (mu_prior, beta_prior, alpha_prior, shape_prior, rate_prior,
     phi_prior, phi_cov_prior) = hyper

    key, k1, k2, k3, k_mc = jax.random.split(state.key, 5)
    N = stim.shape[0]
    sig0 = state.shape / state.rate

    # replicated orders (same key on every device); identity for
    # deterministic parity, mirroring solvers.cavi_sns._iteration
    if static.get("update_order", "random") == "identity":
        _order = lambda _k: jnp.arange(N)  # noqa: E731
    else:
        _order = lambda _k: jax.random.permutation(_k, N)  # noqa: E731

    beta = _sns_update_slab_scale(state.alpha, state.lam, state.shape,
                                  state.rate, beta_prior)
    mu = _sns_sweep_means(
        y, state.mu, beta, state.alpha, state.lam, sig0, mu_prior, beta_prior,
        _order(k1),
    )
    alpha = _sns_sweep_connection_probs(
        y, mu, beta, state.alpha, state.lam, sig0, alpha_prior,
        _order(k2),
    )

    scale = jnp.diagonal(state.phi_cov, axis1=-2, axis2=-1)
    if static["analytic_mc"]:
        m = truncated_normal_mean(state.phi, scale)
    else:
        m = jnp.mean(
            sample_truncated_normal(k_mc, state.phi, scale,
                                    static["num_mc_samples"]),
            axis=0,
        )
    lam = _sns_sweep_spikes(
        y, stim, mu, beta, alpha, state.lam, sig0, m[:, 0], m[:, 1], lam_mask,
        _order(k3), static["minimum_spike_count"],
    )

    shape, rate = _sns_update_noise(y, mu, beta, alpha, lam, shape_prior,
                                    rate_prior, k_global)
    S, C = _powercurve_stats_masked(lam, stim, levels, valid)
    phi, phi_cov = laplace_from_stats_impl(
        S, C, levels, phi_prior, phi_cov_prior,
        impl=static.get("laplace_impl", "xla"))

    return SnsState(mu, beta, alpha, lam, shape, rate, phi, phi_cov, key)


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "iters", "num_mc_samples", "minimum_spike_count",
        "analytic_mc", "save_histories", "laplace_impl", "update_order",
    ),
)
def _run_sns_sharded(
    y, stim, lam0, lam_mask, valid, levels, k_global,
    mu_prior, beta_prior, alpha_prior, shape_prior, rate_prior,
    phi_prior, phi_cov_prior, key, *, mesh, iters, num_mc_samples,
    minimum_spike_count, analytic_mc, save_histories,
    laplace_impl="xla", update_order="random",
):
    from ..solvers.cavi_sns import SnsState

    static = dict(
        num_mc_samples=num_mc_samples,
        minimum_spike_count=minimum_spike_count,
        analytic_mc=analytic_mc,
        laplace_impl=laplace_impl,
        update_order=update_order,
    )

    def body(y, stim, lam0, lam_mask, valid, levels, k_global,
             mu_prior, beta_prior, alpha_prior, shape_prior, rate_prior,
             phi_prior, phi_cov_prior, key):
        data = (y, stim, lam_mask, valid, levels, k_global)
        hyper = (mu_prior, beta_prior, alpha_prior, shape_prior, rate_prior,
                 phi_prior, phi_cov_prior)
        init = SnsState(
            mu=mu_prior, beta=beta_prior, alpha=alpha_prior, lam=lam0,
            shape=shape_prior, rate=rate_prior, phi=phi_prior,
            phi_cov=phi_cov_prior, key=key,
        )

        def step(state, _):
            new = _sns_iteration(state, data, hyper, static)
            hist = (
                (new.mu, new.beta, new.alpha, new.lam, new.shape, new.rate,
                 new.phi, new.phi_cov)
                if save_histories else None
            )
            return new, hist

        return lax.scan(step, init, None, length=iters)

    from ..solvers.cavi_sns import SnsState as _S

    state_spec = _S(
        mu=P(), beta=P(), alpha=P(), lam=P(None, TRIAL_AXIS), shape=P(),
        rate=P(), phi=P(), phi_cov=P(), key=P(),
    )
    hist_spec = (
        (P(), P(), P(), P(None, None, TRIAL_AXIS), P(), P(), P(), P())
        if save_histories else None
    )
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(TRIAL_AXIS),            # y
            P(None, TRIAL_AXIS),      # stim
            P(None, TRIAL_AXIS),      # lam0
            P(TRIAL_AXIS),            # lam_mask
            P(TRIAL_AXIS),            # valid
            P(), P(),                 # levels, k_global
            P(), P(), P(), P(), P(), P(), P(),   # hyper
            P(),                      # key
        ),
        out_specs=(state_spec, hist_spec),
        check_vma=False,
    )
    return sharded(
        y, stim, lam0, lam_mask, valid, levels, k_global,
        mu_prior, beta_prior, alpha_prior, shape_prior, rate_prior,
        phi_prior, phi_cov_prior, key,
    )


def cavi_sns_sharded(
    y_psc,
    stim,
    mu_prior,
    beta_prior,
    alpha_prior,
    shape_prior,
    rate_prior,
    phi_prior,
    phi_cov_prior,
    mesh,
    iters=50,
    num_mc_samples=100,
    seed=1,
    minimum_spike_count=3,
    save_histories=True,
    dtype=jnp.float32,
    analytic_mc=False,
    y_xcorr_thresh=1e-2,
    laplace_impl="auto",
    update_order="random",
    verbose=True,
):
    """Fit CAVI-SnS with the trial axis sharded over ``mesh``.

    ``y_xcorr_thresh`` is accepted (so a local fit config can add
    ``mesh``) but unused, exactly as in solvers.cavi_sns — the
    reference disables the activity mask for this solver.

    Same return contract as solvers.cavi_sns: ``(mu, beta, alpha, lam,
    shape, rate, phi, phi_cov, *eight history arrays)``. As in the
    single-device solver (and the reference, cavi_sns.py:24-25) no trial
    activity mask is applied — the mask here only excludes the trials
    added to pad K to a mesh multiple.
    """
    from ..ops.charge import integrated_charge

    n_dev = mesh.devices.size
    y_psc = np.asarray(y_psc)
    stim_np = np.asarray(stim)
    K = y_psc.shape[0]
    pad = (-K) % n_dev
    if pad:
        y_psc = np.concatenate([y_psc, np.zeros((pad, y_psc.shape[1]))], axis=0)
        stim_np = np.concatenate(
            [stim_np, np.zeros((stim_np.shape[0], pad))], axis=1
        )
    valid = np.concatenate([np.ones(K), np.zeros(pad)]).astype(np.float32)

    y_psc = jnp.asarray(y_psc, dtype=dtype)
    stim_j, stim_np, powers_np, powers_dev = prepare_stim(stim_np, dtype)
    warn_data_thin_design_dense(stim_np, k_true=K,
                                what="cavi_sns_sharded()")
    y = integrated_charge(y_psc)
    lam_mask = jnp.asarray(valid, dtype)
    lam0 = jnp.where(stim_j > 0, jnp.asarray(0.95, dtype), 0.0) * lam_mask

    # device levels from the uploaded-stim table (f64 contract, _common)
    levels = np.concatenate([[0.0], powers_dev])

    if verbose:
        print(f"Running CAVI-SnS sharded over {n_dev} devices (K={K}, pad={pad}).")

    final, hists = _run_sns_sharded(
        y,
        stim_j,
        lam0,
        lam_mask,
        jnp.asarray(valid, dtype),
        jnp.asarray(levels, dtype),
        jnp.asarray(float(K), dtype),
        jnp.asarray(mu_prior, dtype),
        jnp.asarray(beta_prior, dtype),
        jnp.asarray(alpha_prior, dtype),
        jnp.asarray(shape_prior, dtype),
        jnp.asarray(rate_prior, dtype),
        jnp.asarray(phi_prior, dtype),
        jnp.asarray(phi_cov_prior, dtype),
        jax.random.PRNGKey(seed),
        mesh=mesh,
        iters=int(iters),
        num_mc_samples=int(num_mc_samples),
        minimum_spike_count=int(minimum_spike_count),
        analytic_mc=bool(analytic_mc),
        save_histories=bool(save_histories),
        laplace_impl=_resolve_laplace_impl(laplace_impl, dtype),
        update_order=_validate_update_order(str(update_order)),
    )

    if save_histories:
        h = list(hists)
        h[3] = h[3][:, :, :K]  # lam history: trim trial padding
        hist_arrs = [np.asarray(x) for x in h]
        # reference contract: shape/rate histories are (iters, K)
        # broadcasts of the scalar posteriors (cavi_sns.py:54-55)
        for i in (4, 5):
            hist_arrs[i] = np.repeat(hist_arrs[i][:, None], K, axis=1)
    else:
        hist_arrs = [None] * 8

    return (
        final.mu, final.beta, final.alpha, final.lam[:, :K], final.shape,
        final.rate, final.phi, final.phi_cov, *hist_arrs,
    )


# ---------------------------------------------------------------------------
# Sharded MBCS update rules
# ---------------------------------------------------------------------------


def _mbcs_slab_scale(lam, shape, rate, beta_prior):
    """beta update with per-trial noise vector; the lam sum psums."""
    return 1.0 / jnp.sqrt(
        _psum(jnp.sum((shape / rate)[None, :] * lam, axis=1))
        + 1.0 / (beta_prior * beta_prior)
    )


def _mbcs_weights_l1_sharded(
    y, mu, lam, shape, rate, penalty, scale_factor, max_penalty_iters,
    max_lasso_iters, positive, flip, k_global, valid, tol=1e-5,
):
    """Penalty-shrinking FISTA lasso under trial sharding.

    The normal-equation statistics AtA = lam lam^T / K and
    Aty = lam y / K psum ONCE (A is fixed across the penalty loop); the
    FISTA recursion then runs replicated on [N]-sized state. The
    residual-norm stopping constraint is a psum'd scalar.
    """
    A_lam = -lam if flip else lam          # rows of A^T
    mu0 = -mu if flip else mu
    AtA = _psum(A_lam @ A_lam.T) / k_global
    Aty = _psum(A_lam @ y) / k_global
    # masked by ``valid``: mesh-padding trials carry prior/degenerate
    # noise values and must not perturb the stopping point vs the
    # single-device solver
    constr = jnp.sqrt(_psum(jnp.sum(valid * rate / shape)))

    # Lipschitz constant by power iteration (replicated)
    def power_step(v, _):
        w = AtA @ v
        return w / (jnp.linalg.norm(w) + 1e-12), None

    v0 = jnp.ones(AtA.shape[0], dtype=AtA.dtype) / jnp.sqrt(AtA.shape[0])
    v, _ = lax.scan(power_step, v0, None, length=30)
    step = 1.0 / jnp.maximum(v @ (AtA @ v), 1e-8)

    def fista(x0, pen):
        def prox_p(u):
            s = jnp.sign(u) * jnp.maximum(jnp.abs(u) - step * pen, 0.0)
            return jnp.maximum(s, 0.0) if positive else s

        def fista_step(carry, _):
            x, x_prev, t = carry
            grad = AtA @ x - Aty
            x_new = prox_p(x - step * grad)
            t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            momentum = x_new + (t - 1.0) / t_new * (x_new - x_prev)
            return (momentum, x_new, t_new), None

        (_, x_last, _), _ = lax.scan(
            fista_step, (x0, x0, jnp.asarray(1.0, AtA.dtype)), None,
            length=max_lasso_iters,
        )
        return x_last

    def cond(carry):
        i, _, _, _, done = carry
        return (i < max_penalty_iters) & (~done)

    def body(carry):
        i, coef, _, pen, _ = carry
        new = fista(coef, pen)
        err = jnp.sqrt(_psum(jnp.sum(jnp.square(y - new @ A_lam))))
        plateau = (
            (i > 0) & jnp.all(jnp.abs(new - coef) < tol) & ~jnp.all(new == 0)
        )
        done = (err <= constr) | plateau
        return i + 1, new, coef, pen * scale_factor, done

    init = (jnp.asarray(0), mu0, mu0, jnp.asarray(penalty, AtA.dtype),
            jnp.asarray(False))
    _, coef, _, _, _ = lax.while_loop(cond, body, init)
    return -coef if flip else coef


def _mbcs_receptive_fields_sharded(lam, stim, pw, valid):
    """Isotonic per-power rates; stats psum, fit + prior lookup local."""
    from ..ops.pava import isotonic_regression_batched

    # per-level masked reductions + compare-select prior lookup: no
    # [N, P+1, K] one-hot and no TPU table gather (see _select_levels)
    lam_v = lam * valid[None, :]
    P1 = pw.shape[0]
    S = jnp.stack(
        [jnp.sum(jnp.where(stim == pw[p], lam_v, 0.0), axis=-1)
         for p in range(P1)], axis=1)
    C = jnp.stack(
        [jnp.sum((stim == pw[p]).astype(lam.dtype) * valid[None, :],
                 axis=-1) for p in range(P1)], axis=1)
    S, C = _psum(S), _psum(C)
    rates = S / jnp.maximum(C, 1.0)
    rates = rates.at[:, 0].set(0.0)
    rf = jnp.clip(isotonic_regression_batched(rates, 1.0), 0.0, 1.0)
    prior = jnp.zeros(stim.shape, lam.dtype)
    for p in range(P1):
        prior = prior + jnp.where(stim == pw[p], rf[:, p][:, None], 0.0)
    return rf, prior


def _mbcs_filtering_sharded(mu, lam, rf, minimum_spike_count,
                            minimum_maximal_spike_prob):
    keep = (rf[:, -1] >= minimum_maximal_spike_prob) & (
        _psum(jnp.sum((lam >= 0.5).astype(mu.dtype), axis=1))
        >= minimum_spike_count
    )
    keep = keep.astype(mu.dtype)
    return mu * keep, lam * keep[:, None]


def _mbcs_noise_mc_sharded(key, y, mu, beta, lam, noise_scale,
                           num_mc_samples):
    """MC noise model; weight draws replicated, spike draws shard-local.

    Per-trial quantities stay on their shard. The spike uniforms fold
    the shard index into the key (a [S, N, K] global draw cannot be
    split counter-exactly), so results are statistically — not
    bit-exactly — equal to the single-device solver.
    """
    eps = 1e-4
    kw, ks = jax.random.split(key)
    ks = jax.random.fold_in(ks, lax.axis_index(TRIAL_AXIS))
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


def _mbcs_outliers_sharded(y, mu, lam, lam_mask, penalty, scale_factor,
                           max_penalty_iters, orthogonal, tol):
    resid = y - mu @ lam
    explained = jnp.any(lam >= 0.5, axis=0)
    denom = _psum(jnp.sum(y * y))

    def cond(carry):
        i, err, _, _ = carry
        return (i < max_penalty_iters) & (err > tol)

    def body(carry):
        i, _, _, pen = carry
        z = jnp.maximum(jnp.where(resid < pen, 0.0, resid - pen), 0.0)
        if orthogonal:
            z = jnp.where(explained, 0.0, z)
        z = z * lam_mask
        err = _psum(jnp.sum(jnp.square(resid - z))) / denom
        return i + 1, err, z, pen * scale_factor

    init = (jnp.asarray(0), jnp.asarray(jnp.inf, y.dtype),
            jnp.zeros_like(resid), jnp.asarray(penalty, y.dtype))
    _, _, z, _ = lax.while_loop(cond, body, init)
    return z


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "iters", "max_penalty_iters", "max_lasso_iters",
        "constrain_weights", "learn_lam", "delay_spont_estimation",
        "minimum_spike_count", "num_mc_samples_noise_model",
        "orthogonal_outliers", "save_histories", "analytic_noise",
    ),
)
def _run_mbcs_sharded(
    y, stim, lam0, lam_mask, valid, pw, k_global, mu0, beta_prior,
    shape0, rate0, key, penalty, scale_factor, outlier_penalty,
    minimum_maximal_spike_prob, spont_rate0, outlier_tol, noise_scale, *,
    mesh, iters, max_penalty_iters, max_lasso_iters, constrain_weights,
    learn_lam, delay_spont_estimation, minimum_spike_count,
    num_mc_samples_noise_model, orthogonal_outliers, save_histories,
    analytic_noise=False,
):
    from ..solvers.mbcs import sweep_spikes_mbcs

    flip = constrain_weights == "negative"
    positive = constrain_weights in ("positive", "negative")
    N = stim.shape[0]
    P1 = pw.shape[0]

    def body(y, stim, lam0, lam_mask, valid, pw, k_global, mu0, beta_prior,
             shape0, rate0, key, penalty, scale_factor, outlier_penalty,
             minimum_maximal_spike_prob, spont_rate0, outlier_tol,
             noise_scale):
        K_loc = y.shape[0]
        init = (
            mu0, beta_prior, lam0, shape0, rate0,
            jnp.zeros(K_loc, dtype=y.dtype), spont_rate0, lam0,
            jnp.zeros((N, P1), dtype=y.dtype), key,
        )

        def step(carry, it):
            (mu, beta, lam, shape, rate, z, spont_rate, spike_prior, _,
             key) = carry
            beta = _mbcs_slab_scale(lam, shape, rate, beta_prior)
            mu = _mbcs_weights_l1_sharded(
                y, mu, lam, shape, rate, penalty, scale_factor,
                max_penalty_iters, max_lasso_iters, positive, flip, k_global,
                valid,
            )
            key, k_order, k_noise = jax.random.split(key, 3)
            order = jax.random.permutation(k_order, N)  # replicated
            if learn_lam:
                # per-coordinate updates are trial-local: reuse the
                # single-device sweep unchanged on the shard
                lam = sweep_spikes_mbcs(
                    y, stim, mu, beta, lam, shape, rate, lam_mask,
                    spike_prior, order,
                )
            rf, spike_prior = _mbcs_receptive_fields_sharded(
                lam, stim, pw, valid)
            mu, lam = _mbcs_filtering_sharded(
                mu, lam, rf, minimum_spike_count,
                minimum_maximal_spike_prob + spont_rate,
            )
            if analytic_noise:
                # exact moments are per-trial (column-wise): shard-local
                # with NO collective, and bit-exact vs single-device —
                # unlike the MC draw, which can only be statistically
                # equal across shardings (see solvers.mbcs)
                from ..solvers.mbcs import update_noise_analytic

                shape, rate = update_noise_analytic(
                    y, mu, beta, lam, noise_scale=noise_scale,
                )
            else:
                shape, rate = _mbcs_noise_mc_sharded(
                    k_noise, y, mu, beta, lam, noise_scale,
                    num_mc_samples_noise_model,
                )
            gate = it > delay_spont_estimation
            z_new = _mbcs_outliers_sharded(
                y, mu, lam, lam_mask, outlier_penalty, scale_factor,
                max_penalty_iters, orthogonal_outliers, outlier_tol,
            )
            z = jnp.where(gate, z_new, z)
            spont_rate = jnp.where(
                gate,
                _psum(jnp.sum((z_new != 0.0).astype(y.dtype))) / k_global,
                spont_rate,
            )
            carry = (mu, beta, lam, shape, rate, z, spont_rate, spike_prior,
                     rf, key)
            hist = (mu, beta, lam, shape, rate, z) if save_histories else None
            return carry, hist

        return lax.scan(step, init, jnp.arange(iters))

    sh = P(TRIAL_AXIS)
    state_spec = (P(), P(), P(None, TRIAL_AXIS), sh, sh, sh, P(),
                  P(None, TRIAL_AXIS), P(), P())
    hist_spec = (
        (P(), P(), P(None, None, TRIAL_AXIS), P(None, TRIAL_AXIS),
         P(None, TRIAL_AXIS), P(None, TRIAL_AXIS))
        if save_histories else None
    )
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            sh,                       # y
            P(None, TRIAL_AXIS),      # stim
            P(None, TRIAL_AXIS),      # lam0
            sh,                       # lam_mask
            sh,                       # valid
            P(), P(),                 # pw, k_global
            P(), P(),                 # mu0, beta_prior
            sh, sh,                   # shape0, rate0 (per-trial)
            P(),                      # key
            P(), P(), P(), P(), P(), P(), P(),  # scalars
        ),
        out_specs=(state_spec, hist_spec),
        check_vma=False,
    )
    return sharded(
        y, stim, lam0, lam_mask, valid, pw, k_global, mu0, beta_prior,
        shape0, rate0, key, penalty, scale_factor, outlier_penalty,
        minimum_maximal_spike_prob, spont_rate0, outlier_tol, noise_scale,
    )


def mbcs_sharded(
    y_psc,
    stim,
    mu_prior,
    beta_prior,
    shape_prior,
    rate_prior,
    mesh,
    iters=50,
    seed=0,
    y_xcorr_thresh=0.05,
    penalty=5e0,
    scale_factor=0.5,
    max_penalty_iters=10,
    max_lasso_iters=100,
    constrain_weights="positive",
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
    init_lam=None,
    verbose=False,
    analytic_noise=False,
    **_compat,
):
    """Fit MBCS with the trial axis sharded over ``mesh``.

    Same return contract as solvers.mbcs: ``(mu, beta, lam, shape, rate,
    z, receptive_fields, *six history arrays)``. The MC noise model's
    per-trial spike draws are shard-local (statistically, not
    bit-exactly, equal to the single-device solver — see
    _mbcs_noise_mc_sharded); everything else matches up to reduction
    reassociation. ``analytic_noise=True`` (solvers.mbcs) closes even
    that gap: the exact noise moments are column-wise, so the sharded
    fit becomes bit-exact vs single-device with the same flag.
    """
    n_dev = mesh.devices.size
    y_psc_np = np.asarray(y_psc)
    stim_np = np.asarray(stim)
    K = y_psc_np.shape[0]
    N = np.asarray(mu_prior).shape[0]

    # host activity mask on the REAL trials (mbcs.py:41-42 analogue)
    energy = np.sum(y_psc_np * y_psc_np, axis=-1)
    lam_mask_np = (energy > y_xcorr_thresh).astype(np.float32)
    lam_mask_np[np.max(y_psc_np, axis=1)
                < lam_mask_fraction * np.max(y_psc_np)] = 0.0

    pad = (-K) % n_dev
    if pad:
        y_psc_np = np.concatenate(
            [y_psc_np, np.zeros((pad, y_psc_np.shape[1]))], axis=0)
        stim_np = np.concatenate([stim_np, np.zeros((N, pad))], axis=1)
        lam_mask_np = np.concatenate([lam_mask_np, np.zeros(pad)])
    valid = np.concatenate([np.ones(K), np.zeros(pad)]).astype(np.float32)

    from ..ops.charge import integrated_charge

    y = integrated_charge(jnp.asarray(y_psc_np, dtype=dtype))
    # compressed stim upload + deduplicated levels, as every other solver
    stim_j, stim_np, powers_mb, powers_mb_dev = prepare_stim(stim_np, dtype)
    warn_data_thin_design_dense(stim_np, k_true=K, what="mbcs_sharded()")
    lam_mask = jnp.asarray(lam_mask_np, dtype=dtype)
    # device table from the uploaded stim (f64 contract, _common)
    pw = np.concatenate([[0.0], powers_mb_dev])

    rng = np.random.default_rng(seed)
    mu0 = jnp.asarray(rng.lognormal(1.0, 1.0, N), dtype=dtype)
    if init_lam is not None:
        il = np.asarray(init_lam)
        if pad:
            il = np.concatenate([il, np.zeros((N, pad))], axis=1)
        lam0 = jnp.asarray(il, dtype=dtype)
    else:
        lam0 = jnp.where(stim_j > 0, jnp.asarray(init_spike_prior, dtype), 0.0)
        lam0 = lam0 * lam_mask

    if verbose:
        print(f"Running MBCS sharded over {n_dev} devices (K={K}, pad={pad}).")

    final, hists = _run_mbcs_sharded(
        y, stim_j, lam0, lam_mask,
        jnp.asarray(valid, dtype),
        jnp.asarray(pw, dtype),
        jnp.asarray(float(K), dtype),
        mu0,
        jnp.asarray(beta_prior, dtype),
        jnp.full((K + pad,), float(shape_prior), dtype=dtype),
        jnp.full((K + pad,), float(rate_prior), dtype=dtype),
        jax.random.PRNGKey(seed),
        jnp.asarray(penalty, dtype),
        jnp.asarray(scale_factor, dtype),
        jnp.asarray(outlier_penalty, dtype),
        jnp.asarray(minimum_maximal_spike_prob, dtype),
        jnp.asarray(spont_rate, dtype),
        jnp.asarray(outlier_tol, dtype),
        jnp.asarray(noise_scale, dtype),
        mesh=mesh,
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
    (mu, beta, lam, shape, rate, z, _spont, _prior, rf, _key) = final
    lam = lam[:, :K]
    shape, rate, z = shape[:K], rate[:K], z[:K]

    if save_histories:
        h = list(hists)
        h[2] = h[2][:, :, :K]
        h[3], h[4], h[5] = h[3][:, :K], h[4][:, :K], h[5][:, :K]
        hist_arrs = [np.asarray(x) for x in h]
    else:
        hist_arrs = [None] * 6

    return (mu, beta, lam, shape, rate, z, rf, *hist_arrs)


# ---------------------------------------------------------------------------
# The sharded solver
# ---------------------------------------------------------------------------


def _elbo_sharded(y, stim, state, hyper, k_global):
    """Trial-sharded evidence lower bound (solvers.diagnostics.elbo_device
    with every trial reduction psum'd; replicated scalar out). Padded
    trials are inert (zero y/lam/stim/z), so only the explicit
    trial-count factor uses k_global."""
    from jax.scipy.special import digamma
    from jax.nn import log_sigmoid

    mu_prior, beta_prior, shape_prior, rate_prior, _pp, _pc = hyper
    mu, var = state.mu, jnp.clip(state.beta, 1e-12, None)
    lam, a, b, phi, z = state.lam, state.shape, state.rate, state.phi, state.z

    e_tau = a / b
    e_log_tau = digamma(a) - jnp.log(b)
    resid = y - z - mu @ lam
    # row-weighted reductions: one fused pass over the local shard
    row_lam = jnp.sum(lam, axis=1)
    row_lam2 = jnp.sum(lam * lam, axis=1)
    parts = jnp.stack([
        jnp.sum(resid * resid),
        jnp.sum(mu * mu * row_lam2),
        jnp.sum((mu * mu + var) * row_lam),
    ])
    drive = phi[:, 0:1] * stim - phi[:, 1:2]
    targeted = stim > 0
    logp = lam * log_sigmoid(drive) + (1.0 - lam) * log_sigmoid(-drive)
    lam_c = jnp.clip(lam, 1e-7, 1.0 - 1e-7)
    ent = jnp.where(targeted,
                    lam_c * jnp.log(lam_c) + (1 - lam_c) * jnp.log(1 - lam_c),
                    0.0)
    spike_parts = jnp.stack([
        jnp.sum(jnp.where(targeted, logp, 0.0)),
        -jnp.sum(ent),
    ])
    red = _psum(jnp.concatenate([parts, spike_parts]))
    e_sq = red[0] - red[1] + red[2]
    e_loglik = (0.5 * k_global * (e_log_tau - jnp.log(2 * jnp.pi))
                - 0.5 * e_tau * e_sq)
    # KL terms are per-neuron / scalar (no trial reduction): reuse the
    # ONE definition in diagnostics — the bound must not be maintained
    # in hand-synchronised copies
    from ..solvers.diagnostics import _gamma_kl, _gauss_kl

    kl_w = jnp.sum(_gauss_kl(mu, var, mu_prior, jnp.square(beta_prior)))
    kl_tau = _gamma_kl(a, b, shape_prior, rate_prior)
    return e_loglik - kl_w - kl_tau + red[3] + red[4]


def _iteration(state, it, data, hyper, static):
    (y, stim, lam_mask, valid, powers, levels, power_counts, k_global,
     spont_seed_cap) = data
    mu_prior, beta_prior, shape_prior, rate_prior, phi_prior, phi_cov_prior = hyper

    mu, beta = _update_weights(y, state.lam, state.shape, state.rate,
                               mu_prior, beta_prior)

    key, k_order, k_mc = jax.random.split(state.key, 3)
    N = stim.shape[0]
    if static.get("update_order", "random") == "identity":
        order = jnp.arange(N)  # deterministic schedule (parity measurement runs)
    else:
        order = jax.random.permutation(k_order, N)  # replicated: same key everywhere
    m0, m1 = powercurve_logit_means(
        k_mc, state.phi, state.phi_cov, static["num_mc_samples"],
        static["analytic_mc"],
    )
    lam = _sweep_spikes(
        y, stim, mu, beta, state.lam, state.shape / state.rate, m0, m1,
        lam_mask, powers, power_counts, order,
        static["msrmp"] + state.spont_rate, static["minimum_spike_count"],
        gate_active=it > static["delay_spont_est"],
        block_size=static.get("sweep_block_size", 1),
    )

    shape, rate = _update_noise(y, mu, beta, lam, shape_prior, rate_prior, k_global)

    S, C = _powercurve_stats_masked(lam, stim, levels, valid)
    # the stats are psum'd (replicated) so the Newton recursion runs
    # identically on every device; on TPU route it through the
    # one-launch kernel (ops/laplace_pallas.py) — the vmapped-XLA form
    # is ~0.8 ms/iteration of latency-bound tiny fusions PER DEVICE,
    # which would dominate the sharded iteration on real ICI
    phi, phi_cov = laplace_from_stats_impl(
        S, C, levels, phi_prior, phi_cov_prior,
        impl=static.get("laplace_impl", "xla"))

    # streaming warm starts cap the soft-threshold seed (see
    # solvers/caviar._iteration: the raw global index would freeze z
    # once cumulative iterations pass max_backtrack_iters)
    spont_it = it if spont_seed_cap is None else jnp.minimum(
        it, spont_seed_cap)
    z = _update_spontaneous(
        y, mu, lam, state.z, spont_it,
        jnp.asarray(static["penalty"], y.dtype), lam_mask,
        static["scale_factor"], static["tol"], static["spont_orthogonality"],
        static["max_backtrack_iters"],
    )
    spont_rate = _psum(jnp.sum((z != 0.0).astype(y.dtype))) / k_global

    return CaviarState(mu, beta, lam, shape, rate, phi, phi_cov, z, spont_rate, key)


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "iters", "num_mc_samples", "minimum_spike_count",
        "delay_spont_est", "msrmp", "scale_factor", "penalty",
        "max_backtrack_iters", "tol", "spont_orthogonality", "analytic_mc",
        "save_histories", "sweep_block_size",
        "track_elbo", "elbo_tol", "update_order", "laplace_impl",
    ),
)
def _run_sharded(
    y, stim, lam0, lam_mask, valid, powers, levels, power_counts, k_global,
    mu_prior, beta_prior, shape_prior, rate_prior, phi_prior, phi_cov_prior,
    key, init_state=None, spont_seed_cap=None, *, mesh, iters,
    num_mc_samples,
    minimum_spike_count, delay_spont_est, msrmp, scale_factor, penalty,
    max_backtrack_iters, tol, spont_orthogonality, analytic_mc,
    save_histories=False, start_iter=0, sweep_block_size=1,
    track_elbo=False, elbo_tol=None, update_order="random",
    laplace_impl="xla",
):
    # ``start_iter`` is traced (solvers/caviar._run_caviar rationale:
    # a static offset recompiled the whole program for every resumable
    # segment / online update — 4.5 s each through the remote
    # compiler). It enters the shard_map body as an explicit replicated
    # argument rather than a closure, so the body stays closure-free.
    start_iter = jnp.asarray(start_iter, jnp.int32)
    if spont_seed_cap is not None:
        spont_seed_cap = jnp.asarray(spont_seed_cap, jnp.int32)
    static = dict(
        num_mc_samples=num_mc_samples,
        minimum_spike_count=minimum_spike_count,
        delay_spont_est=delay_spont_est,
        msrmp=msrmp,
        scale_factor=scale_factor,
        penalty=penalty,
        max_backtrack_iters=max_backtrack_iters,
        tol=tol,
        spont_orthogonality=spont_orthogonality,
        analytic_mc=analytic_mc,
        sweep_block_size=sweep_block_size,
        update_order=update_order,
        laplace_impl=laplace_impl,
    )
    hyper_specs = (P(), P(), P(), P(), P(), P())

    def body(y, stim, lam0, lam_mask, valid, powers, levels, power_counts,
             k_global, mu_prior, beta_prior, shape_prior, rate_prior,
             phi_prior, phi_cov_prior, key, init_state, start_iter,
             spont_seed_cap):
        data = (y, stim, lam_mask, valid, powers, levels, power_counts,
                k_global, spont_seed_cap)
        hyper = (mu_prior, beta_prior, shape_prior, rate_prior, phi_prior,
                 phi_cov_prior)
        K_loc = y.shape[0]
        if init_state is None:
            init = CaviarState(
                mu=mu_prior, beta=beta_prior, lam=lam0, shape=shape_prior,
                rate=rate_prior, phi=phi_prior, phi_cov=phi_cov_prior,
                z=jnp.zeros(K_loc, dtype=y.dtype),
                spont_rate=jnp.zeros((), dtype=y.dtype), key=key,
            )
        else:
            init = init_state

        def _snap(new):
            return (
                (new.mu, new.beta, new.lam, new.shape, new.rate, new.phi,
                 new.phi_cov, new.z)
                if save_histories else None
            )

        if not track_elbo:

            def step(state, it):
                new = _iteration(state, it, data, hyper, static)
                return new, (_snap(new), None)

            final, ys = lax.scan(
                step, init,
                jnp.arange(iters, dtype=start_iter.dtype) + start_iter)
            return final, (ys, None)

        # per-iteration psum'd ELBO as scan ys; with elbo_tol the
        # iteration body AND the bound evaluation (with its psum) are
        # cond-skipped once converged — all devices see the same
        # replicated bound, so they agree on `done`. stop_at is carried
        # exactly as in the single-device scan (caviar._run_caviar).
        neg_inf = jnp.asarray(-jnp.inf, y.dtype)

        def step(carry, it):
            state, prev, done, stop_at = carry

            def live(s):
                new = _iteration(s, it, data, hyper, static)
                return new, _elbo_sharded(y, stim, new, hyper, k_global)

            new, e = lax.cond(done, lambda s: (s, prev), live, state)
            if elbo_tol is not None:
                rel = jnp.abs(e - prev) / jnp.maximum(jnp.abs(prev), 1e-12)
                newly = (~done) & (it > start_iter) & (rel < elbo_tol)
                stop_at = jnp.where(newly, it, stop_at)
                done = done | newly
            return (new, e, done, stop_at), ((_snap(new), e))

        its = jnp.arange(iters, dtype=start_iter.dtype) + start_iter
        # stop_at shares the xs dtype
        carry0 = (init, neg_inf, jnp.asarray(False),
                  (start_iter + iters).astype(its.dtype))
        (final, _, _, stop_at), (hists, elbos) = lax.scan(
            step, carry0, its)
        return final, ((hists, elbos), stop_at)

    state_spec = CaviarState(
        mu=P(), beta=P(), lam=P(None, TRIAL_AXIS), shape=P(), rate=P(),
        phi=P(), phi_cov=P(), z=P(TRIAL_AXIS), spont_rate=P(), key=P(),
    )
    # history arrays gain a leading iters axis; lam/z stay trial-sharded
    # so per-iteration snapshots never gather the big arrays onto one
    # device (reference analogue: per-iter CPU device_put, caviar.py:54-70)
    hist_spec = (
        (P(), P(), P(None, None, TRIAL_AXIS), P(), P(), P(), P(),
         P(None, TRIAL_AXIS))
        if save_histories else None
    )
    # second output = ((histories, per-iter ELBO), stop_at); the bound
    # and the stopping iteration are psum'd/replicated scalars
    hist_spec = ((hist_spec, P() if track_elbo else None),
                 P() if track_elbo else None)
    init_spec = None if init_state is None else state_spec
    cap_spec = None if spont_seed_cap is None else P()
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(TRIAL_AXIS),            # y
            P(None, TRIAL_AXIS),      # stim
            P(None, TRIAL_AXIS),      # lam0
            P(TRIAL_AXIS),            # lam_mask
            P(TRIAL_AXIS),            # valid
            P(), P(), P(), P(),       # powers, levels, power_counts, k_global
            *hyper_specs,
            P(),                      # key
            init_spec,                # resumed state (or None)
            P(),                      # start_iter (traced offset)
            cap_spec,                 # spont_seed_cap (or None)
        ),
        out_specs=(state_spec, hist_spec),
        check_vma=False,
    )
    return sharded(
        y, stim, lam0, lam_mask, valid, powers, levels, power_counts, k_global,
        mu_prior, beta_prior, shape_prior, rate_prior, phi_prior, phi_cov_prior,
        key, init_state, start_iter, spont_seed_cap,
    )


def _prep_sharded(y_psc, stim, mesh, dtype, y_xcorr_thresh, powers=None,
                  trace_wire=None):
    """Shared host->device preamble for the trial-sharded solvers.

    Pads K to a mesh multiple, builds the validity mask, observations,
    lam init, and power-bucket statistics. Returns host metadata plus
    ``device_args`` — the positional prefix every _run_sharded call takes.
    ``trace_wire`` compresses the trace upload (_common.prepare_traces).
    """
    n_dev = mesh.devices.size
    y_psc = np.asarray(y_psc)
    stim_np = np.asarray(stim)
    K = y_psc.shape[0]
    pad = (-K) % n_dev
    if pad:
        y_psc = np.concatenate([y_psc, np.zeros((pad, y_psc.shape[1]))], axis=0)
        stim_np = np.concatenate(
            [stim_np, np.zeros((stim_np.shape[0], pad))], axis=1
        )
    valid = np.concatenate([np.ones(K), np.zeros(pad)]).astype(np.float32)

    from ..solvers._common import prepare_traces

    y_psc = prepare_traces(y_psc, dtype, trace_wire=trace_wire)
    # powers come back deduplicated and at the stim matrix's own
    # precision (host comparisons below and the reconnect scan need
    # exact matches; see solvers/_common._levels)
    stim_j, stim_np, powers, powers_dev = prepare_stim(
        stim_np, dtype, powers=powers)
    warn_data_thin_design_dense(stim_np, k_true=K,
                                what="caviar_sharded()")
    y, active = prepare_observations(y_psc, y_xcorr_thresh)
    lam_mask = active.astype(dtype) * jnp.asarray(valid, dtype)
    lam0 = jnp.where(stim_j > 0, jnp.asarray(0.95, dtype), 0.0) * lam_mask

    # all device-side tables come from powers_dev — the values actually
    # present in the uploaded stim (f64 contract, _common docstring)
    levels = np.concatenate([[0.0], powers_dev])
    # counts compared in f32, matching the device-side bucketed stim:
    # distinct f64 powers that collapse to one f32 level must count as
    # one level on both sides
    power_counts = (
        stim_np[:, :K, None].astype(np.float32)
        == powers_dev[None, None, :].astype(np.float32)
    ).sum(axis=1).astype(np.float64)

    device_args = (
        y, stim_j, lam0, lam_mask,
        jnp.asarray(valid, dtype),
        jnp.asarray(powers_dev, dtype),
        jnp.asarray(levels, dtype),
        jnp.asarray(power_counts, dtype),
        jnp.asarray(float(K), dtype),
    )
    return dict(K=K, pad=pad, stim_np=stim_np, powers_np=powers,
                device_args=device_args, y=y)


def caviar_sharded(
    y_psc,
    stim,
    mu_prior,
    beta_prior,
    shape_prior,
    rate_prior,
    phi_prior,
    phi_cov_prior,
    mesh,
    iters=50,
    num_mc_samples=100,
    seed=0,
    y_xcorr_thresh=1e-2,
    minimum_spike_count=3,
    delay_spont_est=1,
    msrmp=0.3,
    scale_factor=0.75,
    penalty=5e0,
    max_backtrack_iters=20,
    tol=0.05,
    spont_orthogonality=0.1,
    fn_scan=True,
    save_histories=False,
    dtype=jnp.float32,
    analytic_mc=False,
    powers=None,
    sweep_impl="auto",
    sweep_block_size=1,
    laplace_impl="auto",
    track_elbo=False,
    elbo_tol=None,
    update_order="random",
    trace_wire=None,
    verbose=True,
):
    """Fit CAVIaR with the trial axis sharded over ``mesh``.

    Same posterior/return contract as solvers.caviar: ``(mu, beta, lam,
    shape, rate, phi, phi_cov, z, receptive_fields, *eight history
    arrays)``. Results match the single-device solver up to reduction
    reassociation. With ``save_histories`` the per-iteration lam/z
    snapshots stay trial-sharded on device and are trimmed of padding
    on the way out. ``powers`` skips the stim level scan exactly as in
    solvers.caviar. ``sweep_block_size`` > 1 batches the sweep's gate
    collectives — one [B, P+1] psum per block of B neurons instead of
    one [P+1] psum per neuron, N -> ceil(N/B) latency-bound collectives
    per iteration (see _sweep_spikes); the blocked schedule matches the
    single-device blocked sweep exactly. ``sweep_impl`` is accepted so
    a single-device fit config can add ``mesh`` without edits, but is
    ignored — the sharded sweep is its own psum formulation.
    ``laplace_impl`` IS honoured: the phi refit's Newton recursion runs
    replicated per device on the psum'd bucket stats, and "auto"
    routes it through the one-launch kernel (ops/laplace_pallas.py) on
    TPU f32 — the vmapped-XLA form costs ~0.8 ms of latency-bound tiny
    fusions per device per iteration, which would dominate the sharded
    iteration on real ICI.
    ``track_elbo``/``elbo_tol`` match solvers.caviar: the bound is
    computed with psum'd trial reductions every iteration (appended as
    the 18th return element ``(elbos, converged_at)``), and the early
    stop is consistent across devices because the replicated bound is
    identical everywhere.
    """
    del sweep_impl
    prep = _prep_sharded(y_psc, stim, mesh, dtype, y_xcorr_thresh,
                         powers=powers, trace_wire=trace_wire)
    K = prep["K"]
    stim_np = prep["stim_np"]
    powers = prep["powers_np"]

    if verbose:
        print(f"Running CAVIaR sharded over {mesh.devices.size} devices "
              f"(K={K}, pad={prep['pad']}).")

    final, ((hists, elbos), stop_at) = _run_sharded(
        *prep["device_args"],
        jnp.asarray(mu_prior, dtype),
        jnp.asarray(beta_prior, dtype),
        jnp.asarray(shape_prior, dtype),
        jnp.asarray(rate_prior, dtype),
        jnp.asarray(phi_prior, dtype),
        jnp.asarray(phi_cov_prior, dtype),
        jax.random.PRNGKey(seed),
        mesh=mesh,
        iters=int(iters),
        num_mc_samples=int(num_mc_samples),
        minimum_spike_count=int(minimum_spike_count),
        delay_spont_est=int(delay_spont_est),
        msrmp=float(msrmp),
        scale_factor=float(scale_factor),
        penalty=float(penalty),
        max_backtrack_iters=int(max_backtrack_iters),
        tol=float(tol),
        spont_orthogonality=float(spont_orthogonality),
        analytic_mc=bool(analytic_mc),
        save_histories=bool(save_histories),
        sweep_block_size=_resolve_sweep_block_size(sweep_block_size),
        track_elbo=bool(track_elbo),
        elbo_tol=None if elbo_tol is None else float(elbo_tol),
        update_order=_validate_update_order(str(update_order)),
        laplace_impl=_resolve_laplace_impl(laplace_impl, dtype),
    )

    mu, beta = final.mu, final.beta
    lam = final.lam[:, :K]
    z = final.z[:K]
    phi, phi_cov = final.phi, final.phi_cov

    if fn_scan:
        mu, beta, lam, z, reconnected = reconnect_from_spontaneous(
            None, stim_np[:, :K], lam, mu, beta, z,
            msrmp=msrmp, minimum_spike_count=minimum_spike_count,
            powers=powers, verbose=verbose,
        )
        if reconnected:
            from ..solvers._laplace import laplace_phi_update_jit

            phi, phi_cov = laplace_phi_update_jit(
                jnp.asarray(lam, dtype), jnp.asarray(stim_np[:, :K], dtype),
                jnp.asarray(phi_prior, dtype), jnp.asarray(phi_cov_prior, dtype),
                powers=jnp.asarray(powers, dtype),
            )

    if save_histories:
        # same 8-slot layout as solvers.caviar; trim trial padding.
        # shape/rate histories are broadcast to (iters, K) to match the
        # reference history contract (caviar.py:58-59).
        h_mu, h_beta, h_lam, h_shape, h_rate, h_phi, h_phi_cov, h_z = hists
        hist_arrs = [
            np.asarray(h_mu), np.asarray(h_beta), np.asarray(h_lam[:, :, :K]),
            np.repeat(np.asarray(h_shape)[:, None], K, axis=1),
            np.repeat(np.asarray(h_rate)[:, None], K, axis=1),
            np.asarray(h_phi),
            np.asarray(h_phi_cov), np.asarray(h_z[:, :K]),
        ]
    else:
        hist_arrs = [None] * 8

    out = (mu, beta, lam, final.shape, final.rate, phi, phi_cov, z, None,
           *hist_arrs)
    if track_elbo:
        # stop_at is carried through the scan exactly as in the
        # single-device solver — identical semantics with or without mesh
        out = out + ((np.asarray(elbos), int(np.asarray(stop_at))),)
    return out
