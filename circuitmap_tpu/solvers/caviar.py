"""CAVIaR: coordinate-ascent variational inference with isotonic regularisation.

The flagship solver. Infers, from PSC charges ``y`` [K] and a stimulus
design matrix ``stim`` [N, K]:

  * ``mu`` [N]       synaptic weight posterior means
  * ``beta`` [N]     weight posterior variance diagonal (the reference
                     stores the covariance diagonal, not its sqrt —
                     caviar.py:172 — and we preserve that contract)
  * ``lam`` [N, K]   presynaptic spike posteriors
  * ``shape, rate``  gamma posterior of the observation noise
  * ``phi, phi_cov`` sigmoid power-curve coefficient posteriors
  * ``z`` [K]        spontaneous (unexplained) activity per trial

Behavioural parity target: reference optimise/caviar.py:20-316. The
update *math* matches; the *execution model* is rebuilt for TPU:

  1. The whole ``iters``-step CAVI loop is a single ``lax.scan`` inside
     one ``jit`` — the reference dispatches 5+ separate jitted calls
     per iteration from a Python loop (caviar.py:79-92).
  2. The per-neuron lam sweep keeps a running residual
     ``r = mu @ lam`` updated rank-1 per coordinate, making each
     coordinate update O(K) instead of the reference's O(N·K) masked
     re-reduction (caviar.py:204-205) — an O(N) total-work reduction.
  3. The Monte-Carlo expectation over truncated-normal power-curve
     samples collapses analytically: since logit(sigmoid(x)) = x
     (caviar.py:233-236), the MC average is linear in the samples, so
     it is batch-sampled ONCE per sweep as [S, N, 2] and reduced to two
     [N] means — instead of N sequential in-sweep sampling rounds.
  4. The PAVA connection gate evaluates the isotonic fit only at max
     power via its minimax form (ops/pava.isotonic_fit_at_max) — a few
     fused vector ops instead of sequential pool merging.
  5. trapz + the trial-activity mask are fused device reductions
     (ops/charge) — the reference computes the mask in a host loop over
     all K trials (caviar.py:30).

Everything is dtype-parametric; float32 is the TPU default (the
reference forces global float64, caviar.py:12 — on TPU that would run
on the slow emulated path; weight-recovery parity in f32 is validated
by the test suite).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.nn import sigmoid

from ..ops.charge import prepare_observations
from ..ops.pava import isotonic_fit_at_max, isotonic_fit_at_max_batched
from ..ops.spike_rates import spike_rates_by_power
from ..ops.truncnorm import sample_truncated_normal, truncated_normal_mean
from ..ops.sweep_pallas import sweep_spikes_pallas
from ._common import (prepare_stim_and_init, prepare_traces,
                      warn_data_thin_design, warn_single_chip_envelope)
from ._laplace import (_resolve_laplace_impl, laplace_phi_update,
                       laplace_phi_update_jit)


class CaviarState(NamedTuple):
    """Carry of the CAVI scan. One pytree; lives on device end-to-end."""

    mu: jnp.ndarray
    beta: jnp.ndarray
    lam: jnp.ndarray
    shape: jnp.ndarray
    rate: jnp.ndarray
    phi: jnp.ndarray
    phi_cov: jnp.ndarray
    z: jnp.ndarray
    spont_rate: jnp.ndarray
    key: jax.Array


# ---------------------------------------------------------------------------
# Individual CAVI updates
# ---------------------------------------------------------------------------


def update_weights(y, lam, shape, rate, mu_prior, beta_prior):
    """Blocked Gaussian update of all synaptic weights (caviar.py:166-172).

    Solves the N x N normal equations with a Cholesky factorisation
    (the reference forms an explicit inverse). Returns the posterior
    mean and the covariance *diagonal* (reference contract for beta).
    The Gram matrix ``lam @ lam.T`` is the dominant matmul and maps
    straight onto the MXU; under trial sharding it becomes a psum.
    """
    N = lam.shape[0]
    sig = shape / rate
    gram = lam @ lam.T
    soft_var = jnp.sum(lam * (1.0 - lam), axis=-1)
    prior_prec = 1.0 / (beta_prior * beta_prior)
    M = sig * gram
    M = M + jnp.diag(sig * soft_var + prior_prec)
    rhs = sig * (lam @ y) + mu_prior * prior_prec
    chol = jax.scipy.linalg.cho_factor(M, lower=True)
    # cov diagonal without forming the inverse: M^-1 = L^-T L^-1, so
    # diag(M^-1)_j = sum_i (L^-1)_ij^2 — ONE triangular solve with N
    # rhs instead of cho_solve's two (triangular solves are the
    # dominant per-iteration cost at N=1000; measured ~2x faster).
    Linv = jax.scipy.linalg.solve_triangular(
        chol[0], jnp.eye(N, dtype=lam.dtype), lower=True
    )
    # the mean reuses the SAME explicit L^-1: two [N,N]x[N] matmuls
    # (MXU, one pass) instead of cho_solve's second sequential
    # back-substitution chain — profiled as a per-iteration train of
    # [N,1] panel updates + scoped-memory copies inside the fit scan.
    mean = Linv.T @ (Linv @ rhs)
    return mean, jnp.sum(Linv * Linv, axis=0)


def update_noise(y, mu, beta, lam, shape_prior, rate_prior, k_true=None):
    """Gamma noise posterior (caviar.py:238-244).

    ``k_true``: the real trial count when the arrays carry inert
    128-alignment padding (zero traces/spikes contribute nothing to the
    sums, but the shape term counts trials).
    """
    K = y.shape[0] if k_true is None else k_true
    pred = mu @ lam
    # the two quadratic terms are row-weighted reductions of lam and
    # lam^2: computing per-row sums first makes them ONE fused pass over
    # the [N, K] array instead of two (lam is the 80 MB HBM-resident
    # array at bench scale — each avoided traversal is ~0.1 ms/iter)
    row_lam = jnp.sum(lam, axis=1)
    row_lam2 = jnp.sum(lam * lam, axis=1)
    rate = rate_prior + 0.5 * (
        jnp.sum(jnp.square(y - pred))
        - jnp.sum(mu * mu * row_lam2)
        + jnp.sum((mu * mu + beta * beta) * row_lam)
    )
    return shape_prior + 0.5 * K, rate


def powercurve_logit_means(key, phi, phi_cov, num_mc_samples, analytic):
    """E^[phi] under the zero-truncated power-curve posterior, per neuron.

    Because logit(sigmoid(phi_0 I - phi_1)) = phi_0 I - phi_1, the
    reference's per-neuron MC loop (caviar.py:209-215) reduces to the
    mean of its truncated-normal samples — batch-sampled here once per
    sweep. The sample batch is laid out [2, S, N] so the lane dimension
    is N (a trailing dim of 2 wastes 98% of each TPU tile). Note the
    reference uses the covariance *diagonal* as the sampling scale
    (caviar.py:211) — preserved.

    ``analytic=True`` replaces the estimator with the exact truncated
    mean. Deterministic and cheaper, but NOT the default: the MC
    estimator's sampling dither measurably helps borderline cells clear
    the connection gate (verified against the reference: MC mode agrees
    at R^2=0.999, analytic mode can flip threshold cells).
    """
    scale = jnp.diagonal(phi_cov, axis1=-2, axis2=-1)  # [N, 2]
    if analytic:
        m = truncated_normal_mean(phi, scale)
        return m[:, 0], m[:, 1]
    samps = sample_truncated_normal(key, phi.T, scale.T, num_mc_samples)
    m = jnp.mean(samps, axis=0)  # [2, N]
    return m[0], m[1]


def sweep_spikes(
    y,
    stim,
    mu,
    beta,
    lam,
    sig,
    m0,
    m1,
    lam_mask,
    powers,
    order,
    msrmp_eff,
    minimum_spike_count,
    gate_active,
    block_size=1,
):
    """Coordinate-ascent sweep over all N spike-posterior rows.

    Per-neuron math matches reference update_lam (caviar.py:190-231):
    the quadratic coupling term uses the running residual
    ``r = mu @ lam`` (rank-1 updated) instead of re-reducing over all
    other neurons. Within-sweep weight zeroing for gated-off neurons is
    visible to later coordinates but — like the reference (caviar.py:231
    returns only lam) — the swept weights are NOT returned; the next
    blocked weight update re-derives them.

    ``block_size`` > 1 updates that many coordinates per step from the
    shared block-start residual (Jacobi within a block, Gauss–Seidel
    across blocks). Neurons only couple through shared trials, and a
    random block rarely contains co-stimulated pairs, so the fit is
    essentially unchanged while the sweep gains a ~block_size reduction
    in sequential-step latency — the dominant cost of a TPU sweep.
    block_size=1 is exactly the reference's update order.
    """

    r = mu @ lam

    if block_size == 1:

        def body(i, carry):
            lam, mu_s, r = carry
            n = order[i]
            stim_n = stim[n]
            lam_n = lam[n]
            mu_n = mu_s[n]

            r_excl = r - mu_n * lam_n
            quad = sig * (
                -2.0 * y * mu_n + 2.0 * mu_n * r_excl
                + (mu_n * mu_n + beta[n] * beta[n])
            )
            logit_drive = m0[n] * stim_n - m1[n]
            est = lam_mask * (stim_n > 0) * sigmoid(logit_drive - 0.5 * quad)

            srates = spike_rates_by_power(stim_n, est, powers)
            ok = (isotonic_fit_at_max(srates) >= msrmp_eff) & (
                jnp.sum(est) >= minimum_spike_count
            )
            gate = jnp.where(gate_active, ok.astype(est.dtype),
                             jnp.ones((), est.dtype))

            new_lam_n = est * gate
            new_mu_n = mu_n * gate
            lam = lam.at[n].set(new_lam_n)
            mu_s = mu_s.at[n].set(new_mu_n)
            r = r_excl + new_mu_n * new_lam_n
            return lam, mu_s, r

        N = lam.shape[0]
        lam, _, _ = lax.fori_loop(0, N, body, (lam, mu, r))
        return lam

    # ---- blocked sweep ----
    N = lam.shape[0]
    B = block_size
    n_blocks = -(-N // B)
    pad = n_blocks * B - N
    # invalid lanes point one past the end; their writes are dropped
    order_pad = jnp.concatenate(
        [order, jnp.full((pad,), N, dtype=order.dtype)]
    ).reshape(n_blocks, B)

    gate_srates = jax.vmap(spike_rates_by_power, in_axes=(0, 0, None))

    def body(i, carry):
        lam, mu_s, r = carry
        idx = order_pad[i]
        valid = (idx < N).astype(lam.dtype)
        n = jnp.minimum(idx, N - 1)

        stim_b = stim[n]            # [B, K]
        lam_b = lam[n]
        mu_b = mu_s[n] * valid
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

        srates = gate_srates(stim_b, est, powers)          # [B, P]
        ok = (isotonic_fit_at_max_batched(srates) >= msrmp_eff) & (
            jnp.sum(est, axis=1) >= minimum_spike_count
        )
        gate = jnp.where(gate_active, ok.astype(est.dtype),
                         jnp.ones((B,), est.dtype))

        new_lam_b = est * gate[:, None]
        new_mu_b = mu_b * gate
        write = jnp.minimum(idx, N)  # == idx; out-of-range rows dropped
        lam = lam.at[write].set(new_lam_b, mode="drop")
        mu_s = mu_s.at[write].set(new_mu_b, mode="drop")
        r = r + jnp.sum(
            valid[:, None] * (new_mu_b[:, None] * new_lam_b - mu_b[:, None] * lam_b),
            axis=0,
        )
        return lam, mu_s, r

    lam, _, _ = lax.fori_loop(0, n_blocks, body, (lam, mu, r))
    return lam


def update_spontaneous(
    y, mu, lam, z, it, penalty, lam_mask, scale_factor, tol, orthogonality, max_iters
):
    """Soft-threshold estimate of per-trial spontaneous activity.

    Reference ``estimate_spont_act_soft_thresh`` (caviar.py:146-163):
    shrinking-penalty soft threshold of the residual, zeroed on trials
    already explained by stimulation (any lam >= orthogonality). The
    reference seeds the loop counter with the CAVI iteration index and
    the error with sum(y) — quirky but preserved, since it bounds the
    per-iteration penalty-shrink count.
    """
    resid = y - mu @ lam
    explained = jnp.any(lam >= orthogonality, axis=0)
    denom = jnp.sum(y * y) + 1e-5

    def cond(carry):
        i, err, _, _ = carry
        return (i < max_iters) & (err > tol)

    def body(carry):
        i, _, _, pen = carry
        z = jnp.where(resid < pen, 0.0, resid - pen)
        z = jnp.maximum(z, 0.0)
        z = jnp.where(explained, 0.0, z) * lam_mask
        err = jnp.sum(jnp.square(resid - z)) / denom
        return i + 1, err, z, pen * scale_factor

    init_err = jnp.sum(y)
    _, _, z, _ = lax.while_loop(cond, body, (it, init_err, z, penalty))
    return z


# ---------------------------------------------------------------------------
# One full CAVI iteration + the fused scan
# ---------------------------------------------------------------------------


def _iteration(state: CaviarState, it, data, hyper, static):
    y, stim, lam_mask, powers, _power_counts, spont_seed_cap = data
    spont_it = it if spont_seed_cap is None else jnp.minimum(it, spont_seed_cap)
    mu_prior, beta_prior, shape_prior, rate_prior, phi_prior, phi_cov_prior = hyper

    mu, beta = update_weights(y, state.lam, state.shape, state.rate, mu_prior, beta_prior)

    key, k_order, k_mc = jax.random.split(state.key, 3)
    N = stim.shape[0]
    # "identity" fixes the coordinate schedule — paired with
    # analytic_mc=True this makes the whole fit deterministic, which is
    # how cross-implementation parity is measured with the sampling and
    # ordering dither removed (scripts_tpu/parity_variance_reduced.py)
    if static.get("update_order", "random") == "identity":
        order = jnp.arange(N)
    else:
        order = jax.random.permutation(k_order, N)
    m0, m1 = powercurve_logit_means(
        k_mc, state.phi, state.phi_cov, static["num_mc_samples"], static["analytic_mc"]
    )
    sig = state.shape / state.rate
    impl = static["sweep_impl"]
    if impl.startswith("pallas_blocked"):
        from ..ops import sweep_pallas as sp

        # blocked manual-DMA kernel over the native 2-D layout: visits
        # blocks of sweep_block_size consecutive rows in permuted block
        # order (no [N,1,K] relayout, N/B sequential steps). The order
        # here is over BLOCKS, including any inert padding block.
        B = static["sweep_block_size"]
        nb_pad = -(-N // B)
        if static.get("update_order", "random") == "identity":
            border = jnp.arange(nb_pad)
        else:
            border = jax.random.permutation(k_order, nb_pad)
        # vmappable wrapper: under jax.vmap (caviar_many) this lowers
        # onto the batched blocked kernel (grid over experiments)
        fn = sp.get_blocked_sweep_v(impl.endswith("interpret"), B)
        lam = fn(
            y, stim, mu, beta, state.lam, sig, m0, m1, lam_mask, powers,
            data[4], border, static["msrmp"] + state.spont_rate,
            static["minimum_spike_count"],
            (it > static["delay_spont_est"]).astype(y.dtype),
        )
    elif impl.startswith("pallas"):
        from ..ops import sweep_pallas as sp

        # custom-vmap wrappers: under jax.vmap (solvers/batched.caviar_many)
        # these lower onto the (B, N)-grid batched kernel
        fn = {
            "pallas": sp.sweep_spikes_pallas_dma_v,       # manual-DMA kernel
            "pallas_grid": sp.sweep_spikes_pallas_v,      # N-step grid kernel
            "pallas_interpret": sp.sweep_spikes_pallas_interpret_v,
            "pallas_dma_interpret": sp.sweep_spikes_pallas_dma_interpret_v,
        }[impl]
        lam = fn(
            y, stim, mu, beta, state.lam, sig, m0, m1, lam_mask, powers,
            data[4], order, static["msrmp"] + state.spont_rate,
            static["minimum_spike_count"],
            (it > static["delay_spont_est"]).astype(y.dtype),
        )
    else:
        lam = sweep_spikes(
            y,
            stim,
            mu,
            beta,
            state.lam,
            sig,
            m0,
            m1,
            lam_mask,
            powers,
            order,
            static["msrmp"] + state.spont_rate,
            static["minimum_spike_count"],
            gate_active=it > static["delay_spont_est"],
            block_size=static["sweep_block_size"],
        )

    shape, rate = update_noise(y, mu, beta, lam, shape_prior, rate_prior,
                               k_true=static.get("k_true"))
    # counts= hands the loop-invariant bucket counts (data[4], computed
    # once before the scan) to the phi update, skipping P+1 [N, K]
    # mask-sums per iteration; laplace_impl routes the Newton recursion
    # onto the one-launch TPU kernel (ops/laplace_pallas.py)
    phi, phi_cov = laplace_phi_update(lam, stim, phi_prior, phi_cov_prior,
                                      powers=powers,
                                      total_trials=static.get("k_true"),
                                      counts=data[4],
                                      impl=static.get("laplace_impl", "xla"))

    z = update_spontaneous(
        y,
        mu,
        lam,
        state.z,
        spont_it,
        jnp.asarray(static["penalty"], y.dtype),
        lam_mask,
        static["scale_factor"],
        static["tol"],
        static["spont_orthogonality"],
        static["max_backtrack_iters"],
    )
    k_true = static.get("k_true")
    if k_true is None:  # not `or`: k_true may be a traced scalar
        k_true = y.shape[0]
    spont_rate = jnp.sum((z != 0.0).astype(y.dtype)) / k_true

    return CaviarState(mu, beta, lam, shape, rate, phi, phi_cov, z, spont_rate, key)


@partial(
    jax.jit,
    # start_iter is deliberately NOT static: segment offsets vary every
    # resumable segment and every OnlineCaviar.update, and a static
    # start_iter recompiled the whole fused scan each time (measured
    # 4.5 s per online update through the remote compiler — the fit
    # itself is tens of ms). As a plain-int argument jit traces it
    # value-independently, so all offsets share one program.
    static_argnames=(
        "iters",
        "num_mc_samples",
        "minimum_spike_count",
        "delay_spont_est",
        "msrmp",
        "scale_factor",
        "penalty",
        "max_backtrack_iters",
        "tol",
        "spont_orthogonality",
        "analytic_mc",
        "save_histories",
        "sweep_block_size",
        "sweep_impl",
        "laplace_impl",
        "update_order",
        "track_elbo",
        "elbo_tol",
    ),
)
def _run_caviar(
    y,
    stim,
    lam0,
    lam_mask,
    powers,
    mu_prior,
    beta_prior,
    shape_prior,
    rate_prior,
    phi_prior,
    phi_cov_prior,
    key,
    init_state=None,
    k_true=None,
    spont_seed_cap=None,
    *,
    iters,
    start_iter=0,
    num_mc_samples,
    minimum_spike_count,
    delay_spont_est,
    msrmp,
    scale_factor,
    penalty,
    max_backtrack_iters,
    tol,
    spont_orthogonality,
    analytic_mc,
    save_histories,
    sweep_block_size=1,
    sweep_impl="xla",
    laplace_impl="xla",
    update_order="random",
    track_elbo=False,
    elbo_tol=None,
):
    # Pad the trial axis to a multiple of 128 ONCE, outside the scan.
    # The Pallas DMA sweep needs lane-aligned rows; padding inside the
    # per-iteration wrapper cost two [N, K] copies every iteration
    # (profiled at >half the device time of the whole fit). Padded
    # trials are inert: traces, masks and spikes are zero there, so
    # every sum over K is unchanged; the three places that count trials
    # rather than sum them (noise shape term, spontaneous rate,
    # bucket-0 power counts) use k_true instead.
    #
    # ``k_true`` (argument): the REAL trial count when the caller's
    # arrays already carry inert padded columns beyond it (the online
    # solver's capacity buffers, solvers/online.py). A traced scalar —
    # NOT static — so a stream growing inside one capacity bucket never
    # recompiles. None (default) = every input trial is real.
    k_orig = y.shape[0]
    if k_true is None:
        k_true = k_orig  # static int: existing single-shot behaviour
    padk = (-(-k_orig // 128) * 128) - k_orig
    if padk:
        y = jnp.pad(y, (0, padk))
        lam_mask = jnp.pad(lam_mask, (0, padk))
        lam0 = jnp.pad(lam0, ((0, 0), (0, padk)))
        stim = jnp.pad(stim, ((0, 0), (0, padk)))
        if init_state is not None:
            init_state = init_state._replace(
                lam=jnp.pad(init_state.lam, ((0, 0), (0, padk))),
                z=jnp.pad(init_state.z, (0, padk)),
            )

    # per-neuron trial counts per power: static across iterations, used
    # by the pallas sweep's gate (computed once, fused by XLA)
    power_counts = jnp.sum(
        stim[:, None, :] == powers[None, :, None], axis=-1
    ).astype(y.dtype)
    # ``spont_seed_cap``: optional ceiling on the iteration index that
    # seeds the spontaneous soft-threshold counter (update_spontaneous
    # seeds with the iteration index — reference quirk, so iterations
    # past max_backtrack_iters run ZERO soft-threshold steps). Batch and
    # resumable fits leave it None — the GLOBAL index, matching the
    # reference exactly and keeping segmented fits bit-exact vs one
    # scan. Streaming warm starts cap it at max_backtrack_iters-1 so a
    # mature stream keeps the schedule's LATE regime (one coarse step at
    # the unshrunk penalty per iteration) instead of freezing z for all
    # trials ingested after the cumulative counter passes the bound.
    data = (y, stim, lam_mask, powers, power_counts, spont_seed_cap)
    hyper = (mu_prior, beta_prior, shape_prior, rate_prior, phi_prior, phi_cov_prior)
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
        sweep_impl=sweep_impl,
        laplace_impl=laplace_impl,
        update_order=update_order,
        k_true=k_true,
    )

    K = y.shape[0]
    if init_state is None:
        init = CaviarState(
            mu=mu_prior,
            beta=beta_prior,
            lam=lam0,
            shape=shape_prior,
            rate=rate_prior,
            phi=phi_prior,
            phi_cov=phi_cov_prior,
            z=jnp.zeros(K, dtype=y.dtype),
            spont_rate=jnp.zeros((), dtype=y.dtype),
            key=key,
        )
    else:
        init = init_state

    def _snap(new):
        if save_histories:
            return (new.mu, new.beta, new.lam, new.shape, new.rate, new.phi,
                    new.phi_cov, new.z)
        return None

    if not track_elbo:

        def step(state, it):
            new = _iteration(state, it, data, hyper, static)
            return new, _snap(new)

        # arange(iters) + offset, not arange(start, stop): start_iter is
        # traced and only the LENGTH may be shape-determining
        final, hists = lax.scan(
            step, init, jnp.arange(iters) + start_iter)
        elbo_out = None
    else:
        # per-iteration ELBO as scan ys; with elbo_tol the iteration body
        # is skipped (lax.cond — only one branch executes) once the
        # relative bound change drops below tol, freezing the state: an
        # early stop that keeps the scan shape static.
        from .diagnostics import elbo_device

        neg_inf = jnp.asarray(-jnp.inf, y.dtype)

        def step(carry, it):
            state, prev, done, stop_at = carry

            def live(s):
                new = _iteration(s, it, data, hyper, static)
                return new, elbo_device(y, stim, new, hyper, k_true)

            # the ELBO evaluation lives INSIDE the cond: once converged,
            # frozen steps skip both the iteration AND the O(N*K) bound
            # computation (a jnp.where would evaluate both operands)
            new, e = lax.cond(done, lambda s: (s, prev), live, state)
            if elbo_tol is not None:
                rel = jnp.abs(e - prev) / jnp.maximum(jnp.abs(prev), 1e-12)
                newly = (~done) & (it > start_iter) & (rel < elbo_tol)
                stop_at = jnp.where(newly, it, stop_at)
                done = done | newly
            return (new, e, done, stop_at), (_snap(new), e)

        its = jnp.arange(iters) + start_iter
        # stop_at must share the xs dtype: under jax_enable_x64 arange
        # yields int64 and an int32-pinned carry breaks the scan typing
        carry0 = (init, neg_inf, jnp.asarray(False),
                  jnp.asarray(start_iter + iters).astype(its.dtype))
        (final, _, _, stop_at), (hists, elbos) = lax.scan(
            step, carry0, its)
        elbo_out = (elbos, stop_at)

    if padk:  # strip the alignment padding from everything trial-shaped
        # (back to the caller's k_orig columns — a traced k_true cannot
        # slice, and capacity-buffer callers expect their full width)
        final = final._replace(lam=final.lam[:, :k_orig], z=final.z[:k_orig])
        if save_histories:
            hists = list(hists)
            hists[2] = hists[2][:, :, :k_orig]  # lam snapshots
            hists[7] = hists[7][:, :k_orig]     # z snapshots
            hists = tuple(hists)
    return final, hists, elbo_out


# ---------------------------------------------------------------------------
# Host-side post-processing: false-negative reconnection scan
# ---------------------------------------------------------------------------


def _pull_host_batch(*arrs):
    """Fetch several device arrays (flattened) in ONE host pull.

    Each separate device->host transfer pays the tunnel round trip
    (~0.2-0.4 s); concatenating on device first makes it a single one.
    Host inputs pass through unchanged when nothing lives on device.
    Values pack in their common result dtype — an f64 fit must not be
    silently truncated to f32 on the way out.
    """
    if not any(isinstance(a, jax.Array) for a in arrs):
        return [np.asarray(a) for a in arrs]
    pack_dtype = jnp.result_type(*arrs)
    flats = [jnp.ravel(jnp.asarray(a, pack_dtype)) for a in arrs]
    sizes = [int(f.shape[0]) for f in flats]
    packed = np.asarray(jnp.concatenate(flats))
    out, o = [], 0
    for s in sizes:
        out.append(packed[o:o + s])
        o += s
    return out


def reconnect_from_spontaneous(
    y, stim, lam, mu, beta, z, msrmp=0.3, minimum_spike_count=3,
    powers=None, power_counts=None, verbose=False,
):
    """Greedy false-negative scan (reference ``reconnect_spont_cells``,
    caviar.py:102-144).

    Cells currently inferred disconnected whose stim trials coincide
    with spontaneous events are re-examined: if the isotonic fit of
    event rates at max power clears msrmp and the event count clears the
    spike minimum, the cell is reconnected, absorbing those events.

    Runs once post-fit. The decision loop is host numpy over small
    arrays (z, mu, beta, per-power counts) — O(N) data-dependent
    decisions on [P]-sized vectors, where each device dispatch on a
    tunneled TPU would cost more than the whole scan. The big [N, K]
    spike-posterior matrix never leaves the device: reconnections are
    collected as (row, trial) updates and applied as one scatter at the
    end. The isotonic fit at max power is max-over-suffix-means (the
    minimax form used in ops/pava.isotonic_fit_at_max), computed inline.
    """
    del y  # accepted for reference-signature parity; decisions use z only
    mu, beta, z = (a.copy() for a in _pull_host_batch(mu, beta, z))
    stim = np.asarray(stim)
    lam_updates = []  # (neuron, trial_locs) reconnections to scatter later
    if powers is None:
        powers = np.unique(stim)[1:]
    else:
        powers = np.sort(np.asarray(powers, dtype=stim.dtype))

    candidate_mask = mu == 0.0
    z_nz = z != 0.0
    P = powers.size

    # Vectorised greedy scan. Spontaneous events are only ever REMOVED,
    # so a candidate whose gate fails can never pass later — the loop
    # therefore only iterates once per actual reconnection (usually
    # 0-3), with all candidates' gates evaluated in [N, P] batch ops,
    # instead of once per candidate. Same decisions as the sequential
    # reference scan (caviar.py:102-144): each reconnection is the
    # highest-event-count passer at the current z state.
    if power_counts is None:  # [N, P]; the sparse prep hands it in free
        power_counts = np.stack([(stim == p).sum(1) for p in powers], 1)
    else:
        power_counts = np.asarray(power_counts, dtype=float)
    # spontaneous events are sparse: restrict every hit computation to
    # the event columns ([N, n_events] slices instead of full [N, K])
    z_idx = np.flatnonzero(z_nz)
    stim_z = stim[:, z_idx]
    hits_all = np.stack([(stim_z == p).sum(1) for p in powers], 1).astype(float)
    suffix_div = np.arange(1, P + 1, dtype=float)

    while z_nz.sum() > minimum_spike_count:
        with np.errstate(invalid="ignore"):
            rates = np.where(power_counts > 0, hits_all / power_counts, 0.0)
        # isotonic fit at max power == max over suffix means
        iso_at_max = (np.cumsum(rates[:, ::-1], axis=1) / suffix_div).max(1)
        n_events = hits_all.sum(1)
        ok = candidate_mask & (iso_at_max >= msrmp) & (
            n_events >= minimum_spike_count
        )
        if not ok.any():
            break
        n = int(np.argmax(np.where(ok, n_events, -1.0)))
        candidate_mask[n] = False

        locs = np.flatnonzero((stim[n] != 0.0) & z_nz)
        vals = z[locs]
        mu[n] = vals.mean()
        # standard error of the mean (scipy.stats.sem semantics, ddof=1)
        beta[n] = (
            vals.std(ddof=1) / np.sqrt(vals.size) if vals.size > 1 else np.nan
        )
        lam_updates.append((n, locs))
        z[locs] = 0.0
        z_nz[locs] = False
        # incremental hit update: all removed events had z_nz == True
        hits_all -= np.stack(
            [(stim[:, locs] == p).sum(1) for p in powers], 1
        )
        if verbose:
            print(f"reconnected cell {n} "
                  f"(iso fit at max power {iso_at_max[n]:.2f})")

    if lam_updates:
        rows = np.concatenate([np.full(l.size, n) for n, l in lam_updates])
        cols = np.concatenate([l for _, l in lam_updates])
        if isinstance(lam, jnp.ndarray):
            lam = lam.at[rows, cols].set(1.0)
        else:
            lam = np.asarray(lam).copy()
            lam[rows, cols] = 1.0

    return mu, beta, lam, z, bool(lam_updates)


def _reconnect_scan_device(stim, lam, mu, beta, z, powers, msrmp,
                           minimum_spike_count):
    """The greedy reconnection scan as one ``lax.while_loop`` on device.

    Same decisions as reconnect_from_spontaneous (greedy
    highest-event-count passer at the current z state; ties break to
    the lowest index in both argmax implementations), but with zero
    host round trips — on a tunneled TPU the host version's batched
    pull costs more than the whole scan. [N, K, P] temporaries are
    avoided: per-power hits update via P unrolled masked reductions.
    """
    dtype = lam.dtype
    P = powers.shape[0]
    counts = jnp.stack(
        [jnp.sum((stim == powers[p]).astype(dtype), axis=1)
         for p in range(P)], axis=1)                               # [N, P]

    def hits_of(vec):  # [K] f32 membership vector -> [N, P] event counts
        return jnp.stack(
            [(stim == powers[p]).astype(dtype) @ vec for p in range(P)],
            axis=1)

    z_nz0 = (z != 0.0).astype(dtype)
    state0 = dict(
        mu=mu, beta=beta, lam=lam, z=z, z_nz=z_nz0,
        candidate=(mu == 0.0),
        hits=hits_of(z_nz0),
        go=jnp.asarray(True),
        n_reconnected=jnp.asarray(0, jnp.int32),
    )
    min_count = jnp.asarray(minimum_spike_count, dtype)
    nan = jnp.asarray(jnp.nan, dtype)

    def cond(s):
        return s["go"] & (jnp.sum(s["z_nz"]) > min_count)

    def body(s):
        rates = jnp.where(counts > 0, s["hits"] / jnp.maximum(counts, 1.0),
                          0.0)
        iso = isotonic_fit_at_max_batched(rates)                   # [N]
        n_events = jnp.sum(s["hits"], axis=1)
        ok = s["candidate"] & (iso >= msrmp) & (n_events >= min_count)
        any_ok = jnp.any(ok)
        n = jnp.argmax(jnp.where(ok, n_events, -1.0))

        stim_n = stim[n]                                           # [K]
        locs = ((stim_n != 0.0) & (s["z_nz"] > 0)).astype(dtype)
        c = jnp.sum(locs)
        c_safe = jnp.maximum(c, 1.0)
        mean = jnp.sum(s["z"] * locs) / c_safe
        # scipy.stats.sem semantics: std(ddof=1) / sqrt(c); nan at c==1
        var = jnp.sum(jnp.square(s["z"] - mean) * locs) / jnp.maximum(
            c - 1.0, 1.0)
        sem = jnp.sqrt(var / c_safe)
        upd = any_ok
        rm = locs * upd                                            # [K]

        new = dict(s)
        new["mu"] = s["mu"].at[n].set(jnp.where(upd, mean, s["mu"][n]))
        new["beta"] = s["beta"].at[n].set(
            jnp.where(upd, jnp.where(c > 1.0, sem, nan), s["beta"][n]))
        new["lam"] = s["lam"].at[n].set(
            jnp.where(rm > 0, jnp.asarray(1.0, dtype), s["lam"][n]))
        new["z"] = jnp.where(rm > 0, 0.0, s["z"])
        new["z_nz"] = s["z_nz"] * (1.0 - rm)
        new["candidate"] = s["candidate"].at[n].set(
            jnp.where(upd, False, s["candidate"][n]))
        new["hits"] = s["hits"] - hits_of(rm)
        new["go"] = any_ok
        new["n_reconnected"] = s["n_reconnected"] + upd.astype(jnp.int32)
        return new

    out = lax.while_loop(cond, body, state0)
    return (out["mu"], out["beta"], out["lam"], out["z"],
            out["n_reconnected"])


@jax.jit
def _reconnect_and_refit_device(stim, lam, mu, beta, z, powers,
                                phi, phi_cov, phi_prior, phi_cov_prior,
                                msrmp, minimum_spike_count,
                                total_trials=None):
    """Fused device program: reconnection scan + conditional power-curve
    refit — replaces the host scan's mid-fit pull + scatter + refit
    dispatches with ONE dispatch that ends in the final state.

    ``total_trials``: the real trial count when the arrays carry inert
    padded columns beyond it (the online solver's capacity buffers).
    The scan itself is padding-proof (padded stim columns match no
    power, padded z is zero), but the refit's bucket-0 count would
    otherwise count every padded column as an unstimulated trial."""
    mu, beta, lam, z, n_rec = _reconnect_scan_device(
        stim, lam, mu, beta, z, powers, msrmp, minimum_spike_count)

    def refit(_):
        return laplace_phi_update(lam, stim, phi_prior, phi_cov_prior,
                                  powers=powers, total_trials=total_trials)

    phi, phi_cov = lax.cond(n_rec > 0, refit, lambda _: (phi, phi_cov),
                            operand=None)
    return mu, beta, lam, z, phi, phi_cov, n_rec


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------


def _validate_update_order(update_order):
    """update_order exists to make parity runs deterministic — a typo
    silently falling back to random order would quietly re-measure the
    order dither the knob exists to remove, so invalid values raise."""
    if update_order not in ("random", "identity"):
        raise ValueError(
            f"update_order must be 'random' or 'identity', got "
            f"{update_order!r}")
    return update_order


def _resolve_sweep_block_size(block_size):
    """'auto' -> 8 on TPU-class backends (the blocked manual-DMA kernel
    wins there: no per-iteration relayout, N/8 sequential steps, and
    truth-R2 measured equal within seed noise at the bench config), 1
    elsewhere (the reference's strictly sequential schedule)."""
    if block_size == "auto":
        platform = jax.devices()[0].platform
        return 8 if platform in ("tpu", "axon") else 1
    return int(block_size)


# VMEM bytes the ROW kernel's ring may claim of the ~16 MB scoped
# budget (headroom left for semaphores/layout padding): 3 ring buffers
# x depth x one [K128] f32 row + 4 more [K128] vectors. Lowering
# verified on hardware up to K128=200064 (round-5 probes); past the
# budget the auto routing falls back to the XLA sweep.
_VMEM_SWEEP_BUDGET = 14e6

# Hardware-probed lowering cliff for the BLOCKED kernel, in
# K128 x block_rows units. Round 4's analytic ring model
# ((2*3*B*4 + 16) bytes/column, depth floored at 2) underestimates the
# real scoped-VMEM allocation by ~1.5x — Mosaic's actual usage at
# N=1000..5000, B=8 (this chip's compiler, round-5 bisect): lowers at
# K128 <= 51200, scoped-vmem OOM (18.5M vs the 16M limit) from
# K128 >= 52224, independent of N and of the kernel's self-limited
# ring depth. Don't trust the analytic model again: compile-probe
# (/tmp-style direct kernel lower+compile in a subprocess) when this
# constant needs revisiting on a new compiler.
_BLOCKED_SWEEP_MAX_KB = 51200 * 8


def _k128(k):
    return -(-int(k) // 128) * 128


def _blocked_sweep_fits(k, block_size):
    return _k128(k) * block_size <= _BLOCKED_SWEEP_MAX_KB


def _row_sweep_fits(k):
    return (4 * 3 * 4 + 16) * _k128(k) <= _VMEM_SWEEP_BUDGET


def _resolve_sweep_impl(sweep_impl, block_size, k=None):
    """'auto' -> the Pallas kernel on TPU-class backends, XLA elsewhere.

    With block_size > 1 on TPU (a multiple of 8), resolves to the
    blocked manual-DMA kernel — block DMAs of the native 2-D layout,
    no per-iteration [N,1,K] relayout, N/B sequential steps. When the
    trial count ``k`` is given and the kernel's VMEM ring would exceed
    the chip's scoped budget (hardware-probed: K128 > 51200 at block 8; _BLOCKED_SWEEP_MAX_KB), auto falls back
    to the XLA sweep with the SAME block schedule — bit-compatible
    semantics at any K.

    An EXPLICIT implementation name is honoured verbatim: a pinned
    ``sweep_impl="pallas"`` always means the row-DMA kernel (the
    strictly sequential schedule), never a silent rewrite to the
    blocked kernel or XLA — pinned implementations exist for
    apples-to-apples measurements and reference-order fits (past the
    VMEM budget they fail loudly in the Mosaic lowering).
    """
    if sweep_impl != "auto":
        return sweep_impl
    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    if block_size != 1:
        return ("pallas_blocked"
                if on_tpu and block_size % 8 == 0
                and (k is None or _blocked_sweep_fits(k, block_size))
                else "xla")
    return ("pallas" if on_tpu and (k is None or _row_sweep_fits(k))
            else "xla")


def _resolve_sweep(sweep_impl, sweep_block_size, k=None):
    """Jointly resolve ``(block_size, impl)`` for a trial count ``k``.

    The auto schedule degrades gracefully with K: blocked-8 manual-DMA
    kernel while its VMEM ring fits (hardware-probed K128 <= 51200), then the row-DMA
    kernel at block 1 (strictly sequential — the reference's exact
    schedule; measured 0.82 s vs the XLA fallback's 12.7 s for a
    50-iteration N=1000/K=100000 fit), then the XLA sweep. An
    EXPLICITLY pinned block size or impl is honoured verbatim — auto
    never rewrites a pinned schedule, only its own.
    """
    block_auto = sweep_block_size == "auto"
    block = _resolve_sweep_block_size(sweep_block_size)
    impl = _resolve_sweep_impl(sweep_impl, block, k=k)
    # the one rule _resolve_sweep_impl cannot express (it may not change
    # the block size): when BOTH knobs are auto and the blocked ring
    # fell past its VMEM budget, degrade to the row kernel if that fits
    if (sweep_impl == "auto" and block_auto and block != 1
            and impl == "xla"
            and _resolve_sweep_impl("auto", 1, k=k) == "pallas"):
        return 1, "pallas"
    return block, impl


def caviar(
    y_psc,
    stim,
    mu_prior,
    beta_prior,
    shape_prior,
    rate_prior,
    phi_prior,
    phi_cov_prior,
    iters=50,
    num_mc_samples=100,
    seed=0,
    y_xcorr_thresh=1e-2,
    minimum_spike_count=3,
    delay_spont_est=1,
    msrmp=0.3,
    scale_factor=0.75,
    penalty=5e0,
    save_histories=False,
    max_backtrack_iters=20,
    tol=0.05,
    spont_orthogonality=0.1,
    fn_scan=True,
    dtype=jnp.float32,
    analytic_mc=False,
    sweep_block_size="auto",
    sweep_impl="auto",
    laplace_impl="auto",
    powers=None,
    update_order="random",
    track_elbo=False,
    elbo_tol=None,
    trace_wire=None,
    verbose=True,
):
    """Fit CAVIaR. Signature and return layout mirror reference caviar.py:20-100.

    Returns ``(mu, beta, lam, shape, rate, phi, phi_cov, z,
    receptive_fields, *eight history arrays)`` — receptive_fields is
    always None (reference caviar.py:51,100) and histories are None
    unless ``save_histories``.

    ``track_elbo=True`` appends an 18th element ``(elbos[iters],
    converged_at)``: the per-iteration evidence lower bound, recorded as
    scan outputs inside the fit (solvers/diagnostics.elbo_device — the
    reference tracks no objective at all). With ``elbo_tol`` set, CAVI
    updates stop once the relative ELBO change drops below it
    (``converged_at`` is the stopping iteration, else start+iters);
    remaining scan steps skip the iteration body via lax.cond, so a
    converged fit costs almost nothing per remaining step.

    ``analytic_mc=False`` (default, reference-faithful) uses the
    100-sample truncated-normal Monte Carlo estimator of the power-curve
    expectation (caviar.py:209-215); True substitutes the exact
    truncated mean — deterministic and slightly cheaper, but its lack of
    sampling dither can flip borderline connection-gate decisions (see
    powercurve_logit_means).

    ``sweep_block_size="auto"`` (default) resolves to 8 on TPU-class
    backends — the blocked manual-DMA sweep (Jacobi within each 8-row
    block, Gauss-Seidel across blocks; truth-R2 measured equal within
    seed noise at N=1000/K=20000, device fit ~30% faster) — and to 1
    elsewhere (the reference's strictly sequential schedule). Pass 1
    explicitly for the reference schedule on TPU.

    ``laplace_impl="auto"`` routes the power-curve Newton refit through
    the one-launch Pallas kernel on TPU f32 fits (ops/laplace_pallas.py;
    ~66x less per-iteration launch latency); XLA elsewhere.

    ``trace_wire`` compresses the raw-trace upload when ``y_psc`` is a
    host array ("f16" halves, "int8" quarters — see
    _common.prepare_traces). Demixed device-resident inputs are
    unaffected (the demixer has its own transfer_dtype wire).
    """
    from .. import _ensure_compile_cache

    _ensure_compile_cache()
    if verbose:
        print("Running CAVIaR (TPU-native).")

    warn_single_chip_envelope(*np.shape(stim), what="caviar()",
                              dtype=dtype)
    y_psc = prepare_traces(y_psc, dtype, trace_wire=trace_wire)
    y, active = prepare_observations(y_psc, y_xcorr_thresh)
    # single fused program for the stim gather + mask + lam init (the
    # eager-op version cost one tunnel dispatch per op)
    stim, lam_mask, lam0, stim_np, powers_np, powers_dev_np, power_counts_np = (
        prepare_stim_and_init(stim, active, dtype, powers=powers)
    )
    warn_data_thin_design(power_counts_np, stim.shape[1], what="caviar()")
    # device powers come from the same table the uploaded stim was
    # reconstructed from; powers_np (original precision) serves the host
    # reconnect scan only (_common module docstring, f64 contract)
    powers = jnp.asarray(powers_dev_np, dtype=dtype)

    key = jax.random.PRNGKey(seed)

    block_size, sweep_impl_res = _resolve_sweep(
        sweep_impl, sweep_block_size, k=stim.shape[1])
    final, hists, elbo_out = _run_caviar(
        y,
        stim,
        lam0,
        lam_mask,
        powers,
        jnp.asarray(mu_prior, dtype),
        jnp.asarray(beta_prior, dtype),
        jnp.asarray(shape_prior, dtype),
        jnp.asarray(rate_prior, dtype),
        jnp.asarray(phi_prior, dtype),
        jnp.asarray(phi_cov_prior, dtype),
        key,
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
        sweep_block_size=block_size,
        sweep_impl=sweep_impl_res,
        laplace_impl=_resolve_laplace_impl(laplace_impl, dtype),
        update_order=_validate_update_order(str(update_order)),
        track_elbo=bool(track_elbo),
        elbo_tol=None if elbo_tol is None else float(elbo_tol),
    )

    mu, beta, lam = final.mu, final.beta, final.lam
    shape, rate = final.shape, final.rate
    phi, phi_cov, z = final.phi, final.phi_cov, final.z

    if fn_scan:
        # On accelerator backends the whole scan + conditional refit is
        # ONE device program — the host formulation's batched pull would
        # cost a tunnel round trip mid-fit. This is the default for ALL
        # accelerator fits (verbose included — a post-hoc count replaces
        # the per-reconnection prints); the host path remains for CPU,
        # where dispatches are free and it is faster.
        on_accel = jax.devices()[0].platform not in ("cpu",)
        if on_accel:
            mu, beta, lam, z, phi, phi_cov, n_rec = (
                _reconnect_and_refit_device(
                    stim, lam, mu, beta, z, powers,
                    phi, phi_cov,
                    jnp.asarray(phi_prior, dtype),
                    jnp.asarray(phi_cov_prior, dtype),
                    jnp.asarray(msrmp, dtype),
                    jnp.asarray(minimum_spike_count, dtype),
                )
            )
            if verbose:
                # the n_rec pull rides the state pull that follows the
                # fit anyway; only the print itself is host work
                print(f"Reconnected {int(np.asarray(n_rec))} neurons "
                      "previously attributed to spontaneous activity.")
        else:
            mu, beta, lam, z, reconnected = reconnect_from_spontaneous(
                y,       # unused (reference-signature parity; never pulled)
                stim_np,
                lam,
                mu,
                beta,
                z,
                msrmp=msrmp,
                minimum_spike_count=minimum_spike_count,
                powers=powers_np,
                power_counts=power_counts_np,
                verbose=verbose,
            )
            if reconnected:
                # only refit the power curves if lam actually changed —
                # the in-loop update already used this exact lam otherwise
                phi, phi_cov = laplace_phi_update_jit(
                    jnp.asarray(lam, dtype), stim,
                    jnp.asarray(phi_prior, dtype),
                    jnp.asarray(phi_cov_prior, dtype),
                    powers=powers,
                )

    if save_histories:
        hist_arrs = [np.asarray(h) for h in hists]
        # Reference history-shape contract (caviar.py:58-59): shape and
        # rate are scalar posteriors, but their histories are stored
        # broadcast to (iters, K). Our scan snapshots them as scalars
        # ((iters,) ys); widen here so downstream history consumers see
        # the reference layout exactly.
        k_hist = hist_arrs[7].shape[1]  # z history carries the true K
        for i in (3, 4):
            hist_arrs[i] = np.repeat(
                hist_arrs[i][:, None], k_hist, axis=1)
    else:
        hist_arrs = [None] * 8

    receptive_fields = None
    out = (mu, beta, lam, shape, rate, phi, phi_cov, z, receptive_fields,
           *hist_arrs)
    if track_elbo:
        elbos, stop_at = elbo_out
        out = out + ((np.asarray(elbos), int(np.asarray(stop_at))),)
    return out
