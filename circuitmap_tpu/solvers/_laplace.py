"""Laplace approximation of the sigmoid power-curve posteriors (phi).

Each neuron's opsin power curve is ``p(spike | power) = sigmoid(phi_0 *
power - phi_1)``. Given current spike posteriors lam[n] (soft Bernoulli
observations), the posterior over (phi_0, phi_1) is approximated by a
Laplace fit at the barrier-regularised MAP via damped Newton with Armijo
backtracking (reference optimise/caviar.py:246-316).

TPU formulation — sufficient statistics. The log-likelihood
``sum_k lam_k log s(x_k) + (1 - lam_k) log s(-x_k)`` with
``x_k = phi_0 I_k - phi_1`` depends on trial k only through its power
bucket (I takes P+1 distinct values). Regrouping by bucket,

    nll(phi) = -sum_p [ S_p log s(x_p) + (C_p - S_p) log s(-x_p) ]

with S_p = sum of lam over bucket p and C_p its trial count. The same
regrouping holds for the gradient and Hessian. So the K-dependence is
ONE [N, P+1] masked matmul per CAVI iteration (an MXU op; a single psum
under trial sharding), and the Newton/backtracking recursion — a
fixed-length ``lax.scan`` vmapped over N — runs on [P+1]-sized
vectors. The reference re-reduces over all K trials at every
backtracking evaluation (caviar.py:270-272, 312-316); this version is
algebraically identical (sums regrouped) at a tiny fraction of the
work.

Stability: log-likelihoods use ``log_sigmoid`` so saturated power
curves give large finite values rather than inf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.nn import sigmoid, log_sigmoid

NEWTON_STEPS = 10
BARRIER_T = 1e1
ARMIJO_ALPHA = 0.25
BACKTRACK_BETA = 0.5
MAX_BACKTRACK = 40


def _inv2x2(M):
    """Closed-form 2x2 inverse (adjugate / determinant).

    ``jnp.linalg.inv`` on a (vmapped) [2, 2] lowers to TPU's batched-LU
    custom call — profiled at ~0.55 ms per Newton step at N=1000, it was
    the single hottest op of the whole CAVI fit (10 calls per
    iteration). The adjugate form is a handful of fused VPU ops.
    """
    a, b = M[0, 0], M[0, 1]
    c, d = M[1, 0], M[1, 1]
    det = a * d - b * c
    return jnp.array([[d, -b], [-c, a]]) / det


def powercurve_stats(lam, stim, powers, total_trials=None, counts=None):
    """Per-neuron bucket statistics (S, C) over power levels.

    lam, stim: [N, K]; powers: [P] nonzero power levels. Returns
    S: [N, P+1] summed spike posteriors, C: [N, P+1] trial counts, with
    bucket 0 = untargeted (power 0) trials. Under trial sharding these
    are the only cross-device reductions the phi update needs.

    ``total_trials``: the real trial count when the arrays carry inert
    128-alignment padding. Padded columns have stim == 0, so only the
    bucket-0 count over-counts — and it equals
    ``total_trials - sum(targeted counts)`` exactly.

    ``counts``: optional precomputed [N, P] per-neuron trial counts per
    nonzero power (requires ``total_trials``). stim is constant across
    CAVI iterations, so the C reductions are loop-invariant; the fit
    scan hands in the counts it already computed once and this skips P+1
    full [N, K] mask-sums per iteration. Bit-identical: both forms sum
    the same 0/1 masks (exact integers in f32), and bucket 0 is derived
    the same way.
    """
    levels = jnp.concatenate([jnp.zeros((1,), powers.dtype), powers])  # [P+1]
    # one fused masked reduction per level: avoids materialising the
    # [N, P+1, K] one-hot tensor (320 MB of traffic at N=1000, K=20000)
    S = jnp.stack(
        [jnp.sum(jnp.where(stim == levels[p], lam, 0.0), axis=-1)
         for p in range(levels.shape[0])],
        axis=1,
    )
    if counts is not None:
        # without total_trials, bucket 0 counts every stim == 0 column
        # (incl. any padding) — exactly what the mask-sum form computes,
        # i.e. the full trial axis minus the targeted counts
        total = lam.shape[-1] if total_trials is None else total_trials
        counts = counts.astype(lam.dtype)
        bucket0 = total - jnp.sum(counts, axis=1)
        C = jnp.concatenate([bucket0[:, None], counts], axis=1)
        return S, C, levels
    C = jnp.stack(
        [jnp.sum((stim == levels[p]).astype(lam.dtype), axis=-1)
         for p in range(levels.shape[0])],
        axis=1,
    )
    if total_trials is not None:
        C = C.at[:, 0].set(total_trials - jnp.sum(C[:, 1:], axis=1))
    return S, C, levels


def _laplace_from_stats(S, C, levels, phi_prior, phi_cov_prior, t=BARRIER_T):
    """MAP + covariance for one neuron from its bucket stats.

    S, C, levels: [P+1]; phi_prior: [2]; phi_cov_prior: [2, 2].
    """
    prec = _inv2x2(phi_cov_prior)

    def objective(phi):
        x = phi[0] * levels - phi[1]
        ll = S * log_sigmoid(x) + (C - S) * log_sigmoid(-x)
        dphi = phi - phi_prior
        return (
            -jnp.sum(jnp.nan_to_num(ll))
            - jnp.sum(jnp.log(phi)) / t
            + 0.5 * dphi @ prec @ dphi
        )

    def newton_direction(phi):
        f = sigmoid(phi[0] * levels - phi[1])
        resid = S - C * f  # sum over bucket of (lam_k - f)
        g = jnp.array([-jnp.sum(levels * resid), jnp.sum(resid)])
        g = g + prec @ (phi - phi_prior) - 1.0 / (t * phi)

        w = C * f * (1.0 - f)
        h00 = jnp.sum(levels * levels * w)
        h01 = -jnp.sum(levels * w)
        h11 = jnp.sum(w)
        H = jnp.array([[h00, h01], [h01, h11]])
        H = H + prec + jnp.diag(1.0 / (t * phi * phi))
        H_inv = _inv2x2(H)
        return -H_inv @ g, g, H_inv

    # Armijo backtracking evaluated in parallel: the while_loop walks the
    # fixed geometric step sequence 1, beta, beta^2, ... until the first
    # acceptable step (or gives up at beta^MAX) — so evaluate every
    # candidate at once on the tiny [P+1] stats and pick the first
    # acceptance. Identical step selection, no data-dependent loop
    # (which vmap would otherwise run to the worst lane's trip count).
    step_grid = BACKTRACK_BETA ** jnp.arange(MAX_BACKTRACK + 1)

    def newton_step(carry, _):
        phi, _ = carry
        v, g, H_inv = newton_direction(phi)
        steps = step_grid.astype(phi.dtype)
        lhs = jax.vmap(lambda s: objective(phi + s * v))(steps)
        rhs = objective(phi) + ARMIJO_ALPHA * steps * (g @ v)
        ok = jnp.logical_not(jnp.isnan(lhs)) & (lhs <= rhs)
        first = jnp.argmax(ok)
        j = jnp.where(jnp.any(ok), first, MAX_BACKTRACK)
        phi = phi + steps[j] * v
        return (phi, H_inv), None

    init = (phi_prior, jnp.zeros((2, 2), dtype=phi_prior.dtype))
    (phi, cov), _ = lax.scan(newton_step, init, None, length=NEWTON_STEPS)
    return phi, cov


laplace_from_stats = jax.vmap(_laplace_from_stats, in_axes=(0, 0, None, 0, 0))


def laplace_phi_update(lam, stim, phi_prior, phi_cov_prior, powers=None,
                       total_trials=None, counts=None, impl="xla"):
    """Batched Laplace refit of all N power-curve posteriors.

    lam, stim: [N, K]; phi_prior: [N, 2]; phi_cov_prior: [N, 2, 2];
    powers: [P] nonzero levels (derived from stim if omitted — only
    possible outside jit); total_trials/counts: see powercurve_stats.
    Returns (phi [N, 2], phi_cov [N, 2, 2]).
    Reference behaviour: vmapped ``_laplace_approx`` (caviar.py:253-310).

    ``impl``: "xla" (default — also the f64/CPU/vmapped fallback),
    "pallas" (one-launch TPU Newton kernel, ops/laplace_pallas.py), or
    "pallas_interpret" (the kernel under the interpreter, for CPU
    equality tests).
    """
    if powers is None:
        import numpy as np

        powers = jnp.asarray(np.unique(np.asarray(stim))[1:], dtype=lam.dtype)
    S, C, levels = powercurve_stats(lam, stim, powers, total_trials, counts)
    return laplace_from_stats_impl(S, C, levels, phi_prior, phi_cov_prior,
                                   impl=impl)


def _resolve_laplace_impl(laplace_impl, dtype):
    """'auto' -> the one-launch Newton kernel on TPU-class f32 fits.

    The XLA formulation stays the fallback for CPU runs, f64
    parity-oracle fits (Pallas TPU is f32), and any explicit override.
    """
    if laplace_impl != "auto":
        if laplace_impl not in _LAPLACE_IMPLS:
            raise ValueError(
                f"laplace_impl must be 'auto' or one of {_LAPLACE_IMPLS}, "
                f"got {laplace_impl!r}")
        return laplace_impl
    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    # normalise dtype spellings ('float32', np.float32, jnp.float32)
    return ("pallas"
            if on_tpu and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
            else "xla")


_LAPLACE_IMPLS = ("xla", "pallas", "pallas_interpret")


def laplace_from_stats_impl(S, C, levels, phi_prior, phi_cov_prior,
                            impl="xla"):
    """Route the Newton recursion by ``impl`` — the ONE switch shared by
    laplace_phi_update and both sharded iterations (keep routing logic
    here, not at call sites)."""
    if impl not in _LAPLACE_IMPLS:
        # a typo must not silently select a different implementation
        # (same rationale as caviar._validate_update_order)
        raise ValueError(
            f"laplace impl must be one of {_LAPLACE_IMPLS}, got {impl!r}")
    if impl != "xla":
        from ..ops.laplace_pallas import (
            laplace_from_stats_pallas_interpret_v, laplace_from_stats_pallas_v,
        )

        fn = (laplace_from_stats_pallas_interpret_v
              if impl.endswith("interpret") else laplace_from_stats_pallas_v)
        return fn(S, C, levels, phi_prior, phi_cov_prior)
    return laplace_from_stats(S, C, levels, phi_prior, phi_cov_prior)


# Jitted form for EAGER call sites (post-reconnect refits): run op-by-op
# through a dispatch-costly link, the masked reductions + vmapped Newton
# while_loops cost ~2 s; as one compiled program, ~10 ms.
laplace_phi_update_jit = jax.jit(laplace_phi_update)
