"""Laplace approximation of the sigmoid power-curve posteriors (phi).

Each neuron's opsin power curve is ``p(spike | power) = sigmoid(phi_0 *
power - phi_1)``. Given current spike posteriors lam[n] (treated as soft
Bernoulli observations), the posterior over (phi_0, phi_1) is
approximated by a Laplace fit at the barrier-regularised MAP, found by
damped Newton with Armijo backtracking (reference optimise/caviar.py:246-316).

TPU formulation: the Newton recursion is a fixed-length ``lax.scan``
and the N per-neuron problems run as one ``vmap`` — N tiny 2x2 solves
batched into dense vector ops. All K-reductions (gradient, Hessian,
objective) are row sums, which under trial-axis sharding become psums.

Stability: log-likelihood terms use ``log_sigmoid`` so saturated power
curves produce large finite values rather than inf (the reference
relies on ``nan_to_num``; we keep that guard too).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.nn import sigmoid, log_sigmoid

NEWTON_STEPS = 10
BARRIER_T = 1e1
ARMIJO_ALPHA = 0.25
BACKTRACK_BETA = 0.5
MAX_BACKTRACK = 40


def _penalised_nll(spk, phi, phi_prior, prec, powers_row, t):
    """Negative log-lik + log-barrier keeping phi > 0 + Gaussian prior.

    Mirrors reference ``negloglik_with_barrier`` (caviar.py:312-316).
    """
    x = phi[0] * powers_row - phi[1]
    ll = spk * log_sigmoid(x) + (1.0 - spk) * log_sigmoid(-x)
    dphi = phi - phi_prior
    return (
        -jnp.sum(jnp.nan_to_num(ll))
        - jnp.sum(jnp.log(phi)) / t
        + 0.5 * dphi @ prec @ dphi
    )


def _laplace_single(spk, phi_prior, phi_cov_prior, powers_row, t=BARRIER_T):
    """MAP + covariance for one neuron. spk, powers_row: [K]; phi_prior: [2]."""
    prec = jnp.linalg.inv(phi_cov_prior)

    def objective(phi):
        return _penalised_nll(spk, phi, phi_prior, prec, powers_row, t)

    def newton_direction(phi):
        f = sigmoid(phi[0] * powers_row - phi[1])
        resid = spk - f
        g = jnp.array([-jnp.sum(powers_row * resid), jnp.sum(resid)])
        g = g + prec @ (phi - phi_prior) - 1.0 / (t * phi)

        w = f * (1.0 - f)
        h00 = jnp.sum(powers_row * powers_row * w)
        h01 = -jnp.sum(powers_row * w)
        h11 = jnp.sum(w)
        H = jnp.array([[h00, h01], [h01, h11]])
        H = H + prec + jnp.diag(1.0 / (t * phi * phi))
        H_inv = jnp.linalg.inv(H)
        return -H_inv @ g, g, H_inv

    def backtrack_cond(carry):
        it, _, lhs, rhs, _, _, _ = carry
        return (it < MAX_BACKTRACK) & (jnp.isnan(lhs) | (lhs > rhs))

    def backtrack_body(carry):
        it, step, lhs, rhs, v, g, phi = carry
        step = step * BACKTRACK_BETA
        lhs = objective(phi + step * v)
        rhs = objective(phi) + ARMIJO_ALPHA * step * (g @ v)
        return (it + 1, step, lhs, rhs, v, g, phi)

    def newton_step(carry, _):
        phi, _ = carry
        v, g, H_inv = newton_direction(phi)
        step = jnp.asarray(1.0, dtype=phi.dtype)
        lhs = objective(phi + step * v)
        rhs = objective(phi) + ARMIJO_ALPHA * step * (g @ v)
        it0 = jnp.asarray(0, dtype=jnp.int32)
        _, step, _, _, _, _, _ = lax.while_loop(
            backtrack_cond, backtrack_body, (it0, step, lhs, rhs, v, g, phi)
        )
        return (phi + step * v, H_inv), None

    init = (phi_prior, jnp.zeros((2, 2), dtype=phi_prior.dtype))
    (phi, cov), _ = lax.scan(newton_step, init, None, length=NEWTON_STEPS)
    return phi, cov


_laplace_batched = jax.vmap(_laplace_single, in_axes=(0, 0, 0, 0))


def laplace_phi_update(lam, stim, phi_prior, phi_cov_prior):
    """Batched Laplace refit of all N power-curve posteriors.

    lam, stim: [N, K]; phi_prior: [N, 2]; phi_cov_prior: [N, 2, 2].
    Returns (phi [N, 2], phi_cov [N, 2, 2]).
    Reference: vmapped ``_laplace_approx`` (caviar.py:253-310).
    """
    return _laplace_batched(lam, phi_prior, phi_cov_prior, stim)
