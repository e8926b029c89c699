"""Left-truncated normal sampling and moments.

CAVIaR's lam update takes Monte-Carlo expectations over the sigmoid
power-curve coefficients phi, sampled from normals truncated at zero
(reference optimise/caviar.py:209-212). Because the integrand
``log(sigmoid(x)/(1-sigmoid(x)))`` is exactly ``x`` (the logit of a
sigmoid is the identity), the MC expectation is linear in the samples
and collapses to the truncated-normal *mean* — so the whole MC stage is
one batched op evaluated once per sweep rather than N times inside it.
Both the sampled estimator (bit-compatible in distribution with the
reference) and the exact analytic mean are provided.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtr, ndtri


def sample_truncated_normal(key, mean, sd, num_samples: int):
    """Inverse-CDF samples of N(mean, sd) truncated to (0, inf).

    mean, sd: arrays of identical shape S. Returns [num_samples, *S].
    Mirrors the reference estimator (caviar.py:209-212): note the
    reference uses the *covariance diagonal* directly as the scale, a
    behaviour callers preserve for parity.

    The CDF argument is clamped away from {0, 1}: in float32,
    ``a + u * (1 - a)`` can round to exactly 1.0 for u near 1 (and to
    0.0 for a = u = 0), where ndtri returns +/-inf and a single infinite
    sample poisons the whole fit through inf * 0 = nan. (The reference
    is shielded only by running in float64.)
    """
    a = ndtr(-mean / sd)
    u = jax.random.uniform(key, (num_samples,) + mean.shape, dtype=mean.dtype)
    q = a + u * (1.0 - a)
    eps = jnp.finfo(mean.dtype).epsneg
    q = jnp.clip(q, eps, 1.0 - eps)
    return ndtri(q) * sd + mean


def truncated_normal_mean(mean, sd):
    """Exact mean of N(mean, sd) truncated to (0, inf).

    E[X | X > 0] = mean + sd * phi(alpha) / (1 - Phi(alpha)), alpha = -mean/sd.
    """
    alpha = -mean / sd
    pdf = jnp.exp(-0.5 * alpha * alpha) / jnp.sqrt(2.0 * jnp.pi).astype(mean.dtype)
    # P(X > 0) as ndtr(-alpha), NOT 1 - ndtr(alpha): the subtraction
    # catastrophically cancels in f32 once ndtr(alpha) rounds to 1
    # (mean <~ -5*sd), returning wrong-signed or ~1e30 means — a single
    # such value poisons the whole analytic_mc fit (round-4 review
    # finding, empirically confirmed)
    tail = ndtr(-alpha)
    ratio = pdf / jnp.maximum(tail, jnp.finfo(mean.dtype).tiny)
    # where even ndtr(-alpha) underflows (alpha >~ 12 in f32), use the
    # Mills-ratio asymptote phi/Phi(-alpha) -> alpha + 1/alpha
    ratio = jnp.where(tail > 0, ratio, alpha + 1.0 / alpha)
    return mean + sd * ratio
