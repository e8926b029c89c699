"""Trace → per-trial observation reductions, fused on device.

The solvers operate on the integrated charge of each PSC trace
(``y[k] = trapz(psc[k])``) plus a per-trial activity mask derived from
the zero-lag autocorrelation. The reference computes the mask with a
Python list comprehension over all K trials on the host
(optimise/caviar.py:30) — here both reductions are one fused XLA kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def integrated_charge(psc: jnp.ndarray) -> jnp.ndarray:
    """Trapezoidal charge of each trace. psc: [..., T] -> [...]."""
    return jnp.trapezoid(psc, axis=-1)


def trial_activity_mask(psc: jnp.ndarray, xcorr_thresh: float) -> jnp.ndarray:
    """Boolean mask of trials with appreciable signal energy.

    ``jnp.correlate(x, x)`` in 'valid' mode is the single value
    ``sum(x**2)`` — the reference's per-trial loop (caviar.py:30)
    reduces to one row-sum of squares.
    """
    return jnp.sum(psc * psc, axis=-1) > xcorr_thresh


@jax.jit
def prepare_observations(psc: jnp.ndarray, xcorr_thresh: float):
    """Fused (charge, activity-mask) computation for a [K, T] trace block."""
    return integrated_charge(psc), trial_activity_mask(psc, xcorr_thresh)
