"""Isotonic regression (pool-adjacent-violators) on device.

The CAVIaR solver gates each candidate synapse on the value of an
isotonic (non-decreasing) regression through its per-power spike rates,
evaluated at the maximum stimulation power (reference optimise/pava.py:9-88
and optimise/caviar.py:219-220). Two implementations are provided:

1. ``isotonic_regression`` — the full regressor, supporting the
   exponential-decay generalisation (``gamma``) of the reference.
   Sequential pool merging expressed with ``lax`` loops so it jits with
   static shapes; intended for short inputs (the power axis, P ~ 3-10).

2. ``isotonic_fit_at_max`` — only the fitted value at the final index,
   for the standard gamma=1 case. Uses the minimax characterisation of
   isotonic regression: the fitted value at the last position equals the
   maximum over suffixes of the suffix mean. This is a handful of fused
   vector ops — no data-dependent loop at all — and is the form used in
   the hot per-neuron gate inside the lam sweep.

Both are batched over rows with ``vmap`` (one row per neuron), which is
how the TPU earns its keep: N independent tiny regressions run as one
vectorised program rather than N host calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _merge_pools(y: jnp.ndarray, gamma: float):
    """Run pool-adjacent-violators, returning pool (value, weight, length) arrays.

    Pools are stored left-packed in fixed-size buffers (length T) so the
    whole routine has static shapes. With ``gamma`` < 1 the regressor is
    allowed to decay geometrically inside a pool; pool statistics carry
    the decay-weighted sums exactly as the reference formulation does
    (reference optimise/pava.py:39-56).
    """
    T = y.shape[0]
    lg = jnp.log(jnp.asarray(gamma, dtype=y.dtype))

    val = jnp.zeros(T, dtype=y.dtype).at[0].set(y[0])
    wgt = jnp.zeros(T, dtype=y.dtype).at[0].set(1.0)
    length = jnp.zeros(T, dtype=jnp.int32).at[0].set(1)

    def violation(state):
        top, val, wgt, length = state
        # decayed end-value of the previous pool vs average of the top pool
        prev_end = val[top - 1] / wgt[top - 1] * jnp.exp(lg * length[top - 1])
        return (top > 0) & (prev_end > val[top] / wgt[top])

    def merge(state):
        top, val, wgt, length = state
        i = top - 1
        decay = jnp.exp(lg * length[i].astype(y.dtype))
        val = val.at[i].add(val[i + 1] * decay)
        wgt = wgt.at[i].add(wgt[i + 1] * decay * decay)
        length = length.at[i].add(length[i + 1])
        val = val.at[i + 1].set(0.0)
        wgt = wgt.at[i + 1].set(0.0)
        length = length.at[i + 1].set(0)
        return (i, val, wgt, length)

    def push(t, state):
        top, val, wgt, length = state
        top = top + 1
        val = val.at[top].set(y[t])
        wgt = wgt.at[top].set(1.0)
        length = length.at[top].set(1)
        top, val, wgt, length = jax.lax.while_loop(
            violation, merge, (top, val, wgt, length)
        )
        return (top, val, wgt, length)

    _, val, wgt, length = jax.lax.fori_loop(1, T, push, (0, val, wgt, length))
    return val, wgt, length


def isotonic_regression(y: jnp.ndarray, gamma: float = 1.0) -> jnp.ndarray:
    """Non-decreasing (gamma=1) isotonic regression of a 1-D array.

    Numerically matches the reference ``_isotonic_regression``
    (optimise/pava.py:86-88), including the exponential-decay variant:
    within a pool the fitted values decay as ``gamma**(t - pool_start)``.
    """
    y = jnp.asarray(y)
    T = y.shape[0]
    val, wgt, length = _merge_pools(y, gamma)
    lg = jnp.log(jnp.asarray(gamma, dtype=y.dtype))

    # Reconstruct: position t belongs to pool p iff start[p] <= t < start[p+1].
    starts = jnp.cumsum(length) - length  # start index of each pool slot
    t_idx = jnp.arange(T)
    # membership matrix [pools, T]; empty slots (length 0) match nothing
    member = (t_idx[None, :] >= starts[:, None]) & (
        t_idx[None, :] < (starts + length)[:, None]
    )
    safe_wgt = jnp.where(wgt > 0, wgt, 1.0)
    level = val / safe_wgt  # pool level at its first position
    offset = t_idx[None, :] - starts[:, None]  # within-pool offset
    fitted = level[:, None] * jnp.exp(lg * offset.astype(y.dtype))
    return jnp.sum(jnp.where(member, fitted, 0.0), axis=0)


isotonic_regression_batched = jax.vmap(isotonic_regression, in_axes=(0, None))


def isotonic_fit_at_max(y: jnp.ndarray) -> jnp.ndarray:
    """Fitted value of gamma=1 isotonic regression at the last index.

    By the minimax characterisation, the last fitted value is
    ``max_i mean(y[i:])``. Computed with one reversed cumulative sum —
    fully vectorised, the TPU-friendly form of the CAVIaR msrmp gate
    (reference optimise/caviar.py:220 reads ``_isotonic_regression(srates)[-1]``).
    """
    y = jnp.asarray(y)
    rev_csum = jnp.cumsum(y[::-1])
    counts = jnp.arange(1, y.shape[0] + 1, dtype=y.dtype)
    return jnp.max(rev_csum / counts)


isotonic_fit_at_max_batched = jax.vmap(isotonic_fit_at_max)
