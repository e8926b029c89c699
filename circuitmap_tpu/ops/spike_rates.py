"""Per-power inferred spike rates.

For a neuron n, the CAVIaR gate needs the mean posterior spike
probability at each stimulation power: ``sr[p] = mean(lam[n, k] over
trials k with stim[n, k] == powers[p])``. The reference loops over
powers with a fori_loop and builds index scatters (optimise/caviar.py:174-186);
here it is a tiny masked matmul — [P, K] one-hot times [K] — which XLA
maps straight onto the MXU and which vectorises over all N neurons.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spike_rates_by_power(stim_row, lam_row, powers):
    """stim_row: [K] powers delivered; lam_row: [K] spike posteriors; powers: [P].

    Returns [P] mean spike rate per power, with the same zero-count
    guard as the reference (caviar.py:183): empty buckets report 0.
    """
    onehot = (stim_row[None, :] == powers[:, None]).astype(lam_row.dtype)  # [P, K]
    counts = jnp.sum(onehot, axis=1)
    total = onehot @ lam_row
    return total / (counts + 1e-4 * (counts == 0.0))


spike_rates_by_power_batched = jax.vmap(spike_rates_by_power, in_axes=(0, 0, None))
