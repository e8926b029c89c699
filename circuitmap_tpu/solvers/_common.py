"""Shared host->device preamble for the solvers.

Every solver takes the [N, K] stimulus design matrix from host memory.
On a bandwidth-limited link (CLAUDE.md: the tunneled TPU moves ~50 MB/s)
the dense f32 upload dominates fixed cost, but stim takes only P+1
distinct values — so it ships as int8 bucket indices (4x smaller) and is
reconstructed by a device gather. Factored here so caviar, cavi_sns,
the resumable wrapper, and the sharded solver share one implementation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def prepare_traces(y_psc, dtype):
    """Cast traces host-side (half the transfer) unless already on device."""
    if isinstance(y_psc, jax.Array):
        return y_psc.astype(dtype)
    return jnp.asarray(np.asarray(y_psc, dtype=np.float32), dtype=dtype)


def prepare_stim(stim, dtype):
    """Returns (stim_device, stim_np_f32, powers_np).

    Ships stim as int8 power-bucket indices when there are at most 127
    levels (the practical case), falling back to a dense f32 upload.
    """
    stim_np = np.asarray(stim, dtype=np.float32)
    powers_np = np.unique(stim_np)[1:]
    levels_np = np.concatenate([[0.0], powers_np]).astype(np.float32)
    if levels_np.size <= 127:
        bucket = np.searchsorted(levels_np, stim_np).astype(np.int8)
        stim_dev = jnp.asarray(levels_np, dtype)[
            jnp.asarray(bucket).astype(jnp.int32)
        ]
    else:
        stim_dev = jnp.asarray(stim_np, dtype=dtype)
    return stim_dev, stim_np, powers_np
