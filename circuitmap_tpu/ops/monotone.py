"""Monotone-decay filtering of demixed traces.

After the demixer, each trace is forced to decay monotonically beyond a
start index: ``out[t] = min(out[t-1], x[t])``. The reference runs a
Python loop over time on the host (neural_waveform_demixing.py:337-348);
a running minimum is an associative scan, so on device it is a single
``lax.cummin`` over the tail of the trace block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("start",))
def monotone_decay_filter(traces: jnp.ndarray, start: int = 500) -> jnp.ndarray:
    """traces: [..., T]. Running min along time from index ``start`` on."""
    head = traces[..., :start]
    tail = jax.lax.cummin(
        traces[..., max(start - 1, 0):], axis=traces.ndim - 1
    )
    if start == 0:
        return tail
    return jnp.concatenate([head, tail[..., 1:]], axis=-1)
