"""Small mask helpers (reference optimise/utils.py:6-11)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(0,))
def get_mask(N: int) -> jnp.ndarray:
    """Boolean [N, N] mask that is False on the diagonal, True elsewhere."""
    return ~jnp.eye(N, dtype=bool)
