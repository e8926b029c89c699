"""Pallas TPU kernel for the CAVIaR spike-posterior sweep.

The sweep is inherently sequential (each coordinate update reads the
running residual the previous ones wrote), so its cost on TPU is
per-step overhead, not FLOPs. The XLA formulation (solvers/caviar.py
sweep_spikes) pays a dynamic-slice + dynamic-update-slice of the [N, K]
posterior matrix per step inside a `fori_loop`. This kernel instead:

  * runs a grid of N steps with the update order as a *scalar-prefetch*
    operand — the Pallas pipeline machinery double-buffers the DMA of
    each step's lam/stim row from HBM into VMEM using
    ``order[i]``-dependent index maps,
  * keeps the running residual ``r`` [K] and the swept weights [N] in
    VMEM scratch, which persists across sequential grid steps on TPU,
  * writes each updated row straight back to HBM through the output
    block pipeline (rows are visited exactly once: order is a
    permutation).

Semantics are identical to sweep_spikes(block_size=1): same residual
algebra, same PAVA-at-max-power gate (suffix-mean maximum), same
within-sweep weight zeroing. Falls back to the XLA path off-TPU.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sweep_kernel(
    # scalar-prefetch
    order_ref,
    # inputs (blocked per grid step unless noted)
    y_ref,            # [K] VMEM, full
    lam_mask_ref,     # [K] VMEM, full
    mu_ref,           # [N] VMEM, full
    beta_ref,         # [N] VMEM, full
    m0_ref,           # [N] VMEM, full
    m1_ref,           # [N] VMEM, full
    powers_ref,       # [P] VMEM, full
    counts_ref,       # [N, P] VMEM, full — per-neuron trial counts per power
    r_init_ref,       # [K] VMEM, full
    scalars_ref,      # [4] SMEM: sig, msrmp_eff, min_spike_count, gate_active
    lam_row_ref,      # [1, 1, K] VMEM — row order[i] of lam (auto-DMA)
    stim_row_ref,     # [1, 1, K] VMEM — row order[i] of stim (auto-DMA)
    # outputs
    out_row_ref,      # [1, 1, K] VMEM — written back to row order[i]
    # scratch
    r_ref,            # [K] VMEM
):
    i = pl.program_id(0)
    n = order_ref[i]

    @pl.when(i == 0)
    def _init():
        r_ref[...] = r_init_ref[...]

    sig = scalars_ref[0]
    msrmp_eff = scalars_ref[1]
    min_count = scalars_ref[2]
    gate_active = scalars_ref[3]

    lam_n = lam_row_ref[0, 0, :]
    stim_n = stim_row_ref[0, 0, :]
    # each neuron is visited exactly once per sweep (order is a
    # permutation), so its own mu entry is never stale: within-sweep
    # coupling flows only through r. No swept-mu buffer needed.
    mu_n = mu_ref[n]
    beta_n = beta_ref[n]

    r_excl = r_ref[...] - mu_n * lam_n
    quad = sig * (
        -2.0 * y_ref[...] * mu_n + 2.0 * mu_n * r_excl + (mu_n * mu_n + beta_n * beta_n)
    )
    est = (
        lam_mask_ref[...]
        * (stim_n > 0).astype(lam_n.dtype)
        * jax.nn.sigmoid(m0_ref[n] * stim_n - m1_ref[n] - 0.5 * quad)
    )

    # per-power spike rates -> isotonic fit at max power (suffix-mean max)
    P = powers_ref.shape[0]
    sums = [
        jnp.sum(jnp.where(stim_n == powers_ref[p], est, 0.0)) for p in range(P)
    ]
    counts = [counts_ref[n, p] for p in range(P)]
    rates = [s / (c + 1e-4 * (c == 0.0)) for s, c in zip(sums, counts)]
    iso_max = rates[P - 1]
    acc = rates[P - 1]
    cnt = 1.0
    for p in range(P - 2, -1, -1):
        acc = acc + rates[p]
        cnt = cnt + 1.0
        iso_max = jnp.maximum(iso_max, acc / cnt)

    total = jnp.sum(est)
    ok = jnp.logical_and(iso_max >= msrmp_eff, total >= min_count)
    gate = jnp.where(gate_active > 0, ok.astype(est.dtype), jnp.ones((), est.dtype))

    new_lam = est * gate
    new_mu = mu_n * gate
    out_row_ref[0, 0, :] = new_lam
    r_ref[...] = r_excl + new_mu * new_lam


@partial(
    jax.jit,
    static_argnames=("interpret",),
)
def sweep_spikes_pallas(
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
    power_counts,
    order,
    msrmp_eff,
    minimum_spike_count,
    gate_active,
    interpret=False,
):
    """Pallas version of solvers.caviar.sweep_spikes (block_size=1).

    power_counts: [N, P] per-neuron trial counts per power level
    (static across iterations — computed once per fit).
    Returns the updated lam [N, K].
    """
    N, K = lam.shape
    P = powers.shape[0]
    dtype = lam.dtype

    scalars = jnp.stack(
        [
            jnp.asarray(sig, dtype),
            jnp.asarray(msrmp_eff, dtype),
            jnp.asarray(minimum_spike_count, dtype),
            jnp.asarray(gate_active, dtype),
        ]
    )
    r_init = mu @ lam

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # y
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lam_mask
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mu (scalar reads)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # beta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # m0
            pl.BlockSpec(memory_space=pltpu.SMEM),  # m1
            pl.BlockSpec(memory_space=pltpu.SMEM),  # powers
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r_init
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            # rows are [1, 1, K] blocks of an [N, 1, K] view: trailing
            # block dims equal the array dims, satisfying Mosaic's
            # alignment rule for any K
            pl.BlockSpec((1, 1, K), lambda i, order: (order[i], 0, 0)),  # lam
            pl.BlockSpec((1, 1, K), lambda i, order: (order[i], 0, 0)),  # stim
        ],
        out_specs=pl.BlockSpec((1, 1, K), lambda i, order: (order[i], 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((K,), dtype),  # r
        ],
    )

    # no aliasing needed: order is a permutation, so every output row is
    # written exactly once and input rows are only read before their write
    out = pl.pallas_call(
        _sweep_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 1, K), dtype),
        interpret=interpret,
    )(
        order.astype(jnp.int32),
        y, lam_mask, mu, beta, m0, m1, powers,
        power_counts.astype(dtype), r_init, scalars,
        lam[:, None, :], stim[:, None, :],
    )
    return out[:, 0, :]
