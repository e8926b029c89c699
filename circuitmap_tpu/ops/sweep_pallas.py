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
    counts_ref,       # [N*P] SMEM, flat — 2-D SMEM pads lanes to 128 (an [N, P] layout costs N*128 words: 1 MB — the whole SMEM — at N=2000)
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
    P = powers_ref.shape[0]
    new_lam, new_mu, r_excl = _sweep_body(
        lam_n, stim_n,
        lambda: r_ref[...], lambda: y_ref[...], lambda: lam_mask_ref[...],
        lambda: mu_ref[n], lambda: beta_ref[n],
        lambda: m0_ref[n], lambda: m1_ref[n], powers_ref,
        lambda p: counts_ref[n * P + p],
        sig, msrmp_eff, min_count, gate_active)
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
        power_counts.astype(dtype).reshape(-1), r_init, scalars,
        lam[:, None, :], stim[:, None, :],
    )
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# Fused single-invocation kernel with manual double-buffered DMA.
#
# The grid kernel above pays the Pallas pipeline's per-grid-step latency
# N times (three ~80 KB block DMAs per step whose issue is serialised
# with the previous step's compute). This variant runs the WHOLE sweep
# in one kernel invocation: rows stream HBM->VMEM through a depth-D
# ring of manually-issued async copies, so row n's compute overlaps the
# in-flight loads of rows n+1..n+D and the store of row n-1.
# ---------------------------------------------------------------------------


def _sweep_body(lam_n, stim_n, read_r, read_y, read_mask, read_mu,
                read_beta, read_m0, read_m1, powers_ref, read_count,
                sig, msrmp_eff, min_count, gate_active):
    """One coordinate update — the ONE copy of the residual-exclusion /
    quad / est / suffix-mean isotonic gate / residual-writeback algebra
    shared by every scalar-row sweep kernel (grid, row-DMA, batched
    grid). The ``read_*`` thunks let each kernel keep its own ref
    indexing while the reads stay at the exact program points the
    kernels always used (the traced jaxprs — and hence the Mosaic
    lowerings — are byte-identical to the pre-factored copies;
    verified). The blocked kernels use 2-D Jacobi block algebra and are
    intentionally separate.
    """
    mu_n = read_mu()
    beta_n = read_beta()
    r_excl = read_r() - mu_n * lam_n
    quad = sig * (
        -2.0 * read_y() * mu_n + 2.0 * mu_n * r_excl
        + (mu_n * mu_n + beta_n * beta_n)
    )
    est = (
        read_mask()
        * (stim_n > 0).astype(lam_n.dtype)
        * jax.nn.sigmoid(read_m0() * stim_n - read_m1() - 0.5 * quad)
    )
    P = powers_ref.shape[0]
    sums = [
        jnp.sum(jnp.where(stim_n == powers_ref[p], est, 0.0)) for p in range(P)
    ]
    counts = [read_count(p) for p in range(P)]
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
    gate = jnp.where(gate_active > 0, ok.astype(est.dtype),
                     jnp.ones((), est.dtype))
    new_lam = est * gate
    new_mu = mu_n * gate
    # the residual writeback `r_excl + new_mu * new_lam` stays in each
    # caller: the grid/batched kernels issue it AFTER their out-row
    # store, the row-DMA body before — returning the pieces keeps every
    # kernel's traced op order (and Mosaic lowering) bit-identical to
    # the pre-factored copies
    return new_lam, new_mu, r_excl


def _sweep_body_row(lam_n, stim_n, n, r, y, lam_mask, mu_ref, beta_ref,
                    m0_ref, m1_ref, powers_ref, counts_ref, sig, msrmp_eff,
                    min_count, gate_active):
    """Row-DMA kernels' entry to :func:`_sweep_body` (r/y/mask arrive
    pre-read; the per-neuron params read from SMEM here)."""
    P = powers_ref.shape[0]
    new_lam, new_mu, r_excl = _sweep_body(
        lam_n, stim_n, lambda: r, lambda: y, lambda: lam_mask,
        lambda: mu_ref[n], lambda: beta_ref[n],
        lambda: m0_ref[n], lambda: m1_ref[n], powers_ref,
        lambda p: counts_ref[n * P + p],
        sig, msrmp_eff, min_count, gate_active)
    return new_lam, r_excl + new_mu * new_lam


def _sweep_kernel_dma(
    # SMEM inputs
    order_ref,        # [N] int32
    mu_ref,           # [N]
    beta_ref,         # [N]
    m0_ref,           # [N]
    m1_ref,           # [N]
    powers_ref,       # [P]
    counts_ref,       # [N*P] flat (SMEM lane-padding rule above)
    scalars_ref,      # [4]: sig, msrmp_eff, min_spike_count, gate_active
    # VMEM inputs
    y_ref,            # [K]
    lam_mask_ref,     # [K]
    r_init_ref,       # [K]
    # HBM inputs / output (manually DMA'd)
    lam_hbm,          # [N, 1, K]
    stim_hbm,         # [N, 1, K]
    out_hbm,          # [N, 1, K]
    # scratch
    r_ref,            # [K] VMEM
    lam_buf,          # [D, 1, K] VMEM ring
    stim_buf,         # [D, 1, K] VMEM ring
    out_buf,          # [D, 1, K] VMEM ring
    in_sems,          # DMA (D, 2)
    out_sems,         # DMA (D,)
):
    N = lam_hbm.shape[0]
    D = lam_buf.shape[0]

    def in_dmas(i, slot):
        n = order_ref[i]
        return (
            pltpu.make_async_copy(lam_hbm.at[n], lam_buf.at[slot],
                                  in_sems.at[slot, 0]),
            pltpu.make_async_copy(stim_hbm.at[n], stim_buf.at[slot],
                                  in_sems.at[slot, 1]),
        )

    def out_dma(i, slot):
        return pltpu.make_async_copy(out_buf.at[slot], out_hbm.at[order_ref[i]],
                                     out_sems.at[slot])

    r_ref[...] = r_init_ref[...]

    for s in range(min(D, N)):  # static warm-up: prefetch the first D rows
        for dma in in_dmas(s, s):
            dma.start()

    sig = scalars_ref[0]
    msrmp_eff = scalars_ref[1]
    min_count = scalars_ref[2]
    gate_active = scalars_ref[3]

    def body(i, _):
        slot = jax.lax.rem(i, D)
        for dma in in_dmas(i, slot):
            dma.wait()
        new_lam, new_r = _sweep_body_row(
            lam_buf[slot, 0, :], stim_buf[slot, 0, :], order_ref[i],
            r_ref[...], y_ref[...], lam_mask_ref[...], mu_ref, beta_ref,
            m0_ref, m1_ref, powers_ref, counts_ref, sig, msrmp_eff,
            min_count, gate_active,
        )

        @pl.when(i >= D)
        def _():  # slot reuse: the store issued D steps ago must be done
            out_dma(i - D, slot).wait()

        out_buf[slot, 0, :] = new_lam
        r_ref[...] = new_r
        out_dma(i, slot).start()

        @pl.when(i + D < N)
        def _():
            for dma in in_dmas(i + D, slot):
                dma.start()

        return 0

    jax.lax.fori_loop(0, N, body, 0)

    def drain(j, _):  # wait out the last min(D, N) stores
        i = N - jnp.minimum(D, N) + j
        out_dma(i, jax.lax.rem(i, D)).wait()
        return 0

    jax.lax.fori_loop(0, jnp.minimum(D, N), drain, 0)


@partial(jax.jit, static_argnames=("interpret", "depth"))
def sweep_spikes_pallas_dma(
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
    depth=4,
):
    """Manual-DMA variant of sweep_spikes_pallas; identical semantics.

    ``depth`` is the prefetch ring size (rows in flight). Manual DMA
    slices must be 128-aligned on the lane dimension, so K pads up to a
    multiple of 128 (zero-padded trials are inert: stim = 0 masks their
    est contribution and mu @ lam extends with zeros).
    """
    N, K = lam.shape
    dtype = lam.dtype

    K128 = -(-K // 128) * 128
    if K128 != K:
        pad = K128 - K
        y = jnp.pad(y, (0, pad))
        lam_mask = jnp.pad(lam_mask, (0, pad))
        lam = jnp.pad(lam, ((0, 0), (0, pad)))
        stim = jnp.pad(stim, ((0, 0), (0, pad)))

    scalars = jnp.stack(
        [
            jnp.asarray(sig, dtype),
            jnp.asarray(msrmp_eff, dtype),
            jnp.asarray(minimum_spike_count, dtype),
            jnp.asarray(gate_active, dtype),
        ]
    )
    r_init = mu @ lam

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = lambda: pl.BlockSpec(memory_space=pl.ANY)

    out = pl.pallas_call(
        _sweep_kernel_dma,
        in_specs=[
            smem(),  # order
            smem(),  # mu
            smem(),  # beta
            smem(),  # m0
            smem(),  # m1
            smem(),  # powers
            smem(),  # counts
            smem(),  # scalars
            vmem(),  # y
            vmem(),  # lam_mask
            vmem(),  # r_init
            anym(),  # lam rows (HBM)
            anym(),  # stim rows (HBM)
        ],
        out_specs=anym(),
        out_shape=jax.ShapeDtypeStruct((N, 1, K128), dtype),
        scratch_shapes=[
            pltpu.VMEM((K128,), dtype),
            pltpu.VMEM((depth, 1, K128), dtype),
            pltpu.VMEM((depth, 1, K128), dtype),
            pltpu.VMEM((depth, 1, K128), dtype),
            pltpu.SemaphoreType.DMA((depth, 2)),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        interpret=interpret,
    )(
        order.astype(jnp.int32), mu, beta, m0, m1, powers,
        power_counts.astype(dtype).reshape(-1), scalars,
        y, lam_mask, r_init,
        lam[:, None, :], stim[:, None, :],
    )
    return out[:, 0, :K]


# ---------------------------------------------------------------------------
# Batched (B, N)-grid kernel + the custom-vmap wrapper that routes
# jax.vmap of the sweep (solvers/batched.caviar_many) onto it
# ---------------------------------------------------------------------------


def _sweep_kernel_batched(
    # scalar-prefetch
    order_ref,        # [B, N] SMEM
    # full-array SMEM operands
    powers_ref,       # [P]
    scalars_ref,      # [B, 4]: sig, msrmp_eff, min_count, gate_active per map
    # blocked operands (one experiment / one row per grid step)
    y_ref,            # (1, 1, K) VMEM — [B, 1, K] view (Mosaic: a (1, K)
    lam_mask_ref,     # (1, 1, K) VMEM    block of [B, K] violates the
    r_init_ref,       # (1, 1, K) VMEM    8-sublane tiling rule on real TPU)
    mu_row_ref,       # (1, 1, 1, 1) VMEM — mu[b, order[b, j]]
    beta_row_ref,     # (1, 1, 1, 1)
    m0_row_ref,       # (1, 1, 1, 1)
    m1_row_ref,       # (1, 1, 1, 1)
    counts_row_ref,   # (1, 1, 1, P) VMEM — counts[b, order[b, j], :]
    lam_row_ref,      # (1, 1, 1, K) VMEM
    stim_row_ref,     # (1, 1, 1, K) VMEM
    # outputs
    out_row_ref,      # (1, 1, 1, K) VMEM
    # scratch
    r_ref,            # [K] VMEM — reset at the start of each experiment
):
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        r_ref[...] = r_init_ref[0, 0, :]

    sig = scalars_ref[b, 0]
    msrmp_eff = scalars_ref[b, 1]
    min_count = scalars_ref[b, 2]
    gate_active = scalars_ref[b, 3]

    lam_n = lam_row_ref[0, 0, 0, :]
    stim_n = stim_row_ref[0, 0, 0, :]
    new_lam, new_mu, r_excl = _sweep_body(
        lam_n, stim_n,
        lambda: r_ref[...], lambda: y_ref[0, 0, :],
        lambda: lam_mask_ref[0, 0, :],
        lambda: mu_row_ref[0, 0, 0, 0], lambda: beta_row_ref[0, 0, 0, 0],
        lambda: m0_row_ref[0, 0, 0, 0], lambda: m1_row_ref[0, 0, 0, 0],
        powers_ref, lambda p: counts_row_ref[0, 0, 0, p],
        sig, msrmp_eff, min_count, gate_active)
    out_row_ref[0, 0, 0, :] = new_lam
    r_ref[...] = r_excl + new_mu * new_lam


@partial(jax.jit, static_argnames=("interpret",))
def sweep_spikes_pallas_batched(
    y,             # [B, K]
    stim,          # [B, N, K]
    mu,            # [B, N]
    beta,          # [B, N]
    lam,           # [B, N, K]
    sig,           # [B]
    m0,            # [B, N]
    m1,            # [B, N]
    lam_mask,      # [B, K]
    powers,        # [P] (shared across maps)
    power_counts,  # [B, N, P]
    order,         # [B, N]
    msrmp_eff,     # [B]
    minimum_spike_count,  # scalar or [B]
    gate_active,   # scalar or [B]
    interpret=False,
):
    """B independent sweeps as one (B, N)-grid kernel.

    Each experiment keeps the sequential residual recursion of the
    single-map kernel (reset at j == 0). NOTE the experiment axis must
    NOT be declared ``parallel`` to Mosaic: the residual lives in a
    single VMEM scratch shared across grid steps, so splitting b across
    cores would race on it (a per-experiment scratch would be needed
    first).
    """
    B, N, K = lam.shape
    P = powers.shape[0]
    dtype = lam.dtype

    ones_b = jnp.ones((B,), dtype)
    scalars = jnp.stack(
        [
            jnp.asarray(sig, dtype) * ones_b,
            jnp.asarray(msrmp_eff, dtype) * ones_b,
            jnp.asarray(minimum_spike_count, dtype) * ones_b,
            jnp.asarray(gate_active, dtype) * ones_b,
        ],
        axis=1,
    )
    r_init = jnp.einsum("bn,bnk->bk", mu, lam)

    def _expt(b, j, order):
        del j, order
        return (b, 0, 0)

    def _row(b, j, order):
        return (b, order[b, j], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, N),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # powers
            pl.BlockSpec(memory_space=pltpu.SMEM),        # scalars
            # [B, 1, K] views with (1, 1, K) blocks: trailing block dims
            # equal the array dims, so any K satisfies Mosaic tiling (a
            # (1, K) block of [B, K] requires 8 | 1 on real TPU — the
            # interpret-mode tests never caught this)
            pl.BlockSpec((1, 1, K), _expt),               # y
            pl.BlockSpec((1, 1, K), _expt),               # lam_mask
            pl.BlockSpec((1, 1, K), _expt),               # r_init
            pl.BlockSpec((1, 1, 1, 1), _row),             # mu row
            pl.BlockSpec((1, 1, 1, 1), _row),             # beta row
            pl.BlockSpec((1, 1, 1, 1), _row),             # m0 row
            pl.BlockSpec((1, 1, 1, 1), _row),             # m1 row
            pl.BlockSpec((1, 1, 1, P), _row),             # counts row
            pl.BlockSpec((1, 1, 1, K), _row),             # lam row
            pl.BlockSpec((1, 1, 1, K), _row),             # stim row
        ],
        out_specs=pl.BlockSpec((1, 1, 1, K), _row),
        scratch_shapes=[pltpu.VMEM((K,), dtype)],
    )

    out = pl.pallas_call(
        _sweep_kernel_batched,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, 1, K), dtype),
        interpret=interpret,
    )(
        order.astype(jnp.int32),
        powers,
        scalars,
        y[:, None, :], lam_mask[:, None, :], r_init[:, None, :],
        mu[:, :, None, None], beta[:, :, None, None],
        m0[:, :, None, None], m1[:, :, None, None],
        power_counts.astype(dtype)[:, :, None, :],
        lam[:, :, None, :], stim[:, :, None, :],
    )
    return out[:, :, 0, :]


def _make_sweep_with_batching(interpret, single_fn=None):
    """The single-map Pallas sweep with a custom vmap rule.

    ``jax.vmap`` of the CAVIaR iteration (solvers/batched.caviar_many)
    hits this rule and lowers onto the (B, N)-grid kernel instead of
    falling back to the XLA sweep — the round-1 gap where batched fits
    lost the Pallas speedup (solvers/batched.py:12-16).

    ``single_fn`` overrides the unbatched implementation (the manual-DMA
    kernel for the flagship single-fit path); the batched rule always
    uses the (B, N)-grid kernel.
    """
    import jax.custom_batching

    single = single_fn if single_fn is not None else sweep_spikes_pallas

    @jax.custom_batching.custom_vmap
    def sweep(y, stim, mu, beta, lam, sig, m0, m1, lam_mask, powers,
              power_counts, order, msrmp_eff, minimum_spike_count,
              gate_active):
        return single(
            y, stim, mu, beta, lam, sig, m0, m1, lam_mask, powers,
            power_counts, order, msrmp_eff, minimum_spike_count, gate_active,
            interpret=interpret,
        )

    @sweep.def_vmap
    def _rule(axis_size, in_batched, y, stim, mu, beta, lam, sig, m0, m1,
              lam_mask, powers, power_counts, order, msrmp_eff,
              minimum_spike_count, gate_active):
        (b_y, b_stim, b_mu, b_beta, b_lam, b_sig, b_m0, b_m1, b_mask,
         b_powers, b_counts, b_order, b_msrmp, b_minc, b_gate) = in_batched
        if b_powers:
            powers = powers[0]  # power levels must agree across maps

        def bcast(x, batched):
            x = jnp.asarray(x)
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape
            )

        out = sweep_spikes_pallas_batched(
            bcast(y, b_y), bcast(stim, b_stim), bcast(mu, b_mu),
            bcast(beta, b_beta), bcast(lam, b_lam),
            bcast(sig, b_sig), bcast(m0, b_m0), bcast(m1, b_m1),
            bcast(lam_mask, b_mask), powers,
            bcast(power_counts, b_counts), bcast(order, b_order),
            bcast(msrmp_eff, b_msrmp),
            bcast(minimum_spike_count, b_minc), bcast(gate_active, b_gate),
            interpret=interpret,
        )
        return out, True

    return sweep


sweep_spikes_pallas_v = _make_sweep_with_batching(False)
sweep_spikes_pallas_interpret_v = _make_sweep_with_batching(True)
# flagship single-fit path: manual-DMA kernel (measured ~25% faster than
# the grid kernel at N=1000/K=20000); batched fits keep the grid kernel
sweep_spikes_pallas_dma_v = _make_sweep_with_batching(
    False, single_fn=sweep_spikes_pallas_dma
)
sweep_spikes_pallas_dma_interpret_v = _make_sweep_with_batching(
    True, single_fn=sweep_spikes_pallas_dma
)


# ---------------------------------------------------------------------------
# Blocked manual-DMA kernel: B=8-row blocks over the NATIVE 2-D layout.
#
# The row-at-a-time kernels above must take lam/stim as [N, 1, K] views
# (Mosaic row-DMA of a 2-D T(8,128) array is misaligned on dim 0), and
# XLA pays a physical [N, K] <-> [N, 1, K] relayout copy every iteration
# to feed them — profiled at 0.57 ms/iteration at the bench shape, ~20%
# of the whole CAVI step. DMA-ing 8-row-aligned BLOCKS of the plain 2-D
# array is tile-aligned, so this kernel needs no view at all, and the
# sequential chain shortens from N steps to N/8 (Jacobi within a block,
# Gauss-Seidel across blocks — the sweep_block_size=8 schedule of
# solvers/caviar.sweep_spikes, with block-consecutive row order).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("interpret", "depth", "block_size"))
def sweep_spikes_pallas_dma_blocked(
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
    border,
    msrmp_eff,
    minimum_spike_count,
    gate_active,
    interpret=False,
    depth=4,
    block_size=8,
):
    """Blocked manual-DMA sweep: visits blocks of ``block_size``
    consecutive rows in the order given by ``border`` (a permutation of
    block indices). Semantics == solvers.caviar.sweep_spikes with
    ``block_size`` and a block-consecutive row order. ``block_size``
    must be a multiple of 8 (Mosaic sublane tiling); N pads up with
    inert rows (zero mu/lam/stim) and K pads to a lane multiple of 128.

    Implemented as the batched kernel with a single experiment — the
    leading-axis views are metadata-only (trailing-dim tiling
    unchanged), so there is exactly one kernel body to maintain.
    """
    return sweep_spikes_pallas_dma_blocked_batched(
        y[None], stim[None], mu[None], beta[None], lam[None],
        sig, m0[None], m1[None], lam_mask[None], powers,
        power_counts[None], border[None], msrmp_eff,
        minimum_spike_count, gate_active,
        interpret=interpret, depth=depth, block_size=block_size,
    )[0]


# ---------------------------------------------------------------------------
# Batched blocked kernel: grid over experiments, manual block DMA within.
#
# The (B, N)-grid kernel above costs a very long Mosaic compile at
# production sizes (B*N grid steps; measured ~11 min cold for
# caviar_many at B=8/N=300 on a v5e) for a modest runtime edge over the
# XLA sweep. This variant keeps the grid at (B,) — one sequential grid
# step per experiment — and streams 8-row blocks through the manual DMA
# ring inside the body, exactly like the single-fit blocked kernel:
# compile time is that of ONE block body, runtime gains the blocked
# kernel's no-relayout + N/8-steps advantages for every experiment.
# ---------------------------------------------------------------------------


def _make_blocked_kernel_batched(N, P, B, D, NB):
    """Closure factory; same packed-SMEM layout as _make_blocked_kernel,
    one row per experiment."""
    O_MU, O_BETA, O_M0, O_M1 = 0, N, 2 * N, 3 * N
    O_CNT = 4 * N
    O_PW = O_CNT + N * P
    O_SC = O_PW + P

    def kernel(
        border_ref,       # [BE, NB] int32 SMEM — per-experiment block order
        packed_ref,       # [BE, 4N + N*P + P + 4] SMEM
        y_ref,            # (1, 1, K) VMEM — this experiment's charges
        lam_mask_ref,     # (1, 1, K) VMEM
        r_init_ref,       # (1, 1, K) VMEM
        lam_hbm,          # [BE, N, K] HBM (full)
        stim_hbm,         # [BE, N, K] HBM
        out_hbm,          # [BE, N, K] HBM
        r_ref,            # [K] VMEM scratch
        lam_buf,          # [D, B, K] VMEM ring
        stim_buf,         # [D, B, K] VMEM ring
        out_buf,          # [D, B, K] VMEM ring
        in_sems,          # DMA (D, 2)
        out_sems,         # DMA (D,)
    ):
        e = pl.program_id(0)

        def in_dmas(t, slot):
            n0 = border_ref[e, t] * B
            return (
                pltpu.make_async_copy(lam_hbm.at[e, pl.ds(n0, B)],
                                      lam_buf.at[slot], in_sems.at[slot, 0]),
                pltpu.make_async_copy(stim_hbm.at[e, pl.ds(n0, B)],
                                      stim_buf.at[slot], in_sems.at[slot, 1]),
            )

        def out_dma(t, slot):
            n0 = border_ref[e, t] * B
            return pltpu.make_async_copy(out_buf.at[slot],
                                         out_hbm.at[e, pl.ds(n0, B)],
                                         out_sems.at[slot])

        r_ref[...] = r_init_ref[0, 0, :]

        for s in range(min(D, NB)):
            for dma in in_dmas(s, s):
                dma.start()

        sig = packed_ref[e, O_SC + 0]
        msrmp_eff = packed_ref[e, O_SC + 1]
        min_count = packed_ref[e, O_SC + 2]
        gate_active = packed_ref[e, O_SC + 3]

        def body(t, _):
            slot = jax.lax.rem(t, D)
            for dma in in_dmas(t, slot):
                dma.wait()
            n0 = border_ref[e, t] * B

            lam_b = lam_buf[slot]
            stim_b = stim_buf[slot]
            mu_b = jnp.stack(
                [packed_ref[e, O_MU + n0 + j] for j in range(B)])
            beta_b = jnp.stack(
                [packed_ref[e, O_BETA + n0 + j] for j in range(B)])
            m0_b = jnp.stack(
                [packed_ref[e, O_M0 + n0 + j] for j in range(B)])
            m1_b = jnp.stack(
                [packed_ref[e, O_M1 + n0 + j] for j in range(B)])

            r = r_ref[...]
            r_excl = r[None, :] - mu_b[:, None] * lam_b
            quad = sig * (
                -2.0 * y_ref[0, 0, :][None, :] * mu_b[:, None]
                + 2.0 * mu_b[:, None] * r_excl
                + (mu_b * mu_b + beta_b * beta_b)[:, None]
            )
            est = (
                lam_mask_ref[0, 0, :][None, :]
                * (stim_b > 0).astype(lam_b.dtype)
                * jax.nn.sigmoid(m0_b[:, None] * stim_b - m1_b[:, None]
                                 - 0.5 * quad)
            )

            rates = []
            for p in range(P):
                s_p = jnp.sum(
                    jnp.where(stim_b == packed_ref[e, O_PW + p], est, 0.0),
                    axis=1)
                c_p = jnp.stack(
                    [packed_ref[e, O_CNT + (n0 + j) * P + p]
                     for j in range(B)])
                rates.append(s_p / (c_p + 1e-4 * (c_p == 0.0)))
            iso_max = rates[P - 1]
            acc = rates[P - 1]
            cnt = 1.0
            for p in range(P - 2, -1, -1):
                acc = acc + rates[p]
                cnt = cnt + 1.0
                iso_max = jnp.maximum(iso_max, acc / cnt)

            total = jnp.sum(est, axis=1)
            ok = jnp.logical_and(iso_max >= msrmp_eff, total >= min_count)
            gate = jnp.where(gate_active > 0, ok.astype(est.dtype),
                             jnp.ones((B,), est.dtype))

            new_lam = est * gate[:, None]
            new_mu = mu_b * gate
            r = r + jnp.sum(new_mu[:, None] * new_lam
                            - mu_b[:, None] * lam_b, axis=0)

            @pl.when(t >= D)
            def _():
                out_dma(t - D, slot).wait()

            out_buf[slot] = new_lam
            r_ref[...] = r
            out_dma(t, slot).start()

            @pl.when(t + D < NB)
            def _():
                for dma in in_dmas(t + D, slot):
                    dma.start()

            return 0

        jax.lax.fori_loop(0, NB, body, 0)

        def drain(j, _):
            t = NB - jnp.minimum(D, NB) + j
            out_dma(t, jax.lax.rem(t, D)).wait()
            return 0

        jax.lax.fori_loop(0, jnp.minimum(D, NB), drain, 0)

    return kernel


@partial(jax.jit, static_argnames=("interpret", "depth", "block_size"))
def sweep_spikes_pallas_dma_blocked_batched(
    y,             # [BE, K]
    stim,          # [BE, N, K]
    mu,            # [BE, N]
    beta,          # [BE, N]
    lam,           # [BE, N, K]
    sig,           # [BE]
    m0,            # [BE, N]
    m1,            # [BE, N]
    lam_mask,      # [BE, K]
    powers,        # [P] (shared)
    power_counts,  # [BE, N, P]
    border,        # [BE, NB] block orders
    msrmp_eff,     # [BE]
    minimum_spike_count,  # [BE] or scalar
    gate_active,   # [BE] or scalar
    interpret=False,
    depth=4,
    block_size=8,
):
    """BE independent blocked sweeps: grid (BE,), manual DMA within."""
    BE, N, K = lam.shape
    P = powers.shape[0]
    dtype = lam.dtype
    B = block_size
    if B % 8 != 0:
        # Mosaic's 8-sublane tiling constraint on the block DMAs; a
        # ValueError at trace time names the knob (and survives -O,
        # unlike an assert)
        raise ValueError(
            f"blocked sweep requires sweep_block_size % 8 == 0, got {B}")

    K128 = -(-K // 128) * 128
    bytes_per_slot = 3 * B * K128 * jnp.dtype(dtype).itemsize
    depth = max(2, min(depth, int(12e6 // max(bytes_per_slot, 1))))
    NB_pad = (-(-N // B)) * B
    if K128 != K:
        pad = K128 - K
        y = jnp.pad(y, ((0, 0), (0, pad)))
        lam_mask = jnp.pad(lam_mask, ((0, 0), (0, pad)))
        lam = jnp.pad(lam, ((0, 0), (0, 0), (0, pad)))
        stim = jnp.pad(stim, ((0, 0), (0, 0), (0, pad)))
    if NB_pad != N:
        rp = NB_pad - N
        lam = jnp.pad(lam, ((0, 0), (0, rp), (0, 0)))
        stim = jnp.pad(stim, ((0, 0), (0, rp), (0, 0)))
        mu = jnp.pad(mu, ((0, 0), (0, rp)))
        beta = jnp.pad(beta, ((0, 0), (0, rp)))
        m0 = jnp.pad(m0, ((0, 0), (0, rp)))
        m1 = jnp.pad(m1, ((0, 0), (0, rp)))
        power_counts = jnp.pad(power_counts, ((0, 0), (0, rp), (0, 0)))

    ones = jnp.ones((BE,), dtype)
    packed = jnp.concatenate([
        mu.astype(dtype), beta.astype(dtype), m0.astype(dtype),
        m1.astype(dtype),
        power_counts.astype(dtype).reshape(BE, -1),
        jnp.broadcast_to(powers.astype(dtype)[None], (BE, P)),
        jnp.stack([
            jnp.asarray(sig, dtype) * ones,
            jnp.asarray(msrmp_eff, dtype) * ones,
            jnp.asarray(minimum_spike_count, dtype) * ones,
            jnp.asarray(gate_active, dtype) * ones,
        ], axis=1),
    ], axis=1)
    r_init = jnp.einsum("en,enk->ek", mu, lam)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    anym = lambda: pl.BlockSpec(memory_space=pl.ANY)
    NBLK = NB_pad // B
    kernel = _make_blocked_kernel_batched(NB_pad, P, B, depth, NBLK)

    def _expt(e):
        return (e, 0, 0)

    out = pl.pallas_call(
        kernel,
        grid=(BE,),
        in_specs=[
            smem(),  # border
            smem(),  # packed
            pl.BlockSpec((1, 1, K128), _expt),  # y view [BE,1,K]
            pl.BlockSpec((1, 1, K128), _expt),  # lam_mask
            pl.BlockSpec((1, 1, K128), _expt),  # r_init
            anym(),  # lam (HBM)
            anym(),  # stim (HBM)
        ],
        out_specs=anym(),
        out_shape=jax.ShapeDtypeStruct((BE, NB_pad, K128), dtype),
        scratch_shapes=[
            pltpu.VMEM((K128,), dtype),
            pltpu.VMEM((depth, B, K128), dtype),
            pltpu.VMEM((depth, B, K128), dtype),
            pltpu.VMEM((depth, B, K128), dtype),
            pltpu.SemaphoreType.DMA((depth, 2)),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        interpret=interpret,
    )(
        border.astype(jnp.int32), packed,
        y[:, None, :], lam_mask[:, None, :], r_init[:, None, :],
        lam, stim,
    )
    return out[:, :N, :K]


def _make_blocked_sweep_with_batching(interpret, block_size):
    """Blocked single-fit kernel with a custom vmap rule onto the
    batched blocked kernel (so caviar_many's vmapped iteration keeps
    the blocked speedup; cf. _make_sweep_with_batching). block_size is
    a closure parameter (it shapes the kernel, so it must be static —
    wrappers are cached per (interpret, block_size))."""
    import jax.custom_batching

    @jax.custom_batching.custom_vmap
    def sweep(y, stim, mu, beta, lam, sig, m0, m1, lam_mask, powers,
              power_counts, border, msrmp_eff, minimum_spike_count,
              gate_active):
        return sweep_spikes_pallas_dma_blocked(
            y, stim, mu, beta, lam, sig, m0, m1, lam_mask, powers,
            power_counts, border, msrmp_eff, minimum_spike_count,
            gate_active, interpret=interpret, block_size=block_size,
        )

    @sweep.def_vmap
    def _rule(axis_size, in_batched, y, stim, mu, beta, lam, sig, m0, m1,
              lam_mask, powers, power_counts, border, msrmp_eff,
              minimum_spike_count, gate_active):
        (b_y, b_stim, b_mu, b_beta, b_lam, b_sig, b_m0, b_m1, b_mask,
         b_powers, b_counts, b_border, b_msrmp, b_minc, b_gate) = in_batched
        if b_powers:
            powers = powers[0]

        def bcast(x, batched):
            x = jnp.asarray(x)
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)

        out = sweep_spikes_pallas_dma_blocked_batched(
            bcast(y, b_y), bcast(stim, b_stim), bcast(mu, b_mu),
            bcast(beta, b_beta), bcast(lam, b_lam), bcast(sig, b_sig),
            bcast(m0, b_m0), bcast(m1, b_m1), bcast(lam_mask, b_mask),
            powers, bcast(power_counts, b_counts),
            bcast(border, b_border), bcast(msrmp_eff, b_msrmp),
            bcast(minimum_spike_count, b_minc), bcast(gate_active, b_gate),
            interpret=interpret, block_size=block_size,
        )
        return out, True

    return sweep


_blocked_sweep_cache = {}


def get_blocked_sweep_v(interpret, block_size):
    """Cached vmappable blocked-sweep wrapper for a given block size."""
    key = (bool(interpret), int(block_size))
    if key not in _blocked_sweep_cache:
        _blocked_sweep_cache[key] = _make_blocked_sweep_with_batching(*key)
    return _blocked_sweep_cache[key]
