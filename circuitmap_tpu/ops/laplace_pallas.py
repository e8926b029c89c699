"""Pallas TPU kernel for the batched Laplace power-curve refit.

``solvers/_laplace.laplace_from_stats`` runs 10 damped-Newton steps with
a 41-candidate Armijo grid, vmapped over N neurons on [P+1]-sized bucket
statistics. As XLA ops this is latency-bound, not compute-bound: every
Newton step is ~dozens of tiny fusions on [N, 4]-ish arrays, each paying
launch overhead, profiled at ~0.8 ms/iteration at N=1000 — the largest
single component of the CAVI fit after the hot-path fusions. The FLOPs
are trivial (~10^7), so the right shape is ONE kernel launch per CAVI
iteration with the whole recursion unrolled on VMEM-resident vectors.

Layout: neurons along lanes. All per-neuron state lives in [rows, NB]
blocks (phi [2, NB], gradient/Hessian terms [1, NB], the Armijo grid
[41, NB]); the bucket statistics are [P+1, NB]. Every op vectorises
across the 128-lane VPU with the P+1 levels and 41 backtracking steps
unrolled at compile time (both are small compile-time constants).

Numerics are bit-compatible with the XLA formulation: same objective
(log_sigmoid likelihood regrouped by bucket, log-barrier, prior
quadratic with the adjugate 2x2 inverse), same first-acceptance Armijo
selection including the NaN-rejection of infeasible (negative-phi)
candidates, same "take beta^MAX step when nothing accepts" fallback,
and the returned covariance is the Hessian inverse from the FINAL
Newton direction evaluation (i.e. at phi_9), exactly as the scan carry
in the XLA version. Reference behaviour: optimise/caviar.py:246-316.

Float32 only (TPU). The XLA path remains the fallback for f64 parity
fits and CPU runs. Vmapped callers (caviar_many) DO run the kernel:
the custom_vmap rule below flattens the B x N independent per-neuron
solves into B*N lanes of one launch.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers import _laplace as _L


def _laplace_kernel(P1, levels_ref, S_ref, C_ref, pp_ref, prec_ref,
                    phi_out_ref, cov_out_ref):
    """One lane-block of neurons: full Newton/Armijo solve in VMEM.

    levels_ref: [P1] SMEM; S/C: [P1, NB]; pp (phi prior): [2, NB];
    prec (packed symmetric prior precision): [3, NB] (p00, p01, p11).
    Outputs: phi [2, NB]; cov [3, NB] (c00, c01, c11).
    """
    t = _L.BARRIER_T
    lev = [levels_ref[p] for p in range(P1)]
    S = [S_ref[p:p + 1, :] for p in range(P1)]
    C = [C_ref[p:p + 1, :] for p in range(P1)]
    prior0 = pp_ref[0:1, :]
    prior1 = pp_ref[1:2, :]
    p00 = prec_ref[0:1, :]
    p01 = prec_ref[1:2, :]
    p11 = prec_ref[2:3, :]

    # [SG, 1] step grid built in-kernel (captured array constants are
    # not allowed); beta = 0.5 so the powers are exact either way. The
    # give-up fallback is the grid's last entry, beta^MAX.
    steps_col = jnp.float32(_L.BACKTRACK_BETA) ** jax.lax.broadcasted_iota(
        jnp.int32, (_L.MAX_BACKTRACK + 1, 1), 0
    ).astype(jnp.float32)
    step_min = np.float32(_L.BACKTRACK_BETA ** _L.MAX_BACKTRACK)

    def objective(c0, c1):
        # c0/c1: [1, NB] or [SG, NB]; same algebra as the XLA version
        # including nan_to_num on the per-bucket log-likelihood
        acc = jnp.zeros_like(c0)
        for p in range(P1):
            x = c0 * lev[p] - c1
            ll = S[p] * jax.nn.log_sigmoid(x) \
                + (C[p] - S[p]) * jax.nn.log_sigmoid(-x)
            acc = acc - jnp.nan_to_num(ll)
        acc = acc - (jnp.log(c0) + jnp.log(c1)) / t
        d0 = c0 - prior0
        d1 = c1 - prior1
        return acc + 0.5 * (p00 * d0 * d0 + 2.0 * p01 * d0 * d1
                            + p11 * d1 * d1)

    phi0, phi1 = prior0, prior1
    hi00 = jnp.zeros_like(phi0)
    hi01 = jnp.zeros_like(phi0)
    hi11 = jnp.zeros_like(phi0)

    for _ in range(_L.NEWTON_STEPS):
        # Newton direction at phi (gradient + 2x2 adjugate inverse)
        g0 = jnp.zeros_like(phi0)
        g1 = jnp.zeros_like(phi0)
        h00 = jnp.zeros_like(phi0)
        h01 = jnp.zeros_like(phi0)
        h11 = jnp.zeros_like(phi0)
        for p in range(P1):
            f = jax.nn.sigmoid(phi0 * lev[p] - phi1)
            resid = S[p] - C[p] * f
            g0 = g0 - lev[p] * resid
            g1 = g1 + resid
            w = C[p] * f * (1.0 - f)
            h00 = h00 + (lev[p] * lev[p]) * w
            h01 = h01 - lev[p] * w
            h11 = h11 + w
        d0 = phi0 - prior0
        d1 = phi1 - prior1
        g0 = g0 + p00 * d0 + p01 * d1 - 1.0 / (t * phi0)
        g1 = g1 + p01 * d0 + p11 * d1 - 1.0 / (t * phi1)
        h00 = h00 + p00 + 1.0 / (t * phi0 * phi0)
        h01 = h01 + p01
        h11 = h11 + p11 + 1.0 / (t * phi1 * phi1)
        det = h00 * h11 - h01 * h01
        hi00 = h11 / det
        hi01 = -h01 / det
        hi11 = h00 / det
        v0 = -(hi00 * g0 + hi01 * g1)
        v1 = -(hi01 * g0 + hi11 * g1)

        # Armijo grid, every candidate at once: [SG, NB]
        c0 = phi0 + steps_col * v0
        c1 = phi1 + steps_col * v1
        lhs = objective(c0, c1)
        gv = g0 * v0 + g1 * v1
        rhs = objective(phi0, phi1) + _L.ARMIJO_ALPHA * steps_col * gv
        ok = jnp.logical_not(jnp.isnan(lhs)) & (lhs <= rhs)

        # first acceptance: the step grid is strictly decreasing, so the
        # first accepted index has the LARGEST step value — a masked max
        # over the grid axis IS the argmax/where selection of the XLA
        # version (exact: the steps are powers of 0.5), with the
        # beta^MAX fallback when nothing accepts
        sel = jnp.max(jnp.where(ok, steps_col * jnp.ones_like(lhs), 0.0),
                      axis=0, keepdims=True)
        sel = jnp.where(sel > 0.0, sel, step_min)
        phi0 = phi0 + sel * v0
        phi1 = phi1 + sel * v1

    phi_out_ref[0:1, :] = phi0
    phi_out_ref[1:2, :] = phi1
    cov_out_ref[0:1, :] = hi00
    cov_out_ref[1:2, :] = hi01
    cov_out_ref[2:3, :] = hi11


@partial(jax.jit, static_argnames=("interpret",))
def laplace_from_stats_pallas(S, C, levels, phi_prior, phi_cov_prior,
                              interpret=False):
    """Drop-in for ``solvers/_laplace.laplace_from_stats`` on TPU (f32).

    S, C: [N, P+1]; levels: [P+1]; phi_prior: [N, 2];
    phi_cov_prior: [N, 2, 2] (symmetric). Returns (phi [N, 2],
    phi_cov [N, 2, 2]).
    """
    N, P1 = S.shape
    dt = S.dtype

    # prior precision via the same adjugate inverse as the XLA path,
    # packed symmetric (cheap [N, 2, 2] elementwise work, fused by XLA)
    prec = jax.vmap(_L._inv2x2)(phi_cov_prior)
    prec_pk = jnp.stack([prec[:, 0, 0], prec[:, 0, 1], prec[:, 1, 1]])  # [3,N]

    lane_block = 1024 if N > 1024 else max(128, -(-N // 128) * 128)
    n_pad = -(-N // lane_block) * lane_block
    pad = n_pad - N

    def lanes(x):  # [N, rows] -> padded [rows, n_pad]
        x = jnp.pad(x, ((0, pad), (0, 0)))
        return x.T

    St = lanes(S)
    Ct = lanes(C)
    ppt = lanes(phi_prior)
    prect = jnp.pad(prec_pk, ((0, 0), (0, pad)))

    grid = (n_pad // lane_block,)
    blk = lambda rows: pl.BlockSpec((rows, lane_block), lambda i: (0, i))
    phi_t, cov_t = pl.pallas_call(
        partial(_laplace_kernel, P1),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # levels
            blk(P1),                                # S
            blk(P1),                                # C
            blk(2),                                 # phi prior
            blk(3),                                 # packed precision
        ],
        out_specs=[blk(2), blk(3)],
        out_shape=[
            jax.ShapeDtypeStruct((2, n_pad), dt),
            jax.ShapeDtypeStruct((3, n_pad), dt),
        ],
        interpret=interpret,
    )(levels, St, Ct, ppt, prect)

    phi = phi_t[:, :N].T  # [N, 2]
    c00, c01, c11 = cov_t[0, :N], cov_t[1, :N], cov_t[2, :N]
    cov = jnp.stack(
        [jnp.stack([c00, c01], axis=-1), jnp.stack([c01, c11], axis=-1)],
        axis=-2,
    )  # [N, 2, 2]
    return phi, cov


def _make_with_batching(interpret):
    @jax.custom_batching.custom_vmap
    def fn(S, C, levels, phi_prior, phi_cov_prior):
        return laplace_from_stats_pallas(S, C, levels, phi_prior,
                                         phi_cov_prior, interpret=interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, S, C, levels, phi_prior, phi_cov_prior):
        # the Newton solve has no cross-neuron coupling, so a batch of B
        # experiments is just B*N independent lanes: flatten, run the
        # SAME one-launch kernel, unflatten. The vmapped-XLA
        # alternative keeps the full latency-bound recursion (~0.8 ms
        # per CAVI iteration regardless of B — op count is invariant
        # under vmap), which dominated caviar_many's iteration.
        b_S, b_C, b_lev, b_pp, b_pc = in_batched
        if b_lev:
            # CONTRACT: the level table must be SHARED across the batch
            # (caviar_many validates this host-side before any fit, in
            # batched._upload_plan). Taking row 0 of a genuinely
            # heterogeneous batch would silently solve every experiment
            # against experiment 0's levels — new batched callers must
            # validate like caviar_many does or keep levels unbatched.
            levels = levels[0]

        def bcast(x, batched):
            x = jnp.asarray(x)
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)

        S = bcast(S, b_S)
        C = bcast(C, b_C)
        pp = bcast(phi_prior, b_pp)
        pc = bcast(phi_cov_prior, b_pc)
        B, N, P1 = S.shape
        phi, cov = laplace_from_stats_pallas(
            S.reshape(B * N, P1), C.reshape(B * N, P1), levels,
            pp.reshape(B * N, 2), pc.reshape(B * N, 2, 2),
            interpret=interpret,
        )
        out = (phi.reshape(B, N, 2), cov.reshape(B, N, 2, 2))
        return out, (True, True)

    return fn


laplace_from_stats_pallas_v = _make_with_batching(False)
laplace_from_stats_pallas_interpret_v = _make_with_batching(True)
