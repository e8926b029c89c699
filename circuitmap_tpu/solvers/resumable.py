"""Checkpointable CAVIaR: segment-wise fitting with resume.

The reference has no inference-side resume (SURVEY.md §5) — a preempted
fit restarts from scratch. Here the CAVI carry is a flat pytree, so the
fit runs in segments of iterations with the carry checkpointed between
segments; a restarted process picks up at the last completed segment.
The segmented run is numerically identical to the single-scan solver
(the scan consumes explicit iteration indices, so gate delays and
penalty-shrink budgets line up exactly).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.charge import prepare_observations
from ..utils.checkpoint import load_state, save_state
from ._common import prepare_stim_and_init, prepare_traces
from ._laplace import laplace_phi_update_jit
from .caviar import (CaviarState, _run_caviar, _resolve_sweep_impl,
                     reconnect_from_spontaneous)


def caviar_resumable(
    y_psc,
    stim,
    mu_prior,
    beta_prior,
    shape_prior,
    rate_prior,
    phi_prior,
    phi_cov_prior,
    checkpoint_path,
    iters=50,
    checkpoint_every=10,
    seed=0,
    num_mc_samples=100,
    y_xcorr_thresh=1e-2,
    minimum_spike_count=3,
    delay_spont_est=1,
    msrmp=0.3,
    scale_factor=0.75,
    penalty=5e0,
    max_backtrack_iters=20,
    tol=0.05,
    spont_orthogonality=0.1,
    fn_scan=True,
    dtype=jnp.float32,
    analytic_mc=False,
    verbose=True,
):
    """CAVIaR with periodic state checkpoints + resume.

    If ``checkpoint_path`` exists, resumes from the iteration recorded
    in it. Returns the same tuple as solvers.caviar (histories None).
    """
    # np.savez appends .npz; normalise so the resume check finds the file
    if not str(checkpoint_path).endswith(".npz"):
        checkpoint_path = str(checkpoint_path) + ".npz"
    y_psc = prepare_traces(y_psc, dtype)
    y, active = prepare_observations(y_psc, y_xcorr_thresh)
    stim, lam_mask, lam0, stim_np, powers_np = prepare_stim_and_init(
        stim, active, dtype
    )
    powers = jnp.asarray(powers_np, dtype=dtype)

    start = 0
    state = None
    if os.path.exists(checkpoint_path):
        ck = load_state(checkpoint_path)
        start = int(ck.pop("completed_iters"))
        state = CaviarState(**{
            k: jnp.asarray(v, dtype if v.dtype.kind == "f" else None)
            for k, v in ck.items()
        })
        if verbose:
            print(f"Resuming CAVIaR from iteration {start} ({checkpoint_path}).")

    static = dict(
        num_mc_samples=int(num_mc_samples),
        minimum_spike_count=int(minimum_spike_count),
        delay_spont_est=int(delay_spont_est),
        msrmp=float(msrmp),
        scale_factor=float(scale_factor),
        penalty=float(penalty),
        max_backtrack_iters=int(max_backtrack_iters),
        tol=float(tol),
        spont_orthogonality=float(spont_orthogonality),
        analytic_mc=bool(analytic_mc),
        save_histories=False,
        sweep_block_size=1,
        sweep_impl=_resolve_sweep_impl("auto", 1),
    )
    priors = (
        jnp.asarray(mu_prior, dtype),
        jnp.asarray(beta_prior, dtype),
        jnp.asarray(shape_prior, dtype),
        jnp.asarray(rate_prior, dtype),
        jnp.asarray(phi_prior, dtype),
        jnp.asarray(phi_cov_prior, dtype),
    )
    key = jax.random.PRNGKey(seed)

    while start < iters:
        seg = min(checkpoint_every, iters - start)
        state, _ = _run_caviar(
            y, stim, lam0, lam_mask, powers, *priors, key, state,
            iters=seg, start_iter=start, **static,
        )
        start += seg
        save_state(checkpoint_path, {**state._asdict(),
                                     "completed_iters": np.asarray(start)})
        if verbose:
            print(f"checkpointed after iteration {start}/{iters}")

    mu, beta, lam, z = state.mu, state.beta, state.lam, state.z
    phi, phi_cov = state.phi, state.phi_cov
    if fn_scan:
        mu, beta, lam, z, reconnected = reconnect_from_spontaneous(
            np.asarray(y), stim_np, lam, mu, beta, z,
            msrmp=msrmp, minimum_spike_count=minimum_spike_count,
            verbose=verbose,
        )
        if reconnected:
            phi, phi_cov = laplace_phi_update_jit(
                jnp.asarray(lam, dtype), stim,
                jnp.asarray(phi_prior, dtype), jnp.asarray(phi_cov_prior, dtype),
                powers=powers,
            )

    return (mu, beta, lam, state.shape, state.rate, phi, phi_cov, z, None,
            *[None] * 8)
