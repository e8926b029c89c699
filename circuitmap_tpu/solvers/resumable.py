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
from ._common import (prepare_stim_and_init, prepare_traces,
                      warn_data_thin_design,
                      warn_single_chip_envelope)
from ._laplace import laplace_phi_update_jit
from .caviar import (CaviarState, _run_caviar, _resolve_laplace_impl,
                     _resolve_sweep,
                     reconnect_from_spontaneous)


def _state_to_host(state):
    """CaviarState -> numpy dict in TWO device pulls (the small fields
    batched into one transfer + lam on its own), instead of one tunnel
    round trip per field at every segment boundary."""
    from .caviar import _pull_host_batch

    N = state.mu.shape[0]
    small = _pull_host_batch(
        state.mu, state.beta, state.phi, state.phi_cov, state.z,
        state.shape, state.rate, state.spont_rate,
    )
    return dict(
        mu=small[0], beta=small[1],
        phi=small[2].reshape(N, 2), phi_cov=small[3].reshape(N, 2, 2),
        z=small[4], shape=small[5].reshape(()), rate=small[6].reshape(()),
        spont_rate=small[7].reshape(()),
        lam=np.asarray(state.lam),
        key=np.asarray(state.key),
    )


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
    mesh=None,
    powers=None,
    sweep_impl="auto",
    sweep_block_size="auto",
    laplace_impl="auto",
    trace_wire=None,
    verbose=True,
):
    """CAVIaR with periodic state checkpoints + resume.

    If ``checkpoint_path`` exists, resumes from the iteration recorded
    in it. Returns the same tuple as solvers.caviar (histories None —
    per-iteration histories across segments are not retained). With
    ``mesh`` the fit runs trial-sharded (parallel.caviar_sharded's
    execution model) in checkpointed segments — preemptible multi-chip
    fits; the checkpoint stores the gathered global state at the true
    trial count, so a resumed run may even use a different mesh size.
    ``powers``/``sweep_impl``/``sweep_block_size``/``laplace_impl``/
    ``trace_wire`` match solvers.caviar; the sharded path honours
    laplace_impl and trace_wire too (like parallel.caviar_sharded) but
    ignores the sweep knobs — its sweep is the psum formulation.
    """
    if int(checkpoint_every) < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    if int(iters) < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # np.savez appends .npz; normalise so the resume check finds the file
    if not str(checkpoint_path).endswith(".npz"):
        checkpoint_path = str(checkpoint_path) + ".npz"
    if mesh is not None:
        return _caviar_resumable_sharded(
            y_psc, stim, mu_prior, beta_prior, shape_prior, rate_prior,
            phi_prior, phi_cov_prior, checkpoint_path, mesh,
            iters=iters, checkpoint_every=checkpoint_every, seed=seed,
            num_mc_samples=num_mc_samples, y_xcorr_thresh=y_xcorr_thresh,
            minimum_spike_count=minimum_spike_count,
            delay_spont_est=delay_spont_est, msrmp=msrmp,
            scale_factor=scale_factor, penalty=penalty,
            max_backtrack_iters=max_backtrack_iters, tol=tol,
            spont_orthogonality=spont_orthogonality, fn_scan=fn_scan,
            dtype=dtype, analytic_mc=analytic_mc, powers=powers,
            laplace_impl=laplace_impl, trace_wire=trace_wire,
            verbose=verbose,
        )
    warn_single_chip_envelope(*np.shape(stim), what="caviar_resumable()",
                              dtype=dtype)
    y_psc = prepare_traces(y_psc, dtype, trace_wire=trace_wire)
    y, active = prepare_observations(y_psc, y_xcorr_thresh)
    stim, lam_mask, lam0, stim_np, powers_np, powers_dev_np, power_counts_np = (
        prepare_stim_and_init(stim, active, dtype, powers=powers)
    )
    warn_data_thin_design(power_counts_np, stim.shape[1],
                          what="caviar_resumable()")
    # device powers from the uploaded-stim level table; powers_np keeps
    # original precision for the host reconnect scan (f64 contract)
    powers = jnp.asarray(powers_dev_np, dtype=dtype)

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

    block_size, sweep_impl_res = _resolve_sweep(
        sweep_impl, sweep_block_size, k=stim.shape[1])
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
        sweep_block_size=block_size,
        sweep_impl=sweep_impl_res,
        laplace_impl=_resolve_laplace_impl(laplace_impl, dtype),
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
        state, _, _ = _run_caviar(
            y, stim, lam0, lam_mask, powers, *priors, key, state,
            iters=seg, start_iter=start, **static,
        )
        start += seg
        # state is already at the true K (_run_caviar strips its own
        # 128-alignment padding before returning)
        save_state(checkpoint_path, {**_state_to_host(state),
                                     "completed_iters": np.asarray(start)})
        if verbose:
            print(f"checkpointed after iteration {start}/{iters}")

    mu, beta, lam, z = state.mu, state.beta, state.lam, state.z
    phi, phi_cov = state.phi, state.phi_cov
    if fn_scan:
        mu, beta, lam, z, reconnected = reconnect_from_spontaneous(
            None, stim_np, lam, mu, beta, z,
            msrmp=msrmp, minimum_spike_count=minimum_spike_count,
            powers=powers_np, power_counts=power_counts_np, verbose=verbose,
        )
        if reconnected:
            phi, phi_cov = laplace_phi_update_jit(
                jnp.asarray(lam, dtype), stim,
                jnp.asarray(phi_prior, dtype), jnp.asarray(phi_cov_prior, dtype),
                powers=powers,
            )

    return (mu, beta, lam, state.shape, state.rate, phi, phi_cov, z, None,
            *[None] * 8)


def _caviar_resumable_sharded(
    y_psc, stim, mu_prior, beta_prior, shape_prior, rate_prior,
    phi_prior, phi_cov_prior, checkpoint_path, mesh, *,
    iters, checkpoint_every, seed, num_mc_samples, y_xcorr_thresh,
    minimum_spike_count, delay_spont_est, msrmp, scale_factor, penalty,
    max_backtrack_iters, tol, spont_orthogonality, fn_scan, dtype,
    analytic_mc, powers, verbose, laplace_impl="auto", trace_wire=None,
):
    """Trial-sharded segmented fit with checkpoint/resume.

    Segments run parallel.sharded._run_sharded with start_iter offsets
    (iteration indices line up exactly with an unsegmented run, so gate
    delays match); the checkpoint stores the GLOBAL (gathered) CaviarState
    plus the completed-iteration count, so a resumed run is independent
    of mesh size.
    """
    from ..parallel.sharded import _prep_sharded, _run_sharded

    prep = _prep_sharded(y_psc, stim, mesh, dtype, y_xcorr_thresh,
                         powers=powers, trace_wire=trace_wire)
    K = prep["K"]
    stim_np = prep["stim_np"]
    powers_np = prep["powers_np"]

    start = 0
    state = None
    if os.path.exists(checkpoint_path):
        ck = load_state(checkpoint_path)
        start = int(ck.pop("completed_iters"))
        # the checkpoint stores trial-shaped state at the TRUE K; re-pad
        # to THIS mesh's multiple so a fit may resume on a different
        # mesh size (padded trials are zero in any unsegmented run)
        if prep["pad"]:
            ck["lam"] = np.pad(np.asarray(ck["lam"]),
                               ((0, 0), (0, prep["pad"])))
            ck["z"] = np.pad(np.asarray(ck["z"]), (0, prep["pad"]))
        state = CaviarState(**{
            k: jnp.asarray(v, dtype if np.asarray(v).dtype.kind == "f"
                           else None)
            for k, v in ck.items()
        })
        if verbose:
            print(f"Resuming sharded CAVIaR from iteration {start} "
                  f"({checkpoint_path}).")

    priors = (
        jnp.asarray(mu_prior, dtype),
        jnp.asarray(beta_prior, dtype),
        jnp.asarray(shape_prior, dtype),
        jnp.asarray(rate_prior, dtype),
        jnp.asarray(phi_prior, dtype),
        jnp.asarray(phi_cov_prior, dtype),
    )
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
        laplace_impl=_resolve_laplace_impl(laplace_impl, dtype),
    )
    key = jax.random.PRNGKey(seed)

    while start < iters:
        seg = min(checkpoint_every, iters - start)
        state, _ = _run_sharded(
            *prep["device_args"], *priors, key, state,
            mesh=mesh, iters=seg, start_iter=start, **static,
        )
        start += seg
        # store trial-shaped state trimmed to the true K: the checkpoint
        # must be independent of this mesh's padding so it can resume on
        # any mesh size (the advertised contract)
        host = _state_to_host(state)
        host["lam"] = host["lam"][:, :K]
        host["z"] = host["z"][:K]
        save_state(checkpoint_path,
                   {**host, "completed_iters": np.asarray(start)})
        if verbose:
            print(f"checkpointed after iteration {start}/{iters}")

    mu, beta = state.mu, state.beta
    lam = state.lam[:, :K]
    z = state.z[:K]
    phi, phi_cov = state.phi, state.phi_cov
    if fn_scan:
        mu, beta, lam, z, reconnected = reconnect_from_spontaneous(
            None, stim_np[:, :K], lam, mu, beta, z,
            msrmp=msrmp, minimum_spike_count=minimum_spike_count,
            powers=powers_np, verbose=verbose,
        )
        if reconnected:
            phi, phi_cov = laplace_phi_update_jit(
                jnp.asarray(lam, dtype), jnp.asarray(stim_np[:, :K], dtype),
                jnp.asarray(phi_prior, dtype), jnp.asarray(phi_cov_prior, dtype),
                powers=jnp.asarray(powers_np, dtype),
            )

    return (mu, beta, lam, state.shape, state.rate, phi, phi_cov, z, None,
            *[None] * 8)
