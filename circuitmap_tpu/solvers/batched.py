"""Batched CAVIaR: fit many experiments as one vmapped program.

Production mapping sessions produce stacks of same-shaped problems —
cross-validation folds, repeated maps of the same field of view,
parameter sweeps. ``caviar_many`` vmaps the entire fused CAVI scan over
the experiment axis: one compile, one dispatch, B posteriors. (The
reference's answer to this workload is a SLURM job array — one process
per fit.)

Constraints: all experiments share trace/stim shapes and the same set
of stimulation power levels (the common case: one rig configuration).
On TPU the vmapped sweep lowers onto the batched (B, N)-grid Pallas
kernel via its custom-vmap rule (ops/sweep_pallas.py), so the batched
path keeps the single-fit Pallas speedup while amortising dispatch —
strictly better than sequential fits.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.charge import prepare_observations
from ._laplace import laplace_phi_update_jit
from .caviar import _resolve_sweep_impl, _run_caviar, reconnect_from_spontaneous


def caviar_many(
    y_pscs,
    stims,
    mu_prior,
    beta_prior,
    shape_prior,
    rate_prior,
    phi_prior,
    phi_cov_prior,
    iters=50,
    seeds=None,
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
    verbose=True,
):
    """Fit B experiments at once. y_pscs: [B, K, T]; stims: [B, N, K].

    Priors are shared across maps. Returns a list of B result dicts
    with keys mu/beta/lam/shape/rate/phi/phi_cov/z.

    With ``mesh`` the *experiment* axis shards over the mesh devices —
    each device vmaps over its local slice of experiments, with zero
    collectives (each fit is independent, so experiment sharding beats
    trial sharding here: no per-sweep psum latency, perfect scaling).
    This is the communication-free TPU replacement for the reference's
    SLURM job arrays (generate_loho_cv_slurm_scripts.py).
    """
    y_pscs = np.asarray(y_pscs, dtype=np.float32)
    stims_np = np.asarray(stims, dtype=np.float32)
    B, K, _T = y_pscs.shape

    levels0 = np.unique(stims_np[0])
    powers_np = levels0[levels0 > 0]
    for b in range(1, B):
        if not np.array_equal(np.unique(stims_np[b]), levels0):
            raise ValueError(
                "all experiments must share the same power levels: "
                f"experiment {b} has {np.unique(stims_np[b])}, "
                f"experiment 0 has {levels0}"
            )

    if verbose:
        print(f"Running CAVIaR on {B} experiments in one vmapped program.")

    y_dev = jnp.asarray(y_pscs, dtype=dtype)
    stim_dev = jnp.asarray(stims_np, dtype=dtype)
    ys, actives = jax.vmap(prepare_observations, in_axes=(0, None))(
        y_dev, y_xcorr_thresh
    )
    lam_masks = actives.astype(dtype)
    lam0 = jnp.where(stim_dev > 0, jnp.asarray(0.95, dtype), 0.0) * \
        lam_masks[:, None, :]
    powers = jnp.asarray(powers_np, dtype=dtype)

    if seeds is None:
        seeds = np.arange(B)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds, jnp.uint32))

    priors = (
        jnp.asarray(mu_prior, dtype),
        jnp.asarray(beta_prior, dtype),
        jnp.asarray(shape_prior, dtype),
        jnp.asarray(rate_prior, dtype),
        jnp.asarray(phi_prior, dtype),
        jnp.asarray(phi_cov_prior, dtype),
    )

    def one(y, stim, l0, mask, key):
        final, _ = _run_caviar(
            y, stim, l0, mask, powers, *priors, key,
            iters=int(iters),
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
            sweep_impl=_resolve_sweep_impl("auto", 1),
        )
        return final

    if mesh is None:
        finals = jax.vmap(one)(ys, stim_dev, lam0, lam_masks, keys)
    else:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import TRIAL_AXIS

        n_dev = mesh.devices.size
        pad_b = (-B) % n_dev
        if pad_b:
            def _pad(a):
                return jnp.concatenate(
                    [a, jnp.repeat(a[-1:], pad_b, axis=0)], axis=0
                )
            ys_p, stim_p, lam0_p, masks_p, keys_p = map(
                _pad, (ys, stim_dev, lam0, lam_masks, keys)
            )
        else:
            ys_p, stim_p, lam0_p, masks_p, keys_p = (
                ys, stim_dev, lam0, lam_masks, keys
            )
        from .caviar import CaviarState

        spec = P(TRIAL_AXIS)  # leading (experiment) axis over the 1-D mesh
        out_spec = CaviarState(
            mu=spec, beta=spec, lam=spec, shape=spec, rate=spec, phi=spec,
            phi_cov=spec, z=spec, spont_rate=spec, key=spec,
        )
        finals = jax.shard_map(
            jax.vmap(one),
            mesh=mesh,
            in_specs=(spec,) * 5,
            out_specs=out_spec,
            check_vma=False,
        )(ys_p, stim_p, lam0_p, masks_p, keys_p)
        if pad_b:
            finals = jax.tree_util.tree_map(lambda a: a[:B], finals)

    results = []
    for b in range(B):
        mu = finals.mu[b]
        beta = finals.beta[b]
        lam = finals.lam[b]
        z = finals.z[b]
        phi, phi_cov = finals.phi[b], finals.phi_cov[b]
        if fn_scan:
            mu, beta, lam, z, reconnected = reconnect_from_spontaneous(
                None, stims_np[b], lam, mu, beta, z,
                msrmp=msrmp, minimum_spike_count=minimum_spike_count,
                powers=powers_np, verbose=False,
            )
            if reconnected:
                phi, phi_cov = laplace_phi_update_jit(
                    jnp.asarray(lam, dtype), stim_dev[b],
                    priors[4], priors[5], powers=powers,
                )
        results.append({
            "mu": np.asarray(mu),
            "beta": np.asarray(beta),
            "lam": np.asarray(lam),
            "shape": np.asarray(finals.shape[b]),
            "rate": np.asarray(finals.rate[b]),
            "phi": np.asarray(phi),
            "phi_cov": np.asarray(phi_cov),
            "z": np.asarray(z),
        })
    return results
