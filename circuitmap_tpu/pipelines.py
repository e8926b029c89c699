"""Experimental-data analysis pipelines: shared building blocks.

The reference implements these inline in its 1v10 and pair-patch
scripts (run_1v10_pipeline_reformatted.py:15-61,
run_pair_patch_pipeline.py:210-241); here they are a tested library:

  * trial splitting (single-target vs ensemble),
  * per-connection PSC waveforms via positive ridge regression,
  * duplicate-connection merging (same cell mapped at adjacent imaging
    planes) by waveform similarity + 3-D proximity clustering,
  * loose-patch ("LP") ground-truth spike detection and per-power
    spike-rate comparison against the model posteriors.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Trial splitting
# ---------------------------------------------------------------------------


def split_single_ensemble(stim_matrix):
    """Indices of single-target and multi-target trials
    (run_1v10_pipeline_reformatted.py:197-200)."""
    n_targets = np.sum(np.asarray(stim_matrix) > 0, axis=0)
    return np.flatnonzero(n_targets == 1), np.flatnonzero(n_targets > 1)


# ---------------------------------------------------------------------------
# Ridge waveforms
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("iters",))
def _positive_ridge(X, Y, alpha, iters=300):
    """min_W ||X @ W - Y||^2 + alpha ||W||^2 s.t. W >= 0.

    X: [K, n]; Y: [K, T]; W: [n, T]. Projected gradient with 1/L step —
    the sklearn Ridge(positive=True) equivalent used for waveform
    extraction (run_1v10_pipeline_reformatted.py:38-43).
    """
    XtX = X.T @ X + alpha * jnp.eye(X.shape[1], dtype=X.dtype)
    XtY = X.T @ Y
    L = jnp.linalg.norm(XtX, ord=2) + 1e-8
    step = 1.0 / L

    def body(W, _):
        W = W - step * (XtX @ W - XtY)
        return jnp.maximum(W, 0.0), None

    W0 = jnp.zeros((X.shape[1], Y.shape[1]), dtype=X.dtype)
    W, _ = jax.lax.scan(body, W0, None, length=iters)
    return W


def connection_waveforms(psc, stim_matrix, state, alpha=1e-3):
    """Per-connection PSC waveform estimates.

    Regresses the demixed traces of all trials touching any inferred
    connection onto the spike posteriors of the connected cells.
    Returns (connected_idx [n], waveforms [n, T]).
    """
    mu = np.asarray(state["mu"])
    lam = np.asarray(state["lam"])
    psc = np.asarray(psc)
    stim = np.asarray(stim_matrix)
    cnx = np.flatnonzero(mu)
    if cnx.size == 0:
        return cnx, np.zeros((0, psc.shape[1]))
    locs = np.flatnonzero((stim[cnx] > 0).any(axis=0))
    W = _positive_ridge(
        jnp.asarray(lam[cnx][:, locs].T, jnp.float32),
        jnp.asarray(psc[locs], jnp.float32),
        jnp.asarray(alpha, jnp.float32),
    )
    return cnx, np.asarray(W)


# ---------------------------------------------------------------------------
# Duplicate merging
# ---------------------------------------------------------------------------


def _pairwise_sq_dist(points):
    d = points[:, None, :] - points[None, :, :]
    return np.sum(d * d, axis=-1)


def _plane_adjacency(plane_of, planes):
    idx = np.array([np.flatnonzero(planes == p)[0] for p in plane_of])
    return (np.abs(idx[:, None] - idx[None, :]) <= 1).astype(int)


def merge_duplicate_connections(
    psc, stim_matrix, state, targets, img=None, mse_threshold=0.1,
    dist_threshold=15.0, waveform_alpha=1e-3,
):
    """Cluster inferred connections that are the same physical cell.

    Holographic target lists repeat cells across adjacent imaging
    planes; a cell mapped twice shows near-identical PSC waveforms at
    nearby (x, y) on neighbouring z-planes. Clusters such duplicates
    and picks one representative per cluster — the brightest pixel when
    an image stack is supplied, else the strongest weight (reference
    merge_duplicates, run_1v10_pipeline_reformatted.py:45-61).

    Returns (representatives, clusters): arrays of target indices.
    """
    targets = np.asarray(targets)
    planes = np.unique(targets[:, -1])
    mu = np.asarray(state["mu"])
    cnx, waveforms = connection_waveforms(psc, stim_matrix, state,
                                          alpha=waveform_alpha)
    n = cnx.size
    if n == 0:
        return np.array([], dtype=int), []

    wf_err = _pairwise_sq_dist(waveforms)
    xy_close = _pairwise_sq_dist(targets[cnx][:, :2]) < dist_threshold**2
    z_adj = _plane_adjacency(targets[cnx][:, -1], planes)
    duplicate = (wf_err < mse_threshold) & xy_close & (z_adj > 0)

    clusters = {tuple(sorted(cnx[np.flatnonzero(row)].tolist())) for row in duplicate}
    clusters = [list(c) for c in clusters]

    reps = []
    for cluster in clusters:
        if img is not None:
            brightness = []
            for c in cluster:
                tar = targets[c].astype(int)
                depth = int(np.flatnonzero(planes == targets[c][-1])[0])
                brightness.append(float(np.asarray(img)[0][depth][tar[0], tar[1]]))
            reps.append(cluster[int(np.argmax(brightness))])
        else:
            reps.append(cluster[int(np.argmax(mu[cluster]))])
    return np.asarray(reps, dtype=int), clusters


# ---------------------------------------------------------------------------
# Loose-patch ground truth (pair-patch experiments)
# ---------------------------------------------------------------------------


def detect_lp_spikes(psp, spike_threshold=0.1, window=(100, 240)):
    """Threshold detection of presynaptic spikes from loose-patch traces.

    psp: [K, T] presynaptic patch recording. Returns boolean [K]
    (reference run_pair_patch_pipeline.py:213-220).
    """
    psp = np.asarray(psp)
    seg = np.abs(psp[:, window[0]:window[1]])
    return seg.max(axis=1) > spike_threshold


def find_patched_cell(stim_matrix, psp, spike_threshold=0.1, window=(100, 240)):
    """Which mapped cell is the patched one: the cell whose stim trials
    coincide with the most LP-detected spikes."""
    stim = np.asarray(stim_matrix)
    spikes = detect_lp_spikes(psp, spike_threshold, window)
    # cast before the matmul: numpy bool @ bool is a LOGICAL dot whose
    # result caps at 1, which silently turns "most coincident spikes"
    # into "first cell with ANY coincident spike"
    counts = (stim > 0).astype(float) @ spikes.astype(float)
    return int(np.argmax(counts))


def power_curve_comparison(stim_matrix, lam, lp_spikes, cell, trial_subset=None):
    """Per-power (LP spike rate, posterior spike rate) for one cell.

    ``stim_matrix`` / ``lp_spikes`` live in the full experiment's trial
    space; ``lam`` is the posterior of a model fitted on
    ``trial_subset`` (its columns are subset-local). Returns dict of
    arrays keyed power / lp_rate / lp_std / model_rate / model_std
    (reference run_pair_patch_pipeline.py:229-246).
    """
    stim = np.asarray(stim_matrix)
    lam = np.asarray(lam)
    lp = np.asarray(lp_spikes, dtype=float)
    if trial_subset is None:
        trial_subset = np.arange(stim.shape[1])
    trial_subset = np.asarray(trial_subset)
    stim_cell_local = stim[cell, trial_subset]
    powers = np.unique(stim)[1:]
    out = {k: np.zeros(len(powers)) for k in
           ("power", "lp_rate", "lp_std", "model_rate", "model_std")}
    for i, p in enumerate(powers):
        local = np.flatnonzero(stim_cell_local == p)
        out["power"][i] = p
        if local.size:
            glob = trial_subset[local]
            out["lp_rate"][i] = lp[glob].mean()
            out["lp_std"][i] = lp[glob].std()
            out["model_rate"][i] = lam[cell, local].mean()
            out["model_std"][i] = lam[cell, local].std()
    return out
