"""CoSaMP: compressive-sampling matching pursuit baseline.

Greedy sparse recovery of weights from integrated charges,
``y ≈ A.T @ x`` with A the (normalised) spike/stimulus design. Mirrors
the behaviour of the reference baseline (optimise/cosamp.py:5-97, itself
adapted from mr_utils): support expansion by the 2k largest correlations,
restricted least squares, pruning to k, residual update, relative-residual
stopping rule. Returns ``(x_hat, elapsed_seconds)`` like the reference.

This is a host-side greedy baseline (data-dependent support sets each
iteration); the restricted solves are tiny. Kept in numpy by design —
it exists for comparison harnesses, not the TPU hot path.
"""

from __future__ import annotations

import time

import numpy as np


def cosamp(A, y, k, tol=1e-8, maxiter=500, x=None):
    """Estimate a k-sparse x from measurements y = A x.

    A: [M, N] sensing matrix; y: [M]; k: expected sparsity.
    """
    t0 = time.time()
    A = np.asarray(A)
    y = np.asarray(y)
    _, N = A.shape

    x_hat = np.zeros(N, dtype=y.dtype)
    residual = y.copy()
    y_norm = np.linalg.norm(y)
    if y_norm == 0:
        return x_hat, time.time() - t0

    for _ in range(maxiter):
        corr = A.conj().T @ residual
        # union of current support with the 2k strongest correlations
        support = np.union1d(
            np.flatnonzero(x_hat), np.argsort(np.abs(corr))[-2 * k:]
        )

        trial = np.zeros(N, dtype=y.dtype)
        trial[support] = np.linalg.lstsq(A[:, support], y, rcond=None)[0]

        # prune to the k largest entries
        trial[np.argsort(np.abs(trial))[:-k]] = 0
        x_hat = trial

        residual = y - A @ x_hat
        if np.linalg.norm(residual) / y_norm < tol:
            break

    return x_hat, time.time() - t0
