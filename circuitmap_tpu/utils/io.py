"""Dataset and result IO.

Loaders for the reference's on-disk formats (.mat / .npy / .npz — see
run_circuitmap_main.py:22-32) and exporters for the fitted state
(savemat + npz, run_circuitmap_main.py:58-63).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def load_experiment(path, psc_key="psc", stim_key="stimulus_matrix"):
    """Load (psc [K, T], stim_matrix [N, K]) from .mat/.npy/.npz."""
    p = str(path)
    if p.endswith(".mat"):
        from scipy.io import loadmat

        f = loadmat(p)
    elif p.endswith(".npy") or p.endswith(".npz"):
        f = np.load(p, allow_pickle=True)
        if p.endswith(".npy"):
            f = f.item()
    else:
        raise ValueError(f"unsupported experiment format: {p}")
    psc = np.asarray(f[psc_key], dtype=float)
    stim = np.asarray(f[stim_key], dtype=float)
    return psc, stim


def export_state(out_dir, base_name, state, save_mat=True, save_npz=True):
    """Write weights/uncertainty/spikes in the reference's output layout
    (run_circuitmap_main.py:58-63). Returns the written paths."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    stem = out / f"{base_name}_cmap"
    payload = {
        "weights": np.asarray(state["mu"]),
        "weight_uncertainty": np.asarray(state["beta"]),
        "spikes": np.asarray(state["lam"]),
    }
    written = []
    if save_mat:
        from scipy.io import savemat

        savemat(f"{stem}.mat", payload)
        written.append(f"{stem}.mat")
    if save_npz:
        np.savez(str(stem), **payload)
        written.append(f"{stem}.npz")
    return written


def load_continuous_recording(path, dtype="float32"):
    """Memory-map a raw binary continuous recording (one float per sample)."""
    return np.memmap(path, dtype=dtype, mode="r")


def window_continuous_recording(timeline, stim_times, pre=100, width=900,
                                with_charge=False):
    """Slice a continuous recording into [K, width] response windows.

    Uses the multithreaded native extractor (utils/native) when built —
    streaming at memory bandwidth for hour-scale recordings — with a
    numpy fallback. ``with_charge`` also returns per-window trapezoidal
    charges (the solvers' observation vector) in the same pass.
    """
    from . import native

    if with_charge:
        return native.extract_windows_with_charge(
            np.asarray(timeline), np.asarray(stim_times), pre, width
        )
    return native.extract_windows(
        np.asarray(timeline), np.asarray(stim_times), pre, width
    )
