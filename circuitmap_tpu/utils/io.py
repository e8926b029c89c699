"""Dataset and result IO.

Loaders for the reference's on-disk formats (.mat / .npy / .npz — see
run_circuitmap_main.py:22-32) and exporters for the fitted state
(savemat + npz, run_circuitmap_main.py:58-63).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


# HDF5 file signature (the first 8 bytes of every HDF5 file, which is
# what a MATLAB "-v7.3" .mat actually is — scipy.io.loadmat rejects
# those with NotImplementedError, but real rigs export them routinely).
_HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"


def _is_hdf5(path):
    try:
        with open(path, "rb") as fh:
            return fh.read(len(_HDF5_MAGIC)) == _HDF5_MAGIC
    except OSError:
        return False


def _reconcile_orientation(psc, stim):
    """Fix transposed layouts so psc is [K, T] and stim is [N, K].

    MATLAB stores arrays column-major, so a v7.3 dataset read through
    h5py arrives transposed relative to the loadmat convention; a file
    written directly by h5py (row-major) does not. Rather than guess
    the writer, reconcile against the one hard invariant the pair must
    satisfy: psc's trial axis (rows) == stim's trial axis (columns).
    """
    if psc.ndim != 2 or stim.ndim != 2:
        raise ValueError(
            f"expected 2-D psc and stim arrays, got shapes "
            f"{psc.shape} and {stim.shape}")
    candidates = [
        ("as stored", psc.shape[0] == stim.shape[1],
         lambda: (psc, stim)),
        ("both transposed (MATLAB layout)",
         psc.shape[1] == stim.shape[0], lambda: (psc.T, stim.T)),
        ("psc transposed", psc.shape[1] == stim.shape[1],
         lambda: (psc.T, stim)),
        ("stim transposed", psc.shape[0] == stim.shape[0],
         lambda: (psc, stim.T)),
    ]
    matches = [(name, fix) for name, ok, fix in candidates if ok]
    # shape coincidences (e.g. N == T == 900, where a MATLAB file's
    # transposed layout ALSO satisfies the as-stored check) make the
    # orientation undecidable from shapes alone — refuse rather than
    # silently feed a time axis to the fit as trials
    distinct = {(m[1]()[0].shape, m[1]()[1].shape) for m in matches}
    if len(distinct) > 1:
        raise ValueError(
            f"ambiguous orientation: psc {psc.shape} / stim {stim.shape} "
            f"admit multiple trial-axis readings "
            f"({', '.join(m[0] for m in matches)}); transpose the "
            "arrays to psc [K, T] / stim [N, K] before saving")
    if matches:
        return matches[0][1]()
    raise ValueError(
        f"cannot reconcile trial axes: psc {psc.shape} vs stim "
        f"{stim.shape} share no common trial count")


def load_experiment(path, psc_key="psc", stim_key="stimulus_matrix"):
    """Load (psc [K, T], stim_matrix [N, K]) from .mat/.npy/.npz/.h5.

    Reference contract: scripts/run_circuitmap_main.py:22-32 loads
    ``psc`` + ``stimulus_matrix`` from a .mat or .npy. The format is
    detected by MAGIC BYTES, not extension: MATLAB v7.3 files are HDF5
    containers that scipy's loadmat cannot read, so any .mat (or
    .h5/.hdf5) with the HDF5 signature routes through h5py, with
    orientation reconciled for MATLAB's column-major storage.
    """
    p = str(path)
    if _is_hdf5(p):
        import h5py

        with h5py.File(p, "r") as f:
            for key in (psc_key, stim_key):
                if key not in f:
                    raise KeyError(
                        f"{p!r} has no dataset {key!r}; found: "
                        f"{sorted(f.keys())}")
            psc = np.asarray(f[psc_key], dtype=float)
            stim = np.asarray(f[stim_key], dtype=float)
        return _reconcile_orientation(psc, stim)
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
