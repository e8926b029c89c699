"""Pair-patch pipeline: inferred spikes vs loose-patch ground truth.

Equivalent of reference scripts/run_pair_patch_pipeline.py:153-359: the
1v10 split-and-fit, plus a directly patched presynaptic cell (``psps``
recordings) whose threshold-detected spikes validate the inferred spike
posteriors and power curves.

Usage:
  python scripts_tpu/run_pair_patch_pipeline.py --data expt.mat \
      --demixer demixers/nwd_ie_ChroME2f.npz --msrmp 0.4 --out out/
"""

import argparse
from pathlib import Path

import numpy as np

from circuitmap_tpu import Model, NeuralDemixer
from circuitmap_tpu.pipelines import (
    split_single_ensemble,
    detect_lp_spikes,
    find_patched_cell,
    power_curve_comparison,
)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", required=True)
    parser.add_argument("--demixer", required=True)
    parser.add_argument("--msrmp", type=float, default=0.3)
    parser.add_argument("--out", required=True)
    parser.add_argument("--spike_threshold", type=float, default=0.1)
    args = parser.parse_args()

    from scipy.io import loadmat, savemat

    data = loadmat(args.data)
    stim_matrix = data["stimulus_matrix"]
    psc = data["pscs"]
    psp = data["psps"]
    N, K = stim_matrix.shape

    single, ensemble = split_single_ensemble(stim_matrix)
    demix = NeuralDemixer(path=args.demixer)
    psc_dem = demix(psc)

    fits = {}
    for name, locs in (("single", single), ("ensemble", ensemble)):
        model = Model(N)
        model.fit(
            psc_dem[locs], stim_matrix[:, locs] * 1.0, method="caviar",
            fit_options={"msrmp": args.msrmp, "save_histories": False},
        )
        fits[name] = (model, locs)

    # ground truth from the patched cell
    lp_cell = find_patched_cell(stim_matrix, psp, args.spike_threshold)
    lp_spikes = detect_lp_spikes(psp, args.spike_threshold)
    print(f"patched cell: {lp_cell}; LP spikes detected: {int(lp_spikes.sum())}")

    curves = {}
    for name, (model, locs) in fits.items():
        curves[name] = power_curve_comparison(
            stim_matrix, model.state["lam"], lp_spikes, lp_cell,
            trial_subset=locs,
        )
        agree = np.mean(
            np.abs(curves[name]["lp_rate"] - curves[name]["model_rate"])
        )
        print(f"{name}: mean |LP rate - posterior rate| per power = {agree:.3f}")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    stem = out / f"{Path(args.data).stem}_msrmp{args.msrmp}_pairpatch"
    savemat(
        f"{stem}.mat",
        {
            "lp_cell": lp_cell,
            "lp_spikes": lp_spikes.astype(float),
            "weights_single": fits["single"][0].state["mu"],
            "weights_ensemble": fits["ensemble"][0].state["mu"],
            "spikes_single": fits["single"][0].state["lam"],
            "spikes_ensemble": fits["ensemble"][0].state["lam"],
            **{f"curve_{n}_{k}": v for n, c in curves.items()
               for k, v in c.items()},
        },
    )
    print("Wrote", f"{stem}.mat")


if __name__ == "__main__":
    main()
