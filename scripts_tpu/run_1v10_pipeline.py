"""1v10 pipeline: single-target vs ensemble consistency on real data.

Equivalent of reference scripts/run_1v10_pipeline_reformatted.py:153-327:
split an experiment into single-target and ensemble trials, demix, fit
CAVIaR to each independently, optionally merge duplicate connections
(same cell at adjacent planes), render summary + checkerboard figures,
export both weight sets. Agreement between the two fits is the
reference's real-data validation metric.

Usage:
  python scripts_tpu/run_1v10_pipeline.py --data expt.mat \
      --demixer demixers/nwd_ie_ChroME2f.npz --msrmp 0.4 --out out/
"""

import argparse
from pathlib import Path

import numpy as np

from circuitmap_tpu import Model, NeuralDemixer
from circuitmap_tpu.pipelines import (
    split_single_ensemble,
    merge_duplicate_connections,
)
from circuitmap_tpu.utils.metrics import r2_score
from circuitmap_tpu.viz import plot_spike_inference_comparison


def load_dataset(path, reader):
    if reader == "h5py":
        import h5py

        data = h5py.File(path)
        stim = np.array(data["stimulus_matrix"]).T
        psc = np.array(data["pscs"]).T
        targets = np.array(data["targets"]).T
        img = None
    else:
        from scipy.io import loadmat

        data = loadmat(path)
        stim = data["stimulus_matrix"]
        psc = data["pscs"]
        targets = data.get("targets")
        img = data.get("img")
    return psc, stim, targets, img


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", required=True)
    parser.add_argument("--demixer", required=True)
    parser.add_argument("--msrmp", type=float, default=0.3)
    parser.add_argument("--out", required=True)
    parser.add_argument("--fmt", choices=["mat", "npz"], default="mat")
    parser.add_argument("--reader", choices=["scipy", "h5py"], default="scipy")
    parser.add_argument("--sign", choices=["positive", "negative"],
                        default="positive")
    parser.add_argument("--merge_duplicates", action="store_true")
    args = parser.parse_args()

    psc, stim_matrix, targets, img = load_dataset(args.data, args.reader)
    if args.sign == "negative":
        psc = -psc
    N, K = stim_matrix.shape

    single, ensemble = split_single_ensemble(stim_matrix)
    print(f"trials: {single.size} single-target, {ensemble.size} ensemble")
    if single.size == 0 or ensemble.size == 0:
        raise SystemExit("need both single-target and ensemble trials")

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
        print(f"{name}: {model.time:.2f}s, "
              f"{int((model.state['mu'] != 0).sum())} connections")

    m_s, loc_s = fits["single"]
    m_e, loc_e = fits["ensemble"]
    print("single-vs-ensemble weight R2:",
          round(r2_score(m_s.state["mu"], m_e.state["mu"]), 4))

    if args.merge_duplicates and targets is not None:
        for name in ("single", "ensemble"):
            model, locs = fits[name]
            reps, clusters = merge_duplicate_connections(
                psc_dem[locs], stim_matrix[:, locs], model.state, targets, img
            )
            print(f"{name}: {len(clusters)} merged connection clusters")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    stem = out / f"{Path(args.data).stem}_msrmp{args.msrmp}"

    plot_spike_inference_comparison(
        [psc_dem[loc_s], psc_dem[loc_e]],
        [stim_matrix[:, loc_s], stim_matrix[:, loc_e]],
        [m_s.state, m_e.state],
        titles=["Single target", "Ensemble"],
        n_plots=min(30, N),
        save=f"{stem}_checkerboard.png",
    )

    payload = {
        "weights_single": m_s.state["mu"],
        "weight_uncertainty_single": m_s.state["beta"],
        "weights_ensemble": m_e.state["mu"],
        "weight_uncertainty_ensemble": m_e.state["beta"],
        "spikes_single": m_s.state["lam"],
        "spikes_ensemble": m_e.state["lam"],
    }
    if args.fmt == "npz":
        np.savez(f"{stem}_models.npz", **payload)
    else:
        from scipy.io import savemat

        savemat(f"{stem}_models.mat", payload)
    print("Wrote", f"{stem}_models.{args.fmt}")


if __name__ == "__main__":
    main()
