"""Demo: single-target vs ensemble analysis of an experimental recording.

Script equivalent of the reference's experimental-data walkthrough
(examples/demo_experimental_data.ipynb): load pscs + stimulus_matrix,
demix with a pretrained NWD network, split single-target from ensemble
trials, fit CAVIaR to each independently, and compare — stem plot of
weights, R² between the two fits, ridge-regressed PSC amplitudes, and
the side-by-side checkerboard.

The reference repo ships no experimental .mat, so without ``--data``
the script synthesises an experiment with the same design (mixed
single-target + 10-target ensemble trials) so the full walkthrough runs
out of the box; pass ``--data your.mat`` (keys ``pscs``/``psc`` and
``stimulus_matrix``) to analyse a real recording exactly as the
notebook does.

  python examples/demo_experimental_data.py \
      [--data expt.mat] [--demixer demixers/nwd_ie_ChroME2f.npz] \
      [--plot-dir out/]
"""

import argparse
import os

import numpy as np

import circuitmap_tpu as cm
from circuitmap_tpu.pipelines import split_single_ensemble, connection_waveforms
from circuitmap_tpu.utils.metrics import r2_score


def _load_or_synthesise(path, seed):
    if path is not None:
        from circuitmap_tpu.utils.io import load_experiment

        psc, stim = load_experiment(path)
        return psc, stim, None
    # synthetic stand-in with the notebook's trial design: a block of
    # single-target trials plus a block of 10-target ensemble trials
    np.random.seed(seed)
    N = 100
    sim_single = cm.simulate(N=N, trials=900, H=1, connection_prob=0.08,
                             verbose=False)
    sim_ens = cm.simulate(N=N, trials=900, H=10, connection_prob=0.08,
                          weights=sim_single["weights"],
                          phi_0=sim_single["phi_0"], phi_1=sim_single["phi_1"],
                          kernel=(sim_single["tau_r"], sim_single["tau_d"]),
                          verbose=False)
    psc = np.concatenate([sim_single["psc"], sim_ens["psc"]], axis=0)
    stim = np.concatenate([sim_single["stim_matrix"], sim_ens["stim_matrix"]],
                          axis=1)
    perm = np.random.permutation(psc.shape[0])
    return psc[perm], stim[:, perm], sim_single["weights"]


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", default=None, help=".mat/.npz experiment")
    parser.add_argument("--demixer", default=None,
                        help="NWD checkpoint (.npz or reference .ckpt)")
    parser.add_argument("--msrmp", type=float, default=0.4)  # notebook cell 15
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--plot-dir", default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    psc, stim, true_weights = _load_or_synthesise(args.data, args.seed)
    N = stim.shape[0]
    print(f"experiment: N={N} neurons, K={psc.shape[0]} trials")

    if args.demixer:
        print("Demixing...")
        psc_dem = cm.NeuralDemixer(path=args.demixer)(psc)
    else:
        psc_dem = psc

    # split single-target vs ensemble trials (notebook cell 13)
    single_locs, ensemble_locs = split_single_ensemble(stim)
    print(f"{len(single_locs)} single-target trials, "
          f"{len(ensemble_locs)} ensemble trials")
    stim_single = stim[:, single_locs]
    stim_ens = stim[:, ensemble_locs]
    psc_single = psc_dem[single_locs]
    psc_ens = psc_dem[ensemble_locs]

    fit_options = {"iters": args.iters, "save_histories": False,
                   "msrmp": args.msrmp, "verbose": False}
    print("Fitting CAVIaR to single-target trials...")
    model_single = cm.Model(N)
    model_single.fit(psc_single, stim_single, method="caviar",
                     fit_options=dict(fit_options))
    print(f"  {model_single.time:.2f}s")
    print("Fitting CAVIaR to ensemble trials...")
    model_ens = cm.Model(N)
    model_ens.fit(psc_ens, stim_ens, method="caviar",
                  fit_options=dict(fit_options))
    print(f"  {model_ens.time:.2f}s")

    # single-vs-ensemble agreement (notebook cell 18)
    mu_s, mu_e = model_single.state["mu"], model_ens.state["mu"]
    print(f"\nsingle-vs-ensemble weight R2: {r2_score(mu_s, mu_e):.3f}")
    both = (mu_s != 0) & (mu_e != 0)
    print(f"connections: single={int((mu_s != 0).sum())} "
          f"ensemble={int((mu_e != 0).sum())} common={int(both.sum())}")
    if true_weights is not None:
        print(f"truth R2: single={r2_score(true_weights, mu_s):.3f} "
              f"ensemble={r2_score(true_weights, mu_e):.3f}")

    # ridge-regressed PSC waveforms -> amplitude comparison (cell 19)
    cnx_s, wf_s = connection_waveforms(psc_single, stim_single,
                                       model_single.state)
    cnx_e, wf_e = connection_waveforms(psc_ens, stim_ens, model_ens.state)
    common = np.intersect1d(cnx_s, cnx_e)
    if common.size:
        amp_s = np.max(wf_s[np.searchsorted(cnx_s, common)], axis=1)
        amp_e = np.max(wf_e[np.searchsorted(cnx_e, common)], axis=1)
        print(f"amplitude agreement over {common.size} common connections: "
              f"r={np.corrcoef(amp_s, amp_e)[0, 1]:.3f}")

    if args.plot_dir:
        os.makedirs(args.plot_dir, exist_ok=True)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from circuitmap_tpu.viz import plot_spike_inference_comparison

        # stem comparison (cell 18)
        fig = plt.figure(figsize=(15, 3))
        plt.stem(np.arange(N), mu_s, label="Single-target")
        plt.scatter(np.arange(N), mu_e, marker="x", color="r",
                    label="Ensemble", zorder=N)
        plt.legend()
        plt.xlabel("Neuron")
        plt.ylabel("Synaptic weight")
        fig.savefig(os.path.join(args.plot_dir, "stem_comparison.png"),
                    bbox_inches="tight", dpi=150)
        plt.close(fig)

        if common.size:
            fig = plt.figure(figsize=(3, 3))
            plt.scatter(amp_s, amp_e, color="firebrick")
            plt.xlabel("Single-target amplitude")
            plt.ylabel("Ensemble amplitude")
            plt.title("Synaptic weights")
            fig.savefig(os.path.join(args.plot_dir, "amplitudes.png"),
                        bbox_inches="tight", dpi=150)
            plt.close(fig)

        # side-by-side checkerboard (cells 21-22)
        fig = plot_spike_inference_comparison(
            [psc_single, psc_ens], [stim_single, stim_ens],
            [model_single.state, model_ens.state],
            titles=["Single-target stimulation", "Ensemble stimulation"],
            n_plots=min(12, N), max_trials_to_show=30,
            save=os.path.join(args.plot_dir, "comparison_checkerboard.png"),
        )
        plt.close(fig)
        print("wrote plots to", args.plot_dir)


if __name__ == "__main__":
    main()
