"""Demo: compressive connectivity mapping on simulated data.

Script equivalent of the reference's Colab notebook
(examples/demo_compressive_connectivity_mapping.ipynb): simulate a
2-minute ensemble-stimulation experiment, demix, fit CAVIaR, report
weight-recovery R², and render the checkerboard.

  python examples/demo_compressive_mapping.py [--demixer demixers/nwd_ie_ChroME2f.npz]
"""

import argparse

import numpy as np

import circuitmap_tpu as cm
from circuitmap_tpu.utils.metrics import r2_score, precision_recall_connections


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--N", type=int, default=200)
    parser.add_argument("--trials", type=int, default=3600)  # 2 min @ 30 Hz
    parser.add_argument("--demixer", default=None)
    parser.add_argument("--msrmp", type=float, default=0.3)
    parser.add_argument("--plot", default=None, help="path for checkerboard png")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    np.random.seed(args.seed)
    print("Simulating...")
    sim = cm.simulate(N=args.N, trials=args.trials, H=10, connection_prob=0.05)
    psc = sim["psc"]

    if args.demixer:
        print("Demixing...")
        psc = cm.NeuralDemixer(path=args.demixer)(psc)

    print("Fitting CAVIaR...")
    model = cm.Model(args.N)
    model.fit(psc, sim["stim_matrix"], method="caviar",
              fit_options={"msrmp": args.msrmp})
    print(f"fit took {model.time:.2f}s")

    r2 = r2_score(sim["weights"], model.state["mu"])
    prec, rec = precision_recall_connections(sim["weights"], model.state["mu"])
    print(f"weight recovery R2 = {r2:.4f}")
    print(f"connection detection: precision={prec:.3f} recall={rec:.3f}")

    if args.plot:
        from circuitmap_tpu.viz import plot_checkerboard

        plot_checkerboard(psc, sim["stim_matrix"], model, n_plots=12,
                          save=args.plot, fig_width=20)
        print("wrote", args.plot)


if __name__ == "__main__":
    main()
