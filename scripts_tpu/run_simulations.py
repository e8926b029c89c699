"""Simulation benchmark: simulate → demix → fit all solvers → save.

Equivalent of reference scripts/run_simulations.py:10-98: one trial-based
simulation, NWD demixing, CAVIaR + CAVI-SnS + CoSaMP fits, results (incl.
ground truth and per-solver wall-clock) pickled with bz2.
"""

import argparse
import bz2
import pickle

import numpy as np

from circuitmap_tpu import Model, NeuralDemixer, simulate
from circuitmap_tpu.solvers import cosamp
from circuitmap_tpu.utils.metrics import r2_score


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--N", type=int, default=300)
    parser.add_argument("--trials", type=int, default=2000)
    parser.add_argument("--H", type=int, default=10)
    parser.add_argument("--connection_prob", type=float, default=0.05)
    parser.add_argument("--spont_prob", type=float, default=0.05)
    parser.add_argument("--msrmp", type=float, default=0.3)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--demixer", default=None)
    parser.add_argument("--token", default="sim")
    parser.add_argument("--out", default=".")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    np.random.seed(args.seed)
    sim = simulate(
        N=args.N, trials=args.trials, H=args.H,
        connection_prob=args.connection_prob, spont_prob=args.spont_prob,
    )

    psc = sim["psc"]
    if args.demixer:
        psc = NeuralDemixer(path=args.demixer)(psc)

    results = {"sim": {k: sim[k] for k in ("weights", "stim_matrix", "spks", "I")}}

    for method in ("caviar", "cavi_sns"):
        model = Model(args.N)
        opts = {"iters": args.iters}
        if method == "caviar":
            opts["msrmp"] = args.msrmp
        model.fit(psc, sim["stim_matrix"], method=method, fit_options=opts)
        results[method] = {
            "state": model.state,
            "time": model.time,
            "r2": r2_score(sim["weights"], model.state["mu"]),
        }
        print(f"{method}: {model.time:.2f}s  R2={results[method]['r2']:.4f}")

    # CoSaMP baseline on integrated charge
    y = np.trapezoid(psc, axis=-1)
    A = (sim["stim_matrix"] > 0).T.astype(float)
    k_sparse = max(int(0.1 * args.N), 1)
    w_cosamp, t_cosamp = cosamp(A, y, k_sparse)
    results["cosamp"] = {
        "weights": w_cosamp,
        "time": t_cosamp,
        "r2": r2_score(sim["weights"], w_cosamp),
    }
    print(f"cosamp: {t_cosamp:.2f}s  R2={results['cosamp']['r2']:.4f}")

    out = f"{args.out}/simulation_results_{args.token}_N{args.N}_K{args.trials}.pkl.bz2"
    with bz2.BZ2File(out, "wb") as f:
        pickle.dump(results, f)
    print("Wrote", out)


if __name__ == "__main__":
    main()
