"""Data-efficiency curves: fit on growing trial subsets.

Equivalent of reference scripts/run_downsampling_experiments.py:58-96:
subsample trials at increasing durations (x repeats), fit per subset,
save the weight trajectories.
"""

import argparse

import numpy as np

from circuitmap_tpu import Model, NeuralDemixer
from circuitmap_tpu.utils.io import load_experiment


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", required=True)
    parser.add_argument("--demixer", default=None)
    parser.add_argument("--fractions", type=float, nargs="+",
                        default=[0.1, 0.25, 0.5, 0.75, 1.0])
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--msrmp", type=float, default=0.3)
    parser.add_argument("--out", default="downsampling_results.npz")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    psc, stim = load_experiment(args.data)
    if args.demixer:
        psc = NeuralDemixer(path=args.demixer)(psc)
    N, K = stim.shape

    rng = np.random.default_rng(args.seed)
    weights = np.zeros((len(args.fractions), args.repeats, N))
    times = np.zeros((len(args.fractions), args.repeats))

    for i, frac in enumerate(args.fractions):
        k = max(int(frac * K), 1)
        for r in range(args.repeats):
            sel = np.sort(rng.choice(K, k, replace=False))
            model = Model(N)
            model.fit(psc[sel], stim[:, sel], method="caviar",
                      fit_options={"iters": args.iters, "msrmp": args.msrmp})
            weights[i, r] = model.state["mu"]
            times[i, r] = model.time
            print(f"frac={frac} rep={r}: K={k} t={model.time:.2f}s")

    np.savez(args.out, fractions=np.asarray(args.fractions),
             weights=weights, times=times)
    print("Wrote", args.out)


if __name__ == "__main__":
    main()
