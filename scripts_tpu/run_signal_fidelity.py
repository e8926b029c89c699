"""Demixer signal-fidelity analysis on continuous simulations.

Equivalent of reference scripts/run_signal_fidelity_simulations.py:11-57:
generate continuous experiments, save true / observed / demixed
responses for R² fidelity analysis of the demixer itself.
"""

import argparse

import numpy as np

from circuitmap_tpu import NeuralDemixer, simulate_continuous_experiment
from circuitmap_tpu.utils.metrics import r2_score


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--demixer", required=True)
    parser.add_argument("--N", type=int, default=100)
    parser.add_argument("--expt_len_s", type=float, default=60)
    parser.add_argument("--stim_freqs", type=int, nargs="+", default=[10, 30, 50])
    parser.add_argument("--out", default="signal_fidelity.npz")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    demixer = NeuralDemixer(path=args.demixer)
    payload = {}
    for freq in args.stim_freqs:
        np.random.seed(args.seed)
        expt = simulate_continuous_experiment(
            N=args.N, expt_len=int(args.expt_len_s * 20000), stim_freq=freq,
        )
        dem = demixer(expt["obs_responses"], verbose=False)
        r2 = np.mean([
            r2_score(t, d)
            for t, d in zip(expt["true_responses"], dem)
            if t.std() > 0
        ])
        print(f"stim_freq={freq}: mean per-trial R2(true, demixed) = {r2:.4f}")
        payload[f"true_{freq}"] = expt["true_responses"]
        payload[f"obs_{freq}"] = expt["obs_responses"]
        payload[f"demixed_{freq}"] = dem

    np.savez(args.out, **payload)
    print("Wrote", args.out)


if __name__ == "__main__":
    main()
