"""Demo: continuous mapping experiment end-to-end.

Simulates a full 20 kHz experiment timeline, windows it into trials
(native C++ extractor), demixes, fits CAVIaR, and reports recovery —
the workflow of the reference's continuous-experiment harness in one
readable script.

  python examples/demo_continuous_experiment.py \
      [--demixer demixers/nwd_ie_ChroME2f.npz]
"""

import argparse

import numpy as np

import circuitmap_tpu as cm
from circuitmap_tpu.utils.io import window_continuous_recording
from circuitmap_tpu.utils.metrics import r2_score


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--N", type=int, default=100)
    parser.add_argument("--seconds", type=float, default=60)
    parser.add_argument("--stim_freq", type=int, default=30)
    parser.add_argument("--demixer", default=None)
    parser.add_argument("--msrmp", type=float, default=0.3)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    np.random.seed(args.seed)
    print("Simulating continuous experiment...")
    expt = cm.simulate_continuous_experiment(
        N=args.N, expt_len=int(args.seconds * 20000), stim_freq=args.stim_freq,
    )

    # window the raw timeline ourselves (same result as expt['obs_responses'],
    # but through the production windowing path)
    psc = window_continuous_recording(
        expt["pscs"].astype(np.float32), expt["stim_times"], pre=100, width=900
    )
    stim = expt["stim_matrix"]
    print(f"{psc.shape[0]} trials of {psc.shape[1]} samples")

    if args.demixer:
        psc = cm.NeuralDemixer(path=args.demixer)(psc)

    model = cm.Model(args.N)
    model.fit(psc, stim, method="caviar", fit_options={"msrmp": args.msrmp})
    print(f"fit took {model.time:.2f}s")

    r2 = r2_score(expt["weights"], model.state["mu"])
    print(f"weight recovery R2 = {r2:.4f}")
    found = np.flatnonzero(model.state["mu"])
    true = np.flatnonzero(expt["weights"])
    print(f"connections: {len(true)} true, {len(found)} found, "
          f"{len(set(found) & set(true))} overlapping")


if __name__ == "__main__":
    main()
