"""Demo: extract PSC template parameters from traces, calibrate the NWD
training simulator.

Script equivalent of the reference's fit_sum_of_psc_templates notebook
(examples/fit_sum_of_psc_templates.ipynb): fit a sum of bi-exponential
PSC templates to each recorded trace, inspect the fitted rise/decay
populations, and derive tau ranges for ``generate_training_data`` —
except all traces are fitted simultaneously by one vmapped Adam
optimisation instead of per-trace scipy minimisation.

  python examples/fit_psc_templates.py [--data traces.npz --key pscs]
"""

import argparse

import numpy as np

from circuitmap_tpu.demix.template_fit import (
    fit_psc_templates,
    suggest_datagen_ranges,
)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", default=None,
                        help=".npz with a [K, T] trace array")
    parser.add_argument("--key", default="pscs")
    parser.add_argument("--n_kernels", type=int, default=10)
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    if args.data:
        traces = np.load(args.data)[args.key]
    else:
        # no data supplied: demo on simulated traces with known kernels
        import circuitmap_tpu as cm

        np.random.seed(args.seed)
        sim = cm.simulate(N=30, trials=200, H=3, connection_prob=0.3,
                          spont_prob=0.0, gp_scale=1e-3, verbose=False)
        # calibrate on event-containing traces: trials whose targets
        # didn't spike carry only noise and say nothing about kinetics.
        # The median trial peak is the noise floor (most trials are
        # event-free), so gate several noise floors above it.
        peaks = sim["psc"].max(1)
        active = np.flatnonzero(peaks > 5 * np.median(peaks))
        traces = sim["psc"][active[:64]]
        print(f"no --data given; fitting {traces.shape[0]} simulated "
              "event-containing traces")

    fit = fit_psc_templates(traces, n_kernels=args.n_kernels,
                            steps=args.steps, seed=args.seed)
    print(f"fitted {traces.shape[0]} traces: median R2 = "
          f"{np.median(fit['r2']):.3f}")

    keep = fit["amp"] > 0.1
    print(f"{int(keep.sum())} significant kernels across the population")
    print(f"tau_rise  (ms): median {np.median(fit['tau_r'][keep]):.2f}, "
          f"IQR [{np.percentile(fit['tau_r'][keep], 25):.2f}, "
          f"{np.percentile(fit['tau_r'][keep], 75):.2f}]")
    print(f"tau_decay (ms): median "
          f"{np.median((fit['tau_r'] + fit['tau_diff'])[keep]):.2f}")

    ranges = suggest_datagen_ranges(fit)
    print("suggested generate_training_data kwargs (frames @ 20 kHz):")
    for k, v in ranges.items():
        print(f"  {k} = {v:.1f}")


if __name__ == "__main__":
    main()
