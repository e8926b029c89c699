"""Scaling study: flagship demix+CAVIaR pipeline across problem sizes.

Measures, on the real TPU through the tunnel, the end-to-end wall time
(demix with the int8 wire + 50-iteration CAVIaR fit, forced-pull timed
per the repo's measurement rules) and the truth-recovery R² at a grid of
(N neurons, K trials). Writes SCALING.json and prints a markdown table.

This is the headline-configuration sweep behind BENCH's single point:
the reference benchmarks one shape at a time (its N=300/K=2000
end-to-end runs 175 s on this host, see bench.py's embedded baseline);
here every shape includes full simulation ground truth so the R² column
is a recovery measurement, not a smoke test.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts_tpu/run_scaling_study.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small grid for smoke-testing the harness")
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--only", action="append", default=None,
                    metavar="N,K[,H]",
                    help="run only these N,K[,H] rows (repeatable; H "
                         "defaults to 10 targets/trial); merged into "
                         "an existing --out file by (N, K, H)")
    args = ap.parse_args()

    import jax

    from circuitmap_tpu.demix import NeuralDemixer
    from circuitmap_tpu.model import default_priors
    from circuitmap_tpu.simulation import simulate
    from circuitmap_tpu.solvers import caviar
    from circuitmap_tpu.utils.metrics import r2_score

    grid = (
        [(100, 5000), (300, 20000)]
        if args.quick
        else [(100, 5000), (300, 5000), (300, 20000), (1000, 20000),
              (2000, 20000), (1000, 50000), (5000, 20000),
              (1000, 100000)]
    )
    if args.only:
        grid = [tuple(int(v) for v in spec.split(",")) for spec in args.only]
    grid = [g if len(g) == 3 else (*g, 10) for g in grid]

    # the bench-default wire: int4 + the QAT checkpoint (WIRE_STUDY)
    import os
    qat = "demixers/nwd_ie_ChroME2f_int4qat.npz"
    use_qat = os.path.exists(qat)
    demixer = NeuralDemixer(path=qat if use_qat
                            else "demixers/nwd_ie_ChroME2f.npz")
    wire = "int4" if use_qat else np.int8
    device = str(jax.devices()[0].device_kind)
    # merge-by-(N,K) into any existing file, and write INCREMENTALLY
    # after every row — a crash on a late row must not discard the
    # earlier measurements
    try:
        with open(args.out) as f:
            results = json.load(f).get("results", [])
    except (OSError, ValueError):
        results = []

    def _write():
        payload = dict(device=device, iters=50,
                       wire="int4" if use_qat else "int8",
                       results=results)
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)

    for N, K, H in grid:
        np.random.seed(0)
        t0 = time.time()
        sim = simulate(N=N, trials=K, H=H, connection_prob=0.05,
                       verbose=False, batch_size=1000)
        t_sim = time.time() - t0
        priors = default_priors(N)

        def run():
            dem = demixer(sim["psc"], verbose=False, keep_on_device=True,
                          transfer_dtype=wire)
            return caviar(
                dem, sim["stim_matrix"], priors["mu"], priors["beta"],
                priors["shape"], priors["rate"], priors["phi"],
                priors["phi_cov"], iters=50, msrmp=0.3,
                powers=[45.0, 55.0, 65.0], verbose=False,
            )

        t0 = time.time()
        out = run()
        np.asarray(out[0][:1])  # force completion (axon early-return rule)
        t_cold = time.time() - t0

        best = np.inf
        for _ in range(args.repeats):
            t0 = time.time()
            out = run()
            np.asarray(out[0][:1])
            best = min(best, time.time() - t0)

        r2 = float(r2_score(sim["weights"], np.asarray(out[0])))
        row = dict(N=N, K=K, H=H, seconds=round(best, 3),
                   cold_seconds=round(t_cold, 1), r2=round(r2, 4),
                   sim_gen_seconds=round(t_sim, 1),
                   # per-row: --only merges can mix wire protocols
                   wire="int4" if use_qat else "int8")
        results = [r for r in results
                   if (r["N"], r["K"], r.get("H", 10)) != (N, K, H)] + [row]
        _write()
        print(json.dumps(row), flush=True)

    print("\n| N | K | demix+fit (s) | truth R² |")
    print("|---|---|---|---|")
    for r in results:
        print(f"| {r['N']} | {r['K']} | {r['seconds']} | {r['r2']} |")


if __name__ == "__main__":
    main()
