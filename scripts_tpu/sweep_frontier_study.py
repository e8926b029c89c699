"""Sweep-parallelism / recovery frontier study → SWEEP_FRONTIER.json.

The coordinate sweep is the one sequential part of the CAVI iteration
(N/B dependent steps); everything else is batched MXU work. Larger
Jacobi blocks B buy wall-clock but stale more coordinates per step —
round 3 measured B=16 losing recovery (0.9485 → 0.9423 raw-fit, one
seed, one shape) and the default stayed at 8. This study maps the
frontier properly, on the chip, with the bench pipeline (demix + fit):

  B ∈ {1, 8, 10, 12, 16} × ≥3 seeds × 2 shapes, plus two
  randomized-composition schedules at B=8:
    "perm8"  — a fresh neuron relabeling per FIT (random but fixed
               block composition; the Pallas kernel's blocks must be
               row-consecutive, so composition is the one axis it
               cannot vary — the solver already permutes block ORDER
               every iteration), and
    "xla8"   — sweep_impl='xla' at B=8: the XLA blocked sweep forms
               its blocks from the per-iteration PERMUTED neuron
               order, i.e. fresh random composition EVERY iteration.

B=1 is the reference's strictly sequential schedule (the recovery
gold standard; reference optimise/caviar.py:190-231 updates neurons
one at a time). B=8/16 run the blocked Pallas kernel; 10/12 fall to
the XLA sweep with the identical blocked schedule (the resolver's
documented contract), so their R² is schedule-true even though their
wall-clock is not kernel-representative.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts_tpu/sweep_frontier_study.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny grid to smoke the harness (CPU ok)")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "SWEEP_FRONTIER.json"))
    args = ap.parse_args()

    import jax

    from circuitmap_tpu.demix import NeuralDemixer
    from circuitmap_tpu.model import default_priors
    from circuitmap_tpu.simulation import simulate
    from circuitmap_tpu.solvers import caviar
    from circuitmap_tpu.utils.metrics import r2_score

    if args.quick:
        shapes = [(100, 2000)]
        seeds = [0, 1]
        blocks = [1, 8, "perm8"]
        iters = 20
    else:
        shapes = [(1000, 20000), (2000, 20000)]
        seeds = [0, 1, 2]
        blocks = [1, 8, 10, 12, 16, "perm8", "xla8"]
        iters = 50

    qat = os.path.join(REPO, "demixers", "nwd_ie_ChroME2f_int4qat.npz")
    use_qat = os.path.exists(qat) and not args.quick
    demixer = NeuralDemixer(path=qat if use_qat else None)
    wire = "int4" if use_qat else np.int8

    device = str(jax.devices()[0].device_kind)
    rows = []

    def _fit(dem, stim, priors, B, key_perm, seed):
        """One caviar fit at block size B; 'perm8' relabels neurons
        (fresh random block composition) and inverts on the outputs."""
        N = stim.shape[0]
        if B == "perm8":
            perm = np.asarray(
                jax.random.permutation(key_perm, N))
            inv = np.empty_like(perm)
            inv[perm] = np.arange(N)
            out = caviar(
                dem, np.asarray(stim)[perm], priors["mu"][perm],
                priors["beta"][perm], priors["shape"], priors["rate"],
                priors["phi"][perm], priors["phi_cov"][perm],
                iters=iters, msrmp=0.3, seed=seed,
                powers=[45.0, 55.0, 65.0], sweep_block_size=8,
                verbose=False)
            return np.asarray(out[0])[inv]
        impl = {}
        if B == "xla8":
            impl, B = {"sweep_impl": "xla"}, 8
        out = caviar(
            dem, stim, priors["mu"], priors["beta"], priors["shape"],
            priors["rate"], priors["phi"], priors["phi_cov"],
            iters=iters, msrmp=0.3, seed=seed,
            powers=[45.0, 55.0, 65.0], sweep_block_size=int(B),
            verbose=False, **impl)
        return np.asarray(out[0])

    for N, K in shapes:
        for sim_seed in seeds:
            np.random.seed(sim_seed)
            sim = simulate(N=N, trials=K, H=10, connection_prob=0.05,
                           verbose=False, batch_size=1000)
            dem = demixer(sim["psc"], verbose=False,
                          keep_on_device=True, transfer_dtype=wire)
            np.asarray(dem[0, :1])
            priors = default_priors(N)
            for B in blocks:
                key_perm = jax.random.PRNGKey(1000 + sim_seed)
                t0 = time.time()
                mu = _fit(dem, sim["stim_matrix"], priors, B,
                          key_perm, seed=sim_seed)
                t_cold = time.time() - t0
                t0 = time.time()
                mu = _fit(dem, sim["stim_matrix"], priors, B,
                          key_perm, seed=sim_seed)
                t_warm = time.time() - t0
                r2 = float(r2_score(sim["weights"], mu))
                row = dict(N=N, K=K, block=str(B), seed=sim_seed,
                           r2=round(r2, 4),
                           fit_warm_s=round(t_warm, 3),
                           fit_cold_s=round(t_cold, 1))
                rows.append(row)
                print(json.dumps(row), flush=True)
                _write(args.out, device, iters, rows)

    # summary: mean/min R2 per (shape, block)
    print("\n| N | K | B | mean R2 | min R2 | warm fit (s) |")
    print("|---|---|---|---|---|---|")
    for N, K in shapes:
        for B in blocks:
            sel = [r for r in rows
                   if (r["N"], r["K"], r["block"]) == (N, K, str(B))]
            if not sel:
                continue
            print(f"| {N} | {K} | {B} | "
                  f"{np.mean([r['r2'] for r in sel]):.4f} | "
                  f"{min(r['r2'] for r in sel):.4f} | "
                  f"{np.median([r['fit_warm_s'] for r in sel]):.3f} |")


def _write(path, device, iters, rows):
    payload = dict(device=device, iters=iters, results=rows)
    with open(path + ".tmp", "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    os.replace(path + ".tmp", path)


if __name__ == "__main__":
    main()
