"""Leave-one-hologram-out cross-validation.

Replaces the reference's SLURM job-array generator
(generate_loho_cv_slurm_scripts.py:8-124 — whose worker scripts are not
even in the repo) with an in-process sweep: one fit per held-out
hologram, all sharing a single compiled program, held-out-trial
predictions collected per fold.

Two modes:
  * in-process sweep (default): every fold in one process, shared
    compiled program — right for a single TPU host;
  * single-fold worker (``--fold I``): fit exactly one held-out
    hologram and write ``<out>.fold_I.json`` — the job-array unit the
    cluster fan-out generator emits (scripts_tpu/generate_fanout_jobs.py;
    reference generate_loho_cv_slurm_scripts.py references worker
    scripts that don't exist in its repo).

Usage:
  python scripts_tpu/run_loho_cv.py --data expt.npz \
      [--demixer demixers/nwd_ie_ChroME2f.npz] --method caviar --out cv.json
  python scripts_tpu/run_loho_cv.py --data expt.npz --fold 3 --out cv.json
"""

import argparse
import json

import numpy as np

from circuitmap_tpu import Model, NeuralDemixer
from circuitmap_tpu.parallel.sweep import loho_folds
from circuitmap_tpu.utils.io import load_experiment


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", required=True)
    parser.add_argument("--demixer", default=None)
    parser.add_argument("--method", default="caviar",
                        choices=["caviar", "cavi_sns", "mbcs"])
    parser.add_argument("--msrmp", type=float, default=0.3)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--max_folds", type=int, default=None)
    parser.add_argument("--fold", type=int, default=None,
                        help="worker mode: run ONLY this fold index and "
                             "write <out>.fold_<I>.json")
    parser.add_argument("--out", default="loho_cv.json")
    args = parser.parse_args()

    psc, stim = load_experiment(args.data)
    if args.demixer:
        psc = NeuralDemixer(path=args.demixer)(psc)
    N, K = stim.shape

    folds = list(loho_folds(stim))
    if args.fold is not None:
        if not 0 <= args.fold < len(folds):
            raise SystemExit(
                f"--fold {args.fold} out of range (0..{len(folds) - 1})")
        folds = [folds[args.fold]]
        args.out = f"{args.out}.fold_{args.fold}.json"
    elif args.max_folds:
        folds = folds[: args.max_folds]
    print(f"{len(folds)} holograms; {K} trials")

    records = []
    for holo, train, test in folds:
        # pad/crop handled by shared shapes only when hologram sizes are
        # equal; otherwise each distinct train size compiles once
        model = Model(N)
        opts = {"iters": args.iters, "save_histories": False, "verbose": False}
        if args.method == "caviar":
            opts["msrmp"] = args.msrmp
        model.fit(psc[train], stim[:, train] * 1.0, method=args.method,
                  fit_options=opts)

        # held-out charge prediction from the training-fit weights:
        # expected charge = sum_n mu_n * p(spike | power) via power curve
        mu = model.state["mu"]
        y_test = np.trapezoid(psc[test], axis=-1)
        if "phi" in model.state:
            phi = model.state["phi"]
            drive = phi[:, 0:1] * stim[:, test] - phi[:, 1:2]
            p_spk = 1.0 / (1.0 + np.exp(-drive)) * (stim[:, test] > 0)
            y_hat = mu @ p_spk
        else:
            y_hat = mu @ (stim[:, test] > 0)
        err = float(np.mean((y_test - y_hat) ** 2))
        records.append({
            "hologram": holo, "test_trials": len(test), "seconds": model.time,
            "held_out_mse": err, "n_connections": int((mu != 0).sum()),
        })
        print(f"fold {holo}: mse={err:.4f} t={model.time:.2f}s")

    with open(args.out, "w") as f:
        json.dump(records, f)
    print("Wrote", args.out)


if __name__ == "__main__":
    main()
