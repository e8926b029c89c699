"""Measure the reference implementation on the BASELINE.json configs.

BASELINE.md's protocol: the reference repo publishes no numbers, so
baselines "must be measured locally by running the reference on the
five BASELINE.json configs". This script does exactly that — it runs
the *actual* reference solver code (imported from /root/reference via
the same shim the parity tests use, tests/test_reference_parity.py:33-54)
and the reference NWD network (plain-torch rebuild of the Lightning
module, scripts_tpu/_torch_refnet.py) on identical data as this
framework, on the same CPU host, and writes wall-clock + posterior
agreement to BASELINE_MEASURED.json.

Hardware note: both sides run on the host CPU here — the reference is
CUDA/torch+JAX-CPU code that cannot run on a TPU, so same-host CPU is
the only apples-to-apples comparison. This framework's TPU numbers come
from bench.py and are recorded separately by the driver.

Caveats recorded in the output:
  * config 4 (NWD training): pytorch-lightning is not installed, so the
    reference side is the identical net/optimiser/loss (SGD lr=1e-2,
    MSE, batch 64 — neural_waveform_demixing.py:289-306) driven by a
    plain torch loop instead of pl.Trainer.
  * config 5 (1v10 pipeline): the experimental .mat grids are not
    shipped with the reference repo, so the end-to-end demix+CAVIaR
    core runs on a simulated ensemble map of the same shape.

Usage:
  python scripts_tpu/measure_reference_baseline.py            # all configs
  python scripts_tpu/measure_reference_baseline.py --configs 2 --iters 50
"""

import argparse
import json
import os
import platform
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from circuitmap_tpu.model import Model, default_priors
from circuitmap_tpu.simulation import simulate
from circuitmap_tpu.utils.metrics import r2_score

REF = "/root/reference/circuitmap/optimise"
CKPT = "/root/reference/demixers/nwd_ie_ChroME2f.ckpt"
OUR_CKPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "demixers", "nwd_ie_ChroME2f.npz")


def load_reference_solvers():
    """Import the reference solver modules through a shim package."""
    root = tempfile.mkdtemp(prefix="refshim_")
    pkg = os.path.join(root, "ref_optimise")
    os.makedirs(pkg)
    open(os.path.join(pkg, "__init__.py"), "w").write("")
    for f in ("caviar.py", "pava.py", "cavi_sns.py"):
        shutil.copy(os.path.join(REF, f), os.path.join(pkg, f))
    # reference cavi_sns is unrunnable as shipped (UnboundLocalError at
    # cavi_sns.py:138/146); apply the evident one-line fix.
    path = os.path.join(pkg, "cavi_sns.py")
    src = open(path).read()
    src = src.replace("\t\tlam_vector, current_key = carry\n",
                      "\t\tlam_vector, key = carry\n")
    open(path, "w").write(src)
    sys.path.insert(0, root)
    import ref_optimise.caviar
    import ref_optimise.cavi_sns
    return ref_optimise.caviar, ref_optimise.cavi_sns


def _support_overlap(a, b):
    sa, sb = set(np.flatnonzero(a)), set(np.flatnonzero(b))
    return {"reference": len(sa), "ours": len(sb),
            "intersection": len(sa & sb)}


def config1_cavi_sns(ref_sns, iters):
    """CAVI-SnS on a simulated single-target map (N=300, K=2k, CPU)."""
    np.random.seed(1)
    sim = simulate(N=300, trials=2000, H=1, connection_prob=0.1,
                   spont_prob=0.01, gp_scale=1e-3, verbose=False)
    p = default_priors(300)
    args = (sim["psc"], sim["stim_matrix"], p["mu"], p["beta"], p["alpha"],
            p["shape"], p["rate"], p["phi"], p["phi_cov"])

    t0 = time.time()
    ref = ref_sns.cavi_sns(*args, iters=iters, seed=1, save_histories=False)
    np.asarray(ref[0])  # force completion: async dispatch would stop the
    t_ref = time.time() - t0   # clock before the compute finishes

    from circuitmap_tpu.solvers import cavi_sns

    t0 = time.time()
    ours = cavi_sns(*args, iters=iters, seed=1, save_histories=False,
                    verbose=False)
    np.asarray(ours[0])
    t_cold = time.time() - t0
    t0 = time.time()
    ours = cavi_sns(*args, iters=iters, seed=1, save_histories=False,
                    verbose=False)
    np.asarray(ours[0])
    t_warm = time.time() - t0

    w_ref = np.asarray(ref[0]) * np.asarray(ref[2])
    w_ours = np.asarray(ours[0]) * np.asarray(ours[2])
    return {
        "config": "CAVI-SnS, simulated single-target map, N=300 K=2000",
        "iters": iters,
        "reference_seconds": t_ref,
        "ours_seconds_cold": t_cold,
        "ours_seconds_warm": t_warm,
        "speedup_warm": t_ref / t_warm,
        "effective_weight_r2_vs_reference": r2_score(w_ref, w_ours),
        "truth_r2_reference": r2_score(sim["weights"], w_ref),
        "truth_r2_ours": r2_score(sim["weights"], w_ours),
    }


def config2_caviar_flagship(ref_caviar, iters, N, K):
    """CAVIaR at flagship scale on demixed ensemble data (msrmp=0.3).

    This is both the headline wall-clock comparison and the
    flagship-scale posterior-agreement evidence (PARITY.md previously
    only showed R2 vs the reference at N=300).
    """
    from circuitmap_tpu.demix import NeuralDemixer

    np.random.seed(2)
    sim = simulate(N=N, trials=K, H=10, connection_prob=0.05, verbose=False)
    # f64: the reference crashes on f32 traces (mixed-dtype while_loop
    # carry in its spontaneous-activity update; see PARITY.md)
    demixed = np.asarray(
        NeuralDemixer(OUR_CKPT)(sim["psc"], verbose=False), np.float64)
    p = default_priors(N)
    args = (demixed, sim["stim_matrix"], p["mu"], p["beta"], p["shape"],
            p["rate"], p["phi"], p["phi_cov"])

    t0 = time.time()
    ref = ref_caviar.caviar(*args, iters=iters, msrmp=0.3, seed=0,
                            fn_scan=False)
    np.asarray(ref[0])  # force completion (async dispatch)
    t_ref = time.time() - t0

    from circuitmap_tpu.solvers import caviar

    t0 = time.time()
    ours = caviar(*args, iters=iters, msrmp=0.3, seed=0, fn_scan=False,
                  verbose=False)
    np.asarray(ours[0])
    t_cold = time.time() - t0
    t0 = time.time()
    ours = caviar(*args, iters=iters, msrmp=0.3, seed=0, fn_scan=False,
                  verbose=False)
    np.asarray(ours[0])
    t_warm = time.time() - t0

    mu_ref, mu_ours = np.asarray(ref[0]), np.asarray(ours[0])
    return {
        "config": f"CAVIaR, demixed ensemble stim, N={N} K={K}, msrmp=0.3",
        "iters": iters,
        "reference_seconds": t_ref,
        "ours_seconds_cold": t_cold,
        "ours_seconds_warm": t_warm,
        "speedup_warm": t_ref / t_warm,
        "mu_r2_vs_reference": r2_score(mu_ref, mu_ours),
        "support": _support_overlap(mu_ref, mu_ours),
        "truth_r2_reference": r2_score(sim["weights"], mu_ref),
        "truth_r2_ours": r2_score(sim["weights"], mu_ours),
    }


def config3_nwd_inference(K):
    """NWD forward pass (nwd_ie_ChroME2f) over K x 900 PSC traces."""
    import torch

    from _torch_refnet import build_reference_net, reference_demix
    from circuitmap_tpu.demix import NeuralDemixer

    np.random.seed(3)
    traces = np.abs(np.random.normal(size=(K, 900))).astype(np.float32)

    sd = torch.load(CKPT, map_location="cpu", weights_only=False)["state_dict"]
    net = build_reference_net(sd)
    reference_demix(net, traces[:256])  # torch warm-up
    t0 = time.time()
    ref_out = reference_demix(net, traces)
    t_ref = time.time() - t0

    demix = NeuralDemixer(OUR_CKPT)
    demix(traces[:256], verbose=False)  # compile warm-up
    t0 = time.time()
    our_out = demix(traces, verbose=False)
    t_ours = time.time() - t0

    corr = np.corrcoef(ref_out.ravel(), our_out.ravel())[0, 1]
    return {
        "config": f"NWD inference, nwd_ie_ChroME2f, K={K} traces",
        "reference_seconds": t_ref,
        "reference_traces_per_sec": K / t_ref,
        "ours_seconds_warm": t_ours,
        "ours_traces_per_sec": K / t_ours,
        "speedup_warm": t_ref / t_ours,
        "output_correlation": float(corr),
    }


def config4_nwd_training(epochs, size):
    """NWD training from simulated PSC templates, identical data/recipe."""
    import torch

    from _torch_refnet import build_reference_net
    from circuitmap_tpu.demix import NeuralDemixer

    demix = NeuralDemixer(seed=0)
    (x_tr, y_tr), _ = demix.generate_training_data(size=size, seed=0)

    # reference side: same net/optimiser/loss, plain torch loop
    net = build_reference_net()
    net.train()
    opt = torch.optim.SGD(net.parameters(), lr=1e-2)
    xt = torch.from_numpy(np.asarray(x_tr, np.float32))
    yt = torch.from_numpy(np.asarray(y_tr, np.float32))
    n, bs = xt.shape[0], 64
    t0 = time.time()
    for _ in range(epochs):
        perm = torch.randperm(n)
        for k0 in range(0, n - bs + 1, bs):
            idx = perm[k0:k0 + bs]
            opt.zero_grad()
            loss = torch.mean(
                (net(xt[idx][:, None, :])[:, 0, :] - yt[idx]) ** 2)
            loss.backward()
            opt.step()
    t_ref = time.time() - t0

    demix.train(epochs=1, batch_size=64, verbose=False)  # compile warm-up
    t0 = time.time()
    demix.train(epochs=epochs, batch_size=64, verbose=False)
    t_ours = time.time() - t0

    return {
        "config": f"NWD training, {size} simulated pairs, {epochs} epochs, "
                  "SGD lr=1e-2 MSE batch=64",
        "note": "pytorch-lightning unavailable; reference measured as the "
                "identical net/optimiser/loss under a plain torch loop",
        "reference_seconds": t_ref,
        "reference_sec_per_epoch": t_ref / epochs,
        "ours_seconds_warm": t_ours,
        "ours_sec_per_epoch": t_ours / epochs,
        "speedup_warm": t_ref / t_ours,
    }


def config5_end_to_end(ref_caviar, iters):
    """End-to-end demix + CAVIaR (the 1v10 pipeline core) on a simulated
    ensemble map (the reference repo ships no experimental .mat data)."""
    import torch

    from _torch_refnet import build_reference_net, reference_demix
    from circuitmap_tpu.demix import NeuralDemixer

    np.random.seed(5)
    sim = simulate(N=300, trials=2000, H=10, connection_prob=0.05,
                   verbose=False)
    p = default_priors(300)

    sd = torch.load(CKPT, map_location="cpu", weights_only=False)["state_dict"]
    net = build_reference_net(sd)
    t0 = time.time()
    ref_dem = np.asarray(reference_demix(net, sim["psc"]), np.float64)
    ref = ref_caviar.caviar(
        ref_dem, sim["stim_matrix"], p["mu"], p["beta"], p["shape"],
        p["rate"], p["phi"], p["phi_cov"], iters=iters, msrmp=0.3, seed=0,
        fn_scan=False)
    np.asarray(ref[0])  # force completion (async dispatch)
    t_ref = time.time() - t0

    def ours_once():
        demix = NeuralDemixer(OUR_CKPT)
        model = Model(300, priors=dict(p))
        dem = demix(sim["psc"], verbose=False)
        model.fit(dem, sim["stim_matrix"], method="caviar",
                  fit_options={"iters": iters, "msrmp": 0.3, "seed": 0,
                               "fn_scan": False, "verbose": False})
        return model

    t0 = time.time()
    model = ours_once()
    t_cold = time.time() - t0
    t0 = time.time()
    model = ours_once()
    t_warm = time.time() - t0

    mu_ref = np.asarray(ref[0])
    return {
        "config": "end-to-end demix + CAVIaR, N=300 K=2000 (1v10 core; "
                  "simulated — reference ships no experimental .mat)",
        "iters": iters,
        "reference_seconds": t_ref,
        "ours_seconds_cold": t_cold,
        "ours_seconds_warm": t_warm,
        "speedup_warm": t_ref / t_warm,
        "mu_r2_vs_reference": r2_score(mu_ref, model.state["mu"]),
        "truth_r2_reference": r2_score(sim["weights"], mu_ref),
        "truth_r2_ours": r2_score(sim["weights"], model.state["mu"]),
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--configs", type=int, nargs="*",
                        default=[1, 2, 3, 4, 5])
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--flagship-n", type=int, default=1000)
    # K=10000 keeps each neuron at ~30 trials/power (identifiable fits —
    # at K=2000 both solvers are data-starved and the parity R2 is
    # meaningless noise) while the reference still finishes in ~1 h
    parser.add_argument("--flagship-k", type=int, default=10000)
    parser.add_argument("--nwd-k", type=int, default=20000)
    parser.add_argument("--train-epochs", type=int, default=5)
    parser.add_argument("--train-size", type=int, default=5000)
    parser.add_argument("--out", default="BASELINE_MEASURED.json")
    args = parser.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    ref_caviar, ref_sns = load_reference_solvers()

    results = {
        "protocol": "reference code from /root/reference via shim; both "
                    "sides same data, same CPU host (the reference cannot "
                    "run on TPU); this framework's TPU numbers live in "
                    "bench.py / BENCH_r*.json",
        "host": platform.processor() or platform.machine(),
        "cpu_count": os.cpu_count(),
        "configs": {},
    }
    # partial re-measurements merge into the committed file instead of
    # clobbering the configs they didn't run (incl. the "2vr"
    # deterministic-parity row written by parity_variance_reduced.py)
    if os.path.exists(args.out):
        try:
            results["configs"] = json.load(open(args.out)).get("configs", {})
        except (json.JSONDecodeError, OSError):
            pass
    runners = {
        1: lambda: config1_cavi_sns(ref_sns, args.iters),
        2: lambda: config2_caviar_flagship(
            ref_caviar, args.iters, args.flagship_n, args.flagship_k),
        3: lambda: config3_nwd_inference(args.nwd_k),
        4: lambda: config4_nwd_training(args.train_epochs, args.train_size),
        5: lambda: config5_end_to_end(ref_caviar, args.iters),
    }
    for c in args.configs:
        print(f"=== config {c} ===", flush=True)
        results["configs"][str(c)] = runners[c]()
        print(json.dumps(results["configs"][str(c)], indent=2), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
