"""Trace-wire quantisation fidelity study (round-2 verdict #10 + QAT).

Question: would a 4-bit trace wire (halving the remaining host->TPU
transfer versus the int8 wire the bench uses) preserve weight-recovery
R^2? Protocol: quantise simulated N=200/K=2000 PSC blocks to each wire
format host-side (per-trace peak scale, exactly as the demixer's
transfer_dtype path does), demix, fit CAVIaR (50 iters, msrmp 0.3),
compare truth-R^2 across seeds.

Round-3 verdict (stock checkpoint only): int8 lossless, linear int4
-0.028 mean R2 (rejected), mu-law int4 catastrophic (demixer OOD).

Round-4 revision: the int4 step noise (~7% of peak) is *in magnitude
range* of the demixer's training noise — the stock network had just
never seen its staircase structure. A quantisation-aware fine-tune
(scripts_tpu/train_qat_demixer.py: 150 epochs on 50k pairs with
int4-quantised inputs, clean targets, 7.2 min on the chip) recovers —
and beats — int8 fidelity at half the wire:

  int8 + stock ckpt   mean R2 0.9817
  int4 + stock ckpt   mean R2 0.9538   <- still rejected
  int4 + QAT ckpt     mean R2 0.9881
  int4d2 + stock      mean R2 0.9484   <- rejected
  int4d2 + QAT ckpt   mean R2 0.9862   <- SHIPPED: bench default wire
                                          (quarter of the int8 bytes,
                                          still above f32's 0.9816)

Usage: python scripts_tpu/wire_fidelity_study.py [--seeds 0 1 2]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def quantise(psc, bits, mulaw=False):
    """Per-trace-peak linear (or mu-law) quantisation, matching the
    demixer transfer_dtype wire semantics."""
    peak = np.abs(psc).max(axis=1, keepdims=True)
    peak = np.where(peak > 0, peak, 1.0)
    x = psc / peak
    qmax = 2 ** (bits - 1) - 1
    if mulaw:
        mu = 15.0
        y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
        q = np.rint(y * qmax) / qmax
        x = np.sign(q) * np.expm1(np.abs(q) * np.log1p(mu)) / mu
    else:
        x = np.rint(x * qmax) / qmax
    return (x * peak).astype(np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2])
    ap.add_argument("--out", default=os.path.join(REPO, "WIRE_STUDY.json"))
    args = ap.parse_args()

    from circuitmap_tpu.demix import NeuralDemixer
    from circuitmap_tpu.model import Model
    from circuitmap_tpu.simulation import simulate
    from circuitmap_tpu.utils.metrics import r2_score

    from circuitmap_tpu.demix.demixer import wire_transform

    ck = os.path.join(REPO, "demixers", "nwd_ie_ChroME2f.npz")
    ck_qat = os.path.join(REPO, "demixers", "nwd_ie_ChroME2f_int4qat.npz")
    ck_d2 = os.path.join(REPO, "demixers",
                         "nwd_ie_ChroME2f_int4d2qat.npz")
    rows = []
    for seed in args.seeds:
        np.random.seed(seed)
        sim = simulate(N=200, trials=2000, H=10, connection_prob=0.05,
                       verbose=False)
        dem = NeuralDemixer(ck)
        dem_qat = NeuralDemixer(ck_qat) if os.path.exists(ck_qat) else None
        dem_d2 = NeuralDemixer(ck_d2) if os.path.exists(ck_d2) else None
        configs = [
            ("f32", dem, sim["psc"]),
            ("int8", dem, quantise(sim["psc"], 8)),
            ("int4", dem, quantise(sim["psc"], 4)),
            ("int4-mulaw", dem, quantise(sim["psc"], 4, mulaw=True)),
            ("int4d2", dem, wire_transform(sim["psc"], 4, decimate=2)),
        ]
        if dem_qat is not None:
            configs.append(("int4-qat", dem_qat, quantise(sim["psc"], 4)))
        if dem_d2 is not None:
            configs.append(
                ("int4d2-qat", dem_d2,
                 wire_transform(sim["psc"], 4, decimate=2)))
        for tag, net, psc_in in configs:
            d = net(psc_in, verbose=False)
            m = Model(200)
            m.fit(d, sim["stim_matrix"], method="caviar",
                  fit_options={"iters": 50, "msrmp": 0.3, "verbose": False,
                               "powers": [45.0, 55.0, 65.0], "seed": 0})
            r2 = float(r2_score(sim["weights"], m.state["mu"]))
            rows.append({"seed": seed, "wire": tag, "truth_r2": round(r2, 4)})
            print(rows[-1], flush=True)

    summary = {}
    for tag in ("f32", "int8", "int4", "int4-mulaw", "int4-qat",
                "int4d2", "int4d2-qat"):
        vals = [r["truth_r2"] for r in rows if r["wire"] == tag]
        if vals:
            summary[tag] = {"mean_r2": round(float(np.mean(vals)), 4),
                            "min_r2": min(vals)}
    verdict = {
        "protocol": "per-trace-peak quantisation -> NWD demix -> CAVIaR "
                    "(N=200 K=2000, 50 iters, msrmp 0.3), truth-R2",
        "rows": rows,
        "summary": summary,
        "conclusion": "int8 lossless vs f32; int4 on the stock checkpoint "
                      "rejected (mean R2 -0.03); mu-law int4 rejected "
                      "(demixer OOD); int4+QAT beats int8 fidelity at "
                      "half the wire; int4d2+QAT (mean-pool 2x, device "
                      "upsample) stays above the f32 wire at a QUARTER "
                      "of the int8 bytes — the bench default from "
                      "round 4 (train_qat_demixer.py --decimate 2).",
    }
    json.dump(verdict, open(args.out, "w"), indent=2)
    print("wrote", args.out)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
