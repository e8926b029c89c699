"""Trace-wire quantisation fidelity study (round-2 verdict #10).

Question: would a 4-bit trace wire (halving the remaining host->TPU
transfer versus the int8 wire the bench uses) preserve weight-recovery
R^2? Protocol: quantise simulated N=200/K=2000 PSC blocks to each wire
format host-side (per-trace peak scale, exactly as the demixer's
transfer_dtype path does), demix with the shipped ChroME2f checkpoint,
fit CAVIaR (50 iters, msrmp 0.3), compare truth-R^2 across seeds.

Committed verdict (WIRE_STUDY.json, 2026-08-17, 3 seeds):

  f32        mean R2 0.9816  (min 0.9739)
  int8       mean R2 0.9817  (min 0.9739)   <- current wire: lossless
  int4       mean R2 0.9538  (min 0.9348)   <- REJECTED: -0.028 mean,
                                               far beyond seed noise
  int4-mulaw mean R2 0.6552  (min 0.6218)   <- REJECTED: the NWD was
                                               trained on linear-noise
                                               traces; companded
                                               quantisation error is
                                               out-of-distribution

Conclusion: int8 (0.4% of per-trace peak) sits below recording noise;
int4's 7%-of-peak step does not. The 4-bit leftover is closed as
rejected — further bench wins must come from elsewhere (the transfer is
~0.3 s of the 0.84 s bench; fit ~0.3 s; the rest is tunnel latency).

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

    ck = os.path.join(REPO, "demixers", "nwd_ie_ChroME2f.npz")
    rows = []
    for seed in args.seeds:
        np.random.seed(seed)
        sim = simulate(N=200, trials=2000, H=10, connection_prob=0.05,
                       verbose=False)
        dem = NeuralDemixer(ck)
        for tag, psc_in in [
            ("f32", sim["psc"]),
            ("int8", quantise(sim["psc"], 8)),
            ("int4", quantise(sim["psc"], 4)),
            ("int4-mulaw", quantise(sim["psc"], 4, mulaw=True)),
        ]:
            d = dem(psc_in, verbose=False)
            m = Model(200)
            m.fit(d, sim["stim_matrix"], method="caviar",
                  fit_options={"iters": 50, "msrmp": 0.3, "verbose": False,
                               "powers": [45.0, 55.0, 65.0], "seed": 0})
            r2 = float(r2_score(sim["weights"], m.state["mu"]))
            rows.append({"seed": seed, "wire": tag, "truth_r2": round(r2, 4)})
            print(rows[-1], flush=True)

    summary = {}
    for tag in ("f32", "int8", "int4", "int4-mulaw"):
        vals = [r["truth_r2"] for r in rows if r["wire"] == tag]
        summary[tag] = {"mean_r2": round(float(np.mean(vals)), 4),
                        "min_r2": min(vals)}
    verdict = {
        "protocol": "per-trace-peak quantisation -> NWD demix -> CAVIaR "
                    "(N=200 K=2000, 50 iters, msrmp 0.3), truth-R2",
        "rows": rows,
        "summary": summary,
        "conclusion": "int8 lossless vs f32; int4 rejected (mean R2 drop "
                      "~0.03, beyond seed noise); mu-law int4 rejected "
                      "(demixer OOD). 4-bit wire leftover closed.",
    }
    json.dump(verdict, open(args.out, "w"), indent=2)
    print("wrote", args.out)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
