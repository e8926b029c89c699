"""Measure caviar_many cold-compile + warm time per compile_mode.

Round-3 verdict weak #2: the vmapped-scan XLA compile made first use of
``caviar_many`` cost minutes (287 s at B=8/N=300/K=2000 through the
tunnel's remote compiler). ``compile_mode="sequential"`` reuses the
single-fit executable instead. This script measures both modes
cold (fresh subprocess, persistent compile cache disabled) and warm,
writing COMPILE_STUDY.json.

Run on the real TPU with nothing else on the chip:
  python scripts_tpu/measure_many_compile.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys, time, json
import numpy as np
sys.path.insert(0, %(repo)r)
mode = %(mode)r
import jax
from circuitmap_tpu.model import default_priors
from circuitmap_tpu.simulation import simulate
from circuitmap_tpu.solvers import caviar_many

np.random.seed(0)
sim = simulate(N=300, trials=2000, H=10, connection_prob=0.05,
               verbose=False)
B = 8
pscs = np.stack([sim["psc"]] * B)
stims = np.stack([sim["stim_matrix"]] * B)
p = default_priors(300)
args = (pscs, stims, p["mu"], p["beta"], p["shape"], p["rate"], p["phi"],
        p["phi_cov"])
kw = dict(iters=50, msrmp=0.3, seeds=list(range(B)), verbose=False,
          compile_mode=mode)

times = []
for rep in range(4):
    t0 = time.time()
    out = caviar_many(*args, **kw)
    np.asarray(out[-1]["mu"][:1])  # forced pull: settle everything
    times.append(time.time() - t0)
print("RESULT " + json.dumps({"mode": mode, "cold_s": round(times[0], 1),
                              "warm_s": round(min(times[1:]), 2),
                              "times": [round(t, 2) for t in times]}),
      flush=True)
"""


def main():
    results = []
    for mode in ("sequential", "batched"):
        env = dict(os.environ)
        env["CIRCUITMAP_TPU_NO_COMPILE_CACHE"] = "1"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", _WORKER % {"repo": REPO, "mode": mode}],
            env=env, capture_output=True, text=True, timeout=3600)
        if proc.returncode != 0:
            print(proc.stdout[-2000:], proc.stderr[-2000:])
            raise RuntimeError(f"{mode} worker failed")
        line = [l for l in proc.stdout.splitlines()
                if l.startswith("RESULT ")][-1]
        rec = json.loads(line[len("RESULT "):])
        rec["wall_s"] = round(time.time() - t0, 1)
        results.append(rec)
        print(rec, flush=True)

    out = {
        "config": "B=8 N=300 K=2000 iters=50, tunneled v5e, persistent "
                  "compile cache disabled, cold = first call in a fresh "
                  "process, warm = best of 3 subsequent (forced pulls)",
        "results": results,
    }
    json.dump(out, open(os.path.join(REPO, "COMPILE_STUDY.json"), "w"),
              indent=2)
    print("wrote COMPILE_STUDY.json")


if __name__ == "__main__":
    main()
