"""Locate the single-chip memory cliff of the CAVIaR fit path.

The fit's device working set is dominated by the [N, K] f32 arrays
(stimulus design + spike posterior lam, plus the scan's carry copy and
sweep temporaries — roughly 4-5 live copies of 4*N*K_pad bytes, K
padded to a multiple of 128), so on a 16 GB v5e the cliff sits near
N*K ~ 1e9. This script measures it: for a ladder of shapes it launches
ONE SUBPROCESS per shape (a TPU OOM must not poison the allocator for
the next probe), synthesises a random hologram design + traces (no
full simulation — only the memory footprint matters here), runs a
short public `caviar()` fit, and records ok / oom. Results →
MEMORY_CLIFF.json, summarised in SCALING.md.

Shapes past the cliff route to the trial-sharded solvers
(parallel/sharded.py: every [.., K] array partitions over the mesh, so
P devices raise the ceiling ~P times) or, across hosts, to
parallel/distributed.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts_tpu/probe_memory_cliff.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

# the ladder: (N, K). 4*N*K bytes per [N,K] f32 array.
LADDER = [
    (2000, 100_000),    # 0.8 GB/array
    (5000, 100_000),    # 2.0 GB/array
    (10000, 100_000),   # 4.0 GB/array
    (20000, 100_000),   # 8.0 GB/array — expected past the cliff
]

_CHILD = """
import json, sys, time
import numpy as np

N, K = int(sys.argv[1]), int(sys.argv[2])
rng = np.random.default_rng(0)

# hologram design: H=10 targets/trial, 3 power levels (bench protocol)
H, powers = 10, np.array([45.0, 55.0, 65.0], np.float32)
stim = np.zeros((N, K), np.float32)
cols = np.repeat(np.arange(K), H)
rows = rng.integers(0, N, size=K * H)
stim[rows, cols] = rng.choice(powers, size=K * H)

# traces: random PSC-scale noise; footprint (not recovery) is measured
traces = rng.standard_normal((K, 900)).astype(np.float32) * 0.01

from circuitmap_tpu.model import default_priors
from circuitmap_tpu.solvers import caviar

p = default_priors(N)
t0 = time.time()
out = caviar(traces, stim, p["mu"], p["beta"], p["shape"], p["rate"],
             p["phi"], p["phi_cov"], iters=2, msrmp=0.3,
             powers=[45.0, 55.0, 65.0], trace_wire="int8",
             fn_scan=False, verbose=False)
np.asarray(out[0][:1])
print(json.dumps({"ok": True, "seconds": round(time.time() - t0, 1)}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="first ladder rung only (harness smoke test)")
    ap.add_argument("--out", default="MEMORY_CLIFF.json")
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    ladder = LADDER[:1] if args.quick else LADDER
    results = []
    for N, K in ladder:
        gb = 4 * N * K / 1e9
        print(f"probe N={N} K={K} ({gb:.1f} GB per [N,K] array)...",
              flush=True)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, str(N), str(K)],
            capture_output=True, text=True, timeout=args.timeout,
            env={**os.environ,
                 "PYTHONPATH": "/root/repo:/root/.axon_site"},
        )
        wall = round(time.time() - t0, 1)
        tail = (proc.stdout + proc.stderr).strip().splitlines()
        # the result line may not be LAST: the child's stderr (jax
        # platform warnings) is concatenated after stdout
        marks = [l for l in tail if l.startswith('{"ok"')]
        last = marks[-1] if marks else (tail[-1] if tail else "")
        if proc.returncode == 0 and last.startswith("{"):
            row = dict(N=N, K=K, gb_per_array=round(gb, 2),
                       wall_seconds=wall, **json.loads(last))
        else:
            oom = any("RESOURCE_EXHAUSTED" in l or "out of memory" in l.lower()
                      for l in tail)
            row = dict(N=N, K=K, gb_per_array=round(gb, 2), ok=False,
                       oom=oom, wall_seconds=wall,
                       error=last[-300:] if last else "no output")
        results.append(row)
        print(json.dumps(row), flush=True)
        if not row["ok"]:
            break  # everything larger also fails; don't wedge the tunnel

    with open(args.out, "w") as f:
        json.dump(dict(device="TPU v5 lite (16 GB HBM)",
                       protocol="caviar iters=2, int8 trace wire, "
                                "H=10 hologram design, fn_scan off",
                       results=results), f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
