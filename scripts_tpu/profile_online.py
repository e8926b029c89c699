"""Steady-state OnlineCaviar.update() latency on the real chip.

Closed-loop mapping cares about one number: how long after a block of
trials lands does the refreshed posterior come back? This measures the
full update path (host block prep + wire + insert + warm-started CAVI
iterations + per-update fn-scan) at steady state — fixed capacity, all
programs compiled — plus the posterior() readout pull.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python
    scripts_tpu/profile_online.py [N] [block] [iters]
"""

import json
import sys
import time

import numpy as np

import circuitmap_tpu as cm


def main():
    argv = [a for a in sys.argv[1:] if a.isdigit()]
    N = int(argv[0]) if len(argv) > 0 else 500
    block = int(argv[1]) if len(argv) > 1 else 256
    iters = int(argv[2]) if len(argv) > 2 else 10
    n_blocks = 12

    np.random.seed(0)
    sim = cm.simulate(N=N, trials=block * n_blocks, H=10,
                      connection_prob=0.05, verbose=False, batch_size=1000)

    # fixed capacity: no growth mid-measurement
    oc = cm.OnlineCaviar(N, powers=[45.0, 55.0, 65.0],
                         capacity=block * n_blocks)
    update_ms, readout_ms = [], []
    for b in range(n_blocks):
        sl = slice(b * block, (b + 1) * block)
        t0 = time.time()
        oc.update(sim["psc"][sl], sim["stim_matrix"][:, sl], iters=iters)
        # the posterior readout forces completion (axon block_until_ready
        # returns early; posterior() ends in a host pull)
        t1 = time.time()
        post = oc.posterior()
        t2 = time.time()
        update_ms.append((t1 - t0) * 1e3)
        readout_ms.append((t2 - t1) * 1e3)

    from circuitmap_tpu.utils.metrics import r2_score

    r2 = float(r2_score(sim["weights"], post["mu"]))
    # the honest closed-loop latency is update + readout: update() ends
    # in async dispatches, so its own wall time is enqueue-only — the
    # posterior() pull is what forces completion
    total_ms = [u + r for u, r in zip(update_ms, readout_ms)]
    steady = sorted(total_ms[3:])  # skip compile/warm blocks
    print(json.dumps({
        "N": N, "block": block, "iters_per_update": iters,
        "blocks": n_blocks, "trials_total": block * n_blocks,
        "latency_ms_per_block": [round(u, 1) for u in total_ms],
        "steady_latency_ms_median": round(steady[len(steady) // 2], 1),
        "steady_latency_ms_best": round(steady[0], 1),
        "dispatch_ms_median": round(
            sorted(update_ms)[len(update_ms) // 2], 1),
        "final_r2_vs_truth": round(r2, 4),
    }))


if __name__ == "__main__":
    main()
