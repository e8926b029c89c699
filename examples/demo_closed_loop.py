"""Demo: closed-loop connectivity mapping with the streaming solver.

The reference workflow is strictly offline — stimulate with a fixed
design, record everything, fit afterwards. This demo runs the loop the
`OnlineCaviar` solver exists for: after every acquisition block the
interim posterior decides WHERE the next trials go. Neurons whose
status is resolved — detected connections, or nulls that have already
been stimulated enough times at max power without evidence — drop out
of the stimulation pool, and the remaining trial budget concentrates
on the undecided rest.

Both arms spend the SAME total trial budget and the same CAVI
iteration schedule; the only difference is the design policy:

  static   — one blockwise design drawn up front (the reference's
             protocol), streamed block by block
  adaptive — each block's ensembles drawn only over the unresolved
             neuron pool from the interim posterior

Ground truth is held fixed across rounds via simulate()'s closed-loop
extension (stim_matrix= plus weights=/phi_0=/phi_1=/kernel=).

  python examples/demo_closed_loop.py [--N 200 --rounds 6 --block 360]
"""

import argparse

import numpy as np

import circuitmap_tpu as cm
from circuitmap_tpu.design import AdaptiveDesigner
from circuitmap_tpu.simulation import blockwise_design
from circuitmap_tpu.utils.metrics import (precision_recall_connections,
                                          r2_score)

POWERS = [45.0, 55.0, 65.0]


def synth_block(truth, stim):
    """Trials for a chosen design over the fixed ground-truth circuit."""
    return cm.simulate(
        N=truth["weights"].size, stim_matrix=stim,
        weights=truth["weights"], phi_0=truth["phi_0"],
        phi_1=truth["phi_1"], kernel=(truth["tau_r"], truth["tau_d"]),
        powers=POWERS, verbose=False,
    )["psc"]


def run_arm(truth, designs, iters_per_round, adaptive, H,
            null_trials=18, conn_trials=30):
    """Stream rounds; the adaptive arm redraws each round's design over
    the unresolved pool (``AdaptiveDesigner`` — the library's design
    policy, see circuitmap_tpu/design.py) and STOPS once every neuron
    is resolved. Round 0's design is shared between arms so the two
    trajectories start from identical data.
    """
    N = truth["weights"].size
    oc = cm.OnlineCaviar(N, powers=POWERS)
    designer = AdaptiveDesigner(N, H, POWERS, null_trials=null_trials,
                                conn_trials=conn_trials)
    history = []
    for r, stim in enumerate(designs):
        if adaptive and r > 0:
            stim = designer.next_design(stim.shape[1])
        psc = synth_block(truth, stim)
        oc.update(psc, stim, iters=iters_per_round)
        post = oc.posterior()
        designer.observe(stim, post)
        r2 = r2_score(truth["weights"], post["mu"])
        prec, rec = precision_recall_connections(truth["weights"],
                                                 post["mu"])
        history.append((oc.trial_count, float(r2), float(prec),
                        float(rec), int(designer.pool.size)))
        if adaptive and designer.resolved:
            break  # every neuron resolved: the experiment can end
    return history


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--N", type=int, default=200)
    parser.add_argument("--H", type=int, default=10)
    parser.add_argument("--rounds", type=int, default=6)
    parser.add_argument("--block", type=int, default=360)
    parser.add_argument("--iters", type=int, default=8,
                        help="CAVI iterations per round")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    np.random.seed(args.seed)
    print(f"Fixing a ground-truth circuit (N={args.N})...")
    pilot = cm.simulate(N=args.N, trials=args.block, H=args.H,
                        connection_prob=0.05, powers=POWERS, verbose=False)
    truth = {k: pilot[k] for k in
             ("weights", "phi_0", "phi_1", "tau_r", "tau_d")}
    n_conn = int((truth["weights"] != 0).sum())
    print(f"  {n_conn} true connections")

    # the static arm's full design, drawn up front; round 0 is shared
    static_designs = [
        blockwise_design(args.N, args.H, args.block, POWERS)
        for _ in range(args.rounds)
    ]

    print("\nStatic design (reference protocol, streamed):")
    np.random.seed(args.seed + 1)
    stat = run_arm(truth, static_designs, args.iters, adaptive=False,
                   H=args.H)
    for k, r2, p, rec, pool in stat:
        print(f"  trials={k:5d}  R2={r2:.3f}  precision={p:.2f} "
              f"recall={rec:.2f}")

    print("\nAdaptive design (posterior-guided pool):")
    np.random.seed(args.seed + 1)
    adap = run_arm(truth, static_designs, args.iters, adaptive=True,
                   H=args.H)
    for k, r2, p, rec, pool in adap:
        print(f"  trials={k:5d}  R2={r2:.3f}  precision={p:.2f} "
              f"recall={rec:.2f}  pool={pool}")

    print(f"\nfinal R2: static={stat[-1][1]:.3f} ({stat[-1][0]} trials)  "
          f"adaptive={adap[-1][1]:.3f} ({adap[-1][0]} trials)")
    if adap[-1][4] == 0:
        saved = stat[-1][0] - adap[-1][0]
        print(f"closed-loop demo done: every neuron resolved after "
              f"{adap[-1][0]} trials — {saved} fewer than the static "
              f"protocol's budget")
    else:
        print(f"closed-loop demo done: adaptive pool narrowed "
              f"{args.N} -> {adap[-1][4]} candidates")


if __name__ == "__main__":
    main()
