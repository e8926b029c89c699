"""Demo: a full closed-loop mapping experiment against the fit server.

Launches the resident daemon (`python -m circuitmap_tpu serve`) in a
subprocess — the process that owns the accelerator — then plays the
acquisition machine: numpy + stdlib client only, no model state on the
rig. The loop is the production protocol (docs/DEPLOY.md "Serving"):

1. ``stream_design`` asks the server-resident design policy where to
   stimulate next (round 0 needs no posterior);
2. the "rig" acquires the designed block (here: ``simulate`` over a
   fixed ground-truth circuit, ``stim_matrix=`` closed-loop mode);
3. ``stream_update`` streams the block back — the server warm-starts
   CAVI from the current posterior and folds the block into the policy;
4. repeat until ``resolved`` — every neuron is a pinned connection or
   an evidenced null — then read the full posterior and stop early.

A batch ``fit`` of the same trials runs at the end for comparison, and
the stream is checkpointed (``--state-dir``) the way a crash-tolerant
deployment would.

  python examples/demo_fit_server.py [--n 40] [--block 192] [--h 5]

No reference analogue: the reference's serving story is one NeuroCAAS
cloud job per completed experiment file (reference main.py:1-40).
"""

import argparse
import os
import select
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POWERS = [45.0, 55.0, 65.0]


def launch_server(state_dir):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "circuitmap_tpu", "serve", "--port", "0",
         "--state-dir", state_dir],
        cwd=REPO, env=env, stdout=subprocess.PIPE, text=True)
    deadline = time.time() + 180
    while time.time() < deadline:
        ready, _, _ = select.select([proc.stdout], [], [], 1.0)
        if not ready:
            continue
        line = proc.stdout.readline()
        if line.startswith("SERVING"):
            return proc, int(line.split("port=")[1].split()[0])
    proc.kill()
    raise RuntimeError("fit server did not come up")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=40)
    parser.add_argument("--h", type=int, default=5)
    parser.add_argument("--block", type=int, default=192)
    parser.add_argument("--max-rounds", type=int, default=8)
    parser.add_argument("--iters", type=int, default=8)
    args = parser.parse_args()

    import circuitmap_tpu as cm
    from circuitmap_tpu.serve import FitClient
    from circuitmap_tpu.utils.metrics import r2_score

    # ground truth the "rig" acquires from, fixed across rounds
    np.random.seed(0)
    pilot = cm.simulate(N=args.n, trials=8, H=args.h,
                        connection_prob=0.1, verbose=False)
    truth = {k: pilot[k]
             for k in ("weights", "phi_0", "phi_1", "tau_r", "tau_d")}
    print(f"ground truth: {int((truth['weights'] != 0).sum())} connections "
          f"among {args.n} neurons")

    state_dir = tempfile.mkdtemp(prefix="cm_serve_demo_")
    proc, port = launch_server(state_dir)
    client = FitClient(f"http://127.0.0.1:{port}", timeout=600)
    print("server:", client.health()["device"])

    try:
        design = client.stream_design(
            "demo", trials=args.block,
            designer={"N": args.n, "H": args.h, "powers": POWERS})
        blocks = []
        create = {"powers": POWERS, "analytic_mc": True}
        for rnd in range(args.max_rounds):
            stim = design["stim"]
            psc = cm.simulate(  # the rig acquires the designed block
                N=args.n, stim_matrix=stim, weights=truth["weights"],
                phi_0=truth["phi_0"], phi_1=truth["phi_1"],
                kernel=(truth["tau_r"], truth["tau_d"]),
                powers=POWERS, verbose=False)["psc"]
            blocks.append((psc, stim))
            t0 = time.perf_counter()
            client.stream_update("demo", psc.astype(np.float16),
                                 stim.astype(np.float32),
                                 iters=args.iters, demix=False,
                                 **({"create": create} if rnd == 0 else {}))
            design = client.stream_design("demo", trials=args.block)
            print(f"round {rnd + 1}: {design['pool'].size:3d} unresolved, "
                  f"refresh {time.perf_counter() - t0:.2f}s")
            if bool(design["resolved"]):
                break

        result = client.stream_result("demo")
        r2 = r2_score(truth["weights"], result["mu"])
        trials_used = int(result["trial_count"])
        print(f"\nclosed loop: R² = {r2:.3f} after {trials_used} trials "
              f"({len(blocks)} rounds, early stop = "
              f"{bool(design['resolved'])})")

        saved = client.stream_save("demo")
        print(f"stream checkpointed ({saved}) — a daemon restart would "
              "restore it with stream_load('demo', create=...)")

        # batch fit of the same trials through /fit, for comparison —
        # the design ships sparse by default, and psc_wire='int8'
        # quantises the traces client-side (the server's device wire
        # requantises to the identical codes)
        psc_all = np.concatenate([b[0] for b in blocks], axis=0)
        stim_all = np.concatenate([b[1] for b in blocks], axis=1)
        state = client.fit(psc_all, stim_all, demix=False,
                           psc_wire="int8", iters=30, verbose=False)
        print(f"batch /fit over the same {stim_all.shape[1]} trials: "
              f"R² = {r2_score(truth['weights'], state['mu']):.3f} "
              f"(fit {float(state['fit_time_s']):.2f}s server-side)")
    finally:
        try:
            client.shutdown()
            proc.wait(timeout=30)
        except Exception:
            proc.kill()
    print("done.")


if __name__ == "__main__":
    main()
