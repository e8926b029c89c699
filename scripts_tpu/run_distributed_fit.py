"""Multi-process CAVIaR fit worker / launcher.

One instance of this script runs per host (or per test process). Each
process loads ONLY its own trial shard and joins the cluster through
``circuitmap_tpu.parallel.distributed.initialize`` — the per-host
feeding contract of ``caviar_sharded_distributed``: no process ever
materialises the full trace block.

On a real TPU pod slice, run one instance per host with no coordinator
arguments (auto-detected from TPU metadata):

  python scripts_tpu/run_distributed_fit.py --data shard_$(hostname).npz

For a CPU cluster — and for this repo's 2-process gloo proof
(tests/test_distributed.py, __graft_entry__.dryrun_multichip) — pass
the coordinator explicitly and force virtual CPU devices:

  python scripts_tpu/run_distributed_fit.py \
      --coordinator 127.0.0.1:29500 --num-processes 2 --process-id 0 \
      --cpu-devices 4 --data shard0.npz --out out0.npz

The data npz needs ``psc`` [K_local, T] and ``stim`` [N, K_local].
Writes mu/beta/lam/shape/rate/phi/phi_cov/z (full gathered posteriors,
identical on every process).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit on TPU pods)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--cpu-devices", type=int, default=None,
                    help="force a virtual CPU backend with this many "
                         "devices per process (testing)")
    ap.add_argument("--data", required=True,
                    help="npz with psc [K_local,T] and stim [N,K_local]")
    ap.add_argument("--out", default=None)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--msrmp", type=float, default=0.3)
    ap.add_argument("--powers", type=float, nargs="*", default=None)
    ap.add_argument("--analytic-mc", action="store_true")
    ap.add_argument("--sweep-block-size", type=int, default=1)
    ap.add_argument("--trace-wire", default=None,
                    choices=("f32", "f16", "int8", "int4", "int4d2"),
                    help="compress this process's trace upload "
                         "(solvers/_common.prepare_traces)")
    ap.add_argument("--solver", choices=("caviar", "sns", "mbcs"),
                    default="caviar")
    ap.add_argument("--demixer", default=None,
                    help="demix this process's raw trace shard first "
                         "(.npz/.ckpt checkpoint path). Demixing is "
                         "row-independent, so at pod scale each host "
                         "demixes its own shard on its own devices — "
                         "no collectives, no extra wire")
    ap.add_argument("--demix-wire", default=None,
                    choices=("f32", "f16", "int8", "int4", "int4d2"),
                    help="host->device transfer format for the "
                         "demixer upload (pair int4* with a QAT "
                         "checkpoint)")
    ap.add_argument("--checkpoint", default=None,
                    help="segmented caviar fit with checkpoint/resume "
                         "(parallel.caviar_resumable_distributed); path "
                         "must be on a shared filesystem")
    ap.add_argument("--checkpoint-every", type=int, default=10)
    args = ap.parse_args()
    if args.checkpoint and args.solver != "caviar":
        ap.error("--checkpoint is only supported with --solver caviar")

    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}"
        ).strip()
    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")

    from circuitmap_tpu.parallel import distributed as dist
    from circuitmap_tpu.model import default_priors

    dist.initialize(coordinator_address=args.coordinator,
                    num_processes=args.num_processes,
                    process_id=args.process_id)

    data = np.load(args.data)
    psc, stim = data["psc"], data["stim"]
    if args.demixer:
        from circuitmap_tpu.demix import NeuralDemixer

        demixer = NeuralDemixer(path=args.demixer)
        psc = demixer(psc, verbose=jax.process_index() == 0,
                      transfer_dtype=args.demix_wire)
    N = stim.shape[0]
    p = default_priors(N)

    mesh = dist.global_trial_mesh()
    verbose = jax.process_index() == 0
    if args.solver == "caviar":
        if args.checkpoint:
            out = dist.caviar_resumable_distributed(
                psc, stim, p["mu"], p["beta"], p["shape"], p["rate"],
                p["phi"], p["phi_cov"], checkpoint_path=args.checkpoint,
                mesh=mesh, iters=args.iters,
                checkpoint_every=args.checkpoint_every, seed=args.seed,
                msrmp=args.msrmp, powers=args.powers,
                analytic_mc=args.analytic_mc,
                sweep_block_size=args.sweep_block_size,
                trace_wire=args.trace_wire,
                verbose=verbose,
            )
        else:
            out = dist.caviar_sharded_distributed(
                psc, stim, p["mu"], p["beta"], p["shape"], p["rate"],
                p["phi"], p["phi_cov"], mesh=mesh, iters=args.iters,
                seed=args.seed, msrmp=args.msrmp, powers=args.powers,
                analytic_mc=args.analytic_mc,
                sweep_block_size=args.sweep_block_size,
                trace_wire=args.trace_wire,
                verbose=verbose,
            )
        mu, beta, lam, shape, rate, phi, phi_cov, z, _ = out
        payload = dict(mu=mu, beta=beta, lam=lam, shape=shape, rate=rate,
                       phi=phi, phi_cov=phi_cov, z=z)
    elif args.solver == "sns":
        out = dist.cavi_sns_sharded_distributed(
            psc, stim, p["mu"], p["beta"], p["alpha"], p["shape"],
            p["rate"], p["phi"], p["phi_cov"], mesh=mesh, iters=args.iters,
            seed=args.seed, powers=args.powers,
            analytic_mc=args.analytic_mc, trace_wire=args.trace_wire,
            verbose=verbose,
        )
        mu, beta, alpha, lam, shape, rate, phi, phi_cov = out
        payload = dict(mu=mu, beta=beta, alpha=alpha, lam=lam, shape=shape,
                       rate=rate, phi=phi, phi_cov=phi_cov)
    else:
        out = dist.mbcs_sharded_distributed(
            psc, stim, p["mu"], p["beta"], p["shape"], p["rate"],
            mesh=mesh, iters=args.iters, seed=args.seed,
            powers=args.powers, analytic_noise=True,
            trace_wire=args.trace_wire, verbose=verbose,
        )
        mu, beta, lam, shape, rate, z, rf = out
        payload = dict(mu=mu, beta=beta, lam=lam, shape=shape, rate=rate,
                       z=z)
    if args.out:
        np.savez(args.out, **payload)
    print(json.dumps({
        "process": jax.process_index(),
        "processes": jax.process_count(),
        "devices": len(jax.devices()),
        "K_local": int(psc.shape[0]),
        "K_global": int(lam.shape[1]),
        "nonzero_weights": int((np.asarray(mu) != 0).sum()),
    }), flush=True)


if __name__ == "__main__":
    main()
