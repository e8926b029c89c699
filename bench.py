"""North-star benchmark: demix + CAVIaR at N=1000 / K=20000 on one chip.

BASELINE.json target: the full pipeline (NWD demixer forward over
20k x 900 traces + a 50-iteration CAVIaR fit, msrmp=0.3, 100 MC
samples) in < 10 s on a single TPU v5e with weight-recovery parity.
The reference publishes no numbers (BASELINE.md) — 10 s is the
recorded north star, so vs_baseline = 10 / measured_seconds
(>1 means faster than target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    # smaller problem for quick local checks: bench.py --small
    small = "--small" in sys.argv
    N, K = (200, 2000) if small else (1000, 20000)
    iters = 50

    from circuitmap_tpu.demix import NeuralDemixer
    from circuitmap_tpu.model import default_priors
    from circuitmap_tpu.simulation import simulate
    from circuitmap_tpu.solvers import caviar
    from circuitmap_tpu.utils.metrics import r2_score

    np.random.seed(0)
    sim = simulate(
        N=N, trials=K, H=10, connection_prob=0.05, verbose=False,
        batch_size=1000,
    )

    here = os.path.dirname(os.path.abspath(__file__))
    # quantised trace wire + the matching quantisation-aware-trained
    # checkpoint (scripts_tpu/train_qat_demixer.py). WIRE_STUDY.json
    # round-4, mean truth-R2 over 3 seeds: int8+stock 0.9817;
    # int4+QAT 0.9881 (half the bytes); int4d2+QAT — mean-pool 2x then
    # int4, device-side upsample — 0.9862 at a QUARTER of the int8
    # bytes (still above the f32 wire's 0.9816). Preference order:
    # fewest bytes whose fidelity beats the f32 wire.
    qat_d2 = os.path.join(here, "demixers", "nwd_ie_ChroME2f_int4d2qat.npz")
    qat = os.path.join(here, "demixers", "nwd_ie_ChroME2f_int4qat.npz")
    stock = os.path.join(here, "demixers", "nwd_ie_ChroME2f.npz")
    # (checkpoint, wire, sweep kwargs): the last two rungs step the
    # SWEEP implementation down too (resolver default, then the plain
    # XLA sweep, which always lowers) so a kernel-level regression on
    # fresh hardware degrades the number instead of failing the run
    candidates = [
        (qat_d2, "int4d2", {"sweep_block_size": 8}),
        (qat, "int4", {"sweep_block_size": 8}),
        (stock, np.int8, {"sweep_block_size": 8}),
        ("/root/reference/demixers/nwd_ie_ChroME2f.ckpt", np.int8,
         {"sweep_block_size": 8}),
        (stock, np.int8, {}),
        (stock, np.int8, {"sweep_impl": "xla"}),
    ]
    candidates = [(c, w, s) for c, w, s in candidates if os.path.exists(c)]
    candidates = candidates or [(None, np.int8, {})]

    priors = default_priors(N)

    def pipeline(psc, stim):
        # compressed wire format shrinks the host->TPU trace upload —
        # int4 (two codes per byte, per-trace peak scale) with the QAT
        # checkpoint, int8 fallback with the stock one
        dem = demixer(psc, verbose=False, keep_on_device=True,
                      transfer_dtype=wire)
        out = caviar(
            dem, stim, priors["mu"], priors["beta"], priors["shape"],
            priors["rate"], priors["phi"], priors["phi_cov"], iters=iters,
            msrmp=0.3, powers=[45.0, 55.0, 65.0],  # rig config, as in the
            verbose=False,                         # reference harness YAMLs
            # blocked manual-DMA sweep (sweep_block_size=8 on the top
            # rungs): 8-row blocks over the native 2-D layout — no
            # per-iteration [N,1,K] relayout, N/8 sequential steps.
            # Device fit 149 -> 105 ms; truth-R2 unchanged (measured
            # 0.9911 vs 0.9888, within seed noise — see
            # ops/sweep_pallas.sweep_spikes_pallas_dma_blocked)
            **sweep_kwargs,
        )
        return out

    # warm-up: compile both programs on this shape (cached thereafter).
    # The warm-up doubles as a fallback ladder: if the preferred wire/
    # checkpoint pair fails for any reason, step down to the next one
    # rather than failing the benchmark run.
    warm_psc = sim["psc"][:K].copy()
    for i, (ckpt, wire, sweep_kwargs) in enumerate(candidates):
        demixer = NeuralDemixer(path=ckpt) if ckpt else NeuralDemixer()
        try:
            np.asarray(pipeline(warm_psc, sim["stim_matrix"])[0][:1])
            break
        except Exception:
            if i == len(candidates) - 1:
                raise
            print(f"# wire {wire!r} / sweep {sweep_kwargs} failed on "
                  "warm-up; falling back", file=sys.stderr)

    # best of 5: the tunneled-TPU link adds +-0.5s of run-to-run noise,
    # and the public entry keeps warming over its first ~3 in-process
    # calls (late compiles + allocator warm-up — profile_fit_entry.py).
    # Timing is early-return-proof: block_until_ready on axon can return
    # before the program drains (CLAUDE.md round-2 lesson), so the clock
    # stops only after a small host pull of the result forces completion.
    # Both numbers are recorded so the block-vs-pull delta is on record.
    elapsed = elapsed_block = float("inf")
    for _ in range(5):
        t0 = time.time()
        out = pipeline(sim["psc"], sim["stim_matrix"])
        jax.block_until_ready(out[2])
        t_block = time.time() - t0
        np.asarray(out[0][:1])  # forces the whole fit to completion
        elapsed = min(elapsed, time.time() - t0)
        elapsed_block = min(elapsed_block, t_block)

    # fit-only time (input already device-resident): isolates the solver
    # from the host->TPU trace wire, which dominates the end-to-end
    # number through the tunnel
    dem = demixer(sim["psc"], verbose=False, keep_on_device=True,
                  transfer_dtype=wire)
    np.asarray(dem[0, :1])  # settle the demixer before the fit clock
    fit_only = float("inf")
    for _ in range(5):
        t0 = time.time()
        out_f = caviar(
            dem, sim["stim_matrix"], priors["mu"], priors["beta"],
            priors["shape"], priors["rate"], priors["phi"],
            priors["phi_cov"], iters=iters, msrmp=0.3,
            powers=[45.0, 55.0, 65.0], verbose=False, **sweep_kwargs,
        )
        np.asarray(out_f[0][:1])
        fit_only = min(fit_only, time.time() - t0)

    r2 = r2_score(sim["weights"], np.asarray(out[0]))
    baseline_target_s = 10.0
    record = {
        "metric": f"demix+caviar_fit_N{N}_K{K}_iters{iters}",
        "value": round(elapsed, 3),
        "unit": "seconds",
        "vs_baseline": round(baseline_target_s / elapsed, 3),
        "weight_recovery_r2": round(float(r2), 4),
        "device": str(jax.devices()[0]),
        "block_until_ready_seconds": round(elapsed_block, 3),
        "fit_only_seconds": round(fit_only, 3),
        "trace_wire": wire if isinstance(wire, str) else "int8",
    }
    # measured-reference comparison, when the committed artifact exists
    # (scripts_tpu/measure_reference_baseline.py — reference end-to-end
    # demix+CAVIaR on the same host CPU, scaled to this bench's K)
    measured = os.path.join(here, "BASELINE_MEASURED.json")
    if os.path.exists(measured):
        cfg = json.load(open(measured)).get("configs", {}).get("5")
        if cfg:
            ref_s = cfg["reference_seconds"]
            # config 5 runs N=300/K=2000; quote it as-is plus the ratio
            record["reference_end_to_end_seconds_cpu_N300_K2000"] = round(
                ref_s, 2)
            record["vs_reference_same_config_cpu"] = round(
                ref_s / cfg["ours_seconds_warm"], 2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
