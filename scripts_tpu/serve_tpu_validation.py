"""Serve-daemon end-to-end validation ON THE REAL TPU → SERVE_TPU.json.

The fit daemon (circuitmap_tpu/serve.py) shipped while the accelerator
link was down, so its production path — flagship ``POST /fit`` with the
sparse-hologram + int4d2 body, the warm ``/fit_many`` job-array path,
and a closed-loop stream round-trip — had only CPU-backend evidence.
This script runs the whole loop against a daemon that OWNS the chip
(the deployment shape: reference ``run_circuitmap_main.sh:9-31`` is a
one-job-per-process batch entry; ours is a resident process the rig
talks to over HTTP), with the parent pinned to the CPU backend exactly
like a jax-free acquisition machine.

Writes SERVE_TPU.json:
  fit cold/warm wall seconds at N=1000/K=20000 (demix+fit, int4d2
  wire), recovery R² vs simulation ground truth, request body bytes,
  fit_many warm seconds at B=8×(N=300,K=2000), closed-loop stream
  rounds to resolution.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts_tpu/serve_tpu_validation.py
"""

import json
import os
import select
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _start_tpu_server(*extra_args):
    """Launch the daemon WITHOUT a CPU pin — it inherits the axon TPU
    backend (the one process allowed to own the chip)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "circuitmap_tpu", "serve", "--port", "0",
         *extra_args],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True)
    port = None
    deadline = time.time() + 180
    while time.time() < deadline:
        ready, _, _ = select.select([proc.stdout], [], [], 1.0)
        if not ready:
            if proc.poll() is not None:
                raise RuntimeError("fit server died during startup")
            continue
        line = proc.stdout.readline()
        if not line:
            raise RuntimeError("fit server exited before SERVING")
        if line.startswith("SERVING"):
            port = int(line.split("port=")[1].split()[0])
            break
    if port is None:
        proc.kill()
        raise RuntimeError("no SERVING line within 180s")
    from circuitmap_tpu.serve import FitClient
    return FitClient(f"http://127.0.0.1:{port}", timeout=1200), proc


def main():
    # the parent is the rig: CPU backend only, before first jax use
    import jax
    jax.config.update("jax_platforms", "cpu")

    from circuitmap_tpu.serve import _npz_bytes, encode_stim_sparse
    from circuitmap_tpu.serve import _encode_psc
    from circuitmap_tpu.simulation import simulate
    from circuitmap_tpu.utils.metrics import r2_score

    out = {"device": "server-owned TPU", "date": time.strftime("%Y-%m-%d")}

    print("simulating flagship N=1000/K=20000 on CPU ...", flush=True)
    np.random.seed(0)
    sim = simulate(N=1000, trials=20000, H=10, connection_prob=0.05,
                   verbose=False, batch_size=1000)
    psc, stim, w_true = sim["psc"], sim["stim_matrix"], sim["weights"]

    # measure what actually crosses the wire for the flagship body
    body = _npz_bytes(**{**_encode_psc(np.asarray(psc), "int4d2"),
                         **encode_stim_sparse(np.asarray(stim))})
    out["fit_body_mb"] = round(len(body) / 1e6, 2)

    print("starting TPU daemon ...", flush=True)
    qat_d2 = os.path.join(REPO, "demixers", "nwd_ie_ChroME2f_int4d2qat.npz")
    client, proc = _start_tpu_server("--demixer", qat_d2)
    try:
        client.wait_ready(timeout_s=180)
        out["health"] = client.health()["device"]

        fit_opts = dict(iters=50, msrmp=0.3, seed=0, verbose=False,
                        sweep_block_size=8)
        times = []
        state = None
        for rep in range(4):
            t0 = time.time()
            state = client.fit(psc, stim, demix=True, psc_wire="int4d2",
                               **fit_opts)
            times.append(time.time() - t0)
            print(f"  fit[{rep}] {times[-1]:.2f}s", flush=True)
        out["fit_cold_s"] = round(times[0], 2)
        out["fit_warm_s"] = round(min(times[1:]), 3)
        out["fit_warm_median_s"] = round(sorted(times[1:])[1], 3)
        r2 = float(r2_score(w_true, state["mu"]))
        out["weight_recovery_r2"] = round(r2, 4)
        print(f"  recovery R2 {r2:.4f}", flush=True)

        # response-wire levers (round 5): the full-posterior response
        # is dominated by lam [N, K] f32 (80 MB npz over loopback on a
        # shared single core — the bulk of the warm serving tax)
        t_rf, t_q8 = [], []
        for _ in range(3):
            t0 = time.time()
            slim = client.fit(psc, stim, demix=True, psc_wire="int4d2",
                              return_fields=("mu", "beta", "alpha"),
                              **fit_opts)
            t_rf.append(time.time() - t0)
            t0 = time.time()
            coded = client.fit(psc, stim, demix=True, psc_wire="int4d2",
                               response_wire="int8", **fit_opts)
            t_q8.append(time.time() - t0)
        out["fit_warm_return_fields_s"] = round(min(t_rf), 3)
        out["fit_warm_response_int8_s"] = round(min(t_q8), 3)
        out["return_fields_r2"] = round(
            float(r2_score(w_true, slim["mu"])), 4)
        np.testing.assert_array_equal(slim["mu"], coded["mu"])
        print(f"  warm fit: summaries {min(t_rf):.3f}s / int8 "
              f"posterior {min(t_q8):.3f}s", flush=True)

        # warm job-array path: B=8 × (N=300, K=2000)
        np.random.seed(1)
        bsim = simulate(N=300, trials=2000, H=10, connection_prob=0.05,
                        verbose=False)
        b_stim = [np.asarray(bsim["stim_matrix"]) for _ in range(8)]
        b_psc = [np.asarray(bsim["psc"]) for _ in range(8)]
        client.warm([(300, 2000)], iters=30, batch=8)
        many_opts = dict(iters=30, msrmp=0.3, verbose=False)
        t0 = time.time()
        res = client.fit_many(b_psc, b_stim, demix=True,
                              psc_wire="int4d2", **many_opts)
        cold = time.time() - t0
        t0 = time.time()
        res = client.fit_many(b_psc, b_stim, demix=True,
                              psc_wire="int4d2", **many_opts)
        warm = time.time() - t0
        out["fit_many_b8_cold_s"] = round(cold, 2)
        out["fit_many_b8_warm_s"] = round(warm, 3)
        out["fit_many_b8_r2"] = round(
            float(r2_score(bsim["weights"], res[0]["mu"])), 4)
        print(f"  fit_many B=8 cold {cold:.2f}s warm {warm:.3f}s",
              flush=True)

        # closed-loop stream round-trip (server-resident designer)
        np.random.seed(2)
        csim = simulate(N=60, trials=1, H=5, connection_prob=0.15,
                        verbose=False)
        from circuitmap_tpu.simulation import simulate as _sim
        designer = {"N": 60, "H": 5, "powers": [45.0, 55.0, 65.0]}
        rounds = 0
        t0 = time.time()
        d = client.stream_design("hwval", trials=384, designer=designer)
        while "stim" in d and rounds < 8:
            stim_r = np.asarray(d["stim"])
            trial = _sim(N=60, stim_matrix=stim_r, verbose=False,
                         weights=csim["weights"], phi_0=csim["phi_0"],
                         phi_1=csim["phi_1"])
            client.stream_update(
                "hwval", np.asarray(trial["psc"]), stim_r, iters=12,
                create={"msrmp": 0.3, "seed": 0} if rounds == 0 else None,
                psc_wire="int8")
            rounds += 1
            d = client.stream_design("hwval", trials=384)
        out["stream_rounds"] = rounds
        out["stream_resolved"] = bool(d.get("resolved", False))
        out["stream_wall_s"] = round(time.time() - t0, 2)
        post = client.stream_posterior("hwval")
        out["stream_r2"] = round(
            float(r2_score(csim["weights"], np.asarray(post["mu"]))), 4)
        print(f"  stream resolved={out['stream_resolved']} "
              f"rounds={rounds} R2={out['stream_r2']}", flush=True)
    finally:
        try:
            client.shutdown()
            proc.wait(timeout=30)
        except Exception:
            proc.kill()

    path = os.path.join(REPO, "SERVE_TPU.json")
    with open(path + ".tmp", "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    os.replace(path + ".tmp", path)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
