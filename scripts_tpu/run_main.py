"""Main CLI: demix + CAVIaR on an experiment file, export weights.

TPU-native equivalent of the reference NeuroCAAS entry point
(scripts/run_circuitmap_main.py:9-63): load psc + stimulus_matrix from
.mat/.npy/.npz, demix with a pretrained NWD network, fit CAVIaR with
the config's msrmp, export .mat + .npz. One device, one runtime — no
CPU-pinned demixer workaround needed.

Usage:
  python scripts_tpu/run_main.py --data expt.mat --config config.yaml --out out/
Config keys: demixer (checkpoint path), msrmp (float).

With ``--server URL`` the workflow runs against a resident fit server
(`python -m circuitmap_tpu serve`) instead of this process: the rig box
needs no accelerator and no jax — traces ship f16 over HTTP, the
server's loaded demixer applies (the config's ``demixer`` key is the
SERVER's concern there), and the same .mat/.npz outputs are written
locally. See docs/DEPLOY.md "Serving".
"""

import argparse
from pathlib import Path

import numpy as np
import yaml

from circuitmap_tpu.utils.io import load_experiment, export_state


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--server", default=None, metavar="URL",
                        help="run the fit on a resident fit server "
                             "(e.g. http://tpu-host:8799) instead of "
                             "this process; the server's --demixer "
                             "applies and this box needs no jax")
    args = parser.parse_args()

    config = yaml.safe_load(open(args.config))

    psc, stim_matrix = load_experiment(args.data)
    N = stim_matrix.shape[0]

    fit_options = {
        "msrmp": float(config["msrmp"]),
        "iters": args.iters,
        "save_histories": False,
    }
    if "powers" in config:  # rig power levels, skips a 20M-element scan
        fit_options["powers"] = [float(p) for p in config["powers"]]

    if args.server:
        from circuitmap_tpu.serve import FitClient

        client = FitClient(args.server)
        # client-typed arrays halve the HTTP payload (npz ships raw
        # dtypes — PERF.md "fit-server tax"); the server widens and its
        # own device wire re-compresses independently. An EXPLICIT
        # `transfer_dtype: f32` is a full-precision request and must
        # survive the HTTP leg too — only the compressing tokens ride
        # f16 over the network.
        wire_tok = config.get("transfer_dtype", "f16")
        http_dtype = np.float32 if str(wire_tok).lower() in (
            "f32", "float32") else np.float16
        state = client.fit(
            psc.astype(http_dtype), stim_matrix.astype(np.float32),
            demix=True, trace_wire=wire_tok,
            verbose=False, **fit_options)
        print(f"CAVIaR fit complete on {args.server} "
              f"in {float(state['fit_time_s']):.2f}s (server-side).")
    else:
        from circuitmap_tpu import Model, NeuralDemixer
        from circuitmap_tpu.demix.demixer import resolve_transfer_dtype

        demix = NeuralDemixer(path=config["demixer"])
        # fast path: compressed wire upload, demixed traces stay
        # device-resident and feed the solver directly (no host round
        # trip of the [K, T] block — see bench.py). f16 is the safe
        # default for arbitrary checkpoints; set `transfer_dtype:
        # int4d2` (or int4 / int8) in the YAML when `demixer` points at
        # the matching QAT-trained checkpoint (WIRE_STUDY.json).
        psc_dem = demix(psc, keep_on_device=True,
                        transfer_dtype=resolve_transfer_dtype(
                            config.get("transfer_dtype", "f16")))

        model = Model(N)
        model.fit(psc_dem, stim_matrix, method="caviar",
                  fit_options=fit_options)
        print(f"CAVIaR fit complete in {model.time:.2f}s.")
        state = model.state

    written = export_state(args.out, Path(args.data).stem, state)
    print("Wrote:", ", ".join(written))


if __name__ == "__main__":
    main()
