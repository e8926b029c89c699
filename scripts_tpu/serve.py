"""Run the persistent fit server: ``python -m circuitmap_tpu serve``.

One resident process owns the accelerator and serves demix/fit/stream
requests over HTTP (see circuitmap_tpu/serve.py for the protocol and
the design rationale). Typical deployment::

    python -m circuitmap_tpu serve --demixer demixers/nwd_ie_ChroME2f.npz \
        --wire int8 --warm 1000x20000

then from the rig (numpy + stdlib only)::

    from circuitmap_tpu.serve import FitClient
    state = FitClient().fit(psc, stim, iters=50, msrmp=0.3)
"""

import argparse
import sys

from circuitmap_tpu.utils.synthetic import parse_shape as _shape


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="persistent fit server: one process owns the "
                    "accelerator, fits arrive over HTTP")
    parser.add_argument("--host", default="127.0.0.1",
                        help="bind address (default localhost-only; "
                             "the protocol is unauthenticated — front "
                             "it with an SSH tunnel or reverse proxy "
                             "to expose it beyond the host)")
    parser.add_argument("--port", type=int, default=None,
                        help="port (default 8799; 0 = OS-assigned, "
                             "printed as 'SERVING ... port=<p>')")
    parser.add_argument("--demixer", default=None,
                        help="demixer checkpoint (.npz/.ckpt) the "
                             "server loads once and applies to every "
                             "request that asks (or 'default' for a "
                             "fresh default-architecture net); omit "
                             "to serve raw-trace fits only")
    parser.add_argument("--wire", default=None,
                        choices=["f32", "f16", "int8", "int4", "int4d2"],
                        help="default trace wire for demix uploads "
                             "(per-request X-Options override)")
    parser.add_argument("--max-mb", type=float, default=2048,
                        help="largest accepted request body, MB")
    parser.add_argument("--mesh", type=int, default=0, metavar="N",
                        help="shard fits and streams over an N-device "
                             "trial mesh (the server owns a host slice, "
                             "not one chip); per-request opt-out with "
                             "X-Options {\"sharded\": false}")
    parser.add_argument("--warm", type=_shape, nargs="*", default=[],
                        metavar="NxK",
                        help="pre-compile the pipeline for these shapes "
                             "before accepting requests")
    parser.add_argument("--state-dir", default=None,
                        help="directory for stream checkpoints: enables "
                             "POST /stream/<name>/{save,load} and "
                             "auto-saves live streams on graceful "
                             "shutdown, so a daemon restart does not "
                             "lose a closed-loop experiment")
    parser.add_argument("--token", default=None,
                        help="require `Authorization: Bearer <token>` on "
                             "every request (FitClient(token=...)); the "
                             "protocol is otherwise unauthenticated — "
                             "still prefer an SSH tunnel/reverse proxy "
                             "for transport privacy across machines")
    parser.add_argument("--metrics", default=None, metavar="FILE",
                        help="append one JSON line per request (ts, "
                             "method, path, status, seconds, bytes) — "
                             "tail-able production request log")
    parser.add_argument("--status-port", type=int, default=None,
                        metavar="P",
                        help="read-only liveness sidecar on its own "
                             "thread+port (GET /health; 0 = OS-"
                             "assigned, printed as 'STATUS ... "
                             "port=<p>'): answers while the single-"
                             "threaded main port is busy fitting — or "
                             "wedged on a dead device tunnel — and "
                             "reports the in-flight request + elapsed "
                             "seconds so probes can tell the two apart")
    parser.add_argument("--request-timeout-s", type=float, default=None,
                        metavar="S",
                        help="watchdog: if one request runs past S "
                             "seconds, log a JSON diagnostic, best-"
                             "effort-save streams (--state-dir), and "
                             "exit with code 86 so a supervisor "
                             "restarts the daemon (the dead-TPU-tunnel "
                             "wedge has no other exit). Set S above "
                             "the slowest legitimate request INCLUDING "
                             "cold compiles (minutes unless pre-warmed "
                             "with --warm); 600+ is a sensible floor")
    parser.add_argument("--verbose", action="store_true",
                        help="log every request")
    args = parser.parse_args(argv)

    from circuitmap_tpu.serve import DEFAULT_PORT, run_server

    try:
        run_server(host=args.host,
                   port=DEFAULT_PORT if args.port is None else args.port,
                   demixer_path=args.demixer, default_wire=args.wire,
                   max_mb=args.max_mb, warm_shapes=args.warm,
                   verbose=args.verbose, mesh_devices=args.mesh,
                   state_dir=args.state_dir, metrics_path=args.metrics,
                   auth_token=args.token, status_port=args.status_port,
                   request_timeout_s=args.request_timeout_s)
    except KeyboardInterrupt:
        print("fit server stopped", file=sys.stderr)


if __name__ == "__main__":
    main()
