"""Pre-populate the persistent XLA compile cache for deployment shapes.

``python -m circuitmap_tpu warm-cache --shape 1000x20000 --iters 50``

Cold compiles dominate fresh-process startup on an accelerator (the
fused whole-fit scan measured ~197 s cold vs ~86 s with a warm
persistent cache through a remote compiler — see PERF.md). A
deployment knows its shapes in advance; running this once per shape
after install (or per driver image build) moves that cost out of the
first real experiment.

The warmer executes the *public* entry path — ``NeuralDemixer.__call__``
then ``Model.fit`` — on synthetic data of the requested shape, with the
same knobs ``run_main.py`` exposes. Executables are cached by traced
graph + shapes + static options, so warming MUST route exactly like the
deployment call (hand-lowering internal functions drifts: the profiler
once measured a kernel the public path never runs — see CLAUDE.md).
Synthetic values are irrelevant to the cache key; they only need to be
numerically tame.

TPU-native analogue of a concern the reference never has: its per-fit
processes are pure Python/NumPy + small JIT regions, so compile time is
invisible; a fused whole-solver XLA program is faster per fit but pays
compilation once per (shape, options) — this tool makes that a
deploy-time cost instead of an experiment-time one.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


from circuitmap_tpu.utils.synthetic import (parse_shape as _parse_shape,
                                            synthetic_experiment)


def warm_one(N, K, *, iters, msrmp, powers, demixer, transfer_dtype,
             T=900, verbose=True):
    from circuitmap_tpu import Model

    from circuitmap_tpu.demix.demixer import resolve_transfer_dtype

    psc, stim = synthetic_experiment(N, K, T=T, powers=powers)
    t0 = time.perf_counter()
    if demixer is not None:
        traces = demixer(psc, keep_on_device=True,
                         transfer_dtype=resolve_transfer_dtype(transfer_dtype))
    else:
        traces = psc
    fit_options = {"msrmp": msrmp, "iters": iters,
                   "save_histories": False,
                   "powers": [float(p) for p in powers]}
    model = Model(N)
    model.fit(traces, stim, method="caviar", fit_options=fit_options)
    np.asarray(model.state["mu"][:1])  # settle before timing
    dt = time.perf_counter() - t0
    if verbose:
        print("warmed N=%d K=%d in %.1fs (compile + one fit)" % (N, K, dt))
    return dt


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="pre-compile the demix+CAVIaR pipeline for given "
                    "shapes into the persistent XLA cache")
    parser.add_argument("--shape", type=_parse_shape, nargs="+",
                        required=True, metavar="NxK",
                        help="one or more problem shapes, e.g. "
                             "1000x20000 500x5000")
    parser.add_argument("--iters", type=int, default=50,
                        help="fit iterations — part of the compiled "
                             "program; match the deployment value")
    parser.add_argument("--msrmp", type=float, default=0.3)
    parser.add_argument("--powers", type=float, nargs="+",
                        default=[45.0, 55.0, 65.0])
    parser.add_argument("--demixer", default=None,
                        help="demixer checkpoint (.npz) to warm the "
                             "demix stage with; 'default' for a fresh "
                             "default-architecture net (same compiled "
                             "graphs as any default-architecture "
                             "checkpoint); omit to warm raw-trace fits")
    parser.add_argument("--transfer-dtype", default="f16",
                        choices=["f32", "f16", "int8", "int4", "int4d2"],
                        help="trace wire to warm — the upload graph is "
                             "part of the executable")
    parser.add_argument("--trace-len", type=int, default=900)
    parser.add_argument("--cache-dir", default=None,
                        help="explicit persistent-cache directory; also "
                             "drops the min-compile-time persistence "
                             "threshold so every program is cached "
                             "(default: the package's lazy cache setup, "
                             "accelerator backends only)")
    args = parser.parse_args(argv)

    import jax

    if args.cache_dir:
        Path(args.cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    demixer = None
    if args.demixer == "default":
        from circuitmap_tpu import NeuralDemixer
        demixer = NeuralDemixer(seed=0)
    elif args.demixer:
        from circuitmap_tpu import NeuralDemixer
        demixer = NeuralDemixer(path=args.demixer)

    total = 0.0
    for N, K in args.shape:
        total += warm_one(N, K, iters=args.iters, msrmp=args.msrmp,
                          powers=args.powers, demixer=demixer,
                          transfer_dtype=args.transfer_dtype,
                          T=args.trace_len)

    cache = jax.config.jax_compilation_cache_dir
    n_entries = None
    if cache and Path(cache).is_dir():
        n_entries = sum(1 for p in Path(cache).iterdir() if p.is_file())
    print("warm-cache done: %d shape(s) in %.1fs; cache=%s entries=%s"
          % (len(args.shape), total, cache, n_entries))
    if cache is None:
        print("note: no persistent cache is active on this backend "
              "(CPU compiles are not cached by design — see "
              "circuitmap_tpu._ensure_compile_cache); pass --cache-dir "
              "to force one")


if __name__ == "__main__":
    main()
