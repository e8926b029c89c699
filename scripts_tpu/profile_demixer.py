"""On-device profile of the NWD demixer forward at the bench shape.

Captures an xplane trace of one device-resident forward pass over
[K, 900] traces and aggregates TPU op durations by name — attributes
the ~69 ms forward (CLAUDE.md round-3) to conv/pool/bn/fft components
so the MXU-poor-small-channel leftover can be attacked with numbers.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python
    scripts_tpu/profile_demixer.py [K] [--bf16]
"""

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np
import jax
import jax.numpy as jnp


def aggregate_xplane(logdir, plane_substr="TPU"):
    """Sum event durations by name over device planes (CLAUDE.md recipe)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    totals = {}
    for root, _dirs, files in os.walk(logdir):
        for f in files:
            if not f.endswith(".xplane.pb"):
                continue
            xs = xplane_pb2.XSpace()
            xs.ParseFromString(open(os.path.join(root, f), "rb").read())
            for plane in xs.planes:
                if plane_substr not in plane.name:
                    continue
                emeta = {m.id: m.name for m in plane.event_metadata.values()}
                for line in plane.lines:
                    for ev in line.events:
                        name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                        totals[name] = totals.get(name, 0.0) + (
                            ev.duration_ps / 1e9)  # ms
    return totals


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 20000
    from circuitmap_tpu.demix import NeuralDemixer

    kw = {}
    if "--bf16" in sys.argv:
        kw["compute_dtype"] = jnp.bfloat16
    demixer = NeuralDemixer(path="demixers/nwd_ie_ChroME2f.npz", **kw)
    np.random.seed(0)
    traces = np.random.randn(K, 900).astype(np.float32)

    # device-resident input: isolate compute from the wire (the public
    # __call__ host-casts its input, so it would pull the block back)
    from circuitmap_tpu.demix.demixer import _demix_and_filter

    x = jnp.asarray(traces)
    np.asarray(x[:1, :1])

    def fwd(a):
        return _demix_and_filter(demixer.params, a, 500)

    out = fwd(x)
    np.asarray(out[:1, :1])  # compile + settle

    times = []
    for _ in range(3):
        t0 = time.time()
        out = fwd(x)
        np.asarray(out[:1, :1])
        times.append(time.time() - t0)

    with tempfile.TemporaryDirectory() as d:
        jax.profiler.start_trace(d)
        out = fwd(x)
        np.asarray(out[:1, :1])
        jax.profiler.stop_trace()
        totals = aggregate_xplane(d)

    top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
    print(json.dumps({
        "K": K,
        "bf16": "--bf16" in sys.argv,
        "forward_wall_ms_best": round(min(times) * 1e3, 1),
        "device_total_ms": round(sum(totals.values()), 2),
        "top_ops_ms": {k: round(v, 3) for k, v in top},
    }, indent=1))


if __name__ == "__main__":
    main()
