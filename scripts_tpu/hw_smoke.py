"""One-command TPU-path validation: ``python -m circuitmap_tpu hw-smoke``.

The accelerator link in this deployment (and any tunneled/remote-chip
rig) dies and gets restored out-of-band; kernels and wire defaults
evolve while the link is down. After a restore, the question is always
the same: does the WHOLE production path still lower and run on the
real chip — not in interpret mode, not on the CPU mesh? (Mosaic tiling
and scoped-VMEM constraints only bite on real-TPU lowering; see the
round-3 lesson where a kernel that passed every interpret test never
lowered on hardware.)

This command runs the five probes that answer it, each in its own
subprocess with a timeout (a dead link HANGS jax calls forever — the
parent must be hang-proof, and a wedged probe must not poison the
next one's backend or the tunnel):

  tunnel     devices() + a tiny matmul with a forced host pull
  entry      the driver's ``__graft_entry__.entry()`` program:
             compile + execute the flagship demix+fit step
  kernels    a small CAVIaR fit with each Mosaic kernel PINNED
             (row-DMA sweep, blocked-8 sweep, Pallas Laplace) so a
             lowering regression fails loudly instead of being routed
             around by the auto resolver
  bench      ``bench.py --small`` end-to-end (the fallback ladder,
             wire decode, and recovery-R2 gate)
  fit_many   a tiny batched fit through ``caviar_many`` (the warm
             job-array path)

Exit code 0 iff every probe passes. If the tunnel probe fails the
rest are SKIPped (nothing else can mean anything without a link).

TPU-native analogue of the reference's missing post-install check:
its NeuroCAAS entry (reference ``run_circuitmap_main.sh:9-31``)
assumes a working rig and discovers a broken one hours into a job.
``doctor`` (scripts_tpu/doctor.py) checks the environment's layers;
this command exercises the compute path itself.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

PASS, FAIL, SKIP = "PASS", "FAIL", "SKIP"

_REPO = Path(__file__).resolve().parent.parent

_TUNNEL = r"""
import numpy as np, jax, jax.numpy as jnp
d = jax.devices()[0]
# a CPU backend (e.g. JAX_PLATFORMS=cpu exported while the link was
# down) must FAIL here, not validate the "TPU compute path" on the
# host: every later probe would pass via the auto resolvers' CPU
# routes and say nothing about the chip
assert d.platform in ("tpu", "axon"), (
    "backend is %r, not a TPU-class platform — unset JAX_PLATFORMS "
    "overrides before smoking the chip" % d.platform)
x = jnp.ones((8, 128), jnp.float32)
v = float(np.asarray(x @ x.T)[0, 0])
assert v == 128.0, v
print("SMOKE tunnel ok", d.platform, flush=True)
"""

_ENTRY = r"""
import time, numpy as np, jax
# no sys.path edits: the parent runs this probe with cwd = the repo
# this hw_smoke.py lives in, and `python -c` puts cwd on sys.path —
# a hardcoded path would validate a DIFFERENT checkout's driver
import __graft_entry__ as g
fn, args = g.entry()
t0 = time.time()
compiled = jax.jit(fn).lower(*args).compile()
t_compile = time.time() - t0
t0 = time.time()
out = compiled(*args)
leaf = jax.tree_util.tree_leaves(out)[0]
np.asarray(leaf.ravel()[:1])  # slice ON DEVICE, then force the pull
t_run = time.time() - t0
print("SMOKE entry ok compile=%.1fs run=%.2fs" % (t_compile, t_run),
      flush=True)
"""

# pinned implementations: the auto resolver would silently route
# around a broken kernel (that is its job in production); the smoke's
# job is the opposite
_KERNELS = r"""
import numpy as np, jax
import circuitmap_tpu as cm
from circuitmap_tpu.model import default_priors
from circuitmap_tpu.solvers import caviar

np.random.seed(3)
sim = cm.simulate(N=32, trials=512, H=4, connection_prob=0.1,
                  verbose=False)
p = default_priors(32)
prior_args = (p["mu"], p["beta"], p["shape"], p["rate"], p["phi"],
              p["phi_cov"])
pinned = [
    ("row-DMA sweep", dict(sweep_impl="pallas", sweep_block_size=1)),
    ("blocked-8 sweep", dict(sweep_impl="pallas_blocked",
                             sweep_block_size=8)),
    ("pallas laplace", dict(laplace_impl="pallas")),
]
for name, kw in pinned:
    out = caviar(np.asarray(sim["psc"], np.float32), sim["stim_matrix"],
                 *prior_args, iters=10, verbose=False, **kw)
    mu = np.asarray(out[0])
    assert np.isfinite(mu).all(), (name, "non-finite mu")
    print("SMOKE kernel ok", name.replace(" ", "_"), flush=True)
print("SMOKE kernels ok", flush=True)
"""

_FIT_MANY = r"""
import time, numpy as np
import circuitmap_tpu as cm
from circuitmap_tpu.model import default_priors
from circuitmap_tpu.solvers import caviar_many

np.random.seed(4)
sims = [cm.simulate(N=32, trials=256, H=4, connection_prob=0.1,
                    verbose=False) for _ in range(2)]
p = default_priors(32)
args = ([np.asarray(s["psc"], np.float32) for s in sims],
        [s["stim_matrix"] for s in sims],
        p["mu"], p["beta"], p["shape"], p["rate"], p["phi"],
        p["phi_cov"])
kw = dict(iters=10, seeds=[0, 1], verbose=False)
caviar_many(*args, **kw)  # cold (compiles)
t0 = time.time()
res = caviar_many(*args, **kw)  # warm
np.asarray(res[0]["mu"][:1])
warm = time.time() - t0
assert all(np.isfinite(r["mu"]).all() for r in res)
print("SMOKE fit_many ok warm=%.2fs" % warm, flush=True)
"""

_PROBES = [
    # (name, kind, payload, timeout_s)
    ("tunnel", "code", _TUNNEL, 120),
    ("entry", "code", _ENTRY, 900),
    ("kernels", "code", _KERNELS, 900),
    ("bench", "script", ["bench.py", "--small"], 900),
    ("fit_many", "code", _FIT_MANY, 900),
]


def _run(name, kind, payload, timeout):
    """Run one probe in a fresh interpreter; return (ok, detail).

    The hang-proof subprocess core is shared with ``doctor``
    (circuitmap_tpu.utils.probes) — one copy of the timeout/diagnosis
    contract.
    """
    if str(_REPO) not in sys.path:
        sys.path.insert(0, str(_REPO))
    from circuitmap_tpu.utils.probes import run_probe_cmd

    if kind == "code":
        cmd = [sys.executable, "-c", payload]
    else:
        cmd = [sys.executable, str(_REPO / payload[0]), *payload[1:]]
    t0 = time.time()
    stdout, err = run_probe_cmd(cmd, timeout, cwd=str(_REPO))
    wall = time.time() - t0
    if err is not None:
        if err.startswith("timeout"):
            err += " (link dead or compile stuck — see doctor)"
        else:
            err = err.replace("exit ", "exit code ", 1) \
                  + " [after %.0fs]" % wall
        return False, err
    if kind == "script":  # bench prints its one JSON result line
        line = next((ln for ln in stdout.splitlines()
                     if ln.startswith("{")), "")
        return True, "%.0fs  %s" % (wall, line[:160])
    marks = [ln for ln in stdout.splitlines()
             if ln.startswith("SMOKE ")]
    return True, "%.0fs  %s" % (wall, "; ".join(
        m[len("SMOKE "):] for m in marks))


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="validate the full TPU compute path on the real "
                    "chip (run after an accelerator-link restore)")
    ap.add_argument("--skip", default="",
                    help="comma-separated probe names to skip "
                         "(tunnel,entry,kernels,bench,fit_many)")
    ap.add_argument("--timeout-scale", type=float, default=1.0,
                    help="multiply every probe timeout (slow links)")
    ap.add_argument("--json", default=None, metavar="PATH",
                    help="also write a machine-readable per-probe "
                         "record (e.g. HW_SMOKE.json) for audit")
    args = ap.parse_args(argv)
    skip = {s.strip() for s in args.skip.split(",") if s.strip()}

    failures = 0
    link_ok = True
    records = []
    for name, kind, payload, timeout in _PROBES:
        if name in skip:
            print(f"[{SKIP}] {name:<9} (requested)")
            records.append({"probe": name, "status": SKIP,
                            "detail": "requested"})
            continue
        if not link_ok:
            print(f"[{SKIP}] {name:<9} (no accelerator link)")
            records.append({"probe": name, "status": SKIP,
                            "detail": "no accelerator link"})
            continue
        ok, detail = _run(name, kind, payload,
                          timeout * args.timeout_scale)
        print(f"[{PASS if ok else FAIL}] {name:<9} {detail}")
        records.append({"probe": name,
                        "status": PASS if ok else FAIL,
                        "detail": detail})
        if not ok:
            failures += 1
            if name == "tunnel":
                link_ok = False
    if args.json:
        import datetime
        import json
        payload = {
            "date": datetime.date.today().isoformat(),
            "ok": failures == 0,
            "probes": records,
        }
        tmp = args.json + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.write("\n")
        import os
        os.replace(tmp, args.json)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
