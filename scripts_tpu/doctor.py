"""Environment / accelerator diagnostics: ``python -m circuitmap_tpu doctor``.

Production deployments of the fit path fail in ways that look identical
from the API (a hang, or ``UNAVAILABLE``): a dead accelerator link, a
second process wedging the chip, a cold compilation cache, a missing
native library or demixer checkpoint. This command probes each layer
and prints one PASS/WARN/FAIL line per check; exit code 0 iff no FAIL.

The accelerator probes run in *subprocesses with a timeout* — a direct
``jax.devices()`` call against a dead link blocks forever, so the
probe must be hang-proof and must not poison this process's backend.
Results are parsed from marker lines in the child's stdout (stderr can
interleave arbitrarily with XLA logging).

TPU-native analogue of the reference's implicit environment contract:
its NeuroCAAS entry (reference ``run_circuitmap_main.sh:9-31``) and
README install notes assume a working CUDA/SLURM rig but ship no way
to verify one before a multi-hour job is submitted.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

PASS, WARN, FAIL, SKIP = "PASS", "WARN", "FAIL", "SKIP"

_REPO = Path(__file__).resolve().parent.parent


def _run_probe(code, timeout):
    """Run ``code`` in a fresh interpreter; return (stdout, err_string).

    err_string is None on rc==0, else a short diagnosis ("timeout" or
    the tail of stderr). The child inherits the environment untouched
    so any site customisation (accelerator plugins) applies exactly as
    it would for a real fit. One shared hang-proof core with hw_smoke
    (circuitmap_tpu.utils.probes).
    """
    if str(_REPO) not in sys.path:
        sys.path.insert(0, str(_REPO))
    from circuitmap_tpu.utils.probes import run_probe_cmd

    return run_probe_cmd([sys.executable, "-c", code], timeout)


def _marker(stdout, key):
    """Scan stdout for a ``KEY value...`` marker line (not the last
    line — stderr-free but XLA may still print)."""
    for line in stdout.splitlines():
        if line.startswith(key + " "):
            return line[len(key) + 1:].strip()
        if line.strip() == key:
            return ""
    return None


# ---------------------------------------------------------------- checks

def check_versions():
    import numpy
    detail = {"python": sys.version.split()[0], "numpy": numpy.__version__}
    try:
        from importlib.metadata import version
        for pkg in ("jax", "jaxlib", "flax", "optax"):
            try:
                detail[pkg] = version(pkg)
            except Exception:
                detail[pkg] = "not installed"
    except Exception:
        pass
    sys.path.insert(0, str(_REPO))
    import circuitmap_tpu
    detail["circuitmap_tpu"] = circuitmap_tpu.__version__
    return PASS, detail


def check_host():
    detail = {"cpus": os.cpu_count()}
    try:
        detail["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    detail["mem_available_gb"] = round(
                        int(line.split()[1]) / 1e6, 1)
                    break
    except OSError:
        pass
    # Competing python workloads: on a small host they halve each
    # other's throughput AND two processes racing one accelerator can
    # wedge the link — warn, don't fail.
    others = []
    try:
        out = subprocess.run(["ps", "-eo", "pid,comm,args"],
                             capture_output=True, text=True, timeout=10)
        me = {os.getpid(), os.getppid()}
        for line in out.stdout.splitlines()[1:]:
            parts = line.split(None, 2)
            if len(parts) < 3:
                continue
            pid, comm, args = parts
            if "python" in comm and int(pid) not in me \
                    and "doctor" not in args:
                others.append(args[:80])
    except Exception:
        pass
    if others:
        detail["competing_python"] = others[:5]
        return WARN, detail
    return PASS, detail


def check_native():
    sys.path.insert(0, str(_REPO))
    from circuitmap_tpu.utils import native
    ok = native.native_available()
    lib = native._get_lib() if ok else None
    detail = {"available": bool(ok)}
    if ok:
        detail["sparsifier"] = bool(
            lib is not None and hasattr(lib, "cm_sparsify_stim2_f32"))
        return PASS, detail
    detail["fallback"] = ("numpy paths used for windowing/sparsify "
                          "(correct, slower prep)")
    return WARN, detail


def check_zoo():
    zoo = _REPO / "demixers"
    ckpts = sorted(p.name for p in zoo.glob("*.npz")) if zoo.is_dir() else []
    detail = {"checkpoints": len(ckpts)}
    if not ckpts:
        detail["hint"] = ("no demixers/*.npz found — train one with "
                          "`python -m circuitmap_tpu train-demixer` or "
                          "convert a reference .ckpt")
        return WARN, detail
    detail["qat_int4"] = sorted(n for n in ckpts if "int4" in n)
    return PASS, detail


def check_compile_cache():
    sys.path.insert(0, str(_REPO))
    from circuitmap_tpu import default_compile_cache_dir

    # probe the SAME path the runtime writes (single source of truth in
    # circuitmap_tpu._ensure_compile_cache) so the diagnostic cannot
    # drift from the behaviour it diagnoses
    cache = Path(default_compile_cache_dir())
    detail = {"dir": str(cache),
              "opt_out": bool(os.environ.get(
                  "CIRCUITMAP_TPU_NO_COMPILE_CACHE"))}
    if detail["opt_out"]:
        return WARN, detail
    if cache.is_dir():
        entries = list(cache.glob("*"))
        detail["entries"] = len(entries)
        detail["size_mb"] = round(
            sum(p.stat().st_size for p in entries if p.is_file()) / 1e6, 1)
        return PASS, detail
    detail["entries"] = 0
    detail["hint"] = ("cold cache: first accelerator fit per shape pays "
                      "full compile; pre-populate with "
                      "`python -m circuitmap_tpu warm-cache`")
    return WARN, detail


_ACCEL_PROBE = r"""
import time, numpy as np, jax, jax.numpy as jnp
dev = jax.devices()[0]
print("PLATFORM", dev.platform, getattr(dev, "device_kind", "?"),
      "n=%d" % jax.device_count())
x = jnp.ones((128, 128), jnp.float32)
y = np.asarray((x @ x).ravel()[:1])          # forced pull = real settle
assert abs(float(y[0]) - 128.0) < 1e-3
rtts = []
for _ in range(5):
    t0 = time.perf_counter()
    np.asarray(jnp.zeros((1,), jnp.float32))
    rtts.append(time.perf_counter() - t0)
print("RTT_MS %.2f" % (sorted(rtts)[2] * 1e3))
# Upload bandwidth on RANDOM data (links may compress zeros); first
# touch of a fresh buffer shape is unrepresentative, so time the
# second upload.
rng = np.random.default_rng(0)
buf = rng.standard_normal(NFLOATS).astype(np.float32)
d = jax.device_put(buf); np.asarray(d.ravel()[:1])
buf2 = rng.standard_normal(NFLOATS).astype(np.float32)
t0 = time.perf_counter()
d2 = jax.device_put(buf2); np.asarray(d2.ravel()[:1])
dt = time.perf_counter() - t0
print("UPLOAD_MBPS %.1f" % (buf2.nbytes / dt / 1e6))
print("DOCTOR_ACCEL_OK")
"""


def check_accelerator(timeout, probe_mb):
    nfloats = max(1, int(probe_mb * 1e6 / 4))
    stdout, err = _run_probe(
        _ACCEL_PROBE.replace("NFLOATS", str(nfloats)), timeout)
    if err is not None or _marker(stdout, "DOCTOR_ACCEL_OK") is None:
        detail = {"error": err or "probe did not complete"}
        detail["hint"] = (
            "default-backend probe failed — if this host normally has "
            "an accelerator, its link/driver is down and any jax call "
            "will hang; fall back to CPU with JAX_PLATFORMS=cpu (or "
            "jax.config.update('jax_platforms','cpu') before first use)")
        return FAIL, detail
    detail = {"device": _marker(stdout, "PLATFORM")}
    rtt = _marker(stdout, "RTT_MS")
    bw = _marker(stdout, "UPLOAD_MBPS")
    if rtt:
        detail["roundtrip_ms"] = float(rtt)
    if bw:
        detail["upload_mb_s"] = float(bw)
    status = PASS
    if (detail.get("device") or "").startswith("cpu"):
        detail["note"] = ("default backend is CPU — fits run but "
                          "accelerator-dependent perf numbers do not apply")
    if rtt and float(rtt) > 200.0:
        detail["note"] = "high round-trip latency; expect slow dispatch"
        status = WARN
    return status, detail


_CPU_PROBE = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
out = np.asarray(jax.jit(lambda a: (a @ a).sum())(jnp.eye(16)))
assert abs(float(out) - 16.0) < 1e-4
print("DOCTOR_CPU_OK")
"""


def check_cpu_fallback(timeout):
    stdout, err = _run_probe(_CPU_PROBE, timeout)
    if err is not None or _marker(stdout, "DOCTOR_CPU_OK") is None:
        return FAIL, {"error": err or "probe did not complete"}
    return PASS, {"jit": "ok"}


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="diagnose the circuitmap_tpu runtime environment")
    parser.add_argument("--timeout", type=float, default=90.0,
                        help="per-probe subprocess timeout, seconds "
                             "(a dead accelerator link hangs forever; "
                             "default 90)")
    parser.add_argument("--probe-mb", type=float, default=4.0,
                        help="size of the upload-bandwidth probe (MB)")
    parser.add_argument("--skip-accelerator", action="store_true",
                        help="skip the default-backend probe (e.g. in "
                             "CI or on a known-CPU host)")
    parser.add_argument("--json", dest="json_out", default=None,
                        help="also write results as JSON to this path "
                             "('-' for stdout)")
    args = parser.parse_args(argv)

    checks = [
        ("versions", check_versions, ()),
        ("host", check_host, ()),
        ("native-lib", check_native, ()),
        ("demixer-zoo", check_zoo, ()),
        ("compile-cache", check_compile_cache, ()),
        ("cpu-fallback", check_cpu_fallback, (args.timeout,)),
    ]
    if args.skip_accelerator:
        checks.append(("accelerator", None, ()))
    else:
        checks.append(("accelerator", check_accelerator,
                       (args.timeout, args.probe_mb)))

    results = {}
    t_all = time.perf_counter()
    for name, fn, fargs in checks:
        if fn is None:
            status, detail = SKIP, {"reason": "--skip-accelerator"}
        else:
            try:
                status, detail = fn(*fargs)
            except Exception as exc:  # a broken check is a finding too
                status, detail = FAIL, {"error": "%s: %s" % (
                    type(exc).__name__, exc)}
        results[name] = {"status": status, **detail}
        parts = ", ".join(
            "%s=%s" % (k, v) for k, v in detail.items()
            if k not in ("hint", "note", "error"))
        print("%-5s %-14s %s" % (status, name, parts))
        for key in ("error", "note", "hint"):
            if key in detail:
                print("      %s: %s" % (key, detail[key]))
    print("doctor: %d checks in %.1fs" % (
        len(checks), time.perf_counter() - t_all))

    if args.json_out:
        payload = json.dumps(results, indent=2, default=str)
        if args.json_out == "-":
            print(payload)
        else:
            Path(args.json_out).write_text(payload)

    if any(r["status"] == FAIL for r in results.values()):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
