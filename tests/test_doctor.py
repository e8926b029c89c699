"""Operations CLI: ``doctor`` diagnostics and ``warm-cache``.

The doctor exists because accelerator-link failures are
indistinguishable from hangs at the API layer (see CLAUDE.md: the
tunnel relay dies and every jax call blocks); its probes must therefore
run hang-proof in subprocesses and the command must keep working when
the default backend is plain CPU. warm-cache must populate a persistent
compile cache through the *public* fit path.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


class TestDoctor:
    def test_skip_accelerator_json(self, tmp_path):
        out_json = tmp_path / "doctor.json"
        proc = subprocess.run(
            [sys.executable, "-m", "circuitmap_tpu", "doctor",
             "--skip-accelerator", "--json", str(out_json)],
            capture_output=True, text=True, cwd="/root/repo",
            env=_env(), timeout=600)
        assert proc.returncode == 0, proc.stderr[-2000:]
        results = json.loads(out_json.read_text())
        assert results["versions"]["status"] == "PASS"
        assert results["versions"]["circuitmap_tpu"]
        assert results["accelerator"]["status"] == "SKIP"
        assert results["cpu-fallback"]["status"] == "PASS"
        assert results["native-lib"]["status"] in ("PASS", "WARN")
        assert results["demixer-zoo"]["status"] == "PASS"
        # no FAIL anywhere on a healthy checkout
        assert all(r["status"] != "FAIL" for r in results.values())
        # human output: one line per check
        for name in ("versions", "host", "compile-cache", "accelerator"):
            assert name in proc.stdout

    def test_accelerator_probe_on_cpu_backend(self):
        """With the default backend pinned to CPU, the accelerator
        probe must still complete (device=cpu, metrics parsed) — the
        probe is about the *default backend*, whatever it is."""
        proc = subprocess.run(
            [sys.executable, "-m", "circuitmap_tpu", "doctor",
             "--probe-mb", "0.5", "--timeout", "240"],
            capture_output=True, text=True, cwd="/root/repo",
            env=_env(), timeout=600)
        assert proc.returncode == 0, \
            proc.stdout[-2000:] + proc.stderr[-2000:]
        line = [l for l in proc.stdout.splitlines()
                if l.split()[:2][-1:] == ["accelerator"]]
        assert line and line[0].startswith("PASS"), proc.stdout
        assert "device=cpu" in line[0]
        assert "roundtrip_ms=" in line[0]
        assert "upload_mb_s=" in line[0]


class TestWarmCache:
    def test_populates_explicit_cache_dir(self, tmp_path):
        cache = tmp_path / "xla_cache"
        proc = subprocess.run(
            [sys.executable, "-m", "circuitmap_tpu", "warm-cache",
             "--shape", "15x120", "--iters", "2",
             "--cache-dir", str(cache)],
            capture_output=True, text=True, cwd="/root/repo",
            env=_env(), timeout=600)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "warmed N=15 K=120" in proc.stdout
        entries = [p for p in cache.iterdir() if p.is_file()]
        assert entries, "persistent cache dir stayed empty"

    def test_bad_shape_rejected(self):
        proc = subprocess.run(
            [sys.executable, "-m", "circuitmap_tpu", "warm-cache",
             "--shape", "garbage"],
            capture_output=True, text=True, cwd="/root/repo",
            env=_env(), timeout=300)
        assert proc.returncode == 2
        assert "NxK" in proc.stderr

    def test_synthetic_experiment_shape_faithful(self):
        sys.path.insert(0, "/root/repo/scripts_tpu")
        import warm_cache as wc

        psc, stim = wc.synthetic_experiment(30, 200, T=700, H=5,
                                            powers=(45.0, 55.0))
        assert psc.shape == (200, 700) and psc.dtype == np.float32
        assert stim.shape == (30, 200) and stim.dtype == np.float64
        nz = stim[stim > 0]
        assert set(np.unique(nz)) <= {45.0, 55.0}
        # every trial stimulates at least one target (no degenerate
        # all-zero columns that would distort the power-level scan)
        assert (stim > 0).any(axis=0).all()
