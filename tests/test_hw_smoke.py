"""Harness tests for scripts_tpu/hw_smoke.py (the real probes need the
TPU link; these pin the orchestration: probe isolation, timeout and
failure reporting, and the tunnel-gates-everything rule)."""

import importlib.util
import subprocess
import sys

_spec = importlib.util.spec_from_file_location(
    "hw_smoke", "/root/repo/scripts_tpu/hw_smoke.py")
hw_smoke = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(hw_smoke)


class TestRun:
    def test_passing_code_probe(self):
        ok, detail = hw_smoke._run(
            "x", "code", "print('SMOKE x ok fast')", 60)
        assert ok
        assert "x ok fast" in detail

    def test_failing_probe_reports_tail(self):
        ok, detail = hw_smoke._run(
            "x", "code", "import sys; sys.exit('kernel did not lower')",
            60)
        assert not ok
        assert "kernel did not lower" in detail

    def test_timeout_is_a_failure_not_a_hang(self):
        ok, detail = hw_smoke._run(
            "x", "code", "import time; time.sleep(30)", 2)
        assert not ok
        assert "timeout" in detail


class TestTunnelProbe:
    def test_cpu_backend_is_rejected(self):
        """The tunnel probe must FAIL on a CPU backend (a leftover
        JAX_PLATFORMS=cpu override would otherwise let every probe
        'validate the TPU path' on the host — review fix)."""
        code = ("import jax\n"
                "jax.config.update('jax_platforms', 'cpu')\n"
                + hw_smoke._TUNNEL)
        ok, detail = hw_smoke._run("tunnel", "code", code, 300)
        assert not ok
        assert "not a TPU-class platform" in detail


class TestMain:
    def _patched(self, monkeypatch, probes):
        monkeypatch.setattr(hw_smoke, "_PROBES", probes)

    def test_tunnel_failure_skips_the_rest(self, monkeypatch, capsys):
        self._patched(monkeypatch, [
            ("tunnel", "code", "raise SystemExit('link dead')", 30),
            ("entry", "code", "print('SMOKE entry ok')", 30),
        ])
        rc = hw_smoke.main([])
        out = capsys.readouterr().out
        assert rc == 1
        assert "[FAIL] tunnel" in out
        assert "[SKIP] entry" in out and "no accelerator link" in out

    def test_all_pass_exits_zero(self, monkeypatch, capsys):
        self._patched(monkeypatch, [
            ("tunnel", "code", "print('SMOKE tunnel ok cpu')", 30),
            ("kernels", "code", "print('SMOKE kernels ok')", 30),
        ])
        rc = hw_smoke.main([])
        out = capsys.readouterr().out
        assert rc == 0
        assert out.count("[PASS]") == 2

    def test_skip_flag(self, monkeypatch, capsys):
        self._patched(monkeypatch, [
            ("tunnel", "code", "print('SMOKE tunnel ok cpu')", 30),
            ("bench", "code", "raise SystemExit('never run')", 30),
        ])
        rc = hw_smoke.main(["--skip", "bench"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "[SKIP] bench" in out and "requested" in out

    def test_non_tunnel_failure_does_not_gate(self, monkeypatch,
                                              capsys):
        self._patched(monkeypatch, [
            ("tunnel", "code", "print('SMOKE tunnel ok cpu')", 30),
            ("entry", "code", "raise SystemExit('boom')", 30),
            ("bench", "code", "print('SMOKE bench ok')", 30),
        ])
        rc = hw_smoke.main([])
        out = capsys.readouterr().out
        assert rc == 1
        assert "[FAIL] entry" in out
        assert "[PASS] bench" in out


def test_cli_help_lists_hw_smoke():
    proc = subprocess.run(
        [sys.executable, "-m", "circuitmap_tpu", "help"],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
             "HOME": "/root"}, timeout=120)
    assert proc.returncode == 0
    assert "hw-smoke" in proc.stdout
