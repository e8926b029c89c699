"""Smoke tests: the example walkthroughs run end-to-end as committed."""

import os
import subprocess
import sys

import pytest


def _run_example(script, args, timeout=600):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable, f"examples/{script}", *args],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=timeout,
    )


@pytest.mark.parametrize("script,args,expect", [
    ("demo_compressive_mapping.py",
     ["--N", "40", "--trials", "300"], "weight recovery R2"),
    ("demo_experimental_data.py",
     ["--iters", "8"], "single-vs-ensemble weight R2"),
    ("demo_closed_loop.py",
     ["--N", "50", "--rounds", "2", "--block", "120", "--H", "5",
      "--iters", "4"], "closed-loop demo done"),
])
def test_example_runs(script, args, expect, tmp_path):
    proc = _run_example(script, args)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert expect in proc.stdout


def test_experimental_demo_plots(tmp_path):
    proc = _run_example(
        "demo_experimental_data.py",
        ["--iters", "8", "--plot-dir", str(tmp_path)],
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (tmp_path / "stem_comparison.png").exists()
    assert (tmp_path / "comparison_checkerboard.png").exists()
