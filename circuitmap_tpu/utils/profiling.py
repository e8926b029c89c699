"""Profiling and structured timing.

The reference's observability is coarse wall-clock prints (SURVEY.md §5:
model.py:47-54, neural_waveform_demixing.py:41-52). Here:

  * ``timed`` — context manager collecting named wall-clock spans into a
    metrics dict (JSON-lines friendly),
  * ``trace`` — wraps ``jax.profiler`` so a fit can emit an xprof trace
    viewable in TensorBoard/XProf,
  * ``annotate`` — named TraceAnnotation spans that show up inside the
    device trace (one per CAVI update family).
"""

from __future__ import annotations

import contextlib
import json
import time


class Metrics:
    """Accumulates named timing spans + scalar metrics; dumps JSON lines."""

    def __init__(self):
        self.records = []

    @contextlib.contextmanager
    def span(self, name, **extra):
        t0 = time.time()
        try:
            yield
        finally:
            self.records.append(
                {"name": name, "seconds": time.time() - t0, **extra}
            )

    def log(self, name, **values):
        self.records.append({"name": name, **values})

    def dump(self, path=None):
        lines = [json.dumps(r) for r in self.records]
        if path is not None:
            with open(path, "a") as f:
                f.write("\n".join(lines) + "\n")
        return lines


@contextlib.contextmanager
def trace(log_dir):
    """Capture a device profile (xprof) for the enclosed block."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name):
    """Named annotation visible in device traces."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
