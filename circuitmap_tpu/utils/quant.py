"""Shared host-side int8 trace quantiser (jax-free).

One implementation of the per-trace peak/127 scheme for its three
consumers — the demixer device wire (demix/demixer.py), the solver
raw-trace wire (solvers/_common.prepare_traces) and the fit server's
HTTP body wire (serve.encode_psc_int8; FitClient runs on rig machines
with numpy only, so this module must not import jax). Keeping one copy
is what makes the serve wire's composition guarantee ("server-side
dequantise → device-side requantise is the identity") robust: the
per-row max code is exactly 127 only while every producer uses the
same scale and rounding.

Quantisation always happens in f32 whatever the input dtype — the
'.5-boundary' lesson (CLAUDE.md round-4 session 4): an f64 source
quantised in f64 can round boundary samples to different codes than
the same data quantised in f32.
"""

from __future__ import annotations

import numpy as np


def quantise_int8(part, out=None):
    """Per-trace peak/127 int8 codes for a [..., T] block.

    Returns ``(codes int8 [..., T], scale f32 [...])`` with
    ``scale = max(|row|) / 127`` (1.0 for all-zero rows), quantised in
    f32. ``out`` optionally receives the codes in place (e.g. a slice
    of a preallocated padded buffer). Raises on non-finite input: the
    unsafe int8 cast would otherwise wrap silently.
    """
    part = np.asarray(part, dtype=np.float32)
    scale = (np.abs(part).max(axis=-1) / np.float32(127.0)).astype(
        np.float32)
    if not np.isfinite(scale).all():
        raise ValueError(
            "traces contain non-finite samples (or peaks above float32 "
            "range); the int8 trace wire requires finite traces")
    scale = np.where(scale > 0, scale, np.float32(1.0))
    if out is None:
        out = np.empty(part.shape, dtype=np.int8)
    np.rint(part / scale[..., None], out=out, casting="unsafe")
    return out, scale
