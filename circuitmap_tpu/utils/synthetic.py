"""Shape-faithful synthetic experiments + CLI shape parsing.

Shared by the compile-warming paths (``scripts_tpu/warm_cache.py``,
``serve.FitService.do_warm``) — executables are cached by traced graph
+ shapes + static options, so warming only needs data of the right
SHAPE; values must merely be numerically tame (an all-zero stim would
collapse the power-level scan). Centralised so the two warmers cannot
drift (they once carried independent copies).
"""

from __future__ import annotations

import numpy as np


def parse_shape(text):
    """'NxK' → (N, K); raises argparse.ArgumentTypeError otherwise."""
    import argparse

    try:
        n, k = text.lower().split("x")
        return int(n), int(k)
    except ValueError:
        raise argparse.ArgumentTypeError(
            "shape must look like NxK, e.g. 1000x20000") from None


def synthetic_experiment(N, K, T=900, H=10, powers=(45.0, 55.0, 65.0),
                         seed=0):
    """Random data at the reference's array contracts: [K, T] f32
    traces, [N, K] f64 stim with H targets per trial, one rig power
    level per trial (every trial stimulates at least one target)."""
    rng = np.random.default_rng(seed)
    stim = np.zeros((N, K), dtype=np.float64)
    tgt = rng.integers(0, N, size=(max(int(H), 1), K))
    pw = rng.choice(np.asarray(powers, dtype=np.float64), size=K)
    for h in range(tgt.shape[0]):
        stim[tgt[h], np.arange(K)] = pw
    psc = 0.01 * rng.standard_normal((K, T)).astype(np.float32)
    return psc, stim
