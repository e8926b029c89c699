"""circuitmap_tpu — TPU-native synaptic connectivity mapping.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
``marcustriplett/circuitmap`` (CAVIaR): neural-waveform demixing and
Bayesian inference of synaptic connectivity from two-photon holographic
ensemble stimulation experiments.

Public API mirrors the reference package root (reference
circuitmap/__init__.py:1-3): ``Model``, ``NeuralDemixer``, ``simulate``.

Design stance (TPU-first):
  * One runtime. The demixer is JAX (not PyTorch), so demixing and
    inference share a single XLA-compiled pipeline and one device
    memory pool — the reference forces the demixer onto CPU to avoid
    Torch/JAX GPU memory clashes (reference README.md:31).
  * Whole-solver compilation. The full CAVI iteration loop runs inside
    a single ``lax.scan`` under ``jit`` — no per-iteration Python
    dispatch, no host↔device round trips.
  * Scale-out via ``jax.sharding``: the trial axis (K) shards across a
    device mesh; all cross-trial reductions ride ``psum`` over ICI.

Imports are lazy so that ``circuitmap_tpu.ops`` / ``.solvers`` can be
used without pulling in visualization or checkpoint-conversion deps.
"""

__version__ = "0.1.0"


def default_compile_cache_dir():
    """The persistent-cache location `_ensure_compile_cache` uses when
    nothing else is configured. Single source of truth — the doctor
    diagnostics probe the same path the runtime writes."""
    import os

    return os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "circuitmap_tpu", "jax_cache"),
    )


def _ensure_compile_cache():
    """Opt-out persistent XLA compilation cache, accelerator-only.

    Cold compiles dominate process startup for production fits (a fresh
    process re-compiles the whole fused solver: measured 197 s cold vs
    86 s with a warm cache through the tunneled-TPU remote compiler).
    Deliberately NOT enabled for CPU backends: XLA:CPU AOT cache entries
    bake in the compile host's machine features and log load errors on
    feature mismatch — and CPU compiles are cheap anyway. Called lazily
    by the heavy entry points (Model.fit / solvers / NeuralDemixer)
    once the backend exists; opt out with
    CIRCUITMAP_TPU_NO_COMPILE_CACHE=1. Failures are non-fatal.
    """
    import os

    if getattr(_ensure_compile_cache, "_done", False):
        return
    _ensure_compile_cache._done = True
    if os.environ.get("CIRCUITMAP_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return  # user already configured one
        if jax.devices()[0].platform in ("cpu",):
            return
        cache = default_compile_cache_dir()
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass


_LAZY = {
    "Model": ("circuitmap_tpu.model", "Model"),
    "NeuralDemixer": ("circuitmap_tpu.demix", "NeuralDemixer"),
    "simulate": ("circuitmap_tpu.simulation", "simulate"),
    "simulate_continuous_experiment": (
        "circuitmap_tpu.simulation",
        "simulate_continuous_experiment",
    ),
    "OnlineCaviar": ("circuitmap_tpu.solvers.online", "OnlineCaviar"),
    "caviar_many": ("circuitmap_tpu.solvers.batched", "caviar_many"),
    "sns_many": ("circuitmap_tpu.solvers.batched", "sns_many"),
    "mbcs_many": ("circuitmap_tpu.solvers.batched", "mbcs_many"),
    "FitClient": ("circuitmap_tpu.serve", "FitClient"),
    "AdaptiveDesigner": ("circuitmap_tpu.design", "AdaptiveDesigner"),
    "closed_loop_map": ("circuitmap_tpu.design", "closed_loop_map"),
    "summarize": ("circuitmap_tpu.summary", "summarize"),
    "format_summary": ("circuitmap_tpu.summary", "format_summary"),
}

__all__ = list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'circuitmap_tpu' has no attribute {name!r}")
