"""Automated API-surface parity audit against the reference package.

The numerical parity tests (test_reference_parity.py) pin the *math*;
this module pins the *signatures*: every public keyword a reference
user can pass must be accepted by our counterpart, so a drive-by
refactor can't silently drop a compatibility kwarg. Reference
signatures are extracted with ``ast`` (no import — the reference
modules pull in torch-lightning at module scope), ours with
``inspect``.

Known, deliberate divergences are listed per-callable in
``ALLOWED_MISSING`` with the reason; anything else missing fails.
"""

import ast
import inspect
import pathlib

import pytest

import circuitmap_tpu as cm
from circuitmap_tpu import simulation as sim_tpu
from circuitmap_tpu import viz as viz_tpu

REF = pathlib.Path("/root/reference/circuitmap")

# reference params we intentionally do not accept, with the reason.
ALLOWED_MISSING = {
    # torch DataLoader plumbing with no JAX analogue; train(mesh=) is
    # the TPU-native scale-out instead (PARITY.md "NWD training" row).
    ("neural_waveform_demixing.py", "NeuralDemixer.train"):
        {"num_workers", "pin_memory", "num_gpus"},
    # the reference's first two params are literally named
    # ``_psc``/``_stim_matrix``; ours use the unprefixed names. The
    # reference's own notebooks/scripts only ever pass them
    # positionally, so the keyword spelling is not part of the
    # practical contract.
    ("viz.py", "plot_checkerboard"): {"_psc", "_stim_matrix"},
}


def _ref_params(filename, qualname):
    """Parameter names of a reference def, via ast (never imported)."""
    tree = ast.parse((REF / filename).read_text())
    cls, _, fn = qualname.rpartition(".")
    nodes = ast.walk(tree)
    if cls:
        for node in nodes:
            if isinstance(node, ast.ClassDef) and node.name == cls:
                nodes = ast.walk(node)
                break
        else:  # pragma: no cover - audit wiring error
            raise AssertionError(f"{cls} not found in {filename}")
    for node in nodes:
        if isinstance(node, ast.FunctionDef) and node.name == fn:
            names = [a.arg for a in node.args.args + node.args.kwonlyargs]
            return [n for n in names if n != "self"]
    raise AssertionError(f"{qualname} not found in {filename}")


def _accepted_params(func):
    sig = inspect.signature(func)
    names = set()
    has_var_kw = False
    for p in sig.parameters.values():
        if p.kind is inspect.Parameter.VAR_KEYWORD:
            has_var_kw = True
        elif p.kind is not inspect.Parameter.VAR_POSITIONAL:
            names.add(p.name)
    return names, has_var_kw


SURFACE = [
    # (reference file, reference qualname, our callable)
    ("model.py", "Model.fit", cm.Model.fit),
    ("simulation.py", "simulate", sim_tpu.simulate),
    ("simulation.py", "simulate_continuous_experiment",
     sim_tpu.simulate_continuous_experiment),
    ("simulation.py", "simulate_continuous_experiment_without_spike_failures",
     sim_tpu.simulate_continuous_experiment_without_spike_failures),
    ("simulation.py", "alpha", sim_tpu.alpha),
    ("simulation.py", "get_kernel", sim_tpu.get_kernel),
    ("simulation.py", "get_kernels", sim_tpu.get_kernels),
    ("neural_waveform_demixing.py", "NeuralDemixer.train",
     cm.NeuralDemixer.train),
    ("neural_waveform_demixing.py", "NeuralDemixer.generate_training_data",
     cm.NeuralDemixer.generate_training_data),
    ("viz.py", "plot_checkerboard", viz_tpu.plot_checkerboard),
    ("viz.py", "get_cell_order", viz_tpu.get_cell_order),
    ("viz.py", "plot_spike_inference_comparison",
     viz_tpu.plot_spike_inference_comparison),
]


@pytest.mark.parametrize(
    "filename,qualname,ours", SURFACE,
    ids=[q for _, q, _ in SURFACE])
def test_accepts_reference_keywords(filename, qualname, ours):
    ref = set(_ref_params(filename, qualname))
    ref -= ALLOWED_MISSING.get((filename, qualname), set())
    accepted, has_var_kw = _accepted_params(ours)
    missing = ref - accepted
    if has_var_kw:
        # a **kwargs sink forwards unknown keys somewhere — that is
        # acceptance for this audit, but the explicit surface should
        # still carry the bulk of the contract.
        missing = set()
    assert not missing, (
        f"{qualname}: reference keywords not accepted: {sorted(missing)}")


def _ref_kw_params(filename, fn):
    """KEYWORD parameter names (those with defaults) of a reference
    optimise-solver def — this is exactly the ``fit_options`` surface,
    because reference Model.fit forwards ``**fit_options`` into these
    functions (reference model.py:49-52,96-99,143-146)."""
    tree = ast.parse(
        (REF / "optimise" / filename).read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == fn:
            a = node.args
            kw = [x.arg for x in a.args[len(a.args) - len(a.defaults):]]
            return kw + [x.arg for x in a.kwonlyargs]
    raise AssertionError(f"{fn} not found in optimise/{filename}")


@pytest.mark.parametrize("filename,fn,ours", [
    ("caviar.py", "caviar",
     "circuitmap_tpu.solvers.caviar:caviar"),
    ("cavi_sns.py", "cavi_sns",
     "circuitmap_tpu.solvers.cavi_sns:cavi_sns"),
    ("mbcs.py", "mbcs", "circuitmap_tpu.solvers.mbcs:mbcs"),
    ("cosamp.py", "cosamp", "circuitmap_tpu.solvers.cosamp:cosamp"),
], ids=["caviar", "cavi_sns", "mbcs", "cosamp"])
def test_fit_options_surface(filename, fn, ours):
    """Every fit_options key a reference user can pass is accepted by
    our solver entry of the same name."""
    import importlib

    mod, _, attr = ours.partition(":")
    func = getattr(importlib.import_module(mod), attr)
    ref = set(_ref_kw_params(filename, fn))
    accepted, has_var_kw = _accepted_params(func)
    missing = set() if has_var_kw else ref - accepted
    assert not missing, (
        f"{fn}: reference fit_options not accepted: {sorted(missing)}")


def test_unknown_fit_option_raises():
    """A typo'd fit_options key fails loudly (TypeError), never a
    silent drop — stricter than the reference (which also raises via
    **fit_options) and pinned here so adapter refactors keep it."""
    import numpy as np

    m = cm.Model(5)
    with pytest.raises(TypeError):
        m.fit(np.zeros((8, 20)), np.zeros((5, 8)),
              method="caviar", fit_options={"bogus_option": 1})


def test_reference_surface_unchanged():
    """If the pinned reference grows/renames public sim entry points,
    surface it here so the audit list above gets extended."""
    tree = ast.parse((REF / "simulation.py").read_text())
    public = sorted(
        n.name for n in tree.body
        if isinstance(n, ast.FunctionDef) and not n.name.startswith("_"))
    assert public == [
        "alpha", "get_kernel", "get_kernels", "kernel_conv", "sample_gp",
        "sample_spike_time", "simulate", "simulate_continuous_experiment",
        "simulate_continuous_experiment_without_spike_failures",
    ]
