"""Unified command line: ``python -m circuitmap_tpu <command> [args...]``.

One front door for the framework's workflows. Each command dispatches
to its standalone script in ``scripts_tpu/`` (the TPU-native analogue
of the reference's ``scripts/`` directory of ad-hoc per-workflow files,
e.g. run_circuitmap_main.py / run_1v10_pipeline_on_neuracaas.py); the
scripts stay independently runnable, this module only adds discovery
and routing. ``python -m circuitmap_tpu`` (or ``help``) lists
commands; ``<command> --help`` is the script's own argparse help.
"""

from __future__ import annotations

import runpy
import sys
from pathlib import Path

# command -> (script file, one-line help); grouped for the listing
_GROUPS = [
    ("Mapping workflows", [
        ("fit", "run_main.py",
         "demix + CAVIaR on an experiment file (.mat/.npy/.npz), "
         "export weights"),
        ("pipeline-1v10", "run_1v10_pipeline.py",
         "1-vs-10 ground-truth pipeline (patched-cell validation)"),
        ("pipeline-pair-patch", "run_pair_patch_pipeline.py",
         "paired-patch ground-truth pipeline"),
        ("continuous", "run_continuous_experiment.py",
         "continuous-stimulation benchmark harness (YAML config)"),
        ("loho-cv", "run_loho_cv.py",
         "leave-one-hologram-out cross-validation (one fold per call)"),
        ("fanout-jobs", "generate_fanout_jobs.py",
         "emit SLURM/bash fan-out scripts for LOHO-CV folds"),
        ("distributed-fit", "run_distributed_fit.py",
         "multi-process (multi-host) sharded CAVIaR worker"),
    ]),
    ("Demixer", [
        ("train-demixer", "train_demixer.py",
         "train a neural waveform demixer (per-opsin presets)"),
        ("train-qat-demixer", "train_qat_demixer.py",
         "quantisation-aware training for the int4/int4d2 trace wires"),
        ("denoise-grids", "denoise_grids.py",
         "batch-denoise grid experiment files with a demixer"),
        ("export-ckpt", "export_lightning.py",
         "export a trained demixer as a reference-compatible "
         "Lightning .ckpt (for torch rigs)"),
    ]),
    ("Simulation studies", [
        ("simulations", "run_simulations.py",
         "simulation benchmark sweep (recovery vs trials/noise)"),
        ("downsampling", "run_downsampling.py",
         "trial-count downsampling experiment"),
        ("signal-fidelity", "run_signal_fidelity.py",
         "demixing fidelity vs stimulation frequency"),
        ("design-study", "design_study.py",
         "adaptive closed-loop vs static design policy "
         "(DESIGN_STUDY.json)"),
    ]),
    ("Operations", [
        ("serve", "serve.py",
         "persistent fit server: one resident process owns the "
         "accelerator, fits arrive over HTTP"),
        ("doctor", "doctor.py",
         "diagnose the runtime environment (accelerator link, native "
         "lib, zoo, compile cache) with hang-proof probes"),
        ("hw-smoke", "hw_smoke.py",
         "exercise the full TPU compute path on the real chip "
         "(run after an accelerator-link restore)"),
        ("warm-cache", "warm_cache.py",
         "pre-compile the pipeline for deployment shapes into the "
         "persistent XLA cache"),
    ]),
    ("Measurement / profiling", [
        ("scaling-study", "run_scaling_study.py",
         "on-chip shape-scaling study (SCALING.json)"),
        ("memory-cliff", "probe_memory_cliff.py",
         "walk the single-chip OOM ladder (MEMORY_CLIFF.json)"),
        ("wire-study", "wire_fidelity_study.py",
         "trace-wire fidelity study (WIRE_STUDY.json)"),
        ("compile-study", "measure_many_compile.py",
         "caviar_many cold/warm compile cost (COMPILE_STUDY.json)"),
        ("reference-baseline", "measure_reference_baseline.py",
         "time the reference implementation on identical data"),
        ("parity-vr", "parity_variance_reduced.py",
         "deterministic variance-reduced parity vs the reference"),
        ("profile-fit", "profile_fit_entry.py",
         "stage attribution of the public fit entry"),
        ("profile-demixer", "profile_demixer.py",
         "demixer forward wall/device profile"),
        ("profile-online", "profile_online.py",
         "closed-loop update latency profile"),
    ]),
]

_COMMANDS = {name: (script, blurb)
             for _, rows in _GROUPS for name, script, blurb in rows}


def _scripts_dir() -> Path:
    here = Path(__file__).resolve().parent
    for root in (here.parent, *here.parents):
        cand = root / "scripts_tpu"
        if cand.is_dir():
            return cand
    raise SystemExit(
        "scripts_tpu/ not found next to the circuitmap_tpu package — "
        "the CLI commands need a repository checkout (a bare library "
        "install ships only the importable API)")


def _usage() -> str:
    lines = ["usage: python -m circuitmap_tpu <command> [args...]",
             "       python -m circuitmap_tpu <command> --help", ""]
    for title, rows in _GROUPS:
        lines.append(title + ":")
        for name, _script, blurb in rows:
            lines.append(f"  {name:<22}{blurb}")
        lines.append("")
    lines.append("version: print the package version")
    return "\n".join(lines)


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        try:
            print(_usage())
        except BrokenPipeError:  # e.g. `... | head`
            pass
        return
    cmd = argv[0]
    if cmd == "version":
        from . import __version__

        print(__version__)
        return
    if cmd not in _COMMANDS:
        print(f"unknown command {cmd!r}\n\n{_usage()}", file=sys.stderr)
        raise SystemExit(2)
    script = _scripts_dir() / _COMMANDS[cmd][0]
    sys.argv = [str(script)] + argv[1:]
    runpy.run_path(str(script), run_name="__main__")


if __name__ == "__main__":
    main()
