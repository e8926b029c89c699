"""Checkpoint/resume for solver state and demixer parameters.

The reference has no inference-side resume at all (SURVEY.md §5):
results are exported post-hoc and a crashed fit restarts from scratch.
Here the CAVI carry (a flat pytree of arrays) serialises to a single
.npz, so a preempted-TPU fit resumes from its last saved iteration.
Orbax is used when available (async, sharding-aware); the .npz path is
the dependency-free fallback and interchange format.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif hasattr(tree, "_asdict"):  # NamedTuple
        items = tree._asdict().items()
    else:
        raise TypeError(f"unsupported tree node: {type(tree)}")
    for k, v in items:
        key = f"{prefix}{k}"
        if isinstance(v, dict) or hasattr(v, "_asdict"):
            flat.update(_flatten(v, key + "/"))
        elif v is None:
            flat[key + "#none"] = np.zeros(0)
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat):
    tree: dict = {}
    for key, val in flat.items():
        none = key.endswith("#none")
        if none:
            key = key[: -len("#none")]
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = None if none else val
    return tree


def save_state(path, state_tree):
    """Serialise a (possibly nested) dict/NamedTuple of arrays to .npz.

    The write is ATOMIC (temp file + os.replace): a preemption mid-save
    must not corrupt the only checkpoint — surviving preemption is the
    whole point of this module. A torn in-place np.savez would leave a
    truncated zip that exists but cannot load, permanently breaking
    resume.
    """
    import os

    path = str(path)
    tmp = path + ".tmp"
    try:
        np.savez(tmp, **_flatten(state_tree))
        # np.savez appends .npz to names without an extension
        if not os.path.exists(tmp) and os.path.exists(tmp + ".npz"):
            tmp = tmp + ".npz"
        os.replace(tmp, path)
    finally:
        # a failed savez (or a replace that never ran) must not strand
        # stale '<path>.tmp[.npz]' files next to the checkpoint
        for leftover in (tmp, tmp + ".npz" if not tmp.endswith(".npz")
                         else tmp):
            try:
                os.unlink(leftover)
            except FileNotFoundError:
                pass


def load_state(path):
    """Load a .npz checkpoint back into a nested dict of numpy arrays."""
    data = np.load(str(path), allow_pickle=False)
    return _unflatten({k: data[k] for k in data.files})


def save_state_orbax(directory, state_tree, step=0):
    """Orbax variant for sharded arrays / async IO. Optional dependency."""
    import orbax.checkpoint as ocp

    path = Path(directory).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / f"step_{step}", state_tree, force=True)
    ckptr.wait_until_finished()


def load_state_orbax(directory, step=0):
    import orbax.checkpoint as ocp

    path = Path(directory).absolute()
    return ocp.StandardCheckpointer().restore(path / f"step_{step}")
