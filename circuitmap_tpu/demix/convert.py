"""Checkpoint IO: Lightning .ckpt -> JAX params, plus a native .npz format.

The reference ships five pretrained Lightning checkpoints
(demixers/*.ckpt, reference README.md:85-87). ``load_checkpoint``
accepts either those (via torch, an optional dependency used purely as
a deserialiser) or this package's own flat .npz format.

torch state_dict layout (neural_waveform_demixing.py:204-269):
  {d,u}blockN.{conv,deconv}.{weight,bias}
  {d,u}blockN.bn.{weight,bias,running_mean,running_var,num_batches_tracked}
  conv.conv.* / conv.bn.*
Conv1d weights are [O, I, K] and ConvTranspose1d weights [I, O, K] —
both match this package's layouts directly, so conversion is a pure
re-keying with no transposes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_BLOCKS = (
    [(f"dblock{i}", "conv") for i in range(1, 5)]
    + [(f"ublock{i}", "deconv") for i in range(1, 5)]
    + [("conv", "conv")]
)


def params_from_state_dict(sd, dtype=jnp.float32):
    """Re-key a torch state_dict (tensors or ndarrays) into the params pytree."""

    def arr(name):
        t = sd[name]
        t = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        return jnp.asarray(t, dtype=dtype)

    params = {}
    for block, kind in _BLOCKS:
        params[block] = {
            kind: {"w": arr(f"{block}.{kind}.weight"), "b": arr(f"{block}.{kind}.bias")},
            "bn": {
                "scale": arr(f"{block}.bn.weight"),
                "bias": arr(f"{block}.bn.bias"),
                "running_mean": arr(f"{block}.bn.running_mean"),
                "running_var": arr(f"{block}.bn.running_var"),
            },
        }
    return params


def load_lightning_checkpoint(path, dtype=jnp.float32):
    """Load one of the reference's pretrained .ckpt files."""
    import torch  # optional dep, used only to deserialise

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    return params_from_state_dict(sd, dtype=dtype)


def save_params(path, params):
    """Native format: flat npz keyed 'block/leaf/...'"""
    flat = {}
    for block, sub in params.items():
        for group, leaves in sub.items():
            for leaf, val in leaves.items():
                flat[f"{block}/{group}/{leaf}"] = np.asarray(val)
    np.savez(path, **flat)


def load_params(path, dtype=jnp.float32):
    """Load either the native .npz format or a Lightning .ckpt."""
    p = str(path)
    if p.endswith(".ckpt") or p.endswith(".pt") or p.endswith(".pth"):
        return load_lightning_checkpoint(p, dtype=dtype)
    data = np.load(p)
    params: dict = {}
    for key in data.files:
        block, group, leaf = key.split("/")
        params.setdefault(block, {}).setdefault(group, {})[leaf] = jnp.asarray(
            data[key], dtype=dtype
        )
    return params


def state_dict_from_params(params):
    """Inverse of ``params_from_state_dict``: the params pytree as a
    torch state_dict in the reference's exact key layout (tensors;
    conv layouts already match — module docstring — so this too is a
    pure re-keying). BN ``num_batches_tracked`` is synthesised as 0:
    our training tracks running stats directly (demix/unet.py) and
    eval-mode BatchNorm never reads the counter."""
    import torch  # optional dep, used only as a serialiser

    def t(a, dtype=torch.float32):
        # np.array (copy): jax arrays view as read-only numpy, and
        # torch warns on (and would alias) non-writable memory
        return torch.as_tensor(np.array(a), dtype=dtype)

    sd = {}
    for block, kind in _BLOCKS:
        p = params[block]
        sd[f"{block}.{kind}.weight"] = t(p[kind]["w"])
        sd[f"{block}.{kind}.bias"] = t(p[kind]["b"])
        sd[f"{block}.bn.weight"] = t(p["bn"]["scale"])
        sd[f"{block}.bn.bias"] = t(p["bn"]["bias"])
        sd[f"{block}.bn.running_mean"] = t(p["bn"]["running_mean"])
        sd[f"{block}.bn.running_var"] = t(p["bn"]["running_var"])
        sd[f"{block}.bn.num_batches_tracked"] = t(0, torch.int64)
    return sd


def save_lightning_checkpoint(path, params, epoch=0, global_step=0):
    """Export a trained in-framework demixer as a Lightning ``.ckpt``
    the reference ecosystem loads — the reverse of
    ``load_lightning_checkpoint``, closing the one-way artifact
    asymmetry (a QAT/scratch checkpoint trained here becomes usable on
    a torch rig via ``NWDUNet().load_from_checkpoint(path)``,
    reference neural_waveform_demixing.py:27).

    The container mirrors the reference's shipped checkpoints exactly:
    the same top-level keys (epoch/global_step/pytorch-lightning_
    version/state_dict/callbacks/optimizer_states/lr_schedulers, no
    hyper_parameters — ``NWDUNet()`` takes none) and the same 63-entry
    state_dict layout, so any loader that accepts the shipped .ckpt
    files accepts these. Round-trip parity (export → torch reload →
    forward) is pinned at 1e-3 by the test suite against the plain-
    torch reference net."""
    import torch

    ckpt = {
        "epoch": int(epoch),
        "global_step": int(global_step),
        "pytorch-lightning_version": "1.5.9",
        "state_dict": state_dict_from_params(params),
        "callbacks": {},
        "optimizer_states": [],
        "lr_schedulers": [],
    }
    torch.save(ckpt, path)
