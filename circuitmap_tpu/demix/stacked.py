"""StackedDenoisingNetwork: plain stacked-1D-conv denoiser + dataset.

The reference ships this simpler alternative to the U-Net
(neural_waveform_demixing.py:165-202) — note its constructor crashes as
shipped (``super(DenoisingNetwork, ...)`` NameError at :187); this is
the working equivalent. Same layer recipe: long same-padded 1-D convs
with ReLU between, final single-channel output.

``PSCData`` is the (inputs, targets) dataset/batching helper standing
in for the reference's torch Dataset (neural_waveform_demixing.py:165-180).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .unet import conv1d


class PSCData:
    """Paired (input, target) PSC traces with shuffled minibatching."""

    def __init__(self, inputs, targets):
        inputs = np.asarray(inputs, dtype=np.float32)
        targets = np.asarray(targets, dtype=np.float32)
        assert inputs.shape == targets.shape
        self.inputs = inputs
        self.targets = targets

    def __len__(self):
        return self.inputs.shape[0]

    def __getitem__(self, idx):
        return self.inputs[idx], self.targets[idx]

    def batches(self, batch_size, rng=None):
        """Shuffled minibatches; the final partial batch is yielded too
        (dropping it silently starved datasets smaller than batch_size
        and never trained on the tail remainder)."""
        n = len(self)
        order = (rng or np.random.default_rng()).permutation(n)
        for i0 in range(0, n, batch_size):
            sel = order[i0:i0 + batch_size]
            yield self.inputs[sel], self.targets[sel]


def init_stacked_params(key, n_layers=3, kernel_size=99, channels=(16, 8, 1),
                        dtype=jnp.float32):
    """Fresh parameters for the stacked conv denoiser."""
    assert n_layers >= 2 and channels[-1] == 1
    params = []
    c_in = 1
    keys = jax.random.split(key, n_layers)
    for i in range(n_layers):
        c_out = channels[i]
        bound = 1.0 / np.sqrt(c_in * kernel_size)
        k1, k2 = jax.random.split(keys[i])
        params.append({
            "w": jax.random.uniform(k1, (c_out, c_in, kernel_size), dtype,
                                    -bound, bound),
            "b": jax.random.uniform(k2, (c_out,), dtype, -bound, bound),
        })
        c_in = c_out
    return params


def stacked_forward(params, x):
    """x: [B, 1, L] -> [B, 1, L]; relu after every conv (reference recipe)."""
    h = x
    for layer in params:
        pad = (layer["w"].shape[-1] - 1) // 2
        h = jax.nn.relu(conv1d(h, layer["w"], layer["b"], padding=pad))
    return h
