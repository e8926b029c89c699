"""Neural waveform demixing (NWD) — JAX-native.

Replaces the reference's PyTorch/Lightning demixer stack
(neural_waveform_demixing.py). One runtime: the demixer forward, its
training loop, and the CAVI solvers all compile through XLA onto the
same device — the reference had to pin the torch demixer to CPU to
avoid fighting JAX for GPU memory (reference README.md:31).
"""

from .demixer import NeuralDemixer
from .unet import nwd_unet_forward, init_nwd_params

__all__ = ["NeuralDemixer", "nwd_unet_forward", "init_nwd_params"]
