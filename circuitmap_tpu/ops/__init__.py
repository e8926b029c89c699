"""Device kernels: the numerical primitives underneath the solvers.

Everything in this package is pure-JAX (jittable, vmappable, shardable)
and shape-static, so the solvers can fuse them into a single XLA program.
"""

from .pava import (
    isotonic_regression,
    isotonic_regression_batched,
    isotonic_fit_at_max,
    isotonic_fit_at_max_batched,
)
from .charge import integrated_charge, trial_activity_mask, prepare_observations
from .truncnorm import sample_truncated_normal, truncated_normal_mean
from .spike_rates import spike_rates_by_power, spike_rates_by_power_batched
from .monotone import monotone_decay_filter

__all__ = [
    "isotonic_regression",
    "isotonic_regression_batched",
    "isotonic_fit_at_max",
    "isotonic_fit_at_max_batched",
    "integrated_charge",
    "trial_activity_mask",
    "prepare_observations",
    "sample_truncated_normal",
    "truncated_normal_mean",
    "spike_rates_by_power",
    "spike_rates_by_power_batched",
    "monotone_decay_filter",
]

from .masks import get_mask  # noqa: E402

__all__.append("get_mask")
