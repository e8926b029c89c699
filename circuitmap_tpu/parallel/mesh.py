"""Mesh helpers.

One logical axis, ``trial``: the K (trial) dimension of every [.., K]
array shards across it. Neuron-axis quantities (mu, beta, phi) stay
replicated — they are O(N) and every device needs them each sweep step.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


TRIAL_AXIS = "trial"


def trial_mesh(n_devices=None, devices=None) -> Mesh:
    """A 1-D mesh over the trial axis.

    n_devices defaults to every visible device. On a pod slice the
    devices come back in ICI-contiguous order, so the psum rides ICI.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"trial_mesh({n_devices}) needs {n_devices} devices but the "
                    f"{devices[0].platform} platform only exposes {len(devices)}; "
                    "force a virtual CPU mesh (jax_platforms=cpu + "
                    "jax_num_cpu_devices) before first backend use"
                )
            devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (TRIAL_AXIS,))
