"""Multi-chip execution: mesh construction, trial-sharded CAVIaR, sweeps.

The reference has no distributed layer at all — its only scale-out is
embarrassingly-parallel SLURM job arrays (reference
generate_loho_cv_slurm_scripts.py) and host-side batching. Here the
data axis of the *model itself* shards: every CAVI update is a sum over
trials K, so K partitions across a ``jax.sharding.Mesh`` and the
reductions ride ``psum`` over ICI (SURVEY.md §5 "long-context" note).
"""

from .mesh import trial_mesh
from .sharded import caviar_sharded, cavi_sns_sharded, mbcs_sharded
from .sweep import run_sweep
from .distributed import (
    initialize as initialize_distributed,
    global_trial_mesh,
    caviar_sharded_distributed,
    caviar_resumable_distributed,
    cavi_sns_sharded_distributed,
    mbcs_sharded_distributed,
)

__all__ = ["trial_mesh", "caviar_sharded", "cavi_sns_sharded",
           "mbcs_sharded", "run_sweep", "initialize_distributed",
           "global_trial_mesh", "caviar_sharded_distributed",
           "caviar_resumable_distributed",
           "cavi_sns_sharded_distributed", "mbcs_sharded_distributed"]
