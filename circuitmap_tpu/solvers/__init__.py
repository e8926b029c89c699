"""Inference solvers: CAVIaR (flagship), CAVI-SnS, MBCS, CoSaMP.

Mirrors the reference ``circuitmap.optimise`` surface
(reference optimise/__init__.py:1-4).
"""

from .caviar import caviar
from .cavi_sns import cavi_sns
from .cosamp import cosamp
from .mbcs import mbcs

__all__ = ["caviar", "cavi_sns", "cosamp", "mbcs"]

from .resumable import caviar_resumable  # noqa: E402

__all__.append("caviar_resumable")

from .batched import caviar_many, mbcs_many, sns_many  # noqa: E402

__all__ += ["caviar_many", "mbcs_many", "sns_many"]

from .online import OnlineCaviar  # noqa: E402

__all__.append("OnlineCaviar")
