r"""Serotyping engine, result models, and report writers.

Capability parity with ``/root/reference/src/kaptive/serotyping``.
"""

from kaptive_tpu.serotyping.core import Serotyper
from kaptive_tpu.serotyping.io import KaptiveRow, Pha4geRow
from kaptive_tpu.serotyping.models import (
    GeneHits,
    GeneState,
    LocusPieces,
    SerotypingProblem,
    SerotypingResult,
)

__all__ = [
    "GeneHits",
    "GeneState",
    "KaptiveRow",
    "LocusPieces",
    "Pha4geRow",
    "Serotyper",
    "SerotypingProblem",
    "SerotypingResult",
]
