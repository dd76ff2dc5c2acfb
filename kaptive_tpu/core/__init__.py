r"""Core data plane: sequence containers, intervals, alignments, k-mer sketches, pairwise DP.

Host-side orchestration uses vectorised numpy over Structure-of-Arrays containers
(mirroring the semantics of ``/root/reference/src/kaptive/core``); device compute
lives in :mod:`kaptive_tpu.ops`.
"""

from kaptive_tpu.core.interval import Interval, Intervals, Strand
from kaptive_tpu.core.seq import BacterialTranslationTable, SeqRecord, Sequences

__all__ = [
    "BacterialTranslationTable",
    "Interval",
    "Intervals",
    "SeqRecord",
    "Sequences",
    "Strand",
]
