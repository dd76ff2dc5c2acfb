r"""Biosynthetic Gene Cluster (BGC) toolkit: annotate, predict, train.

Capability parity with ``/root/reference/src/kaptive/bgc``: ORF calling
(pyfgs replaced by a vectorised six-frame ORF finder), protein randstrobe
annotation against the database, bag-of-strobemer featurisation, and an HMM
architectural predictor/trainer.  The numeric kernels run as JAX ops
(:mod:`kaptive_tpu.bgc.kernels`).
"""

from kaptive_tpu.bgc.annotate import AnnotationResult, Annotator, Genes
from kaptive_tpu.bgc.models import ArchitecturalModel
from kaptive_tpu.bgc.orf import find_orfs
from kaptive_tpu.bgc.predictor import ArchitecturalPredictor, BGCPredictions
from kaptive_tpu.bgc.trainer import ArchitecturalTrainer

__all__ = [
    "AnnotationResult",
    "Annotator",
    "ArchitecturalModel",
    "ArchitecturalPredictor",
    "ArchitecturalTrainer",
    "BGCPredictions",
    "Genes",
    "find_orfs",
]
