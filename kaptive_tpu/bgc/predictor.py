r"""BGC locus predictor: per-contig Viterbi decoding of architectural states.

Capability parity with ``/root/reference/src/kaptive/bgc/predictor.py``:
``BGCPredictions`` (:32-128) and ``ArchitecturalPredictor`` (:131-241) —
featurise -> smooth -> emissions -> contig-edge mask -> Viterbi, with BGC-state
extraction (states 1..num_states-2) per contig.
"""

from __future__ import annotations

from collections.abc import Iterable
from dataclasses import dataclass
from typing import Any, Self

import numpy as np
import numpy.typing as npt

import jax.numpy as jnp

from kaptive_tpu.bgc.annotate import AnnotationResult
from kaptive_tpu.bgc.kernels import (
    archetype_emissions,
    architectural_viterbi_host,
    compute_record_offsets,
    contextualize_features,
    vectorize_orfs,
)
from kaptive_tpu.bgc.models import ArchitecturalModel
from kaptive_tpu.core.kmers import RandstrobeIndex
from kaptive_tpu.core.seq import Sequences


@dataclass(slots=True, frozen=True)
class BGCPredictions:
    r"""Predicted BGC loci: contig, score, member ORF indices, state paths, proteins."""

    contig_names: npt.NDArray[np.object_]
    scores: npt.NDArray[np.float32]
    orf_indices: list[npt.NDArray[np.uint32]]
    paths: list[npt.NDArray[np.int32]]
    proteins_list: list[Sequences]

    def __len__(self) -> int:
        return len(self.scores)

    def __getitem__(self, item: int | slice | npt.NDArray[Any] | list[int]) -> Any:
        if isinstance(item, int):
            return (
                self.contig_names[item],
                self.scores[item],
                self.orf_indices[item],
                self.paths[item],
                self.proteins_list[item],
            )
        return BGCPredictions(
            contig_names=self.contig_names[item],
            scores=self.scores[item],
            orf_indices=[self.orf_indices[i] for i in np.arange(len(self))[item]],
            paths=[self.paths[i] for i in np.arange(len(self))[item]],
            proteins_list=[self.proteins_list[i] for i in np.arange(len(self))[item]],
        )

    @classmethod
    def empty(cls) -> "BGCPredictions":
        return cls(
            contig_names=np.empty(0, dtype=object),
            scores=np.empty(0, dtype=np.float32),
            orf_indices=[],
            paths=[],
            proteins_list=[],
        )

    @classmethod
    def concat(cls, batches: Iterable[Self]) -> Self:
        batches = list(batches)
        if not batches:
            return cls.empty()  # type: ignore[return-value]
        return cls(
            contig_names=np.concatenate([b.contig_names for b in batches]),
            scores=np.concatenate([b.scores for b in batches]),
            orf_indices=[idx for b in batches for idx in b.orf_indices],
            paths=[p for b in batches for p in b.paths],
            proteins_list=[p for b in batches for p in b.proteins_list],
        )


class ArchitecturalPredictor:
    r"""Viterbi inference engine over ORF randstrobe features."""

    def __init__(
        self,
        model: ArchitecturalModel,
        window_size: int = 1,
        novelty_score: float = -1.0,
    ) -> None:
        self.model = model
        self.window_size = window_size
        self.novelty_score = novelty_score
        self.dim = self.model.centroids.shape[1]
        self.num_states = self.model.transitions.shape[0]

    def predict_contig(self, proteins: Sequences) -> tuple[npt.NDArray[np.int32], float]:
        num_orfs = len(proteins)
        if num_orfs == 0:
            return np.zeros(0, dtype=np.int32), float("-inf")

        idx = RandstrobeIndex.build(proteins, sort_by_hash=False)
        if len(idx) == 0:
            return np.zeros(num_orfs, dtype=np.int32), float("-inf")

        feats = vectorize_orfs(idx.records["hash"], idx.records["seq_idx"], num_orfs, self.dim)
        smooth = np.asarray(contextualize_features(jnp.asarray(feats), self.window_size))
        emissions = np.array(
            archetype_emissions(
                jnp.asarray(smooth),
                jnp.asarray(self.model.centroids),
                jnp.asarray(self.model.bg_centroid),
                self.novelty_score,
            )
        )  # np.array (not asarray): the device buffer view is read-only
        # Contig-edge genes may be truncated: neutralise their emissions (ref :194-197).
        emissions[0, :] = 0.0
        emissions[-1, :] = 0.0

        return architectural_viterbi_host(emissions, self.model.transitions)

    def predict(self, annotation: AnnotationResult) -> BGCPredictions:
        contig_names, scores, orf_indices, paths, proteins_list = [], [], [], [], []
        for c_idx, c_name in enumerate(annotation.contig_names):
            mask = annotation.genes.contig_indices == c_idx
            if not np.any(mask):
                continue
            contig_genes = annotation.genes[mask]
            path, score = self.predict_contig(contig_genes.translations)
            if score > -np.inf:
                bgc_mask = (path > 0) & (path < self.num_states - 1)
                bgc_inds = np.where(bgc_mask)[0]
                if len(bgc_inds) > 0:
                    contig_names.append(c_name)
                    scores.append(score)
                    orf_indices.append(bgc_inds.astype(np.uint32))
                    paths.append(path[bgc_inds])
                    proteins_list.append(contig_genes.translations[bgc_inds])

        return BGCPredictions(
            contig_names=np.array(contig_names, dtype=object),
            scores=np.array(scores, dtype=np.float32),
            orf_indices=orf_indices,
            paths=paths,
            proteins_list=proteins_list,
        )
