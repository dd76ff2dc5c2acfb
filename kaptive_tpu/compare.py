r"""Multi-locus comparison: all-vs-all forward protein alignment across loci.

Capability parity with ``/root/reference/src/kaptive/compare.py``:
``LocusComparisonEdges`` (:33-135), ``LocusComparisons`` (:138-169),
``LocusData`` (:172-192), ``LocusComparator`` (:195-396) — randstrobe
target/query indexes per locus, upper-triangle pair loop with
``top_hits`` -> ``align_seeds`` (on the device DP kernel), and piece-aware
backbone normalisation for plotting.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from dataclasses import dataclass
from typing import TYPE_CHECKING, Any, Self

import numpy as np
import numpy.typing as npt

from kaptive_tpu.core.interval import Intervals
from kaptive_tpu.core.kmers import RandstrobeIndex
from kaptive_tpu.core.pairwise import PairwiseAligner, PairwiseAlignments
from kaptive_tpu.core.seq import Sequences

if TYPE_CHECKING:
    from kaptive_tpu.serotyping import LocusPieces


@dataclass(slots=True, frozen=True)
class LocusComparisonEdges:
    r"""SoA container of forward cross-locus protein alignment edges."""

    query_locus_indices: npt.NDArray[np.int32]
    target_locus_indices: npt.NDArray[np.int32]
    query_indices: npt.NDArray[np.int32]
    target_indices: npt.NDArray[np.int32]
    global_query_indices: npt.NDArray[np.int32]
    global_target_indices: npt.NDArray[np.int32]
    alignments: PairwiseAlignments

    def __len__(self) -> int:
        return len(self.query_locus_indices)

    def __getitem__(self, item: int | slice | npt.NDArray[Any] | list[int]) -> "Any | LocusComparisonEdges":
        if isinstance(item, (int, np.integer)):
            raise NotImplementedError("Single item access not implemented for LocusComparisonEdges")
        return LocusComparisonEdges(
            query_locus_indices=self.query_locus_indices[item],
            target_locus_indices=self.target_locus_indices[item],
            query_indices=self.query_indices[item],
            target_indices=self.target_indices[item],
            global_query_indices=self.global_query_indices[item],
            global_target_indices=self.global_target_indices[item],
            alignments=self.alignments[item],  # type: ignore[arg-type]
        )

    @classmethod
    def empty(cls) -> "LocusComparisonEdges":
        return cls(
            query_locus_indices=np.empty(0, dtype=np.int32),
            target_locus_indices=np.empty(0, dtype=np.int32),
            query_indices=np.empty(0, dtype=np.int32),
            target_indices=np.empty(0, dtype=np.int32),
            global_query_indices=np.empty(0, dtype=np.int32),
            global_target_indices=np.empty(0, dtype=np.int32),
            alignments=PairwiseAlignments.empty(),
        )

    @classmethod
    def concat(cls, batches: Iterable[Self]) -> Self:
        batches = list(batches)
        if not batches:
            return cls.empty()  # type: ignore[return-value]
        return cls(
            query_locus_indices=np.concatenate([b.query_locus_indices for b in batches]),
            target_locus_indices=np.concatenate([b.target_locus_indices for b in batches]),
            query_indices=np.concatenate([b.query_indices for b in batches]),
            target_indices=np.concatenate([b.target_indices for b in batches]),
            global_query_indices=np.concatenate([b.global_query_indices for b in batches]),
            global_target_indices=np.concatenate([b.global_target_indices for b in batches]),
            alignments=PairwiseAlignments.concat([b.alignments for b in batches]),
        )


@dataclass(slots=True, frozen=True)
class LocusComparisons:
    r"""Complete multi-locus comparison result set (edges + normalised intervals)."""

    edges: LocusComparisonEdges
    locus_names: tuple[str, ...]
    locus_lengths: npt.NDArray[np.int32]
    locus_offsets: npt.NDArray[np.int32]
    gene_names: npt.NDArray[np.object_]
    gene_descriptions: npt.NDArray[np.object_]
    gene_states: npt.NDArray[np.int8]
    gene_intervals: Intervals


@dataclass(slots=True, frozen=True)
class LocusData:
    r"""Generalised single-locus input for comparison (from DB or typing result)."""

    proteins: Sequences
    name: str
    backbone: Intervals
    pieces: "LocusPieces | None" = None
    gene_ctg_indices: npt.NDArray[np.uint32] | None = None
    gene_states: npt.NDArray[np.int8] | None = None
    gene_descriptions: npt.NDArray[np.object_] | Sequence[str] | None = None


class LocusComparator:
    r"""All-vs-all forward protein comparison engine over randstrobe seeding."""

    def __init__(
        self,
        k: int = 10,
        s: int = 5,
        min_score: int = 1,
        aligner_kwargs: dict | None = None,
    ) -> None:
        self.k = k
        self.s = s
        self.min_score = min_score
        self.aligner = PairwiseAligner(**(aligner_kwargs or {}))

    def __call__(self, inputs: Sequence[LocusData]) -> LocusComparisons:
        loci = [inp.proteins for inp in inputs]
        locus_names = [inp.name for inp in inputs]
        backbones = [inp.backbone for inp in inputs]
        locus_pieces = [inp.pieces for inp in inputs]
        gene_ctg_indices = [inp.gene_ctg_indices for inp in inputs]
        n_loci = len(loci)

        global_seqs = Sequences.concat(loci) if n_loci > 0 else Sequences.empty()
        gene_names = np.array(global_seqs.ids, dtype=object)

        desc_list = []
        state_list = []
        for inp in inputs:
            n_genes = len(inp.proteins)
            if len(inp.backbone) != n_genes:
                raise ValueError(
                    f"Locus '{inp.name}': backbone length ({len(inp.backbone)}) "
                    f"does not match protein count ({n_genes})"
                )
            if inp.gene_descriptions is not None:
                raw_desc = np.asarray(inp.gene_descriptions)
                if raw_desc.dtype.kind in ("S", "a"):
                    d_arr = np.asarray(np.char.decode(raw_desc, "utf-8"), dtype=object)
                elif raw_desc.dtype == object or any(
                    isinstance(x, (bytes, np.bytes_)) for x in raw_desc.flat
                ):
                    decoded_list = [
                        x.decode("utf-8")
                        if isinstance(x, (bytes, np.bytes_))
                        else str(x)
                        if x is not None
                        else ""
                        for x in raw_desc.flat
                    ]
                    d_arr = np.asarray(decoded_list, dtype=object).reshape(raw_desc.shape)
                else:
                    d_arr = np.asarray(raw_desc, dtype=object)
                if len(d_arr) != n_genes:
                    raise ValueError(
                        f"Locus '{inp.name}': gene_descriptions length ({len(d_arr)}) "
                        f"does not match protein count ({n_genes})"
                    )
                desc_list.append(d_arr)
            else:
                desc_list.append(np.array([""] * n_genes, dtype=object))

            if inp.gene_states is not None:
                s_arr = np.asarray(inp.gene_states, dtype=np.int8)
                if len(s_arr) != n_genes:
                    raise ValueError(
                        f"Locus '{inp.name}': gene_states length ({len(s_arr)}) "
                        f"does not match protein count ({n_genes})"
                    )
                state_list.append(s_arr)
            else:
                from kaptive_tpu.serotyping.models import GeneState

                state_list.append(np.full(n_genes, GeneState.NORMAL.value, dtype=np.int8))

        if n_loci > 0:
            gene_descriptions = np.concatenate(desc_list, dtype=object)
            gene_states = np.concatenate(state_list, dtype=np.int8)
        else:
            gene_descriptions = np.empty(0, dtype=object)
            gene_states = np.empty(0, dtype=np.int8)

        # Piece-aware backbone normalisation into one 1-D plot space per locus.
        norm_backbones = []
        for i, bb in enumerate(backbones):
            if locus_pieces is not None and i < len(locus_pieces) and locus_pieces[i] is not None:
                lp = locus_pieces[i]
                p_idx = np.zeros(len(bb), dtype=np.int32)
                for p in range(len(lp)):
                    mask = (bb.starts >= lp.starts[p]) & (bb.ends <= lp.ends[p])
                    if gene_ctg_indices is not None and gene_ctg_indices[i] is not None:
                        mask &= gene_ctg_indices[i] == lp.ctg_indices[p]
                    p_idx[mask] = p
                p_order = np.arange(len(lp), dtype=np.int32)
                norm_backbones.append(bb.arrange(p_idx, p_order, lp.starts, lp.ends, lp.strands))
            else:
                norm_backbones.append(bb.shift(-np.min(bb.starts)) if len(bb) > 0 else bb)

        if norm_backbones:
            global_intervals = Intervals(
                starts=np.concatenate([b.starts for b in norm_backbones]),
                ends=np.concatenate([b.ends for b in norm_backbones]),
                strands=np.concatenate([b.strands for b in norm_backbones]),
                original_indices=np.concatenate([b.original_indices for b in norm_backbones]),
            )
        else:
            global_intervals = Intervals.empty()

        locus_lengths = np.array([len(seq_locus) for seq_locus in loci], dtype=np.int32)
        locus_offsets = np.zeros(n_loci, dtype=np.int32)
        if n_loci > 1:
            np.cumsum(locus_lengths[:-1], out=locus_offsets[1:])

        if n_loci <= 1:
            return LocusComparisons(
                edges=LocusComparisonEdges.empty(),
                locus_names=tuple(locus_names),
                locus_lengths=locus_lengths,
                locus_offsets=locus_offsets,
                gene_names=gene_names,
                gene_descriptions=gene_descriptions,
                gene_states=gene_states,
                gene_intervals=global_intervals,
            )

        target_indices = [
            RandstrobeIndex.build(seq_locus, k=self.k, s=self.s, sort_by_hash=True)
            for seq_locus in loci
        ]
        query_indices = [
            RandstrobeIndex.build(seq_locus, k=self.k, s=self.s, sort_by_hash=False)
            for seq_locus in loci
        ]

        edge_batches = []
        for i in range(n_loci):
            for j in range(i + 1, n_loci):
                seeds = target_indices[j].top_hits(query_indices[i], min_score=self.min_score)
                if len(seeds) == 0:
                    continue
                alignments = self.aligner.align_seeds(loci[i], loci[j], seeds)
                n_edges = len(seeds)
                edge_batches.append(
                    LocusComparisonEdges(
                        query_locus_indices=np.full(n_edges, i, dtype=np.int32),
                        target_locus_indices=np.full(n_edges, j, dtype=np.int32),
                        query_indices=seeds.query_indices.astype(np.int32),
                        target_indices=seeds.target_indices.astype(np.int32),
                        global_query_indices=seeds.query_indices.astype(np.int32) + locus_offsets[i],
                        global_target_indices=seeds.target_indices.astype(np.int32) + locus_offsets[j],
                        alignments=alignments,
                    )
                )

        edges = LocusComparisonEdges.concat(edge_batches) if edge_batches else LocusComparisonEdges.empty()
        return LocusComparisons(
            edges=edges,
            locus_names=tuple(locus_names),
            locus_lengths=locus_lengths,
            locus_offsets=locus_offsets,
            gene_names=gene_names,
            gene_descriptions=gene_descriptions,
            gene_states=gene_states,
            gene_intervals=global_intervals,
        )
