r"""The serotyping engine: map, score, reconstruct, classify, phenotype, call confidence.

Capability parity with ``/root/reference/src/kaptive/serotyping/core.py``: the
``Serotyper`` four-phase pipeline (:124-486) with identical decision logic —

- **Mapping & scoring** (:164-207): coverage filter >= ``min_gene_coverage``,
  best hit per gene by (q_cov, score) lexsort, locus score = sum of best
  expected-gene coverages, completeness-cubed weighting, argmax best locus.
- **Reconstruction** (:209-329): overlap culling with best-locus priority,
  spatial clustering with ``max_locus_length`` tolerance, piece bounding boxes
  from primary expected hits, strict ``is_inside`` recompute, missing genes.
- **Gene state & identity** (:351-396): frame-compensated translation with
  ``to_stop``, PARTIAL at contig edges, TRUNCATED < 90% protein coverage,
  device protein DP identities, spurious-outside drop, NOVEL below threshold.
- **Phenotype & confidence** (:398-459): active-cluster mask, vectorised rule
  evaluation, replacement/suffix by priority, typeability rules.

The device work is the mapper (:mod:`kaptive_tpu.ops.mapper` — replaces the
rammappy call at ref :147-155) and the protein identity DP
(:mod:`kaptive_tpu.ops.swg`); the decision glue operates on arrays of at most
a few hundred hits and stays host-side numpy with reference-exact ordering.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from kaptive_tpu import __version__
from kaptive_tpu.core.genome import GenomeAssembly
from kaptive_tpu.core.pairwise import PairwiseAligner
from kaptive_tpu.core.seq import Sequences
from kaptive_tpu.db import Database
from kaptive_tpu.ops.mapper import MapperParams, map_genes
from kaptive_tpu.serotyping.models import (
    GeneHits,
    GeneState,
    LocusPieces,
    SerotypingResult,
)


class Serotyper:
    r"""High-performance *in silico* serotyping engine for bacterial genome assemblies."""

    def __init__(
        self,
        db: Database,
        max_other_genes: int = 1,
        min_completeness: float = 0.5,
        allow_below_threshold: bool = False,
        mapper_params: MapperParams | None = None,
        scoring_metric: str = "scores",
        min_gene_coverage: float = 0.20,
        partial_edge_tolerance: int = 5,
    ) -> None:
        self._db = db
        self.max_other_genes = max_other_genes
        self.min_completeness = min_completeness
        self.allow_below_threshold = allow_below_threshold
        self.mapper_params = mapper_params or MapperParams()
        self.scoring_metric = scoring_metric
        self.min_gene_coverage = min_gene_coverage
        self.partial_edge_tolerance = partial_edge_tolerance
        self._protein_aligner = PairwiseAligner()

        # Expected-genes-per-locus weights (ref :102-108).
        self._expected_genes_per_locus = np.zeros(len(db.loci), dtype=np.float32)
        np.add.at(
            self._expected_genes_per_locus,
            db.gene_locus_indices[~db.extra_genes],
            1.0,
        )
        self._expected_genes_per_locus = np.maximum(self._expected_genes_per_locus, 1.0)

        # Gene name table for mapper output (stringified DB indices, ref :111-122).
        self._gene_names = tuple(str(i) for i in range(len(db.genes)))

    def __call__(self, genome: GenomeAssembly | str | Path) -> SerotypingResult | None:
        return self.batch([genome])[0]

    def batch(self, genomes: list[GenomeAssembly | str | Path]) -> list[SerotypingResult | None]:
        r"""Type a batch of assemblies with amortised device dispatches.

        The mapping phase (seeding scan + table match + banded extensions) runs
        as batched device sweeps across all assemblies, and the protein
        identity DP of every gene hit of every assembly runs as one bucketed
        sweep; only the tiny decision glue runs per assembly.
        """
        from kaptive_tpu.ops.mapper import map_genes_batch
        from kaptive_tpu.utils.profiling import phase_timer

        with phase_timer("type.ingest"):
            ensured = [GenomeAssembly.ensure(g) for g in genomes]
        with phase_timer("type.map"):
            alns_list = map_genes_batch(
                self._db.gene_index, ensured, self._gene_names, self.mapper_params
            )
        with phase_timer("type.analyze"):
            states = [self._analyze(g, alns) for g, alns in zip(ensured, alns_list)]

        # Batched protein identity DP across all assemblies (ref :378-379 per genome).
        with phase_timer("type.protein_dp"):
            counts = [len(st["prot_seqs"]) for st in states]
            all_q = Sequences.concat([st["prot_seqs"] for st in states])
            all_t = Sequences.concat(
                [self._db.translations[st["gene_hits"].gene_indices] for st in states]  # type: ignore[misc]
            )
            all_alns = self._protein_aligner(all_q, all_t)
        with phase_timer("type.finalize"):
            bounds = np.cumsum([0] + counts)
            results = []
            for i, st in enumerate(states):
                pidents = all_alns.pidents[bounds[i] : bounds[i + 1]].astype(np.float32)
                results.append(self._finalize(st, pidents))
        return results

    def _analyze(self, genome: GenomeAssembly, gene_alns) -> dict:
        r"""Phases up to (but excluding) the protein identity DP; pure host numpy."""
        # Total coverage per gene across all alignments, for reporting (ref :157-162).
        q_indices = gene_alns.q_name_ids.astype(np.int32)
        q_lengths = gene_alns.q_aln_lens
        total_q_covs = np.zeros(len(self._db.genes), dtype=np.float32)
        np.add.at(total_q_covs, q_indices, q_lengths)
        total_q_covs /= self._db.genes.lengths

        # Scoring phase (ref :164-207) --------------------------------------------------------------------------------
        q_covs = gene_alns.q_covs
        valid_cov_mask = q_covs >= self.min_gene_coverage

        valid_alns = gene_alns[valid_cov_mask]
        valid_q_covs = q_covs[valid_cov_mask]
        valid_gene_indices = valid_alns.q_name_ids.astype(np.int32)

        order = np.lexsort((-valid_alns.scores, -valid_q_covs, valid_gene_indices))
        valid_gene_indices = valid_gene_indices[order]
        valid_q_covs = valid_q_covs[order]

        _, unique_indices = np.unique(valid_gene_indices, return_index=True)
        best_gene_indices = valid_gene_indices[unique_indices]
        best_q_covs = valid_q_covs[unique_indices]

        valid_locus_indices = self._db.gene_locus_indices[best_gene_indices]
        valid_not_extra = ~self._db.extra_genes[best_gene_indices]

        locus_scores = np.zeros(len(self._db.loci), dtype=np.float64)
        np.add.at(
            locus_scores,
            valid_locus_indices[valid_not_extra],
            best_q_covs[valid_not_extra],
        )

        locus_counts = np.zeros(len(self._db.loci), dtype=np.float32)
        matched_expected_genes = best_gene_indices[valid_not_extra]
        np.add.at(locus_counts, self._db.gene_locus_indices[matched_expected_genes], 1.0)

        locus_completeness = locus_counts / self._expected_genes_per_locus
        final_locus_scores = locus_scores * (locus_completeness**3)

        self._last_scores = final_locus_scores.copy()
        self._last_completeness = locus_completeness.copy()

        best_locus_idx = int(np.argmax(final_locus_scores))
        best_locus_name = self._db.loci.ids[best_locus_idx]

        # Reconstruction phase (ref :209-329) -------------------------------------------------------------------------
        valid_alns = gene_alns

        valid_indices = valid_alns.q_name_ids.astype(np.int32)
        priority_mask = self._db.gene_locus_indices[valid_indices] == best_locus_idx

        culled_alns = valid_alns.cull_overlaps(
            by_query=False, priority_mask=priority_mask, max_overlap_fraction=0.1
        )

        culled_gene_indices = culled_alns.q_name_ids.astype(np.int32)
        t_indices = culled_alns.t_name_ids.astype(np.uint32)
        culled_intervals = culled_alns.to_intervals(by_query=False)
        piece_ids = culled_intervals.cluster_spatial(
            tolerance=self._db.max_locus_length, group_by=t_indices
        )

        is_expected = (
            self._db.gene_locus_indices[culled_gene_indices] == best_locus_idx
        ) & ~self._db.extra_genes[culled_gene_indices]
        valid_cluster_ids = np.unique(piece_ids[is_expected])
        is_extra = self._db.extra_genes[culled_gene_indices]

        coverages = np.clip(total_q_covs[culled_gene_indices] * 100.0, 0.0, 100.0)

        # Primary hit per expected gene for bounding boxes (ref :236-245).
        primary_expected = np.zeros(len(culled_alns), dtype=bool)
        is_expected_hits = np.where(is_expected)[0]
        if len(is_expected_hits) > 0:
            exp_gene_indices = culled_gene_indices[is_expected_hits]
            exp_scores = culled_alns.scores[is_expected_hits]
            order = np.lexsort((-exp_scores, exp_gene_indices))
            sorted_exp_gene_indices = exp_gene_indices[order]
            _, unique_indices = np.unique(sorted_exp_gene_indices, return_index=True)
            best_hits = is_expected_hits[order[unique_indices]]
            primary_expected[best_hits] = True

        l_ctg_indices, l_starts, l_ends, l_strands = [], [], [], []
        l_expected_means = []
        for c_id in valid_cluster_ids:
            piece_mask = piece_ids == c_id
            piece_primary = piece_mask & primary_expected
            if np.any(piece_primary):
                ctg_idx = t_indices[piece_mask][0]
                l_ctg_indices.append(ctg_idx)
                l_starts.append(np.min(culled_intervals.starts[piece_primary]))
                l_ends.append(np.max(culled_intervals.ends[piece_primary]))
                exp_genes = culled_gene_indices[piece_primary]
                l_expected_means.append(np.mean(self._db.gene_positions[exp_genes]))
                exp_strands = self._db.gene_intervals.strands[exp_genes]
                found_strands = culled_alns.strands[piece_primary]
                l_strands.append(-1 if np.sum(found_strands * exp_strands) < 0 else 1)

        # Strict is_inside recompute against piece bounding boxes (ref :272-279).
        is_inside = np.zeros(len(culled_alns), dtype=bool)
        for ctg_idx, start, end in zip(l_ctg_indices, l_starts, l_ends):
            on_ctg = t_indices == ctg_idx
            is_inside |= on_ctg & (culled_intervals.starts <= end) & (culled_intervals.ends >= start)

        piece_order = np.argsort(l_expected_means)
        locus_pieces = LocusPieces(
            ctg_indices=np.array(l_ctg_indices, dtype=np.uint32)[piece_order],
            starts=np.array(l_starts, dtype=np.int32)[piece_order],
            ends=np.array(l_ends, dtype=np.int32)[piece_order],
            strands=np.array(l_strands, dtype=np.int8)[piece_order],
        )

        expected_genes_mask = (
            self._db.gene_locus_indices == best_locus_idx
        ) & ~self._db.extra_genes
        expected_gene_indices = np.where(expected_genes_mask)[0]
        found_expected_gene_indices = culled_gene_indices[is_expected & is_inside]
        missing_indices = np.setdiff1d(
            expected_gene_indices, found_expected_gene_indices, assume_unique=False
        )
        missing_expected_genes = tuple(self._db.genes.ids[i] for i in missing_indices)

        actual_locus_completeness = (
            1.0 - (len(missing_indices) / len(expected_gene_indices))
            if len(expected_gene_indices) > 0
            else 1.0
        )

        gene_hits = GeneHits(
            gene_indices=culled_gene_indices,
            q_starts=culled_alns.q_starts,
            q_ends=culled_alns.q_ends,
            t_indices=t_indices,
            t_starts=culled_alns.t_starts,
            t_ends=culled_alns.t_ends,
            strands=culled_alns.strands,
            is_expected=is_expected,
            is_inside=is_inside,
            is_extra=is_extra,
            expected_positions=self._db.gene_positions[culled_gene_indices].astype(np.int32),
            expected_strands=self._db.gene_intervals.strands[culled_gene_indices],
            gene_ids=np.array(
                [self._db.genes.ids[i].encode("utf-8") for i in culled_gene_indices], dtype="S32"
            ),
            cluster_names=np.array(
                [
                    self._db.cluster_keys[self._db.gene_cluster_ids[i]].encode("utf-8")
                    for i in culled_gene_indices
                ],
                dtype="S10",
            ),
            product_descriptions=np.array(
                [
                    self._db.description_keys[self._db.gene_description_ids[i]].encode("utf-8")
                    for i in culled_gene_indices
                ],
                dtype="S64",
            ),
            coverages=coverages,
        )

        # Locus extraction phase (ref :331-349) -----------------------------------------------------------------------
        if len(locus_pieces) > 0:
            locus_seqs = genome.contigs.extract(
                locus_pieces.ctg_indices.astype(np.int32),
                locus_pieces.starts,
                locus_pieces.ends,
                locus_pieces.strands,
            )
        else:
            locus_seqs = Sequences.empty()

        assem_len = np.sum(locus_pieces.ends - locus_pieces.starts)
        ref_len = self._db.loci.lengths[best_locus_idx]
        pcov = float(min(100.0, (assem_len / ref_len) * 100.0)) if ref_len > 0 else 0.0
        if len(locus_pieces) == 1:
            length_discrepancy = float(assem_len - ref_len)
        else:
            length_discrepancy = float("nan")

        # Gene state phase (ref :351-396) -----------------------------------------------------------------------------
        gene_seqs = genome.contigs.extract_intervals(
            gene_hits.t_indices,
            gene_hits.t_intervals,
            new_ids=tuple(self._db.genes.ids[i] for i in gene_hits.gene_indices),
        )
        # Translate with frame compensation; stop at first stop codon so
        # frameshifts don't drag down the upstream identity (ref :357-360).
        prot_seqs = gene_seqs.translate(frames=gene_hits.frames, to_stop=True)

        gene_states = np.full(len(gene_hits), GeneState.NORMAL.value, dtype=np.int8)
        is_partial = culled_alns.is_partial(self.partial_edge_tolerance)
        db_gene_lengths = self._db.genes.lengths[gene_hits.gene_indices]

        prot_covs = (prot_seqs.lengths * 3.0) / db_gene_lengths
        gene_hits.coverages[:] = np.clip(prot_covs * 100.0, 0.0, 100.0)

        is_truncated = (~is_partial) & (prot_covs < 0.90)
        gene_states[is_partial] = GeneState.PARTIAL.value
        gene_states[is_truncated] = GeneState.TRUNCATED.value

        return dict(
            genome=genome,
            gene_hits=gene_hits,
            gene_seqs=gene_seqs,
            prot_seqs=prot_seqs,
            gene_states=gene_states,
            best_locus_idx=best_locus_idx,
            best_locus_name=best_locus_name,
            locus_scores=locus_scores,
            actual_locus_completeness=actual_locus_completeness,
            length_discrepancy=length_discrepancy,
            locus_pieces=locus_pieces,
            locus_seqs=locus_seqs,
            pcov=pcov,
            missing_expected_genes=missing_expected_genes,
        )

    def _finalize(self, state: dict, prot_idents: np.ndarray) -> SerotypingResult:
        r"""Phases after the protein identity DP: spurious drop, NOVEL calls,
        phenotype rules, confidence, and result assembly."""
        genome = state["genome"]
        gene_hits = state["gene_hits"]
        gene_seqs = state["gene_seqs"]
        prot_seqs = state["prot_seqs"]
        gene_states = state["gene_states"]
        best_locus_idx = state["best_locus_idx"]
        actual_locus_completeness = state["actual_locus_completeness"]
        locus_pieces = state["locus_pieces"]

        # Drop spurious outside-locus homologies below threshold (ref :381-391).
        is_spurious = (~gene_hits.is_inside) & (prot_idents < self._db.metadata.id_threshold)
        if np.any(is_spurious):
            keep_mask = ~is_spurious
            gene_hits = gene_hits[keep_mask]
            gene_seqs = gene_seqs[keep_mask]  # type: ignore[assignment]
            prot_seqs = prot_seqs[keep_mask]  # type: ignore[assignment]
            gene_states = gene_states[keep_mask]
            prot_idents = prot_idents[keep_mask]

        below_threshold = (gene_states == GeneState.NORMAL.value) & (
            prot_idents < self._db.metadata.id_threshold
        )
        gene_states[below_threshold] = GeneState.NOVEL.value
        valid_pidents = prot_idents[gene_states == GeneState.NORMAL.value]
        pident = float(np.mean(valid_pidents)) if valid_pidents.size > 0 else 0.0

        # Phenotype evaluation phase (ref :398-442) -------------------------------------------------------------------
        base_phenotype = self._db.serotypes[best_locus_idx]
        phenotypes = self._db.phenotypes

        if len(phenotypes) > 0:
            q_active = np.zeros(len(self._db.cluster_keys), dtype=bool)
            is_active = (gene_states == GeneState.NORMAL.value) | (
                gene_states == GeneState.PARTIAL.value
            )
            if np.any(is_active):
                active_clusters = self._db.gene_cluster_ids[gene_hits.gene_indices[is_active]]
                q_active[active_clusters] = True

            locus_match = phenotypes.locus_masks[:, best_locus_idx]
            q_active_int = q_active.astype(np.int8)
            extra_match = np.dot(phenotypes.extra_masks, q_active_int) == phenotypes.extra_counts

            has_inactive_rule = phenotypes.inactive_masks.sum(axis=1) > 0

            expected_mask = np.zeros(len(self._db.cluster_keys), dtype=np.int8)
            offset = self._db.locus_gene_offsets[best_locus_idx]
            length = self._db.locus_gene_lengths[best_locus_idx]
            expected_clusters = self._db.gene_cluster_ids[offset : offset + length]
            expected_mask[expected_clusters] = 1

            applicable_inactive_masks = phenotypes.inactive_masks & expected_mask
            has_applicable_inactive = applicable_inactive_masks.sum(axis=1) > 0

            q_inactive_int = (~q_active).astype(np.int8)
            inactive_hits = np.dot(applicable_inactive_masks, q_inactive_int)

            inactive_match = (~has_inactive_rule) | (has_applicable_inactive & (inactive_hits > 0))

            if np.any(valid_mask := locus_match & extra_match & inactive_match):
                valid_rule_indices = np.where(valid_mask)[0]
                is_suffix = phenotypes.as_suffix[valid_rule_indices]

                if len(replacements := valid_rule_indices[~is_suffix]) > 0:
                    best_rep_idx = replacements[np.argmax(phenotypes.priorities[replacements])]
                    base_phenotype = phenotypes.ids[best_rep_idx].decode("utf-8")

                if len(suffixes := valid_rule_indices[is_suffix]) > 0:
                    sorted_suffixes = suffixes[np.argsort(-phenotypes.priorities[suffixes])]
                    suffix_strs = [phenotypes.ids[i].decode("utf-8") for i in sorted_suffixes]
                    base_phenotype = f"{base_phenotype}{''.join(suffix_strs)}"

        # Confidence evaluation phase (ref :444-459) ------------------------------------------------------------------
        typeable = True
        if actual_locus_completeness < self.min_completeness:
            typeable = False

        is_unexpected = gene_hits.is_inside & ~gene_hits.is_expected & ~gene_hits.is_extra
        is_not_truncated = gene_states != GeneState.TRUNCATED.value
        unexpected_count = np.count_nonzero(is_unexpected & is_not_truncated)
        if unexpected_count > self.max_other_genes:
            typeable = False

        if not self.allow_below_threshold:
            if np.any(gene_hits.is_inside & (gene_states == GeneState.NOVEL.value)):
                typeable = False

        return SerotypingResult(
            kaptive_version=__version__,
            database_name=self._db.metadata.name,
            database_version=self._db.metadata.version,
            database_organism=self._db.metadata.organism,
            database_taxon=self._db.metadata.taxon,
            genome=genome.id,
            best_locus_idx=best_locus_idx,
            best_locus_name=state["best_locus_name"],
            best_locus_score=state["locus_scores"][best_locus_idx],
            best_locus_completeness=actual_locus_completeness,
            length_discrepancy=state["length_discrepancy"],
            gene_hits=gene_hits,
            gene_states=gene_states,
            locus_pieces=locus_pieces,
            locus_seqs=state["locus_seqs"],
            gene_seqs=gene_seqs,  # type: ignore[arg-type]
            translations=prot_seqs,  # type: ignore[arg-type]
            percent_identity=pident,
            percent_coverage=state["pcov"],
            protein_identities=prot_idents,
            phenotype=base_phenotype,
            typeable=typeable,
            missing_expected_genes=state["missing_expected_genes"],
        )
