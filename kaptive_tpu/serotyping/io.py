r"""TSV report rows: classic Kaptive format and the PHA4GE standard.

Capability parity with ``/root/reference/src/kaptive/serotyping/io.py``:
``ReportRow`` ABC (:19-97 incl. TSV re-parse :72-97), ``KaptiveRow`` 22 columns
(:100-296 with the legacy header transform :165-189 and the per-gene details
formatter :215-245 — byte-level ``%.2f%%`` formatting preserved), and
``Pha4geRow`` (:299-382).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Iterable, Iterator
from dataclasses import dataclass, fields
from typing import Self

import numpy as np

from kaptive_tpu.serotyping.models import GeneState, SerotypingProblem, SerotypingResult


@dataclass(slots=True, frozen=True)
class ReportRow(ABC):
    r"""Abstract tabular report row with binary TSV serialisation."""

    @classmethod
    def header(cls) -> bytes:
        return ("\t".join(f.name for f in fields(cls)) + "\n").encode("utf-8")

    def __bytes__(self) -> bytes:
        return b"\t".join(getattr(self, f.name) for f in fields(self)) + b"\n"

    @classmethod
    @abstractmethod
    def from_result(cls, result: SerotypingResult) -> Self: ...

    @classmethod
    def _parse_header_line(cls, header_line: bytes) -> list[str]:
        return header_line.rstrip(b"\r\n").decode("utf-8").split("\t")

    @classmethod
    def read_tsv(cls, lines: Iterable[bytes]) -> Iterator[Self]:
        line_iter = iter(lines)
        try:
            header_line = next(line_iter)
        except StopIteration:
            return
        field_names = cls._parse_header_line(header_line)
        expected_fields = {f.name for f in fields(cls)}
        for line in line_iter:
            line = line.rstrip(b"\r\n")
            if not line:
                continue
            values = line.split(b"\t")
            kwargs = {name: val for name, val in zip(field_names, values) if name in expected_fields}
            yield cls(**kwargs)


@dataclass(slots=True, frozen=True)
class KaptiveRow(ReportRow):
    r"""Classic Kaptive TSV row (22 columns, legacy-compatible header)."""

    Kaptive_version: bytes
    Database_name: bytes
    Database_version: bytes
    Assembly: bytes
    Best_match_locus: bytes
    Best_match_type: bytes
    Match_confidence: bytes
    Problems: bytes
    Identity: bytes
    Coverage: bytes
    Length_discrepancy: bytes
    Expected_genes_in_locus: bytes
    Expected_genes_in_locus_details: bytes
    Missing_expected_genes: bytes
    Other_genes_in_locus: bytes
    Other_genes_in_locus_details: bytes
    Expected_genes_outside_locus: bytes
    Expected_genes_outside_locus_details: bytes
    Other_genes_outside_locus: bytes
    Other_genes_outside_locus_details: bytes
    Truncated_genes_details: bytes
    Extra_genes_details: bytes

    @classmethod
    def header(cls) -> bytes:
        headers = [
            f.name.encode("utf-8").replace(b"_details", b", details").replace(b"_", b" ")
            for f in fields(cls)
        ]
        return b"\t".join(headers) + b"\n"

    @classmethod
    def _parse_header_line(cls, header_line: bytes) -> list[str]:
        headers = header_line.rstrip(b"\r\n").split(b"\t")
        return [h.replace(b", details", b"_details").replace(b" ", b"_").decode("utf-8") for h in headers]

    @classmethod
    def from_result(cls, result: SerotypingResult) -> "KaptiveRow":
        hits = result.gene_hits
        states = result.gene_states

        in_loc = hits.is_inside
        out_loc = ~hits.is_inside
        exp = hits.is_expected
        extra = hits.is_extra
        unexp = ~exp & ~extra

        def _format_genes(mask: np.ndarray) -> bytes:
            indices = np.where(mask)[0]
            if indices.size == 0:
                return b""
            details = []
            for i in indices:
                gene_name = result.gene_seqs.ids[i].encode("utf-8")
                parts = [
                    gene_name,
                    b"%.2f%%" % result.protein_identities[i],
                    b"%.2f%%" % result.gene_hits.coverages[i],
                ]
                if states[i] == GeneState.PARTIAL.value:
                    parts.append(b"partial")
                elif states[i] == GeneState.TRUNCATED.value:
                    parts.append(b"truncated")
                elif states[i] == GeneState.NOVEL.value:
                    parts.append(b"below_id_threshold")
                details.append(b",".join(parts))
            return b";".join(details)

        mask_exp_in = in_loc & exp
        n_exp_in = len(np.unique(result.gene_hits.gene_indices[mask_exp_in]))
        mask_exp_out = out_loc & exp
        n_exp_out = len(np.unique(result.gene_hits.gene_indices[mask_exp_out]))
        expected_total = n_exp_in + n_exp_out + len(result.missing_expected_genes)

        in_comp = (n_exp_in / expected_total * 100.0) if expected_total > 0 else 0.0
        exp_in_str = (
            b"%d / %d (%.2f%%)" % (n_exp_in, expected_total, in_comp)
            if expected_total
            else b"0 / 0 (0.00%)"
        )
        out_comp = (n_exp_out / expected_total * 100.0) if expected_total > 0 else 0.0
        exp_out_str = (
            b"%d / %d (%.2f%%)" % (n_exp_out, expected_total, out_comp)
            if expected_total
            else b"0 / 0 (0.00%)"
        )

        n_unexp_in = len(np.unique(result.gene_hits.gene_indices[in_loc & unexp]))
        n_unexp_out = len(np.unique(result.gene_hits.gene_indices[out_loc & unexp]))

        return cls(
            Kaptive_version=result.kaptive_version.encode(),
            Database_name=result.database_name.encode(),
            Database_version=result.database_version.encode(),
            Assembly=result.genome.encode(),
            Best_match_locus=result.best_locus_name.encode(),
            Best_match_type=result.phenotype.encode(),
            Match_confidence=b"Typeable" if result.typeable else b"Untypeable",
            Problems=result.problems.to_symbols(),
            Identity=b"%.2f%%" % result.percent_identity,
            Coverage=b"%.2f%%" % result.percent_coverage,
            Length_discrepancy=b"n/a"
            if (result.length_discrepancy is None or np.isnan(result.length_discrepancy))
            else b"%d" % int(result.length_discrepancy),
            Expected_genes_in_locus=exp_in_str,
            Expected_genes_in_locus_details=_format_genes(mask_exp_in),
            Missing_expected_genes=b";".join(g.encode("utf-8") for g in result.missing_expected_genes),
            Other_genes_in_locus=b"%d" % n_unexp_in,
            Other_genes_in_locus_details=_format_genes(in_loc & unexp),
            Expected_genes_outside_locus=exp_out_str,
            Expected_genes_outside_locus_details=_format_genes(mask_exp_out),
            Other_genes_outside_locus=b"%d" % n_unexp_out,
            Other_genes_outside_locus_details=_format_genes(out_loc & unexp),
            Truncated_genes_details=_format_genes(
                (states == GeneState.TRUNCATED.value) | (states == GeneState.PARTIAL.value)
            ),
            Extra_genes_details=_format_genes(extra),
        )


@dataclass(slots=True, frozen=True, kw_only=True)
class Pha4geRow(ReportRow):
    r"""PHA4GE genotyping-specification TSV row."""

    sample: bytes
    genotyping_method: bytes = b"In silico serotyping"
    genotyping_schema_taxon: bytes
    genotyping_database_name: bytes
    genotyping_database_version: bytes
    genotyping_schema_name: bytes = b"Kaptive"
    genotyping_software_name: bytes = b"Kaptive"
    genotyping_software_version: bytes
    genotype: bytes
    genotype_predicted_phenotype: bytes
    genotype_confidence_value: bytes
    genotyping_details: bytes
    genotyping_method_url: bytes = b"https://github.com/klebgenomics/Kaptive"

    @classmethod
    def from_result(cls, result: SerotypingResult) -> "Pha4geRow":
        if result.problems:
            detail_parts = []
            if SerotypingProblem.TRUNCATED_GENES in result.problems:
                detail_parts.append(b"truncated gene/s in locus")
            if SerotypingProblem.NOVEL_GENES in result.problems:
                detail_parts.append(b"low identity gene/s")
            if SerotypingProblem.FRAGMENTED in result.problems:
                detail_parts.append(b"match broken into %d pieces" % len(result.locus_pieces))
            if SerotypingProblem.MISSING_GENES in result.problems:
                detail_parts.append(b"missing expected gene/s")
            if SerotypingProblem.UNEXPECTED_GENES in result.problems:
                detail_parts.append(b"unexpected gene/s in locus")
            details = b"Best locus match: %b. Problems: %b" % (
                result.best_locus_name.encode(),
                b", ".join(detail_parts),
            )
        else:
            details = b"Best locus match: %b." % result.best_locus_name.encode()

        return cls(
            sample=result.genome.encode(),
            genotyping_schema_taxon=b"%s [NCBITaxon:%d]"
            % (result.database_organism.encode(), result.database_taxon),
            genotyping_database_name=result.database_name.encode(),
            genotyping_database_version=result.database_version.encode(),
            genotyping_software_version=result.kaptive_version.encode(),
            genotype=result.best_locus_name.encode(),
            genotype_confidence_value=b"Typeable" if result.typeable else b"Untypeable",
            genotype_predicted_phenotype=result.phenotype.encode(),
            genotyping_details=details,
        )
