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

# Gene-state annotations appended to per-gene detail entries; NORMAL is untagged.
_STATE_TAGS = {
    GeneState.PARTIAL.value: b",partial",
    GeneState.TRUNCATED.value: b",truncated",
    GeneState.NOVEL.value: b",below_id_threshold",
}


def _detail_cell(result: SerotypingResult, mask: np.ndarray) -> bytes:
    r"""``gene,id%,cov%[,state]`` entries for the selected hits, ``;``-joined."""
    entries = []
    for i in np.flatnonzero(mask):
        entry = b"%s,%.2f%%,%.2f%%" % (
            result.gene_seqs.ids[i].encode("utf-8"),
            result.protein_identities[i],
            result.gene_hits.coverages[i],
        )
        entries.append(entry + _STATE_TAGS.get(int(result.gene_states[i]), b""))
    return b";".join(entries)


def _tally_cell(found: int, roster: int) -> bytes:
    r"""``found / roster (pct%)`` against the expected-gene roster size."""
    if roster <= 0:
        return b"0 / 0 (0.00%)"
    return b"%d / %d (%.2f%%)" % (found, roster, found / roster * 100.0)


def _discrepancy_cell(value: float | None) -> bytes:
    return b"n/a" if value is None or np.isnan(value) else b"%d" % int(value)


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
        category = {  # hit partition: (inside?, expected/other/extra)
            ("in", "exp"): hits.is_inside & hits.is_expected,
            ("out", "exp"): ~hits.is_inside & hits.is_expected,
            ("in", "other"): hits.is_inside & ~hits.is_expected & ~hits.is_extra,
            ("out", "other"): ~hits.is_inside & ~hits.is_expected & ~hits.is_extra,
        }
        distinct = {
            key: len(np.unique(hits.gene_indices[mask])) for key, mask in category.items()
        }
        roster_size = distinct["in", "exp"] + distinct["out", "exp"] + len(
            result.missing_expected_genes
        )
        broken = np.isin(
            result.gene_states, (GeneState.TRUNCATED.value, GeneState.PARTIAL.value)
        )

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
            Length_discrepancy=_discrepancy_cell(result.length_discrepancy),
            Expected_genes_in_locus=_tally_cell(distinct["in", "exp"], roster_size),
            Expected_genes_in_locus_details=_detail_cell(result, category["in", "exp"]),
            Missing_expected_genes=b";".join(
                name.encode("utf-8") for name in result.missing_expected_genes
            ),
            Other_genes_in_locus=b"%d" % distinct["in", "other"],
            Other_genes_in_locus_details=_detail_cell(result, category["in", "other"]),
            Expected_genes_outside_locus=_tally_cell(distinct["out", "exp"], roster_size),
            Expected_genes_outside_locus_details=_detail_cell(result, category["out", "exp"]),
            Other_genes_outside_locus=b"%d" % distinct["out", "other"],
            Other_genes_outside_locus_details=_detail_cell(result, category["out", "other"]),
            Truncated_genes_details=_detail_cell(result, broken),
            Extra_genes_details=_detail_cell(result, hits.is_extra),
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
