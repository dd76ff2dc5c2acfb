r"""TSV report rows: classic Kaptive format and the PHA4GE standard.

Capability parity with ``/root/reference/src/kaptive/serotyping/io.py``:
``ReportRow`` (:19-97), 22-column ``KaptiveRow`` (:100-296) and ``Pha4geRow``
(:299-382).  Column names, the legacy header transform, and every ``%.2f%%``
cell format are byte-level output contracts; around those constants the row
machinery here is label-table driven (state tags, problem notes, and the
string-field mapping are data, not unrolled statements).
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

# PHA4GE free-text notes per problem flag, in report order (ref io.py:340-360).
_PROBLEM_NOTES: tuple[tuple[SerotypingProblem, object], ...] = (
    (SerotypingProblem.TRUNCATED_GENES, lambda r: b"truncated gene/s in locus"),
    (SerotypingProblem.NOVEL_GENES, lambda r: b"low identity gene/s"),
    (SerotypingProblem.FRAGMENTED, lambda r: b"match broken into %d pieces" % len(r.locus_pieces)),
    (SerotypingProblem.MISSING_GENES, lambda r: b"missing expected gene/s"),
    (SerotypingProblem.UNEXPECTED_GENES, lambda r: b"unexpected gene/s in locus"),
)


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


def _confidence_cell(result: SerotypingResult) -> bytes:
    return b"Typeable" if result.typeable else b"Untypeable"


@dataclass(slots=True, frozen=True)
class ReportRow(ABC):
    r"""Tabular report row: column order = field order, cells are raw bytes."""

    @classmethod
    def _labels(cls) -> list[str]:
        return [f.name for f in fields(cls)]

    @classmethod
    def header(cls) -> bytes:
        return "\t".join(cls._labels()).encode("utf-8") + b"\n"

    def __bytes__(self) -> bytes:
        return b"\t".join(getattr(self, name) for name in self._labels()) + b"\n"

    @classmethod
    @abstractmethod
    def from_result(cls, result: SerotypingResult) -> Self: ...

    @classmethod
    def _parse_header_line(cls, header_line: bytes) -> list[str]:
        return header_line.rstrip(b"\r\n").decode("utf-8").split("\t")

    @classmethod
    def read_tsv(cls, lines: Iterable[bytes]) -> Iterator[Self]:
        r"""Re-parse rows previously serialised by this class (column-order
        tolerant; unknown columns are ignored)."""
        stream = iter(lines)
        first = next(stream, None)
        if first is None:
            return
        order = cls._parse_header_line(first)
        known = set(cls._labels())
        for raw in stream:
            raw = raw.rstrip(b"\r\n")
            if raw:
                cells = dict(zip(order, raw.split(b"\t")))
                yield cls(**{k: v for k, v in cells.items() if k in known})


def _legacy_label(name: str) -> bytes:
    r"""Field name -> classic Kaptive header label (``_details`` -> ``, details``)."""
    return name.replace("_details", ", details").replace("_", " ").encode("utf-8")


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
        return b"\t".join(map(_legacy_label, cls._labels())) + b"\n"

    @classmethod
    def _parse_header_line(cls, header_line: bytes) -> list[str]:
        labels = header_line.rstrip(b"\r\n").split(b"\t")
        return [
            lab.replace(b", details", b"_details").replace(b" ", b"_").decode("utf-8")
            for lab in labels
        ]

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
        # UTF-8 passthrough columns, then the computed/format cells.
        cells = {
            column: getattr(result, attr).encode("utf-8")
            for column, attr in (
                ("Kaptive_version", "kaptive_version"),
                ("Database_name", "database_name"),
                ("Database_version", "database_version"),
                ("Assembly", "genome"),
                ("Best_match_locus", "best_locus_name"),
                ("Best_match_type", "phenotype"),
            )
        }
        cells.update(
            Match_confidence=_confidence_cell(result),
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
        return cls(**cells)


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

    @staticmethod
    def _details_cell(result: SerotypingResult) -> bytes:
        best = b"Best locus match: %b." % result.best_locus_name.encode("utf-8")
        if not result.problems:
            return best
        notes = b", ".join(
            note(result) for flag, note in _PROBLEM_NOTES if flag in result.problems
        )
        return best[:-1] + b". Problems: " + notes

    @classmethod
    def from_result(cls, result: SerotypingResult) -> "Pha4geRow":
        taxon_cell = b"%s [NCBITaxon:%d]" % (
            result.database_organism.encode("utf-8"),
            result.database_taxon,
        )
        return cls(
            sample=result.genome.encode("utf-8"),
            genotyping_schema_taxon=taxon_cell,
            genotyping_database_name=result.database_name.encode("utf-8"),
            genotyping_database_version=result.database_version.encode("utf-8"),
            genotyping_software_version=result.kaptive_version.encode("utf-8"),
            genotype=result.best_locus_name.encode("utf-8"),
            genotype_confidence_value=_confidence_cell(result),
            genotype_predicted_phenotype=result.phenotype.encode("utf-8"),
            genotyping_details=cls._details_cell(result),
        )
