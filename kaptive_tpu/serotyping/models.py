r"""Serotyping data models: gene states, problem flags, hit/piece containers, result record.

Capability parity with ``/root/reference/src/kaptive/serotyping/models.py``:
``GeneState`` (:31-44), ``SerotypingProblem`` bitflags + symbol table ``? + - * !``
(:47-92), ``GeneHits`` SoA (:96-364 incl. ``frames`` = ``(-q_starts)%3`` :252-259
and interval views :279-297), ``LocusPieces`` (:367-474), ``SerotypingResult``
(:477-654) with problem derivation (:538-558), ``to_locus_data`` (:596-621) and
lossless dict round-trip (:560-654).
"""

from __future__ import annotations

from collections.abc import Iterable
from dataclasses import dataclass, field
from enum import IntEnum, IntFlag, auto
from typing import TYPE_CHECKING, Any, ClassVar, Self

import numpy as np
import numpy.typing as npt

from kaptive_tpu.core.interval import Intervals
from kaptive_tpu.core.seq import Sequences

if TYPE_CHECKING:
    from kaptive_tpu.compare import LocusData


def _as_bytes_array(val: Any) -> npt.NDArray[np.bytes_]:
    r"""Encode strings/bytes to a fixed-width bytes array sized to the data."""
    if isinstance(val, np.ndarray) and val.dtype.kind in ("S", "a"):
        return val
    items = list(val) if not isinstance(val, np.ndarray) else val.tolist()
    encoded = [x.encode("utf-8") if isinstance(x, str) else bytes(x) for x in items]
    if not encoded:
        return np.empty(0, dtype="S1")
    return np.array(encoded, dtype=np.bytes_)


class GeneState(IntEnum):
    r"""Mutually exclusive classification of a locus gene found in an assembly."""

    NORMAL = 0
    PARTIAL = 1
    TRUNCATED = 2
    NOVEL = 3


class SerotypingProblem(IntFlag):
    r"""Bitflag problems with a serotype call, rendered as ``? + - * !`` symbols."""

    NONE = 0
    FRAGMENTED = auto()
    UNEXPECTED_GENES = auto()
    MISSING_GENES = auto()
    NOVEL_GENES = auto()
    TRUNCATED_GENES = auto()

    SYMBOLS: ClassVar[tuple[bytes, ...]]

    def to_symbols(self) -> bytes:
        return self.SYMBOLS[self.value]


_serotyping_flags = (
    (SerotypingProblem.FRAGMENTED.value, b"?"),
    (SerotypingProblem.UNEXPECTED_GENES.value, b"+"),
    (SerotypingProblem.MISSING_GENES.value, b"-"),
    (SerotypingProblem.NOVEL_GENES.value, b"*"),
    (SerotypingProblem.TRUNCATED_GENES.value, b"!"),
)
SerotypingProblem.SYMBOLS = tuple(
    b"".join(sym for flag, sym in _serotyping_flags if i & flag)
    for i in range(1 << max(SerotypingProblem).value.bit_length())
)


@dataclass(slots=True, frozen=True)
class GeneHits:
    r"""SoA container of classified gene alignments against the assembly."""

    gene_indices: npt.NDArray[np.int32]
    q_starts: npt.NDArray[np.int32]
    q_ends: npt.NDArray[np.int32]
    t_indices: npt.NDArray[np.uint32]
    t_starts: npt.NDArray[np.int32]
    t_ends: npt.NDArray[np.int32]
    strands: npt.NDArray[np.int8]
    is_expected: npt.NDArray[np.bool_]
    is_inside: npt.NDArray[np.bool_]
    is_extra: npt.NDArray[np.bool_]
    expected_positions: npt.NDArray[np.int32]
    expected_strands: npt.NDArray[np.int8]
    gene_ids: npt.NDArray[np.bytes_]
    cluster_names: npt.NDArray[np.bytes_]
    product_descriptions: npt.NDArray[np.bytes_]
    coverages: npt.NDArray[np.float32]

    def __post_init__(self) -> None:
        # Coerce string-ish inputs to width-fitted bytes arrays.  Widths adapt
        # to the data (the reference hardcodes S32/S10/S64, silently truncating
        # long gene ids / cluster names / products — ref ``models.py:96-364``).
        for field_name in ("gene_ids", "cluster_names", "product_descriptions"):
            val = getattr(self, field_name)
            if isinstance(val, np.ndarray) and val.dtype.kind in ("S", "a"):
                continue
            object.__setattr__(self, field_name, _as_bytes_array(val))

    @classmethod
    def empty(cls) -> GeneHits:
        return cls(
            np.empty(0, dtype=np.int32),
            np.empty(0, dtype=np.int32),
            np.empty(0, dtype=np.int32),
            np.empty(0, dtype=np.uint32),
            np.empty(0, dtype=np.int32),
            np.empty(0, dtype=np.int32),
            np.empty(0, dtype=np.int8),
            np.empty(0, dtype=bool),
            np.empty(0, dtype=bool),
            np.empty(0, dtype=bool),
            np.empty(0, dtype=np.int32),
            np.empty(0, dtype=np.int8),
            np.empty(0, dtype="S32"),
            np.empty(0, dtype="S10"),
            np.empty(0, dtype="S64"),
            np.empty(0, dtype=np.float32),
        )

    @classmethod
    def concat(cls, batches: Iterable[Self]) -> Self:
        batches_list = list(batches)
        if not batches_list:
            return cls.empty()  # type: ignore[return-value]
        return cls(
            gene_indices=np.concatenate([b.gene_indices for b in batches_list]),
            q_starts=np.concatenate([b.q_starts for b in batches_list]),
            q_ends=np.concatenate([b.q_ends for b in batches_list]),
            t_indices=np.concatenate([b.t_indices for b in batches_list]),
            t_starts=np.concatenate([b.t_starts for b in batches_list]),
            t_ends=np.concatenate([b.t_ends for b in batches_list]),
            strands=np.concatenate([b.strands for b in batches_list]),
            is_expected=np.concatenate([b.is_expected for b in batches_list]),
            is_inside=np.concatenate([b.is_inside for b in batches_list]),
            is_extra=np.concatenate([b.is_extra for b in batches_list]),
            expected_positions=np.concatenate([b.expected_positions for b in batches_list]),
            expected_strands=np.concatenate([b.expected_strands for b in batches_list]),
            gene_ids=np.concatenate([b.gene_ids for b in batches_list]),
            cluster_names=np.concatenate([b.cluster_names for b in batches_list]),
            product_descriptions=np.concatenate([b.product_descriptions for b in batches_list]),
            coverages=np.concatenate([b.coverages for b in batches_list]),
        )

    def __len__(self) -> int:
        return len(self.gene_indices)

    def __getitem__(self, item: Any) -> GeneHits:
        return GeneHits(
            gene_indices=self.gene_indices[item],
            q_starts=self.q_starts[item],
            q_ends=self.q_ends[item],
            t_indices=self.t_indices[item],
            t_starts=self.t_starts[item],
            t_ends=self.t_ends[item],
            strands=self.strands[item],
            is_expected=self.is_expected[item],
            is_inside=self.is_inside[item],
            is_extra=self.is_extra[item],
            expected_positions=self.expected_positions[item],
            expected_strands=self.expected_strands[item],
            gene_ids=self.gene_ids[item],
            cluster_names=self.cluster_names[item],
            product_descriptions=self.product_descriptions[item],
            coverages=self.coverages[item],
        )

    @property
    def frames(self) -> npt.NDArray[np.int32]:
        r"""Reading-frame offsets: ``(-q_starts) % 3`` (ref :252-259)."""
        return (-self.q_starts) % 3

    @property
    def query_lengths(self) -> npt.NDArray[np.int32]:
        return self.q_ends - self.q_starts

    @property
    def target_lengths(self) -> npt.NDArray[np.int32]:
        return self.t_ends - self.t_starts

    @property
    def q_intervals(self) -> Intervals:
        return Intervals(self.q_starts, self.q_ends, self.strands)

    @property
    def t_intervals(self) -> Intervals:
        return Intervals(self.t_starts, self.t_ends, self.strands)

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> GeneHits:
        def _to_bytes_array(val: Any, _unused: str = "") -> npt.NDArray[np.bytes_]:
            if val is None:
                return np.empty(0, dtype="S1")
            return _as_bytes_array(val)

        return cls(
            gene_indices=np.array(data["gene_indices"], dtype=np.int32),
            q_starts=np.array(data["q_starts"], dtype=np.int32),
            q_ends=np.array(data["q_ends"], dtype=np.int32),
            t_indices=np.array(data["t_indices"], dtype=np.uint32),
            t_starts=np.array(data["t_starts"], dtype=np.int32),
            t_ends=np.array(data["t_ends"], dtype=np.int32),
            strands=np.array(data["strands"], dtype=np.int8),
            is_expected=np.array(data["is_expected"], dtype=bool),
            is_inside=np.array(data["is_inside"], dtype=bool),
            is_extra=np.array(data["is_extra"], dtype=bool),
            expected_positions=np.array(data.get("expected_positions", []), dtype=np.int32),
            expected_strands=np.array(data.get("expected_strands", []), dtype=np.int8),
            gene_ids=_to_bytes_array(data.get("gene_ids", []), "S32"),
            cluster_names=_to_bytes_array(data.get("cluster_names", []), "S10"),
            product_descriptions=_to_bytes_array(data.get("product_descriptions", []), "S64"),
            coverages=np.array(data.get("coverages", []), dtype=np.float32),
        )

    def to_dict(self) -> dict[str, Any]:
        d = {
            k: getattr(self, k)
            for k in (
                "gene_indices", "q_starts", "q_ends", "t_indices", "t_starts", "t_ends",
                "strands", "is_expected", "is_inside", "is_extra",
                "expected_positions", "expected_strands", "coverages",
            )
        }
        d["gene_ids"] = np.char.decode(self.gene_ids, "utf-8").tolist()
        d["cluster_names"] = np.char.decode(self.cluster_names, "utf-8").tolist()
        d["product_descriptions"] = np.char.decode(self.product_descriptions, "utf-8").tolist()
        return d


@dataclass(slots=True, frozen=True)
class LocusPieces:
    r"""SoA container of locus fragment bounding coordinates across contigs."""

    ctg_indices: npt.NDArray[np.uint32]
    starts: npt.NDArray[np.int32]
    ends: npt.NDArray[np.int32]
    strands: npt.NDArray[np.int8]

    def __len__(self) -> int:
        return len(self.ctg_indices)

    def __getitem__(self, item: int | slice | npt.NDArray[Any] | list[int]) -> "Any | LocusPieces":
        if isinstance(item, (int, np.integer)):
            raise NotImplementedError("Single item access not implemented for LocusPieces")
        return LocusPieces(
            ctg_indices=self.ctg_indices[item],
            starts=self.starts[item],
            ends=self.ends[item],
            strands=self.strands[item],
        )

    @classmethod
    def concat(cls, batches: Iterable[Self]) -> Self:
        batches_list = list(batches)
        if not batches_list:
            return cls.empty()  # type: ignore[return-value]
        return cls(
            ctg_indices=np.concatenate([b.ctg_indices for b in batches_list]),
            starts=np.concatenate([b.starts for b in batches_list]),
            ends=np.concatenate([b.ends for b in batches_list]),
            strands=np.concatenate([b.strands for b in batches_list]),
        )

    @classmethod
    def empty(cls) -> LocusPieces:
        return cls(
            np.empty(0, dtype=np.uint32),
            np.empty(0, dtype=np.int32),
            np.empty(0, dtype=np.int32),
            np.empty(0, dtype=np.int8),
        )

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> LocusPieces:
        return cls(
            ctg_indices=np.array(data["ctg_indices"], dtype=np.uint32),
            starts=np.array(data["starts"], dtype=np.int32),
            ends=np.array(data["ends"], dtype=np.int32),
            strands=np.array(data["strands"], dtype=np.int8),
        )

    def to_dict(self) -> dict[str, Any]:
        return {k: getattr(self, k) for k in ("ctg_indices", "starts", "ends", "strands")}


@dataclass(slots=True, frozen=True)
class SerotypingResult:
    r"""Immutable record of one *in silico* serotyping call (JSON round-trippable)."""

    kaptive_version: str
    database_name: str
    database_version: str
    database_organism: str
    database_taxon: int
    genome: str
    best_locus_idx: int
    best_locus_name: str
    best_locus_score: float
    best_locus_completeness: float
    locus_pieces: LocusPieces
    length_discrepancy: float
    locus_seqs: Sequences
    gene_hits: GeneHits
    gene_states: npt.NDArray[np.int8]
    gene_seqs: Sequences
    translations: Sequences
    percent_identity: float
    percent_coverage: float
    protein_identities: npt.NDArray[np.float32]
    phenotype: str
    typeable: bool
    missing_expected_genes: tuple[str, ...]
    problems: SerotypingProblem = field(init=False)

    def __post_init__(self) -> None:
        object.__setattr__(self, "problems", self._derive_problems())

    def _derive_problems(self) -> SerotypingProblem:
        r"""Condense the call into its problem flags.

        Flag conditions: FRAGMENTED = locus split over >1 piece; UNEXPECTED =
        a non-extra foreign gene sits inside the locus; MISSING = not every
        expected gene was recovered inside the locus; NOVEL / TRUNCATED =
        inside-locus genes in those states (PARTIAL counts as truncated).
        """
        hit = self.gene_hits
        inside_state = np.where(hit.is_inside, self.gene_states, np.int8(-1))
        conditions = {
            SerotypingProblem.FRAGMENTED: len(self.locus_pieces) > 1,
            SerotypingProblem.UNEXPECTED_GENES: bool(
                np.any(hit.is_inside & ~(hit.is_expected | hit.is_extra))
            ),
            SerotypingProblem.MISSING_GENES: self.best_locus_completeness < 1.0
            or bool(np.any(hit.is_expected & ~hit.is_inside)),
            SerotypingProblem.NOVEL_GENES: bool(np.any(inside_state == GeneState.NOVEL.value)),
            SerotypingProblem.TRUNCATED_GENES: bool(
                np.any(inside_state == GeneState.TRUNCATED.value)
                | np.any(inside_state == GeneState.PARTIAL.value)
            ),
        }
        flags = SerotypingProblem.NONE
        for flag, present in conditions.items():
            if present:
                flags |= flag
        return flags

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> SerotypingResult:
        return cls(
            kaptive_version=data["kaptive_version"],
            database_name=data["database_name"],
            database_version=data["database_version"],
            database_organism=data["database_organism"],
            database_taxon=data["database_taxon"],
            genome=data["genome"],
            best_locus_idx=data["best_locus_idx"],
            best_locus_name=data["best_locus_name"],
            best_locus_score=data["best_locus_score"],
            best_locus_completeness=data["best_locus_completeness"],
            length_discrepancy=data["length_discrepancy"],
            locus_pieces=LocusPieces.from_dict(data["locus_pieces"]),
            gene_hits=GeneHits.from_dict(data["gene_hits"]),
            gene_states=np.array(data["gene_states"], dtype=np.int8),
            percent_identity=data["percent_identity"],
            percent_coverage=data["percent_coverage"],
            phenotype=data["phenotype"],
            typeable=data["typeable"],
            missing_expected_genes=tuple(data.get("missing_expected_genes", [])),
            locus_seqs=Sequences.from_dict(data["locus_seqs"]),
            gene_seqs=Sequences.from_dict(data["gene_seqs"]),
            translations=Sequences.from_dict(data["translations"]),
            protein_identities=np.array(data["protein_identities"], dtype=np.float32),
        )

    def to_locus_data(self) -> "LocusData":
        from kaptive_tpu.compare import LocusData

        mask = self.gene_hits.is_inside & ~self.gene_hits.is_extra
        descriptions = np.asarray(
            np.char.decode(self.gene_hits.product_descriptions[mask], "utf-8"),
            dtype=object,
        )
        return LocusData(
            proteins=self.translations[mask],  # type: ignore[arg-type]
            name=self.genome,
            backbone=self.gene_hits.t_intervals[mask],  # type: ignore[arg-type]
            pieces=self.locus_pieces,
            gene_ctg_indices=self.gene_hits.t_indices[mask],
            gene_states=self.gene_states[mask],
            gene_descriptions=descriptions,
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "kaptive_version": self.kaptive_version,
            "database_name": self.database_name,
            "database_version": self.database_version,
            "database_organism": self.database_organism,
            "database_taxon": self.database_taxon,
            "genome": self.genome,
            "best_locus_idx": self.best_locus_idx,
            "best_locus_name": self.best_locus_name,
            "best_locus_score": self.best_locus_score,
            "best_locus_completeness": self.best_locus_completeness,
            "length_discrepancy": self.length_discrepancy,
            "percent_identity": self.percent_identity,
            "percent_coverage": self.percent_coverage,
            "phenotype": self.phenotype,
            "typeable": self.typeable,
            "missing_expected_genes": self.missing_expected_genes,
            "problems": self.problems,
            "locus_pieces": self.locus_pieces.to_dict(),
            "gene_hits": self.gene_hits.to_dict(),
            "gene_states": self.gene_states,
            "protein_identities": self.protein_identities,
            "locus_seqs": self.locus_seqs.to_dict(),
            "gene_seqs": self.gene_seqs.to_dict(),
            "translations": self.translations.to_dict(),
        }
