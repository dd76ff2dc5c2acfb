r"""Database metadata schema, phenotype rules, and vectorised phenotype masks.

Capability parity with ``/root/reference/src/kaptive/db/models.py``:
``DatabaseError`` (:27), ``DatabaseMetadata`` (:39-139 incl. ``parsed_version``
:83-94 and ``from_dict`` :96-139), ``Phenotype`` (:142-166), ``Phenotypes``
SoA (:169-307).
"""

from __future__ import annotations

from collections.abc import Iterable
from dataclasses import dataclass
from re import compile as re_compile
from typing import Any, Self

import numpy as np
import numpy.typing as npt


class DatabaseError(Exception):
    r"""Raised for database loading, metadata validation, or format errors."""


@dataclass(frozen=True, slots=True)
class DatabaseMetadata:
    r"""Validated TOML metadata schema for a reference database."""

    name: str
    keyword: str
    genbank: str
    organism: str
    taxon: int
    antigen: str
    pathway: str
    version: str
    id_threshold: float
    doi: list[str]
    owner: str
    repo: str
    branch: str
    contact: dict
    phenotype_logic: dict
    antigenic_units: dict

    @property
    def parsed_version(self) -> tuple[int, ...]:
        pat = re_compile(r"\d+")
        return tuple(int(x) for x in pat.findall(str(self.version)))

    @classmethod
    def from_dict(cls, data: dict) -> DatabaseMetadata:
        if not isinstance(data, dict):
            raise DatabaseError("Metadata must be a dictionary.")
        try:
            meta = cls(
                name=data["name"],
                keyword=data["keyword"],
                genbank=data["genbank"],
                organism=data["organism"],
                taxon=int(data["taxon"]),
                antigen=data["antigen"],
                pathway=data["pathway"],
                version=data["version"],
                id_threshold=float(data["id_threshold"]),
                doi=data["doi"],
                owner=data["owner"],
                repo=data["repo"],
                branch=data["branch"],
                contact=data["contact"],
                phenotype_logic=data.get("phenotype_logic", data.get("logic", {})),
                antigenic_units=data.get("antigenic_units", data.get("units", {})),
            )
        except KeyError as e:
            raise DatabaseError(f"Metadata is missing required field: {e.args[0]!r}")
        except ValueError as e:
            raise DatabaseError(f"Metadata has an invalid value type: {e}")
        return meta


@dataclass(slots=True, frozen=True)
class Phenotype:
    r"""One phenotype rule: required loci / extra genes / inactive genes -> serotype id."""

    id: str
    loci: set[str]
    extra_genes: set[str]
    inactive_genes: set[str]
    priority: int = 50
    as_suffix: bool = False


@dataclass(frozen=True, slots=True)
class Phenotypes:
    r"""SoA batch of phenotype rules for vectorised evaluation."""

    ids: npt.NDArray[np.bytes_]
    locus_masks: npt.NDArray[np.bool_]
    extra_masks: npt.NDArray[np.int8]
    inactive_masks: npt.NDArray[np.int8]
    extra_counts: npt.NDArray[np.int8]
    priorities: npt.NDArray[np.int8]
    as_suffix: npt.NDArray[np.bool_]

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, item: Any) -> Phenotypes:
        if isinstance(item, (int, np.integer)):
            raise NotImplementedError("Single item access not implemented for Phenotypes")
        return Phenotypes(
            ids=self.ids[item],
            locus_masks=self.locus_masks[item],
            extra_masks=self.extra_masks[item],
            inactive_masks=self.inactive_masks[item],
            extra_counts=self.extra_counts[item],
            priorities=self.priorities[item],
            as_suffix=self.as_suffix[item],
        )

    @classmethod
    def empty(cls) -> Phenotypes:
        return cls(
            ids=np.empty(0, dtype="S32"),
            locus_masks=np.empty((0, 0), dtype=bool),
            extra_masks=np.empty((0, 0), dtype=np.int8),
            inactive_masks=np.empty((0, 0), dtype=np.int8),
            extra_counts=np.empty(0, dtype=np.int8),
            priorities=np.empty(0, dtype=np.int8),
            as_suffix=np.empty(0, dtype=bool),
        )

    @classmethod
    def concat(cls, batches: Iterable[Self]) -> Self:
        batches = list(batches)
        if not batches:
            return cls.empty()  # type: ignore[return-value]
        return cls(
            ids=np.concatenate([b.ids for b in batches]),
            locus_masks=np.concatenate([b.locus_masks for b in batches]),
            extra_masks=np.concatenate([b.extra_masks for b in batches]),
            inactive_masks=np.concatenate([b.inactive_masks for b in batches]),
            extra_counts=np.concatenate([b.extra_counts for b in batches]),
            priorities=np.concatenate([b.priorities for b in batches]),
            as_suffix=np.concatenate([b.as_suffix for b in batches]),
        )

    def to_dict(self) -> dict:
        return {
            "ids": np.char.decode(self.ids, "utf-8").tolist(),
            "locus_masks": self.locus_masks,
            "extra_masks": self.extra_masks,
            "inactive_masks": self.inactive_masks,
            "extra_counts": self.extra_counts,
            "priorities": self.priorities,
            "as_suffix": self.as_suffix,
        }

    @classmethod
    def from_dict(cls, data: dict) -> Phenotypes:
        extra_masks = np.array(data["extra_masks"], dtype=np.int8)
        return cls(
            ids=np.array([p.encode("utf-8") for p in data["ids"]], dtype="S32"),
            locus_masks=np.array(data["locus_masks"], dtype=bool),
            extra_masks=extra_masks,
            inactive_masks=np.array(data["inactive_masks"], dtype=np.int8),
            extra_counts=np.array(
                data.get("extra_counts", extra_masks.sum(axis=1) if extra_masks.size else []),
                dtype=np.int8,
            ),
            priorities=np.array(data["priorities"], dtype=np.int8),
            as_suffix=np.array(data["as_suffix"], dtype=bool),
        )
