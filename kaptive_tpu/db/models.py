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

from kaptive_tpu.core.collections import SoAContainer, as_bytes_array, soa


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
class Phenotypes(SoAContainer):
    r"""SoA batch of phenotype rules for vectorised evaluation.

    Batch protocol derived by :class:`~kaptive_tpu.core.collections.SoAContainer`
    (mask matrices index along their rule axis); ``empty`` is overridden to
    keep the 2-D mask shape.
    """

    ids: npt.NDArray[np.bytes_] = soa("S32", kind="bytes")
    locus_masks: npt.NDArray[np.bool_] = soa(bool)
    extra_masks: npt.NDArray[np.int8] = soa(np.int8)
    inactive_masks: npt.NDArray[np.int8] = soa(np.int8)
    extra_counts: npt.NDArray[np.int8] = soa(np.int8)
    priorities: npt.NDArray[np.int8] = soa(np.int8)
    as_suffix: npt.NDArray[np.bool_] = soa(bool)

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
    def from_dict(cls, data: dict) -> Phenotypes:
        extra_masks = np.array(data["extra_masks"], dtype=np.int8)
        return cls(
            ids=as_bytes_array(data["ids"]),
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
