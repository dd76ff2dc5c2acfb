r"""Database metadata schema, phenotype rules, and vectorised phenotype masks.

Capability parity with ``/root/reference/src/kaptive/db/models.py``:
``DatabaseError`` (:27), ``DatabaseMetadata`` (:39-139), ``Phenotype``
(:142-166), ``Phenotypes`` SoA (:169-307).  The TOML field names and the mask
semantics are fixed by the on-disk database format; the validation here is
schema-table driven rather than hand-unrolled.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

import numpy as np
import numpy.typing as npt

from kaptive_tpu.core.collections import SoAContainer, as_bytes_array, soa


class DatabaseError(Exception):
    r"""Raised for database loading, metadata validation, or format errors."""


def _as_is(value: Any) -> Any:
    return value


# TOML schema: required keys with their coercions, then keys that fall back to
# a legacy alias and default to ``{}`` (format contract, ref db/models.py:96-139).
_REQUIRED: tuple[tuple[str, Any], ...] = (
    ("name", _as_is),
    ("keyword", _as_is),
    ("genbank", _as_is),
    ("organism", _as_is),
    ("taxon", int),
    ("antigen", _as_is),
    ("pathway", _as_is),
    ("version", _as_is),
    ("id_threshold", float),
    ("doi", _as_is),
    ("owner", _as_is),
    ("repo", _as_is),
    ("branch", _as_is),
    ("contact", _as_is),
)
_ALIASED: tuple[tuple[str, str], ...] = (
    ("phenotype_logic", "logic"),
    ("antigenic_units", "units"),
)


@dataclass(frozen=True, slots=True)
class DatabaseMetadata:
    r"""Validated TOML metadata for a reference database (identity, organism,
    repo provenance, and the phenotype/antigenic rule tables)."""

    # NB: field order is part of the pickle-cache compatibility contract —
    # slotted frozen dataclasses restore positionally, so reordering breaks
    # previously cached databases.
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
        r"""Numeric components of ``version`` for semver-style comparison."""
        return tuple(int(tok) for tok in re.findall(r"\d+", str(self.version)))

    @classmethod
    def from_dict(cls, data: dict) -> DatabaseMetadata:
        if not isinstance(data, dict):
            raise DatabaseError("Metadata must be a dictionary.")
        fields: dict[str, Any] = {}
        try:
            for key, coerce in _REQUIRED:
                fields[key] = coerce(data[key])
        except KeyError as exc:
            raise DatabaseError(f"Metadata is missing required field: {exc.args[0]!r}")
        except (TypeError, ValueError) as exc:
            raise DatabaseError(f"Metadata has an invalid value type: {exc}")
        for key, legacy in _ALIASED:
            fields[key] = data.get(key, data.get(legacy, {}))
        return cls(**fields)


@dataclass(slots=True, frozen=True)
class Phenotype:
    r"""One phenotype rule: loci it applies to, genes that must be present
    (``extra_genes``) or intact (``inactive_genes``), resolution priority, and
    whether the id is appended as a suffix rather than replacing the call."""

    id: str
    loci: set[str]
    extra_genes: set[str]
    inactive_genes: set[str]
    priority: int = 50
    as_suffix: bool = False


def _mask2d(rows: Any, dtype: Any) -> npt.NDArray[Any]:
    arr = np.array(rows, dtype=dtype)
    return arr if arr.ndim == 2 else arr.reshape(len(arr), -1)


@dataclass(frozen=True, slots=True)
class Phenotypes(SoAContainer):
    r"""SoA batch of phenotype rules for vectorised evaluation.

    Rows are rules; mask matrices span (rules x loci) and (rules x gene
    clusters) so a whole batch of assemblies evaluates with one einsum.
    Batch protocol derived by :class:`~kaptive_tpu.core.collections.SoAContainer`;
    ``empty``/``from_dict`` are overridden to keep the 2-D mask shapes.
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
        zero = np.empty((0, 0), dtype=np.int8)
        return cls(
            ids=np.empty(0, dtype="S32"),
            locus_masks=zero.astype(bool),
            extra_masks=zero,
            inactive_masks=zero,
            extra_counts=np.empty(0, dtype=np.int8),
            priorities=np.empty(0, dtype=np.int8),
            as_suffix=np.empty(0, dtype=bool),
        )

    @classmethod
    def from_dict(cls, data: dict) -> Phenotypes:
        extra = _mask2d(data["extra_masks"], np.int8)
        counts = data.get("extra_counts")
        if counts is None:
            counts = extra.sum(axis=1) if extra.size else np.empty(0)
        return cls(
            ids=as_bytes_array(data["ids"]),
            locus_masks=_mask2d(data["locus_masks"], bool),
            extra_masks=extra,
            inactive_masks=_mask2d(data["inactive_masks"], np.int8),
            extra_counts=np.array(counts, dtype=np.int8),
            priorities=np.array(data["priorities"], dtype=np.int8),
            as_suffix=np.array(data["as_suffix"], dtype=bool),
        )
