r"""In-memory SoA reference database and the GenBank+TOML compiler.

Capability parity with ``/root/reference/src/kaptive/db/core.py``: the
``Database`` container (:32-507) with the same logical fields (:82-98),
``get_locus_data`` (:100-141), ``max_locus_length`` (:143-152), load/pickle
round-trip (:242-287) and the ``from_genbank`` compiler (:289-507) including
locus/type/Extra-genes note parsing (:322-324, :344-441), vocabulary building
(:391-397), phenotype wildcard parsing (:182-219) and mask construction
(:457-505).

TPU addition: the compiled database carries a :class:`~kaptive_tpu.ops.mapper.GeneIndex`
— the static hash-sorted gene minimizer table plus 2-bit encoded gene codes —
so the per-assembly mapping phase needs no DB-side preprocessing.  It is built
lazily and cached inside the pickle artifact.
"""

from __future__ import annotations

import pickle
import tomllib
from collections.abc import Iterable
from dataclasses import dataclass, field
from fnmatch import filter as fnmatch_filter
from pathlib import Path
from re import compile as re_compile
from typing import TYPE_CHECKING, Any

import numpy as np
import numpy.typing as npt

from kaptive_tpu.core.interval import Intervals
from kaptive_tpu.core.kmers import FracMinHashIndex
from kaptive_tpu.core.seq import SeqRecord, Sequences
from kaptive_tpu.db.models import DatabaseError, DatabaseMetadata, Phenotype, Phenotypes

if TYPE_CHECKING:
    from kaptive_tpu.compare import LocusData
    from kaptive_tpu.ops.mapper import GeneIndex


@dataclass(frozen=True, slots=True)
class Database:
    r"""Flat SoA representation of a surface-antigen locus database."""

    metadata: DatabaseMetadata
    loci: Sequences
    serotypes: tuple[str, ...]
    locus_gene_offsets: npt.NDArray[np.uint32]
    locus_gene_lengths: npt.NDArray[np.uint32]
    gene_intervals: Intervals
    genes: Sequences
    translations: Sequences
    extra_genes: npt.NDArray[np.bool_]
    gene_locus_indices: npt.NDArray[np.uint16]
    cluster_keys: tuple[str, ...]
    gene_cluster_ids: npt.NDArray[np.uint16]
    description_keys: tuple[str, ...]
    gene_description_ids: npt.NDArray[np.uint16]
    gene_positions: npt.NDArray[np.uint16]
    phenotypes: Phenotypes
    loci_sketches: FracMinHashIndex
    _gene_index_cache: list = field(default_factory=list, repr=False, compare=False)

    @property
    def gene_index(self) -> "GeneIndex":
        r"""Lazily built, cached device mapping index over the gene set."""
        if not self._gene_index_cache:
            from kaptive_tpu.ops.mapper import GeneIndex

            self._gene_index_cache.append(GeneIndex.build(self.genes))
        return self._gene_index_cache[0]

    def get_locus_data(self, locus_name: str) -> "LocusData":
        from kaptive_tpu.compare import LocusData
        from kaptive_tpu.serotyping.models import GeneState

        locus_idx = self.loci.ids.index(locus_name)
        start = self.locus_gene_offsets[locus_idx]
        length = self.locus_gene_lengths[locus_idx]

        desc_ids = self.gene_description_ids[start : start + length]
        raw_descs = [
            self.description_keys[i].decode("utf-8")
            if isinstance(self.description_keys[i], bytes)
            else str(self.description_keys[i])
            for i in desc_ids
        ]
        descriptions = np.asarray(raw_descs, dtype=object)
        states = np.full(length, GeneState.NORMAL.value, dtype=np.int8)

        return LocusData(
            proteins=self.translations[start : start + length],  # type: ignore[arg-type]
            name=locus_name,
            backbone=self.gene_intervals[start : start + length],  # type: ignore[arg-type]
            pieces=None,
            gene_ctg_indices=None,
            gene_states=states,
            gene_descriptions=descriptions,
        )

    @property
    def max_locus_length(self) -> int:
        return int(np.max(self.loci.lengths)) if len(self.loci) > 0 else 0

    @property
    def cluster_vocab(self) -> dict[str, int]:
        return {k: i for i, k in enumerate(self.cluster_keys)}

    @property
    def description_vocab(self) -> dict[str, int]:
        return {k: i for i, k in enumerate(self.description_keys)}

    @staticmethod
    def _parse_phenotype(
        id_: str,
        data: dict[str, Any],
        locus_iterable: Iterable[str],
        cluster_iterable: Iterable[str],
    ) -> Phenotype:
        r"""Parse one phenotype rule with ``*`` wildcards (ref :182-219)."""
        loci, inactive, extra = [], [], []
        for token, result, iterable in (
            ("loci", loci, locus_iterable),
            ("extra_genes", extra, cluster_iterable),
            ("inactive_genes", inactive, cluster_iterable),
        ):
            for t in data.get(token, []):
                if "*" in t:
                    result += fnmatch_filter(iterable, t)
                else:
                    if t in iterable:
                        result.append(t)
        return Phenotype(id_, set(loci), set(extra), set(inactive), data.get("priority", 50))

    @staticmethod
    def _check_file(file: str | Path, min_size: int = 1) -> Path:
        if isinstance(file, str):
            file = Path(file)
        if file.is_file() and file.stat().st_size >= min_size:
            return file
        raise FileNotFoundError(file)

    @classmethod
    def load(cls, file: str | Path) -> "Database":
        file_path = cls._check_file(file)
        if file_path.suffix == ".gbk":
            return cls.from_genbank(file_path)
        elif file_path.suffix == ".pkl":
            return cls.from_pickle(file_path)
        raise DatabaseError(f"File {file} not supported")

    @classmethod
    def from_pickle(cls, file: str | Path) -> "Database":
        return pickle.loads(cls._check_file(file).read_bytes())

    def save(self, file: str | Path) -> None:
        Path(file).write_bytes(pickle.dumps(self))

    @classmethod
    def from_genbank(cls, file: str | Path) -> "Database":
        r"""Compile GenBank+TOML into the flat SoA layout (ref :289-507)."""
        file = cls._check_file(file)
        from kaptive_tpu.db.genbank import iter_records

        _LOCUS_REGEX = re_compile(r"locus:\s?(.*)$")
        _SEROTYPE_REGEX = re_compile(r"type:\s?(.*)$")
        _EXTRA_REGEX = re_compile(r"Extra genes:\s?(.*)$")

        global_gene_idx = 0
        locus_records: list[SeqRecord] = []
        serotype_names: list[str] = []
        locus_gene_offsets: list[int] = []
        locus_gene_lengths: list[int] = []
        locus_intervals: list[Intervals] = []
        gene_ids: list[str] = []
        extra_genes: list[bool] = []
        gene_cluster_ids: list[int] = []
        gene_description_ids: list[int] = []
        gene_expected_positions: list[int] = []
        cluster_vocab: dict[str, int] = {}
        description_vocab: dict[str, int] = {}

        with file.open("rb") as fh:
            for rec in iter_records(fh):
                locus_name, serotype, extra = None, None, False
                if not rec.features:
                    raise DatabaseError(f"Locus has no features: {rec.name}")
                notes = [q.value for q in rec.features[0].qualifiers if q.key == "note"]
                if not notes:
                    raise DatabaseError(f'Locus has no "note" qualifiers: {rec.name}')
                for note in notes:
                    if match := _EXTRA_REGEX.search(note):
                        extra = True
                        locus_name = match.group(1)
                        break
                    if not locus_name and (match := _LOCUS_REGEX.search(note)):
                        locus_name = match.group(1)
                    if not serotype and (match := _SEROTYPE_REGEX.search(note)):
                        serotype = match.group(1)
                if not locus_name:
                    raise DatabaseError(f'Locus has no valid "locus" qualifiers: {rec.name}')

                locus_record = SeqRecord(locus_name, rec.sequence.upper())
                starts: list[int] = []
                ends: list[int] = []
                strands: list[int] = []
                local_gene_idx = 0
                locus_start_idx = global_gene_idx

                for feat in rec.features[1:]:
                    if feat.kind != "CDS":
                        continue
                    cluster, description = "", ""
                    for q in feat.qualifiers:
                        if not cluster and q.key == "gene":
                            cluster = q.value
                        if not description and q.key == "product":
                            description = q.value

                    gene_id = (
                        f"{locus_name}_{local_gene_idx + 1:02}_{cluster}" if not extra else cluster
                    )
                    if cluster not in cluster_vocab:
                        cluster_vocab[cluster] = len(cluster_vocab)
                    if description not in description_vocab:
                        description_vocab[description] = len(description_vocab)

                    loc = feat.location
                    start, end = sorted((loc.start, loc.end))
                    strand_val = -1 if loc.strand in (-1, "-") else 1

                    starts.append(start)
                    ends.append(end)
                    strands.append(strand_val)
                    gene_ids.append(gene_id)
                    gene_cluster_ids.append(cluster_vocab[cluster])
                    gene_description_ids.append(description_vocab[description])
                    gene_expected_positions.append(0 if extra else local_gene_idx + 1)
                    local_gene_idx += 1
                    global_gene_idx += 1

                if local_gene_idx == 0:
                    continue

                locus_gene_offsets.append(locus_start_idx)
                locus_gene_lengths.append(local_gene_idx)
                locus_intervals.append(
                    Intervals(
                        np.array(starts, dtype=np.int32),
                        np.array(ends, dtype=np.int32),
                        np.array(strands, dtype=np.int8),
                    )
                )
                locus_records.append(locus_record)
                serotype_names.append(serotype or "")
                extra_genes.extend([extra] * local_gene_idx)

        gene_locus_indices = np.zeros(global_gene_idx, dtype=np.uint16)
        for i, (o, length) in enumerate(zip(locus_gene_offsets, locus_gene_lengths)):
            gene_locus_indices[o : o + length] = i

        db_gene_ids = tuple(gene_ids)
        loci = Sequences.from_records(locus_records)
        cluster_keys = tuple(cluster_vocab.keys())
        phenotype_objs: list[Phenotype] = []
        if (metadata_file := file.with_suffix(".toml")).is_file():
            with metadata_file.open("rb") as fp:
                metadata = DatabaseMetadata.from_dict(tomllib.load(fp))
                for key, v in metadata.phenotype_logic.items():
                    phenotype_objs.append(cls._parse_phenotype(key, v, loci.ids, cluster_keys))
        else:
            raise DatabaseError("Missing required TOML metadata file alongside Genbank file.")

        n_pheno, n_loci, n_clusters = len(phenotype_objs), len(loci), len(cluster_keys)
        pheno_ids: list[str] = []
        locus_vocab = {name: i for i, name in enumerate(loci.ids)}
        locus_masks = np.zeros((n_pheno, n_loci), dtype=bool)
        extra_masks = np.zeros((n_pheno, n_clusters), dtype=np.int8)
        inactive_masks = np.zeros((n_pheno, n_clusters), dtype=np.int8)
        priorities = np.zeros(n_pheno, dtype=np.int8)
        as_suffix = np.zeros(n_pheno, dtype=bool)
        for i, p in enumerate(phenotype_objs):
            pheno_ids.append(p.id)
            for loc_name in p.loci:
                locus_masks[i, locus_vocab[loc_name]] = True
            for ext in p.extra_genes:
                extra_masks[i, cluster_vocab[ext]] = 1
            for ina in p.inactive_genes:
                inactive_masks[i, cluster_vocab[ina]] = 1
            priorities[i] = p.priority
            as_suffix[i] = p.as_suffix

        global_intervals = Intervals.concat(locus_intervals) if locus_intervals else Intervals.empty()
        genes = loci.extract_intervals(gene_locus_indices, global_intervals, new_ids=db_gene_ids)
        translations = genes.translate()

        return cls(
            metadata=metadata,
            loci=loci,
            serotypes=tuple(serotype_names),
            locus_gene_offsets=np.array(locus_gene_offsets, dtype=np.uint32),
            locus_gene_lengths=np.array(locus_gene_lengths, dtype=np.uint32),
            gene_intervals=global_intervals,
            genes=genes,
            translations=translations,
            extra_genes=np.array(extra_genes, dtype=bool),
            gene_locus_indices=gene_locus_indices,
            cluster_keys=cluster_keys,
            gene_cluster_ids=np.array(gene_cluster_ids, dtype=np.uint16),
            description_keys=tuple(description_vocab.keys()),
            gene_description_ids=np.array(gene_description_ids, dtype=np.uint16),
            gene_positions=np.array(gene_expected_positions, dtype=np.uint16),
            phenotypes=Phenotypes(
                ids=np.array([p.encode("utf-8") for p in pheno_ids], dtype="S32"),
                locus_masks=locus_masks,
                extra_masks=extra_masks,
                inactive_masks=inactive_masks,
                extra_counts=extra_masks.sum(axis=1, dtype=np.int8),
                priorities=priorities,
                as_suffix=as_suffix,
            ),
            loci_sketches=FracMinHashIndex.build(loci, sort_by_hash=False),
        )
