r"""Biological sequence SoA containers and NCBI table-11 translation.

Capability parity with ``/root/reference/src/kaptive/core/seq.py``:
``SeqRecord`` (:29-87), ``Sequences`` (:90-408) with ``extract`` (:327),
``extract_intervals`` (:357), ``translate`` (:381), ``unique`` (:226),
``internal_stops`` (:215), ``to_fasta`` (:148), dict round-trip (:118-146), and
``BacterialTranslationTable`` (:411-538, identical LUT construction :486-503).

Design: the reference's per-element Numba ragged kernels
(``_extract_ragged_kernel`` :612, ``_translate_ragged_kernel`` :671,
``_hash_sequences_kernel`` :542, ``_internal_stops_kernel`` :744) are replaced by
single-pass vectorised numpy gathers/segment reductions — no Python-level loops
over bases.  These host paths feed ingest/report; the per-assembly hot
translation (gene-state phase) additionally has a device path in
:mod:`kaptive_tpu.ops.translate` operating on padded batches.
"""

from __future__ import annotations

from collections.abc import Generator, Iterable
from dataclasses import dataclass
from typing import Any, Self

import numpy as np
import numpy.typing as npt

from kaptive_tpu.core.collections import cumulative_offsets, ragged_gather_indices
from kaptive_tpu.core.interval import Interval, IntervalLike, Intervals, Strand


@dataclass(frozen=True, slots=True)
class SeqRecord:
    r"""Immutable single-sequence record: string id + raw bytes."""

    id: str
    seq: bytes

    def __len__(self) -> int:
        return len(self.seq)

    def to_fasta(self) -> bytes:
        return b">%b\n%b\n" % (self.id.encode(), self.seq)

    def extract(self, start: int | IntervalLike, end: int | None = None, strand: Strand = Strand.UNSTRANDED) -> bytes:
        if end is None:
            interval = Interval.from_item(start, strand=strand)
            start_val, end_val, strand_val = interval.start, interval.end, interval.strand
        else:
            start_val, end_val, strand_val = int(start), int(end), strand  # type: ignore[assignment]
        new_seq = self.seq[start_val:end_val]
        if strand_val < 0:
            return bytes(new_seq.translate(BacterialTranslationTable._COMP)[::-1])
        return bytes(new_seq)


@dataclass(frozen=True, slots=True)
class Sequences:
    r"""Ragged SoA container of byte sequences: flat uint8 data + offsets/lengths."""

    ids: tuple[str, ...]
    seqs: npt.NDArray[np.uint8]
    offsets: npt.NDArray[np.int32]
    lengths: npt.NDArray[np.int32]

    def __len__(self) -> int:
        return len(self.ids)

    def to_dict(self) -> dict[str, Any]:
        return {
            "ids": self.ids,
            "seqs": self.seqs.tobytes().decode("ascii"),
            "offsets": self.offsets,
            "lengths": self.lengths,
        }

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> Sequences:
        return cls(
            ids=tuple(data["ids"]),
            seqs=np.frombuffer(data["seqs"].encode("ascii"), dtype=np.uint8),
            offsets=np.array(data["offsets"], dtype=np.int32),
            lengths=np.array(data["lengths"], dtype=np.int32),
        )

    def to_fasta(self, use_indices: bool = False) -> bytes:
        if not self.ids and not use_indices:
            return b""
        seq_bytes = self.seqs.tobytes()
        if use_indices:
            return b"".join(
                b">%d\n%b\n" % (i, seq_bytes[o : o + length_val])
                for i, (o, length_val) in enumerate(zip(self.offsets.tolist(), self.lengths.tolist()))
            )
        return b"".join(
            b">%b\n%b\n" % (i.encode(), seq_bytes[o : o + length_val])
            for i, o, length_val in zip(self.ids, self.offsets.tolist(), self.lengths.tolist())
        )

    @classmethod
    def empty(cls) -> Sequences:
        return cls((), np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int32), np.empty(0, dtype=np.int32))

    @classmethod
    def concat(cls, batches: Iterable[Self]) -> Sequences:
        batches_list = list(batches)
        if not batches_list:
            return cls.empty()
        all_ids = sum((b.ids for b in batches_list), ())
        all_seqs = np.concatenate([b.seqs for b in batches_list])
        all_lengths = np.concatenate([b.lengths for b in batches_list])
        return cls(all_ids, all_seqs, cumulative_offsets(all_lengths), all_lengths)

    @property
    def internal_stops(self) -> npt.NDArray[np.bool_]:
        r"""Per-sequence check for a ``*`` before the final character (ref ``seq.py:744-768``)."""
        n = len(self)
        out = np.zeros(n, dtype=np.bool_)
        if n == 0 or len(self.seqs) == 0:
            return out
        # Mask: stops anywhere except each sequence's last character.
        check_lengths = np.maximum(self.lengths - 1, 0)
        flat_idx, _, seg_lengths = ragged_gather_indices(self.offsets, check_lengths)
        if len(flat_idx) == 0:
            return out
        is_stop = self.seqs[flat_idx] == 42  # ord('*')
        seg_ids = np.repeat(np.arange(n), seg_lengths)
        np.logical_or.at(out, seg_ids[is_stop], True)
        return out

    def unique(self) -> Sequences:
        r"""Deduplicate by content hash, preserving first-occurrence order (ref ``seq.py:226-242``)."""
        if len(self) <= 1:
            return self
        hashes = _hash_sequences(self.seqs, self.offsets, self.lengths)
        _, unique_indices = np.unique(hashes, return_index=True)
        unique_indices.sort()
        return self[unique_indices]  # type: ignore[return-value]

    def __getitem__(self, item: int | slice | npt.NDArray[Any] | list[int]) -> SeqRecord | Sequences:
        if isinstance(item, (int, np.integer)):
            item_idx = int(item)
            if item_idx < 0:
                item_idx += len(self)
            if item_idx < 0 or item_idx >= len(self):
                raise IndexError("Batch index out of range")
            offset_val = self.offsets[item_idx]
            length_val = self.lengths[item_idx]
            return SeqRecord(self.ids[item_idx], self.seqs[offset_val : offset_val + length_val].tobytes())

        if isinstance(item, slice):
            indices = np.arange(len(self))[item]
        else:
            indices = np.asarray(item)
            if indices.dtype == bool:
                indices = np.nonzero(indices)[0]

        starts = np.zeros(len(indices), dtype=np.int32)
        ends = self.lengths[indices].astype(np.int32)
        strands = np.ones(len(indices), dtype=np.int8)
        return self.extract(
            indices.astype(np.int32), starts, ends, strands, new_ids=tuple(self.ids[i] for i in indices)
        )

    def __iter__(self) -> Generator[SeqRecord, None, None]:
        for i in range(len(self)):
            offset_val = self.offsets[i]
            length_val = self.lengths[i]
            yield SeqRecord(self.ids[i], self.seqs[offset_val : offset_val + length_val].tobytes())

    @classmethod
    def from_bytes(cls, seqs: list[bytes], ids: tuple[str, ...] | None = None) -> Sequences:
        ids = ids or tuple(str(i) for i in range(len(seqs)))
        return cls.from_records([SeqRecord(i, s) for i, s in zip(ids, seqs)])

    @classmethod
    def from_records(cls, records: list[SeqRecord]) -> Sequences:
        ids = tuple(r.id for r in records)
        seqs = [np.frombuffer(r.seq, dtype=np.uint8) for r in records]
        if not seqs:
            return cls.empty()
        out_seqs = np.concatenate(seqs, dtype=np.uint8)
        lengths = np.array([len(s) for s in seqs], dtype=np.int32)
        return cls(ids, out_seqs, cumulative_offsets(lengths), lengths)

    def extract(
        self,
        indices: npt.NDArray[np.int32],
        starts: npt.NDArray[np.int32],
        ends: npt.NDArray[np.int32],
        strands: npt.NDArray[np.int8],
        new_ids: tuple[str, ...] | None = None,
    ) -> Sequences:
        r"""Vectorised batched sub-sequence extraction with reverse-complementation.

        Equivalent to ``_extract_ragged_kernel`` (ref ``seq.py:612-668``), realised
        as one fancy-indexed gather: forward items gather ``parent_start + c``,
        reverse items gather ``parent_end-1-c`` and map through the complement LUT.
        """
        if len(indices) == 0:
            return self.empty()
        new_ids = new_ids or tuple(
            f"{self.ids[i]}_{x}_{y}_{z}" for i, x, y, z in zip(indices, starts, ends, strands)
        )
        parent_offsets = self.offsets[indices].astype(np.int64)
        out_lengths = (ends - starts).astype(np.int32)
        fwd = strands >= 0
        base = np.where(fwd, parent_offsets + starts, parent_offsets + ends.astype(np.int64) - 1)
        steps = np.where(fwd, 1, -1)
        flat_idx, out_offsets, out_lengths = ragged_gather_indices(base, out_lengths, steps)
        out_seqs = self.seqs[flat_idx]
        rev_mask = np.repeat(~fwd, out_lengths)
        if rev_mask.any():
            out_seqs = np.where(rev_mask, BacterialTranslationTable._COMP_MAP[out_seqs], out_seqs).astype(np.uint8)
        return Sequences(new_ids, out_seqs, out_offsets, out_lengths)

    def extract_intervals(
        self,
        indices: npt.NDArray[np.integer],
        intervals: Intervals,
        new_ids: tuple[str, ...] | None = None,
    ) -> Sequences:
        return self.extract(
            indices.astype(np.int32),
            intervals.starts.astype(np.int32),
            intervals.ends.astype(np.int32),
            intervals.strands,
            new_ids=new_ids,
        )

    def translate(self, frames: npt.NDArray[np.integer] | None = None, to_stop: bool = False) -> Sequences:
        r"""Vectorised NCBI table-11 translation of the whole ragged batch.

        Equivalent to ``_translate_ragged_kernel`` (ref ``seq.py:671-741``):
        per-sequence frame offsets, codon index ``c1*25+c2*5+c3`` into the
        125-entry LUT, optional truncation at the first stop codon.
        """
        n = len(self)
        if n == 0:
            return self.empty()
        if frames is None:
            frames = np.zeros(n, dtype=np.int8)
        frames = np.asarray(frames, dtype=np.int64)
        adj_len = np.maximum(self.lengths.astype(np.int64) - frames, 0)
        max_codons = (adj_len // 3).astype(np.int32)

        codon_starts = self.offsets.astype(np.int64) + frames
        flat_idx, cod_offsets, cod_lengths = ragged_gather_indices(codon_starts, max_codons, np.full(n, 3))
        cm = BacterialTranslationTable._CHAR_MAP
        c1 = cm[self.seqs[flat_idx]].astype(np.int32)
        c2 = cm[self.seqs[flat_idx + 1]].astype(np.int32)
        c3 = cm[self.seqs[flat_idx + 2]].astype(np.int32)
        aa = BacterialTranslationTable._CODON_MAP[c1 * 25 + c2 * 5 + c3]

        if to_stop:
            seg_ids = np.repeat(np.arange(n), cod_lengths)
            within = np.arange(len(aa), dtype=np.int64) - np.repeat(cod_offsets.astype(np.int64), cod_lengths)
            first_stop = max_codons.astype(np.int64).copy()
            is_stop = aa == 42
            np.minimum.at(first_stop, seg_ids[is_stop], within[is_stop])
            keep = within < first_stop[seg_ids]
            out_data = aa[keep]
            out_lengths = first_stop.astype(np.int32)
            out_offsets = cumulative_offsets(out_lengths)
        else:
            out_data = aa
            out_lengths = cod_lengths
            out_offsets = cod_offsets
        return Sequences(self.ids, out_data, out_offsets, out_lengths)


class BacterialTranslationTable:
    r"""NCBI Translation Table 11 LUTs (identical construction to ref ``seq.py:411-538``)."""

    _MAPPING = {
        b"TTT": b"F", b"TTC": b"F", b"TTA": b"L", b"TTG": b"L",
        b"TCT": b"S", b"TCC": b"S", b"TCA": b"S", b"TCG": b"S",
        b"TAT": b"Y", b"TAC": b"Y", b"TAA": b"*", b"TAG": b"*",
        b"TGT": b"C", b"TGC": b"C", b"TGA": b"*", b"TGG": b"W",
        b"CTT": b"L", b"CTC": b"L", b"CTA": b"L", b"CTG": b"L",
        b"CCT": b"P", b"CCC": b"P", b"CCA": b"P", b"CCG": b"P",
        b"CAT": b"H", b"CAC": b"H", b"CAA": b"Q", b"CAG": b"Q",
        b"CGT": b"R", b"CGC": b"R", b"CGA": b"R", b"CGG": b"R",
        b"ATT": b"I", b"ATC": b"I", b"ATA": b"I", b"ATG": b"M",
        b"ACT": b"T", b"ACC": b"T", b"ACA": b"T", b"ACG": b"T",
        b"AAT": b"N", b"AAC": b"N", b"AAA": b"K", b"AAG": b"K",
        b"AGT": b"S", b"AGC": b"S", b"AGA": b"R", b"AGG": b"R",
        b"GTT": b"V", b"GTC": b"V", b"GTA": b"V", b"GTG": b"V",
        b"GCT": b"A", b"GCC": b"A", b"GCA": b"A", b"GCG": b"A",
        b"GAT": b"D", b"GAC": b"D", b"GAA": b"E", b"GAG": b"E",
        b"GGT": b"G", b"GGC": b"G", b"GGA": b"G", b"GGG": b"G",
    }
    _START_CODONS = {b"TTG", b"CTG", b"ATT", b"ATC", b"ATA", b"ATG", b"GTG"}
    _STOP_CODONS = {b"TAA", b"TAG", b"TGA"}
    _COMP = bytes.maketrans(b"ACGTUacgtu", b"TGCAAtgcaa")
    _CHAR_MAP = np.full(256, 4, dtype=np.uint8)
    for _i, _c in enumerate(b"ACGT"):
        _CHAR_MAP[_c] = _i
        _CHAR_MAP[_c + 32] = _i
    _CHAR_MAP[b"U"[0]] = 3
    _CHAR_MAP[b"u"[0]] = 3
    _CHAR_MAP.flags.writeable = False
    _CODON_MAP = np.full(125, 88, dtype=np.uint8)  # 88 = ord('X')
    for _codon, _aa in _MAPPING.items():
        _idx = _CHAR_MAP[_codon[0]] * 25 + _CHAR_MAP[_codon[1]] * 5 + _CHAR_MAP[_codon[2]]
        _CODON_MAP[_idx] = _aa[0]
    _CODON_MAP.flags.writeable = False
    _COMP_MAP = np.arange(256, dtype=np.uint8)
    for _c, _comp in zip(b"ACGTUacgtu", b"TGCAAtgcaa"):
        _COMP_MAP[_c] = _comp
    _COMP_MAP.flags.writeable = False

    @classmethod
    def translate(
        cls, seq: bytes | bytearray | memoryview | npt.NDArray[np.uint8], to_stop: bool = False
    ) -> npt.NDArray[np.uint8]:
        r"""Translate one flat nucleotide array to amino-acid bytes (ref ``seq.py:505-524``)."""
        if len(seq) < 3:
            return np.array([], dtype=np.uint8)
        if not isinstance(seq, np.ndarray):
            seq = np.ascontiguousarray(np.frombuffer(seq, np.uint8))
        n_codons = len(seq) // 3
        codons = seq[: n_codons * 3].reshape(n_codons, 3)
        idx = (
            cls._CHAR_MAP[codons[:, 0]].astype(np.int32) * 25
            + cls._CHAR_MAP[codons[:, 1]].astype(np.int32) * 5
            + cls._CHAR_MAP[codons[:, 2]].astype(np.int32)
        )
        aa = cls._CODON_MAP[idx]
        if to_stop:
            stops = np.nonzero(aa == 42)[0]
            if len(stops):
                aa = aa[: stops[0]]
        return aa

    @classmethod
    def is_coding(cls, seq: bytes) -> bool:
        if len(seq) < 3:
            return False
        return seq[:3] in cls._START_CODONS and seq[-3:] in cls._STOP_CODONS


def _hash_sequences(
    seqs: npt.NDArray[np.uint8], offsets: npt.NDArray[np.int32], lengths: npt.NDArray[np.int32]
) -> npt.NDArray[np.uint64]:
    r"""Content hash per ragged sequence (dedup key; ref FNV-1a kernel ``seq.py:542-567``).

    Implemented as a vectorised polynomial rolling hash over segment boundaries
    (Horner evaluation via per-segment reduction).  Exact hash values differ from
    the reference's FNV-1a — only equality semantics matter for ``unique()``.
    """
    n = len(offsets)
    out = np.full(n, np.uint64(1469598103934665603), dtype=np.uint64)
    if n == 0:
        return out
    # Horner scheme: h = h*P + byte, evaluated with cumulative products per segment.
    # For robust vectorisation use position-weighted sums: h_i = sum_j byte_j * P^(L_i-1-j) mod 2^64.
    flat_idx, seg_offsets, seg_lengths = ragged_gather_indices(offsets, lengths)
    if len(flat_idx) == 0:
        return out
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash semantics
        P = np.uint64(1099511628211)
        maxlen = int(seg_lengths.max())
        powers = np.empty(maxlen, dtype=np.uint64)
        if maxlen > 0:
            powers[0] = np.uint64(1)
            for i in range(1, maxlen):  # tiny loop over max length, not per element
                powers[i] = powers[i - 1] * P
        within = np.arange(len(flat_idx), dtype=np.int64) - np.repeat(seg_offsets.astype(np.int64), seg_lengths)
        exp = np.repeat(seg_lengths.astype(np.int64) - 1, seg_lengths) - within
        weighted = seqs[flat_idx].astype(np.uint64) * powers[exp]
        seg_ids = np.repeat(np.arange(n), seg_lengths)
        sums = np.zeros(n, dtype=np.uint64)
        np.add.at(sums, seg_ids, weighted)
        # Mix in the length to reduce collisions (mirrors ref :565-566 intent).
        return (sums ^ lengths.astype(np.uint64)) * P
