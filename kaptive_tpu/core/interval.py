r"""Genomic intervals, strand orientation, and vectorised SoA interval operations.

Capability parity with ``/root/reference/src/kaptive/core/interval.py``:
``Strand`` (:25-69), ``Interval`` (:75-262), ``Intervals`` (:268-591) including
``cull_overlaps`` (:435), ``cluster_spatial`` (:471), ``cluster_sequential``
(:495), ``arrange`` (:529) and ``shift`` (:412).

Design: the reference backs these with sequential Numba kernels
(``_cluster_kernel`` :595, ``_cluster_by_index_kernel`` :642,
``_cull_overlaps_kernel`` :698).  Here both clustering kernels are re-derived as
pure vectorised prefix operations (sort + segment-wise cumulative max + cumsum of
breaks), which are mathematically equivalent to the reference's sequential
single-linkage sweeps, while greedy overlap culling keeps the reference's exact
order semantics with a vectorised inner comparison.  These run on host: interval
counts in the typing pipeline are tiny (hundreds), far below device-dispatch
breakeven; the O(N) contig-scale work stays on TPU in :mod:`kaptive_tpu.ops`.
"""

from __future__ import annotations

from collections.abc import Iterable
from dataclasses import dataclass
from enum import IntEnum
from re import Match
from typing import Any

import numpy as np
import numpy.typing as npt

from kaptive_tpu.core.collections import SoAContainer, soa


class Strand(IntEnum):
    r"""Integer strand orientation with coercion from ``'+'``/``'-'``/``'1'``/``'-1'``."""

    FORWARD = 1
    REVERSE = -1
    UNSTRANDED = 0

    @classmethod
    def _missing_(cls, value: object) -> Strand:
        if isinstance(value, bytes):
            value = value.decode("ascii")
        if isinstance(value, str):
            if value in ("+", "1", "+1"):
                return Strand.FORWARD
            if value in ("-", "-1"):
                return Strand.REVERSE
        return Strand.UNSTRANDED

    def __str__(self) -> str:
        return {Strand.FORWARD: "+", Strand.REVERSE: "-"}.get(self, ".")


@dataclass(frozen=True, slots=True)
class Interval:
    r"""A single 0-based half-open genomic interval with strand orientation."""

    start: int
    end: int
    strand: Strand = Strand.UNSTRANDED

    def __len__(self) -> int:
        return self.end - self.start

    def __contains__(self, item: IntervalLike) -> bool:
        if isinstance(item, int):
            return self.start <= item < self.end
        other = Interval.from_item(item)
        return self.start <= other.start and other.end <= self.end

    def __add__(self, other: IntervalLike) -> Interval:
        other_obj = Interval.from_item(other)
        new_strand = self.strand if self.strand == other_obj.strand else Strand.UNSTRANDED
        return Interval(min(self.start, other_obj.start), max(self.end, other_obj.end), new_strand)

    def __radd__(self, other: IntervalLike) -> Interval:
        return self.__add__(other)

    def shift(self, x: int, y: int | None = None) -> Interval:
        return Interval(self.start + x, self.end + (y if y is not None else x), self.strand)

    def expand(self, left: int, right: int, clip_length: int | None = None) -> Interval:
        new_start = max(0, self.start - left)
        new_end = self.end + right
        if clip_length is not None:
            new_end = min(new_end, clip_length)
        return Interval(new_start, new_end, self.strand)

    def reverse_complement(self, length: int | None = None) -> Interval:
        if length is None:
            length = self.end
        return Interval(length - self.end, length - self.start, Strand(self.strand * -1))

    @classmethod
    def from_match(cls, item: Match, strand: Strand = Strand.UNSTRANDED) -> Interval:
        return cls(item.start(), item.end(), strand)

    @classmethod
    def from_int(cls, item: int, strand: Strand = Strand.UNSTRANDED, length: int | None = None) -> Interval:
        pos = item + length if (item < 0 and length is not None) else item
        return cls(pos, pos + 1, strand)

    @classmethod
    def from_slice(cls, item: slice, strand: Strand = Strand.UNSTRANDED, length: int | None = None) -> Interval:
        start = 0 if item.start is None else item.start
        stop = length if item.stop is None else item.stop
        if stop is None:
            raise ValueError("Cannot create Interval from slice with None stop without 'length'")
        if item.step == -1:  # reversed slice: flip to forward half-open bounds
            start, stop = stop + 1, start + 1
        return cls(start, stop, strand)

    # Coercion dispatch for interval-like inputs (scalar Interval wins, then
    # anything exposing .interval, then the per-type constructors).
    @classmethod
    def from_item(cls, item: IntervalLike, strand: Strand = Strand.UNSTRANDED, length: int | None = None) -> Interval:
        if isinstance(item, cls):
            return item
        if (interval := getattr(item, "interval", None)) is not None:
            return interval
        for kind, build in (
            (Match, lambda: cls.from_match(item, strand)),
            (int, lambda: cls.from_int(item, strand, length)),
            (slice, lambda: cls.from_slice(item, strand, length)),
        ):
            if isinstance(item, kind):
                return build()
        raise TypeError(item)


IntervalLike = slice | int | Match | Interval


def _segmentwise_shifted_cummax(values: npt.NDArray[np.int64], segment_starts: npt.NDArray[np.bool_]) -> npt.NDArray[np.int64]:
    r"""Running max of ``values`` within segments, shifted right by one position.

    ``segment_starts[i]`` marks the first element of each segment; the output at a
    segment's first position is undefined (returned as the value itself).  Computed
    without loops via the offset trick: add ``segment_rank * OFFSET`` (OFFSET larger
    than the value range), globally accumulate max, then subtract.
    """
    n = len(values)
    if n == 0:
        return values
    seg_rank = np.cumsum(segment_starts.astype(np.int64)) - 1
    vmin, vmax = int(values.min()), int(values.max())
    offset = np.int64(vmax - vmin + 1)
    keyed = values + seg_rank * offset
    cm = np.maximum.accumulate(keyed) - seg_rank * offset
    shifted = np.empty_like(cm)
    shifted[0] = values[0]
    shifted[1:] = cm[:-1]
    return shifted


@dataclass(frozen=True, slots=True)
class Intervals(SoAContainer):
    r"""Vectorised SoA collection of genomic intervals (starts/ends/strands + tracking indices).

    Batch protocol derived by :class:`~kaptive_tpu.core.collections.SoAContainer`;
    integer indexing yields a scalar :class:`Interval` view.
    """

    starts: npt.NDArray[np.int32] = soa(np.int32)
    ends: npt.NDArray[np.int32] = soa(np.int32)
    strands: npt.NDArray[np.int8] = soa(np.int8)
    original_indices: npt.NDArray[np.int32] = soa(np.int32, default=None)

    def __post_init__(self) -> None:
        if self.original_indices is None:
            object.__setattr__(self, "original_indices", np.arange(len(self.starts), dtype=np.int32))

    @classmethod
    def from_intervals(cls, intervals: Iterable[Interval]) -> Intervals:
        data = [(i.start, i.end, i.strand) for i in intervals]
        if not data:
            return cls.empty()
        start_vals, end_vals, strand_vals = zip(*data, strict=False)
        return cls(
            np.array(start_vals, dtype=np.int32),
            np.array(end_vals, dtype=np.int32),
            np.array(strand_vals, dtype=np.int8),
        )

    def to_dict(self) -> dict[str, list]:
        return {"starts": self.starts.tolist(), "ends": self.ends.tolist(), "strands": self.strands.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> Intervals:
        return cls(
            np.array(d["starts"], dtype=np.int32),
            np.array(d["ends"], dtype=np.int32),
            np.array(d["strands"], dtype=np.int8),
        )

    def __getitem__(self, item: Any) -> Interval | Intervals:
        if isinstance(item, (int, np.integer)):
            if item < 0:
                item += len(self)
            if item < 0 or item >= len(self):
                raise IndexError("Batch index out of range")
            return Interval(self.starts[item], self.ends[item], self.strands[item])
        # Explicit base call: slots=True dataclasses break zero-arg super().
        return SoAContainer.__getitem__(self, item)

    def shift(self, x: int | npt.NDArray[np.int32], y: int | npt.NDArray[np.int32] | None = None) -> Intervals:
        if len(self) == 0:
            return self
        new_starts = self.starts + x
        new_ends = self.ends + (y if y is not None else x)
        return Intervals(
            np.asarray(new_starts, dtype=np.int32),
            np.asarray(new_ends, dtype=np.int32),
            self.strands,
            self.original_indices,
        )

    def cull_overlaps(
        self,
        order: npt.NDArray[np.int32],
        max_overlap_fraction: float = 0.1,
        group_by: npt.NDArray[np.integer] | None = None,
        secondary_group_by: npt.NDArray[np.integer] | None = None,
    ) -> npt.NDArray[np.bool_]:
        r"""Greedy overlap culling with the reference's exact order semantics.

        Mirrors ``_cull_overlaps_kernel`` (``interval.py:698-751``): items are
        considered in ``order``; an item is kept unless it overlaps a previously
        kept item in the same (group, secondary group) by more than
        ``max_overlap_fraction`` of the shorter interval.  The sequential greedy
        structure is preserved (required for bit-identical results); the inner
        comparison against kept items is vectorised.
        """
        n = len(self)
        if n == 0:
            return np.empty(0, dtype=np.bool_)
        g1 = np.zeros(n, dtype=np.int64) if group_by is None else np.asarray(group_by, dtype=np.int64)
        g2 = np.zeros(n, dtype=np.int64) if secondary_group_by is None else np.asarray(secondary_group_by, dtype=np.int64)
        starts = self.starts.astype(np.int64)
        ends = self.ends.astype(np.int64)
        lengths = ends - starts

        kept_mask = np.zeros(n, dtype=np.bool_)
        # Kept-so-far arrays, appended per acceptance (amortised O(kept) per item).
        kept_idx: list[int] = []
        kept_s = np.empty(n, dtype=np.int64)
        kept_e = np.empty(n, dtype=np.int64)
        kept_g = np.empty(n, dtype=np.int64)  # combined group key
        # Combine groups into a single key for one comparison.
        gmax = int(g2.max()) + 1 if n else 1
        gkey = g1 * gmax + g2
        nk = 0
        for idx in order:
            s, e, length = starts[idx], ends[idx], lengths[idx]
            if length <= 0:
                continue
            if nk:
                same = kept_g[:nk] == gkey[idx]
                if same.any():
                    ks = kept_s[:nk][same]
                    ke = kept_e[:nk][same]
                    overlap = np.minimum(e, ke) - np.maximum(s, ks)
                    min_len = np.minimum(length, ke - ks)
                    if np.any((overlap > 0) & (overlap > max_overlap_fraction * min_len)):
                        continue
            kept_mask[idx] = True
            kept_s[nk], kept_e[nk], kept_g[nk] = s, e, gkey[idx]
            kept_idx.append(int(idx))
            nk += 1
        return kept_mask

    def cluster_spatial(
        self, tolerance: int = 0, group_by: npt.NDArray[np.integer] | None = None
    ) -> npt.NDArray[np.int32]:
        r"""1-D single-linkage spatial clustering, vectorised.

        Equivalent to the reference's sequential sweep (``interval.py:595-639``):
        sort by (group, start, end); a new cluster starts where the group changes
        or the start exceeds the running maximum end (within the group) plus
        ``tolerance``.  Because starts are sorted, the within-group running max is
        a valid substitute for the within-cluster running max (once an item
        breaks past the global max, all later starts do too).
        """
        n = len(self)
        if n == 0:
            return np.empty(0, dtype=np.int32)
        groups = np.zeros(n, dtype=np.int64) if group_by is None else np.asarray(group_by, dtype=np.int64)
        order = np.lexsort((self.ends, self.starts, groups))
        s_sorted = self.starts[order].astype(np.int64)
        e_sorted = self.ends[order].astype(np.int64)
        g_sorted = groups[order]

        new_group = np.empty(n, dtype=np.bool_)
        new_group[0] = True
        new_group[1:] = g_sorted[1:] != g_sorted[:-1]
        prev_max_end = _segmentwise_shifted_cummax(e_sorted, new_group)
        breaks = new_group | (s_sorted > prev_max_end + tolerance)
        ids_sorted = np.cumsum(breaks.astype(np.int32)) - 1
        cluster_ids = np.empty(n, dtype=np.int32)
        cluster_ids[order] = ids_sorted
        return cluster_ids

    def cluster_sequential(
        self,
        tolerance: int = 0,
        group_by: npt.NDArray[np.integer] | None = None,
        enforce_strand: bool = False,
    ) -> npt.NDArray[np.int32]:
        r"""Index-based sequential clustering, vectorised (ref ``interval.py:495-527``)."""
        n = len(self)
        if n == 0:
            return np.empty(0, dtype=np.int32)
        groups = np.zeros(n, dtype=np.int64) if group_by is None else np.asarray(group_by, dtype=np.int64)
        indices = (
            self.original_indices.astype(np.int64)
            if self.original_indices is not None
            else np.zeros(n, dtype=np.int64)
        )
        if enforce_strand:
            order = np.lexsort((indices, self.strands, groups))
        else:
            order = np.lexsort((indices, groups))
        i_sorted = indices[order]
        g_sorted = groups[order]
        new_group = np.empty(n, dtype=np.bool_)
        new_group[0] = True
        new_group[1:] = g_sorted[1:] != g_sorted[:-1]
        if enforce_strand:
            st_sorted = self.strands[order]
            new_group[1:] |= st_sorted[1:] != st_sorted[:-1]
        prev_max_idx = _segmentwise_shifted_cummax(i_sorted, new_group)
        breaks = new_group | (np.abs(i_sorted - prev_max_idx) > tolerance + 1)
        ids_sorted = np.cumsum(breaks.astype(np.int32)) - 1
        cluster_ids = np.empty(n, dtype=np.int32)
        cluster_ids[order] = ids_sorted
        return cluster_ids

    def arrange(
        self,
        indices: npt.NDArray[np.integer],
        order: npt.NDArray[np.integer],
        starts: npt.NDArray[np.int32],
        ends: npt.NDArray[np.int32],
        strands: npt.NDArray[np.int8],
        gap: int = 500,
    ) -> Intervals:
        r"""Lay out intervals across disjoint contig pieces into one 1-D plot space (ref ``interval.py:529-591``)."""
        if len(self) == 0:
            return self
        n_pieces = len(starts)
        piece_plot_starts = np.zeros(n_pieces, dtype=np.int32)
        current_x = 0
        for i in order:
            p_len = ends[i] - starts[i]
            piece_plot_starts[i] = current_x
            current_x += p_len + gap

        idx = np.asarray(indices, dtype=np.int64)
        valid = (idx >= 0) & (idx < n_pieces)
        safe_idx = np.where(valid, idx, 0)
        p_s = starts[safe_idx].astype(np.int64)
        p_e = ends[safe_idx].astype(np.int64)
        orient = strands[safe_idx].astype(np.int64)
        offset = piece_plot_starts[safe_idx].astype(np.int64)
        fwd = orient >= 0
        new_starts = np.where(valid, np.where(fwd, offset + (self.starts - p_s), offset + (p_e - self.ends)), 0)
        new_ends = np.where(valid, np.where(fwd, offset + (self.ends - p_s), offset + (p_e - self.starts)), 0)
        new_strands = np.where(valid, np.where(fwd, self.strands, -self.strands), 0).astype(np.int8)
        return Intervals(
            new_starts.astype(np.int32), new_ends.astype(np.int32), new_strands, self.original_indices
        )
