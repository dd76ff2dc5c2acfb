r"""Protocol contracts for Structure-of-Arrays (SoA) batched containers.

Capability parity with ``/root/reference/src/kaptive/core/collections.py:20-92``:
``BatchedContainer`` (len/getitem/empty/concat) and ``RaggedArrayContainer``
(adds ``offsets``/``lengths``).  These protocols govern every host-side SoA
container in kaptive-tpu; the device side exchanges only the flat arrays.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any, Protocol, Self, TypeVar

import numpy as np
import numpy.typing as npt

T = TypeVar("T", covariant=True)
S = TypeVar("S", bound="BatchedContainer[Any, Any]")


class BatchedContainer(Protocol[T, S]):
    r"""Contract for SoA batched containers: ``len``, indexing, ``empty``, ``concat``."""

    def __len__(self) -> int: ...

    def __getitem__(self, item: int | slice | npt.NDArray[Any] | list[Any]) -> T | S: ...

    @classmethod
    def empty(cls) -> Self: ...

    @classmethod
    def concat(cls, batches: Iterable[Self]) -> Self: ...


class RaggedArrayContainer(BatchedContainer[T, S], Protocol[T, S]):
    r"""Contract for ragged SoA containers storing variable-length data in flat arrays."""

    offsets: npt.NDArray[np.int32]
    lengths: npt.NDArray[np.int32]


def cumulative_offsets(lengths: npt.NDArray[np.integer]) -> npt.NDArray[np.int32]:
    r"""Exclusive prefix sum of ``lengths`` as int32 offsets into a flat array."""
    offsets = np.zeros(len(lengths), dtype=np.int32)
    if len(lengths) > 1:
        np.cumsum(lengths[:-1], out=offsets[1:])
    return offsets


def ragged_gather_indices(
    starts: npt.NDArray[np.integer],
    lengths: npt.NDArray[np.integer],
    steps: npt.NDArray[np.integer] | None = None,
) -> tuple[npt.NDArray[np.int64], npt.NDArray[np.int32], npt.NDArray[np.int32]]:
    r"""Build flat gather indices for ragged extraction without per-item Python loops.

    For item ``i`` the produced indices are ``starts[i] + step_i * (0..lengths[i]-1)``.
    Replaces the per-element loops of the reference's Numba ragged kernels
    (``/root/reference/src/kaptive/core/seq.py:612-668``) with one vectorised gather.

    Returns:
        (flat_indices, out_offsets, out_lengths)
    """
    out_lengths = np.asarray(lengths, dtype=np.int32)
    out_offsets = cumulative_offsets(out_lengths)
    total = int(out_lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), out_offsets, out_lengths
    within = np.arange(total, dtype=np.int64) - np.repeat(
        out_offsets.astype(np.int64), out_lengths
    )
    base = np.repeat(np.asarray(starts, dtype=np.int64), out_lengths)
    if steps is None:
        return base + within, out_offsets, out_lengths
    step = np.repeat(np.asarray(steps, dtype=np.int64), out_lengths)
    return base + step * within, out_offsets, out_lengths


def group_leaders(
    group_keys: npt.NDArray[np.integer],
    rank_columns: tuple[npt.NDArray[Any], ...],
) -> npt.NDArray[np.int64]:
    r"""Row index of the single top-ranked row per distinct group key.

    Rows sharing a group key are ranked by ``rank_columns`` in order (larger
    wins); any remaining tie goes to the earliest row.  Returns leader row
    indices ordered by ascending group key.  Callers must pass signed/float
    rank columns (unsigned dtypes would wrap under negation).
    """
    n = len(group_keys)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    sort_keys = tuple(-np.asarray(c) for c in reversed(rank_columns)) + (group_keys,)
    ranked = np.lexsort(sort_keys)
    at_front = np.ones(n, dtype=bool)
    at_front[1:] = group_keys[ranked][1:] != group_keys[ranked][:-1]
    return ranked[at_front].astype(np.int64)
