r"""Pairwise protein/nucleotide alignment containers and the batched banded aligner.

Capability parity with ``/root/reference/src/kaptive/core/pairwise.py``:
``PairwiseAlignment`` (:35-73, ``pident`` :63), ``PairwiseAlignments`` SoA
(:76-236), ``PairwiseAligner`` (:239-339: defaults gap_open=11 gap_extend=1
band k=20 :251-253, unseeded band ``max(k, |len1-len2|+1)`` :452, seeded band
``k`` with seed diagonal offset :449-451), and the 256x256 BLOSUM62 matrix
(:343-391; standard public matrix values).

The DP itself runs on device via :func:`kaptive_tpu.ops.swg.banded_swg` — see
that module for the TPU formulation.  Pairs are bucketed by (query length,
target length, band width) into power-of-two shapes so each bucket compiles
once and stays cached.
"""

from __future__ import annotations

from collections.abc import Iterable
from dataclasses import dataclass
from functools import cache
from typing import Any, Self

import numpy as np
import numpy.typing as npt

from kaptive_tpu.core.seq import Sequences


@dataclass(frozen=True, slots=True)
class PairwiseAlignment:
    r"""Summary statistics and coordinates for one pairwise alignment."""

    score: int
    matches: int
    mismatches: int
    gaps: int
    q_start: int
    q_end: int
    t_start: int
    t_end: int

    @property
    def pident(self) -> float:
        total = self.matches + self.mismatches + self.gaps
        return (self.matches / total) * 100.0 if total > 0 else 0.0


@dataclass(frozen=True, slots=True)
class PairwiseAlignments:
    r"""SoA batch of pairwise alignment results."""

    scores: npt.NDArray[np.int32]
    matches: npt.NDArray[np.int32]
    mismatches: npt.NDArray[np.int32]
    gaps: npt.NDArray[np.int32]
    q_starts: npt.NDArray[np.int32]
    q_ends: npt.NDArray[np.int32]
    t_starts: npt.NDArray[np.int32]
    t_ends: npt.NDArray[np.int32]

    def __len__(self) -> int:
        return len(self.scores)

    def to_dict(self) -> dict[str, npt.NDArray[np.int32]]:
        return {
            "scores": self.scores,
            "matches": self.matches,
            "mismatches": self.mismatches,
            "gaps": self.gaps,
            "q_starts": self.q_starts,
            "q_ends": self.q_ends,
            "t_starts": self.t_starts,
            "t_ends": self.t_ends,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> PairwiseAlignments:
        return cls(
            np.array(d["scores"], dtype=np.int32),
            np.array(d["matches"], dtype=np.int32),
            np.array(d["mismatches"], dtype=np.int32),
            np.array(d["gaps"], dtype=np.int32),
            np.array(d["q_starts"], dtype=np.int32),
            np.array(d["q_ends"], dtype=np.int32),
            np.array(d["t_starts"], dtype=np.int32),
            np.array(d["t_ends"], dtype=np.int32),
        )

    def __getitem__(self, item: Any) -> PairwiseAlignment | PairwiseAlignments:
        if isinstance(item, (int, np.integer)):
            if item < 0:
                item += len(self)
            if item < 0 or item >= len(self):
                raise IndexError("Batch index out of range")
            return PairwiseAlignment(
                score=int(self.scores[item]),
                matches=int(self.matches[item]),
                mismatches=int(self.mismatches[item]),
                gaps=int(self.gaps[item]),
                q_start=int(self.q_starts[item]),
                q_end=int(self.q_ends[item]),
                t_start=int(self.t_starts[item]),
                t_end=int(self.t_ends[item]),
            )
        return PairwiseAlignments(
            scores=self.scores[item],
            matches=self.matches[item],
            mismatches=self.mismatches[item],
            gaps=self.gaps[item],
            q_starts=self.q_starts[item],
            q_ends=self.q_ends[item],
            t_starts=self.t_starts[item],
            t_ends=self.t_ends[item],
        )

    @classmethod
    def empty(cls) -> PairwiseAlignments:
        z = np.empty(0, dtype=np.int32)
        return cls(z.copy(), z.copy(), z.copy(), z.copy(), z.copy(), z.copy(), z.copy(), z.copy())

    @classmethod
    def concat(cls, batches: Iterable[Self]) -> Self:
        batches_list = list(batches)
        if not batches_list:
            return cls.empty()  # type: ignore[return-value]
        return cls(
            scores=np.concatenate([b.scores for b in batches_list]),
            matches=np.concatenate([b.matches for b in batches_list]),
            mismatches=np.concatenate([b.mismatches for b in batches_list]),
            gaps=np.concatenate([b.gaps for b in batches_list]),
            q_starts=np.concatenate([b.q_starts for b in batches_list]),
            q_ends=np.concatenate([b.q_ends for b in batches_list]),
            t_starts=np.concatenate([b.t_starts for b in batches_list]),
            t_ends=np.concatenate([b.t_ends for b in batches_list]),
        )

    @property
    def pidents(self) -> npt.NDArray[np.float64]:
        total = self.matches + self.mismatches + self.gaps
        return np.divide(self.matches * 100.0, total, out=np.zeros(len(self), dtype=np.float64), where=total > 0)


@cache
def blosum62_matrix(fill_value: int = -128) -> npt.NDArray[np.int8]:
    r"""256x256 byte-indexed BLOSUM62 substitution matrix (standard public values)."""
    # Standard BLOSUM62 over the NCBI alphabet ARNDCQEGHILKMFPSTWYVBJZX* .
    blosum62 = np.array(
        [
            [4, -1, -2, -2, 0, -1, -1, 0, -2, -1, -1, -1, -1, -2, -1, 1, 0, -3, -2, 0, -2, -1, -1, -1, -4],
            [-1, 5, 0, -2, -3, 1, 0, -2, 0, -3, -2, 2, -1, -3, -2, -1, -1, -3, -2, -3, -1, -2, 0, -1, -4],
            [-2, 0, 6, 1, -3, 0, 0, 0, 1, -3, -3, 0, -2, -3, -2, 1, 0, -4, -2, -3, 4, -3, 0, -1, -4],
            [-2, -2, 1, 6, -3, 0, 2, -1, -1, -3, -4, -1, -3, -3, -1, 0, -1, -4, -3, -3, 4, -3, 1, -1, -4],
            [0, -3, -3, -3, 9, -3, -4, -3, -3, -1, -1, -3, -1, -2, -3, -1, -1, -2, -2, -1, -3, -1, -3, -1, -4],
            [-1, 1, 0, 0, -3, 5, 2, -2, 0, -3, -2, 1, 0, -3, -1, 0, -1, -2, -1, -2, 0, -2, 4, -1, -4],
            [-1, 0, 0, 2, -4, 2, 5, -2, 0, -3, -3, 1, -2, -3, -1, 0, -1, -3, -2, -2, 1, -3, 4, -1, -4],
            [0, -2, 0, -1, -3, -2, -2, 6, -2, -4, -4, -2, -3, -3, -2, 0, -2, -2, -3, -3, -1, -4, -2, -1, -4],
            [-2, 0, 1, -1, -3, 0, 0, -2, 8, -3, -3, -1, -2, -1, -2, -1, -2, -2, 2, -3, 0, -3, 0, -1, -4],
            [-1, -3, -3, -3, -1, -3, -3, -4, -3, 4, 2, -3, 1, 0, -3, -2, -1, -3, -1, 3, -3, 3, -3, -1, -4],
            [-1, -2, -3, -4, -1, -2, -3, -4, -3, 2, 4, -2, 2, 0, -3, -2, -1, -2, -1, 1, -4, 3, -3, -1, -4],
            [-1, 2, 0, -1, -3, 1, 1, -2, -1, -3, -2, 5, -1, -3, -1, 0, -1, -3, -2, -2, 0, -3, 1, -1, -4],
            [-1, -1, -2, -3, -1, 0, -2, -3, -2, 1, 2, -1, 5, 0, -2, -1, -1, -1, -1, 1, -3, 2, -1, -1, -4],
            [-2, -3, -3, -3, -2, -3, -3, -3, -1, 0, 0, -3, 0, 6, -4, -2, -2, 1, 3, -1, -3, 0, -3, -1, -4],
            [-1, -2, -2, -1, -3, -1, -1, -2, -2, -3, -3, -1, -2, -4, 7, -1, -1, -4, -3, -2, -2, -3, -1, -1, -4],
            [1, -1, 1, 0, -1, 0, 0, 0, -1, -2, -2, 0, -1, -2, -1, 4, 1, -3, -2, -2, 0, -2, 0, -1, -4],
            [0, -1, 0, -1, -1, -1, -1, -2, -2, -1, -1, -1, -1, -2, -1, 1, 5, -2, -2, 0, -1, -1, -1, -1, -4],
            [-3, -3, -4, -4, -2, -2, -3, -2, -2, -3, -2, -3, -1, 1, -4, -3, -2, 11, 2, -3, -4, -2, -2, -1, -4],
            [-2, -2, -2, -3, -2, -1, -2, -3, 2, -1, -1, -2, -1, 3, -3, -2, -2, 2, 7, -1, -3, -1, -2, -1, -4],
            [0, -3, -3, -3, -1, -2, -2, -3, -3, 3, 1, -2, 1, -1, -2, -2, 0, -3, -1, 4, -3, 2, -2, -1, -4],
            [-2, -1, 4, 4, -3, 0, 1, -1, 0, -3, -4, 0, -3, -3, -2, 0, -1, -4, -3, -3, 4, -3, 0, -1, -4],
            [-1, -2, -3, -3, -1, -2, -3, -4, -3, 3, 3, -3, 2, 0, -3, -2, -1, -2, -1, 2, -3, 3, -3, -1, -4],
            [-1, 0, 0, 1, -3, 4, 4, -2, 0, -3, -3, 1, -1, -3, -1, 0, -1, -2, -2, -2, 0, -3, 4, -1, -4],
            [-1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -4],
            [-4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, 1],
        ],
        dtype=np.int8,
    )
    alphabet = list(b"ARNDCQEGHILKMFPSTWYVBJZX*")
    score_matrix = np.full((256, 256), fill_value, dtype=np.int8)
    for a, i in enumerate(alphabet):
        for b, j in enumerate(alphabet):
            score_matrix[i, j] = blosum62[a, b]
    score_matrix.flags.writeable = False
    return score_matrix


def _bucket_size(x: int, minimum: int = 64) -> int:
    r"""Smallest power-of-two >= x (>= minimum) to bound jit recompilations."""
    size = minimum
    while size < x:
        size *= 2
    return size


@dataclass(frozen=True, slots=True)
class PairwiseAligner:
    r"""Batched banded Smith-Waterman-Gotoh aligner (device-backed).

    Defaults mirror the reference: gap_open=11, gap_extend=1, band k=20
    (``pairwise.py:251-253``).
    """

    gap_open: int = 11
    gap_extend: int = 1
    k: int = 20

    def __call__(self, queries: Sequences, targets: Sequences, seeds: Any | None = None) -> PairwiseAlignments:
        if len(queries.offsets) != len(targets.offsets):
            raise ValueError("Query and target batches must have the same number of sequences.")
        n = len(queries.offsets)
        if n == 0:
            return PairwiseAlignments.empty()

        if seeds is not None:
            offsets_arr = np.asarray(seeds.offsets, dtype=np.int32)
            k_locals = np.full(n, self.k, dtype=np.int32)
        else:
            offsets_arr = np.zeros(n, dtype=np.int32)
            k_locals = np.maximum(
                self.k, np.abs(queries.lengths.astype(np.int64) - targets.lengths.astype(np.int64)) + 1
            ).astype(np.int32)

        return batched_swg_align(
            queries.seqs, queries.offsets, queries.lengths,
            targets.seqs, targets.offsets, targets.lengths,
            offsets_arr, k_locals,
            matrix=np.asarray(blosum62_matrix(), dtype=np.int32),
            gap_open=self.gap_open, gap_extend=self.gap_extend,
        )

    def align_seeds(self, queries: Sequences, targets: Sequences, seeds: Any) -> PairwiseAlignments:
        paired_queries, paired_targets = seeds.extract_sequences(queries, targets)
        return self(paired_queries, paired_targets, seeds)


def batched_swg_align(
    q_data: np.ndarray, q_offsets: np.ndarray, q_lengths: np.ndarray,
    t_data: np.ndarray, t_offsets: np.ndarray, t_lengths: np.ndarray,
    diag_offsets: np.ndarray, k_locals: np.ndarray,
    matrix: np.ndarray, gap_open: int, gap_extend: int,
) -> PairwiseAlignments:
    r"""Bucket ragged pairs into padded device batches and run :func:`banded_swg`."""
    import jax.numpy as jnp

    from kaptive_tpu.ops.swg import banded_swg, pad_ragged_to_matrix

    n = len(q_offsets)
    w_needed = 2 * k_locals.astype(np.int64) + 3
    w_buckets = np.array([_bucket_size(int(w), 128) for w in w_needed])
    rows_buckets = np.array([_bucket_size(max(int(length), 1), 128) for length in q_lengths])
    t_buckets = np.array([_bucket_size(max(int(length), 1), 128) for length in t_lengths])

    out = {
        k: np.zeros(n, dtype=np.int32)
        for k in ("scores", "matches", "mismatches", "gaps", "q_starts", "q_ends", "t_starts", "t_ends")
    }
    keys = rows_buckets.astype(np.int64) * 10**10 + t_buckets.astype(np.int64) * 10**5 + w_buckets
    for key in np.unique(keys):
        sel = np.nonzero(keys == key)[0]
        rows_max = int(rows_buckets[sel[0]])
        t_max = int(t_buckets[sel[0]])
        w_pad = int(w_buckets[sel[0]])
        t_pad = w_pad + 2

        # Pad the batch dimension to a power-of-two bucket too: compiled
        # program count must not grow with per-genome hit counts (device
        # compiles are expensive, padded pairs are nearly free).
        b = len(sel)
        b_pad = _bucket_size(b, 8)
        q_mat = np.zeros((b_pad, rows_max), dtype=np.uint8)
        q_mat[:b] = pad_ragged_to_matrix(q_data, q_offsets[sel], q_lengths[sel], rows_max)
        t_mat = np.zeros((b_pad, t_max + 2 * t_pad), dtype=np.uint8)
        t_mat[:b, t_pad : t_pad + t_max] = pad_ragged_to_matrix(
            t_data, t_offsets[sel], t_lengths[sel], t_max
        )
        ql = np.zeros(b_pad, dtype=np.int32)
        ql[:b] = q_lengths[sel]
        tl = np.zeros(b_pad, dtype=np.int32)
        tl[:b] = t_lengths[sel]
        do = np.zeros(b_pad, dtype=np.int32)
        do[:b] = diag_offsets[sel]
        kl = np.full(b_pad, 1, dtype=np.int32)
        kl[:b] = k_locals[sel]

        res = banded_swg(
            jnp.asarray(q_mat), jnp.asarray(ql),
            jnp.asarray(t_mat), jnp.asarray(tl),
            jnp.asarray(do), jnp.asarray(kl),
            np.asarray(matrix, dtype=np.int32),
            gap_open=gap_open, gap_extend=gap_extend,
            rows_max=rows_max, w_pad=w_pad, t_pad=t_pad,
        )
        out["scores"][sel] = np.asarray(res.scores)[:b]
        out["matches"][sel] = np.asarray(res.matches)[:b]
        out["mismatches"][sel] = np.asarray(res.mismatches)[:b]
        out["gaps"][sel] = np.asarray(res.gaps)[:b]
        out["q_starts"][sel] = np.asarray(res.q_starts)[:b]
        out["q_ends"][sel] = np.asarray(res.q_ends)[:b]
        out["t_starts"][sel] = np.asarray(res.t_starts)[:b]
        out["t_ends"][sel] = np.asarray(res.t_ends)[:b]

    return PairwiseAlignments(
        out["scores"], out["matches"], out["mismatches"], out["gaps"],
        out["q_starts"], out["q_ends"], out["t_starts"], out["t_ends"],
    )
