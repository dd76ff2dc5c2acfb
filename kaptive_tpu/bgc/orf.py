r"""Vectorised six-frame ORF finder (native replacement for the pyfgs wheel).

The reference calls the Rust/C FragGeneScan wrapper ``pyfgs`` per contig
(``/root/reference/src/kaptive/bgc/annotate.py:261-278``).  Here ORF calling is
a whole-contig vectorised numpy pass: per strand and frame, stop-codon
positions partition the contig into ORF candidates; the first start codon
after the previous stop opens each ORF; candidates shorter than
``min_codons`` are dropped.  Coordinates are reported on the forward strand
(0-based half-open), translations use NCBI table 11 without the stop.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import numpy.typing as npt

from kaptive_tpu.core.seq import BacterialTranslationTable


@dataclass(slots=True, frozen=True)
class Orf:
    start: int  # 0-based inclusive, forward-strand coordinates (incl. stop codon)
    end: int  # 0-based exclusive
    strand: int
    translation: bytes


def _frame_orfs(codes: npt.NDArray[np.uint8], frame: int, min_codons: int):
    r"""ORF (start, stop) codon-index pairs for one frame of an encoded strand."""
    n_codons = (len(codes) - frame) // 3
    if n_codons <= 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    cm = BacterialTranslationTable._CHAR_MAP
    c = cm[codes[frame : frame + n_codons * 3]].reshape(n_codons, 3).astype(np.int32)
    idx = c[:, 0] * 25 + c[:, 1] * 5 + c[:, 2]
    aa = BacterialTranslationTable._CODON_MAP[idx]
    is_stop = aa == 42
    # Start codons of table 11: TTG CTG ATT ATC ATA ATG GTG
    starts_set = {(3, 3, 2), (1, 3, 2), (0, 3, 3), (0, 3, 1), (0, 3, 0), (0, 3, 2), (2, 3, 2)}
    # encode codon triples compactly: vectorised membership via packed integer
    packed = c[:, 0] * 25 + c[:, 1] * 5 + c[:, 2]
    start_packed = np.array([a * 25 + b * 5 + d for a, b, d in starts_set])
    is_start = np.isin(packed, start_packed) & ~is_stop

    stop_pos = np.flatnonzero(is_stop)
    start_pos = np.flatnonzero(is_start)
    if len(stop_pos) == 0 or len(start_pos) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    prev_stop = np.concatenate(([-1], stop_pos[:-1]))
    # First start strictly after the previous stop, before this stop.
    first_start_idx = np.searchsorted(start_pos, prev_stop + 1)
    valid = first_start_idx < len(start_pos)
    first_start = np.where(valid, start_pos[np.minimum(first_start_idx, len(start_pos) - 1)], -1)
    ok = valid & (first_start < stop_pos) & ((stop_pos - first_start) >= min_codons)
    return first_start[ok], stop_pos[ok]


def find_orfs(seq: bytes, min_codons: int = 30) -> list[Orf]:
    r"""Call ORFs on both strands of a contig; returns forward-strand coordinates."""
    if len(seq) < 3 * min_codons:
        return []
    fwd = np.frombuffer(seq, dtype=np.uint8)
    rc = np.frombuffer(
        seq.translate(BacterialTranslationTable._COMP)[::-1], dtype=np.uint8
    )
    n = len(seq)
    orfs: list[Orf] = []
    for strand, codes in ((1, fwd), (-1, rc)):
        for frame in range(3):
            starts_c, stops_c = _frame_orfs(codes, frame, min_codons)
            for sc, pc in zip(starts_c, stops_c):
                b0 = frame + int(sc) * 3  # inclusive, this strand's coordinates
                b1 = frame + int(pc) * 3 + 3  # exclusive (incl. stop codon)
                nt = codes[b0 : b1 - 3]
                translation = bytes(BacterialTranslationTable.translate(nt))
                if strand == 1:
                    orfs.append(Orf(b0, b1, 1, translation))
                else:
                    orfs.append(Orf(n - b1, n - b0, -1, translation))
    orfs.sort(key=lambda o: (o.start, o.end))
    return orfs


def resolve_overlaps(orfs: list[Orf], max_overlap: int = 60) -> list[Orf]:
    r"""Greedy longest-first overlap resolution (FragGeneScan-like single-track output)."""
    order = sorted(range(len(orfs)), key=lambda i: -(orfs[i].end - orfs[i].start))
    kept: list[int] = []
    for i in order:
        oi = orfs[i]
        ok = True
        for j in kept:
            oj = orfs[j]
            overlap = min(oi.end, oj.end) - max(oi.start, oj.start)
            if overlap > max_overlap:
                ok = False
                break
        if ok:
            kept.append(i)
    kept.sort(key=lambda i: orfs[i].start)
    return [orfs[i] for i in kept]


def recover_frameshifts(orfs: list[Orf], max_gap: int = 45) -> list[Orf]:
    r"""Join ORF fragments split by a sequencing indel (FragGeneScan-like).

    FragGeneScan's HMM (wrapped by pyfgs in the reference,
    ``bgc/annotate.py:261-278``) models insertions/deletions, so a gene broken
    by a 1-2 bp indel is still called as one gene.  A plain six-frame scan
    yields two fragments in different frames instead.  This pass merges
    same-strand fragments whose frames differ and whose gap/overlap is within
    ``max_gap`` bases — real neighbouring genes are separated by longer
    spacers, and same-frame neighbours (legitimate tandem genes) never merge.
    """
    if len(orfs) < 2:
        return list(orfs)
    ordered = sorted(orfs, key=lambda o: (o.start, o.end))
    out: list[Orf] = []
    for orf in ordered:
        if out:
            prev = out[-1]
            gap = orf.start - prev.end
            frame_differs = (orf.start - prev.start) % 3 != 0
            if (
                prev.strand == orf.strand
                and frame_differs
                and -max_gap <= gap <= max_gap
            ):
                joined = (
                    prev.translation + orf.translation
                    if orf.strand == 1
                    else orf.translation + prev.translation
                )
                out[-1] = Orf(prev.start, max(prev.end, orf.end), prev.strand, joined)
                continue
        out.append(orf)
    return out
