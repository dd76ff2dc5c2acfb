"""Core container tests (sequences, intervals, alignments).

Mirrors the spirit of ``/root/reference/tests/test_core.py``: synthetic
in-memory fixtures, no data files.  Additionally checks the vectorised
clustering/culling reimplementations against slow sequential oracles that
transcribe the reference's Numba kernels
(``/root/reference/src/kaptive/core/interval.py:595-751``).
"""

import numpy as np
import pytest

from kaptive_tpu.core.alignment import Cigars, parse_cigar_string
from kaptive_tpu.core.interval import Interval, Intervals, Strand
from kaptive_tpu.core.seq import BacterialTranslationTable, SeqRecord, Sequences


# Sequences ------------------------------------------------------------------------------------------------------------
def test_seqrecord_extract_revcomp():
    rec = SeqRecord("x", b"ACGTACGT")
    assert rec.extract(0, 4) == b"ACGT"
    assert rec.extract(0, 4, Strand.REVERSE) == b"ACGT"  # palindrome
    assert SeqRecord("y", b"AACCGG").extract(0, 6, Strand.REVERSE) == b"CCGGTT"


def test_sequences_roundtrip_and_fasta():
    s = Sequences.from_bytes([b"ACGT", b"GG", b"TTTT"], ids=("a", "b", "c"))
    assert len(s) == 3
    assert s[1].seq == b"GG"  # type: ignore
    assert s.to_fasta() == b">a\nACGT\n>b\nGG\n>c\nTTTT\n"
    d = s.to_dict()
    s2 = Sequences.from_dict(d)
    assert s2.ids == s.ids
    np.testing.assert_array_equal(s2.seqs, s.seqs)


def test_sequences_extract_batch():
    s = Sequences.from_bytes([b"AACCGGTT", b"ACGTACGT"])
    out = s.extract(
        np.array([0, 1, 1], dtype=np.int32),
        np.array([0, 2, 0], dtype=np.int32),
        np.array([4, 6, 8], dtype=np.int32),
        np.array([1, -1, 1], dtype=np.int8),
    )
    assert out[0].seq == b"AACC"  # type: ignore
    assert out[1].seq == b"GTAC"  # seq[2:6] of ACGTACGT = GTAC; revcomp(GTAC) = GTAC (palindrome)  # type: ignore
    assert out[2].seq == b"ACGTACGT"  # type: ignore


def test_sequences_empty_extract():
    s = Sequences.from_bytes([b"ACGT"])
    out = s.extract(
        np.empty(0, dtype=np.int32), np.empty(0, dtype=np.int32),
        np.empty(0, dtype=np.int32), np.empty(0, dtype=np.int8),
    )
    assert len(out) == 0


def test_translate_simple():
    # ATG AAA TAA -> M K *
    assert bytes(BacterialTranslationTable.translate(b"ATGAAATAA")) == b"MK*"
    assert bytes(BacterialTranslationTable.translate(b"ATGAAATAA", to_stop=True)) == b"MK"


def test_translate_ragged_with_frames_and_stop():
    s = Sequences.from_bytes([b"ATGAAATAAGGG", b"XATGTGA", b"AC"])
    out = s.translate(frames=np.array([0, 1, 0], dtype=np.int8), to_stop=True)
    assert out[0].seq == b"MK"  # type: ignore
    assert out[1].seq == b"M"  # type: ignore
    assert out[2].seq == b""  # type: ignore
    out2 = s.translate(frames=np.array([0, 1, 0], dtype=np.int8), to_stop=False)
    assert out2[0].seq == b"MK*G"  # type: ignore
    assert out2[1].seq == b"M*"  # type: ignore


def test_internal_stops():
    s = Sequences.from_bytes([b"MK*G", b"MKG*", b"MKG", b""])
    np.testing.assert_array_equal(s.internal_stops, [True, False, False, False])


def test_unique_preserves_order():
    s = Sequences.from_bytes([b"AAA", b"CCC", b"AAA", b"GGG", b"CCC"])
    u = s.unique()
    assert [u[i].seq for i in range(len(u))] == [b"AAA", b"CCC", b"GGG"]  # type: ignore


# Intervals ------------------------------------------------------------------------------------------------------------
def _cluster_oracle(starts, ends, groups, tolerance, order):
    """Transcription of the reference's sequential _cluster_kernel (interval.py:595-639)."""
    n = len(starts)
    cluster_ids = np.empty(n, dtype=np.int32)
    if n == 0:
        return cluster_ids
    curr_cluster = 0
    first_idx = order[0]
    curr_e = ends[first_idx]
    curr_g = groups[first_idx]
    cluster_ids[first_idx] = curr_cluster
    for i in range(1, n):
        idx = order[i]
        s, e, g = starts[idx], ends[idx], groups[idx]
        if g == curr_g and s <= curr_e + tolerance:
            curr_e = max(curr_e, e)
        else:
            curr_cluster += 1
            curr_e = e
            curr_g = g
        cluster_ids[idx] = curr_cluster
    return cluster_ids


def _cull_oracle(order, group1, group2, starts, ends, max_overlap_fraction, n):
    """Transcription of the reference's _cull_overlaps_kernel (interval.py:698-751)."""
    kept_mask = np.zeros(n, dtype=np.bool_)
    for i in range(n):
        idx = order[i]
        g1, g2 = group1[idx], group2[idx]
        s, e = starts[idx], ends[idx]
        length = e - s
        if length <= 0:
            continue
        overlap_found = False
        for j in range(i):
            prev_idx = order[j]
            if not kept_mask[prev_idx] or group1[prev_idx] != g1 or group2[prev_idx] != g2:
                continue
            ks, ke = starts[prev_idx], ends[prev_idx]
            overlap = min(e, ke) - max(s, ks)
            if overlap > 0 and (overlap / min(length, ke - ks)) > max_overlap_fraction:
                overlap_found = True
                break
        if not overlap_found:
            kept_mask[idx] = True
    return kept_mask


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_cluster_spatial_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 200
    starts = rng.integers(0, 10000, n).astype(np.int32)
    ends = (starts + rng.integers(1, 500, n)).astype(np.int32)
    groups = rng.integers(0, 4, n).astype(np.int32)
    iv = Intervals(starts, ends, np.ones(n, dtype=np.int8))
    for tol in (0, 10, 1000):
        got = iv.cluster_spatial(tolerance=tol, group_by=groups)
        order = np.lexsort((ends, starts, groups)).astype(np.int32)
        want = _cluster_oracle(starts, ends, groups, tol, order)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cull_overlaps_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 150
    starts = rng.integers(0, 2000, n).astype(np.int32)
    ends = (starts + rng.integers(0, 300, n)).astype(np.int32)
    g1 = rng.integers(0, 3, n).astype(np.int32)
    g2 = rng.integers(0, 2, n).astype(np.int32)
    scores = rng.integers(0, 100, n)
    order = np.argsort(-scores).astype(np.int32)
    iv = Intervals(starts, ends, np.ones(n, dtype=np.int8))
    got = iv.cull_overlaps(order, 0.1, g1, g2)
    want = _cull_oracle(order, g1, g2, starts, ends, 0.1, n)
    np.testing.assert_array_equal(got, want)


def test_interval_basics():
    i = Interval(10, 20, Strand.FORWARD)
    assert len(i) == 10
    assert 15 in i
    assert Interval(12, 18) in i
    assert (i + Interval(5, 15)).start == 5
    assert i.reverse_complement(100) == Interval(80, 90, Strand.REVERSE)
    assert Strand("+") == Strand.FORWARD
    assert Strand(b"-") == Strand.REVERSE
    assert str(Strand.UNSTRANDED) == "."


def test_cluster_sequential():
    iv = Intervals(
        np.array([0, 10, 20, 100], dtype=np.int32),
        np.array([5, 15, 25, 105], dtype=np.int32),
        np.ones(4, dtype=np.int8),
        original_indices=np.array([0, 1, 2, 10], dtype=np.int32),
    )
    ids = iv.cluster_sequential(tolerance=0)
    assert ids[0] == ids[1] == ids[2]
    assert ids[3] != ids[0]


# CIGAR ----------------------------------------------------------------------------------------------------------------
def test_parse_cigar_string():
    out = parse_cigar_string(b"100M5D20M1I")
    assert list(out >> 4) == [100, 5, 20, 1]
    assert list(out & 0xF) == [0, 2, 0, 1]
    assert len(parse_cigar_string(b"")) == 0


def test_cigars_swap_and_strings():
    c = Cigars.from_lists([parse_cigar_string(b"10M2I3D")])
    swapped = c.swap_sides()
    assert swapped.to_strings() == [b"10M2D3I"]


# Native host-IO ------------------------------------------------------------------------------------------------------
def test_native_hostio_parity():
    """Native C++ FASTA parser agrees with the pure-Python fallback."""
    pytest.importorskip("kaptive_tpu.native.hostio")
    from kaptive_tpu.native import hostio

    data = b">a desc\nACGT\nacgt\n>b\nTT TT\r\nGG\n>c\n\n>d x\nNNN\n"
    native = hostio.parse_fasta_bytes(data)
    fallback = []
    for block in data.split(b">")[1:]:
        header, _, body = block.partition(b"\n")
        name = header.split()[0].decode() if header.split() else ""
        fallback.append((name, body.translate(None, delete=b"\n\r \t")))
    assert native == fallback
    assert native[0] == ("a", b"ACGTacgt")

    codes = hostio.encode_dna(np.frombuffer(b"ACGTNacgtu", np.uint8))
    np.testing.assert_array_equal(codes, [0, 1, 2, 3, 4, 0, 1, 2, 3, 3])


def test_genome_assembly_transparent_decompression(tmp_path):
    """gz/bz2/xz FASTA files load identically to plain (ref genome.py:105-106)."""
    import bz2 as bz2lib
    import gzip
    import lzma

    import numpy as np

    from kaptive_tpu.core.genome import GenomeAssembly

    rng = np.random.default_rng(17)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    fasta = b">c1 extra header words\n%s\n>c2\n%s\n" % (
        bases[rng.integers(0, 4, 5000)].tobytes(),
        bases[rng.integers(0, 4, 300)].tobytes(),
    )
    plain = tmp_path / "g.fasta"
    plain.write_bytes(fasta)
    ref = GenomeAssembly.from_file(plain)
    for suffix, opener in (("gz", gzip.open), ("bz2", bz2lib.open), ("xz", lzma.open)):
        path = tmp_path / f"g.fasta.{suffix}"
        with opener(path, "wb") as fh:
            fh.write(fasta)
        ga = GenomeAssembly.from_file(path)
        assert ga.id == "g"  # extension (incl. compression suffix) stripped
        assert tuple(ga.contigs.ids) == ("c1", "c2")
        assert np.array_equal(ga.contigs.seqs, ref.contigs.seqs)
    import pytest

    with pytest.raises(NotImplementedError):
        GenomeAssembly.from_file(tmp_path / "genome.txt")
