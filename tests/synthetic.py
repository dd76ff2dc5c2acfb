"""Synthetic genome/database generators with known ground truth.

The reference deps (rammappy DBs, network-hosted GenBank databases) are
unavailable offline, so the oracle for end-to-end typing is construction:
assemblies are built from the database's own loci with controlled mutations /
fragmentation, making the true locus call known by design.
"""

import numpy as np

BASES = b"ACGT"


def random_dna(rng, n: int) -> bytes:
    return bytes(BASES[i] for i in rng.integers(0, 4, n))


def mutate_dna(rng, seq: bytes, sub_rate: float = 0.0, indel_rate: float = 0.0) -> bytes:
    out = bytearray()
    for c in seq:
        r = rng.random()
        if r < indel_rate / 2:
            continue
        if r < indel_rate:
            out.append(BASES[rng.integers(0, 4)])
        if rng.random() < sub_rate:
            choices = [b for b in BASES if b != c]
            out.append(choices[rng.integers(0, 3)])
        else:
            out.append(c)
    return bytes(out)


def revcomp(seq: bytes) -> bytes:
    return seq.translate(bytes.maketrans(b"ACGTacgt", b"TGCAtgca"))[::-1]


def make_orf(rng, n_codons: int) -> bytes:
    """Random open reading frame: ATG + non-stop codons + stop codon."""
    stops = {b"TAA", b"TAG", b"TGA"}
    codons = [b"ATG"]
    while len(codons) < n_codons - 1:
        c = bytes(BASES[i] for i in rng.integers(0, 4, 3))
        if c not in stops:
            codons.append(c)
    codons.append(b"TAA")
    return b"".join(codons)
