"""Seed-chain-extend mapper tests on synthetic assemblies with known truth."""

import io

import numpy as np
import pytest

from kaptive_tpu.core.genome import GenomeAssembly
from kaptive_tpu.core.seq import Sequences
from kaptive_tpu.ops.mapper import GeneIndex, MapperParams, map_genes
from kaptive_tpu.ops.minimizer import build_minimizer_set
from tests.synthetic import mutate_dna, random_dna, revcomp


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def _assembly(contigs: dict[str, bytes]) -> GenomeAssembly:
    fasta = b"".join(b">%s\n%s\n" % (k.encode(), v) for k, v in contigs.items())
    return GenomeAssembly.from_stream(io.BytesIO(fasta), "synthetic")


def test_minimizers_basic(rng):
    seqs = Sequences.from_bytes([random_dna(rng, 3000), random_dna(rng, 500)])
    ms = build_minimizer_set(seqs)
    # Expected density ~ 2/(w+1) per position
    assert 200 < len(ms.hashes) < 1200
    assert ms.hashes.dtype == np.uint32
    assert (np.diff(ms.hashes.astype(np.int64)) >= 0).all()  # sorted
    assert set(np.unique(ms.seq_indices)) == {0, 1}


def test_minimizers_revcomp_invariance(rng):
    seq = random_dna(rng, 2000)
    fwd = build_minimizer_set(Sequences.from_bytes([seq]), sort=True)
    rev = build_minimizer_set(Sequences.from_bytes([revcomp(seq)]), sort=True)
    # Canonical hashing: near-identical hash multisets from both strands.
    # (Partial windows at sequence ends may add a few edge minimizers on one
    # strand but not the other; interior selection is strand-symmetric.)
    inter = np.intersect1d(fwd.hashes, rev.hashes)
    assert len(inter) >= 0.97 * max(len(fwd.hashes), len(rev.hashes))


def test_map_exact_gene(rng):
    genes = [random_dna(rng, 900), random_dna(rng, 1200), random_dna(rng, 600)]
    gseqs = Sequences.from_bytes(genes)
    gidx = GeneIndex.build(gseqs)
    # Plant gene 0 forward at 5000, gene 1 revcomp at 8000 in a 20kb contig
    bg = random_dna(rng, 20000)
    contig = bg[:5000] + genes[0] + bg[5000:8000] + revcomp(genes[1]) + bg[8000:]
    ga = _assembly({"ctg1": contig})
    alns = map_genes(gidx, ga, tuple(str(i) for i in range(3)))

    assert len(alns) >= 2
    by_gene = {}
    for i in range(len(alns)):
        g = int(alns.q_names_dict[alns.q_name_ids[i]])
        if g not in by_gene or alns.scores[i] > alns.scores[by_gene[g]]:
            by_gene[g] = i

    # Gene 0: perfect forward hit covering whole gene
    i0 = by_gene[0]
    assert alns.strands[i0] == 1
    assert alns.q_starts[i0] == 0 and alns.q_ends[i0] == 900
    assert alns.t_starts[i0] == 5000 and alns.t_ends[i0] == 5900
    assert alns.matches[i0] == 900
    assert alns.mismatches[i0] == 0  # edit distance

    # Gene 1: perfect reverse hit
    i1 = by_gene[1]
    assert alns.strands[i1] == -1
    assert alns.q_starts[i1] == 0 and alns.q_ends[i1] == 1200
    assert alns.matches[i1] == 1200
    t0 = 5000 + 900 + 3000
    assert alns.t_starts[i1] == t0 and alns.t_ends[i1] == t0 + 1200

    # Gene 2 was not planted: no strong full-length hit
    if 2 in by_gene:
        assert alns.q_covs[by_gene[2]] < 0.5


def test_map_mutated_gene(rng):
    gene = random_dna(rng, 1000)
    gseqs = Sequences.from_bytes([gene])
    gidx = GeneIndex.build(gseqs)
    mutated = mutate_dna(rng, gene, sub_rate=0.10, indel_rate=0.01)
    contig = random_dna(rng, 3000) + mutated + random_dna(rng, 3000)
    ga = _assembly({"c": contig})
    alns = map_genes(gidx, ga, ("0",))
    assert len(alns) >= 1
    best = int(np.argmax(alns.scores))
    assert alns.q_covs[best] > 0.85
    # ~10% divergence -> identity in 85-95% range
    ident = alns.matches[best] / (alns.q_ends[best] - alns.q_starts[best])
    assert 0.8 < ident < 0.99


def test_map_gene_split_across_contigs(rng):
    gene = random_dna(rng, 1500)
    gidx = GeneIndex.build(Sequences.from_bytes([gene]))
    # Fragment the gene across two contigs
    ga = _assembly({
        "a": random_dna(rng, 2000) + gene[:800],
        "b": gene[800:] + random_dna(rng, 2000),
    })
    alns = map_genes(gidx, ga, ("0",))
    tnames = [alns.t_names_dict[t] for t in alns.t_name_ids]
    assert "a" in tnames and "b" in tnames
    for i in range(len(alns)):
        if alns.t_names_dict[alns.t_name_ids[i]] == "a":
            assert alns.q_starts[i] == 0 and abs(int(alns.q_ends[i]) - 800) <= 2
            assert abs(int(alns.t_ends[i]) - 2800) <= 2
        else:
            assert abs(int(alns.q_starts[i]) - 800) <= 2 and alns.q_ends[i] == 1500


def test_map_empty_assembly(rng):
    gidx = GeneIndex.build(Sequences.from_bytes([random_dna(rng, 500)]))
    ga = _assembly({"empty": b""})
    alns = map_genes(gidx, ga, ("0",))
    assert len(alns) == 0
