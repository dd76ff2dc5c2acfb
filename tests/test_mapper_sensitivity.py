"""Mapper sensitivity matrix vs minimap2-class expectations (SURVEY §7.4 #1).

Plants every DB gene in random background at increasing divergence / indel
rates and fragmentation, and asserts recall floors; also exercises the
1-anchor regime and the device->host overflow fallback explicitly.
"""

import io
import tempfile
from pathlib import Path

import numpy as np
import pytest

from kaptive_tpu.core.genome import GenomeAssembly
from kaptive_tpu.db import Database
from kaptive_tpu.ops import mapper as mapper_mod
from kaptive_tpu.ops.mapper import MapperParams, map_genes
from synthetic import make_genome_from_locus, make_synthetic_db, mutate_dna, random_dna


@pytest.fixture(scope="module")
def db_truth():
    rng = np.random.default_rng(777)
    tmp = Path(tempfile.mkdtemp())
    gbk, truth = make_synthetic_db(tmp, rng, n_loci=4, genes_per_locus=6, name="SensDB",
                                   keyword="sens_db")
    return Database.from_genbank(gbk), truth, rng


def _recall(db, truth, rng, locus: str, sub_rate: float, indel_rate: float = 0.0,
            params: MapperParams | None = None, min_cov: float = 0.9):
    """Fraction of the locus' genes recovered with >= min_cov query coverage."""
    genes = truth["loci"][locus]["genes"]
    locus_seq = mutate_dna(rng, truth["loci"][locus]["seq"], sub_rate=sub_rate,
                           indel_rate=indel_rate)
    contig = random_dna(rng, 3000) + locus_seq + random_dna(rng, 3000)
    ga = GenomeAssembly.from_stream(io.BytesIO(b">c\n%s\n" % contig), "s")
    names = tuple(str(i) for i in range(len(db.genes)))
    alns = map_genes(db.gene_index, ga, names, params or MapperParams())
    want = {f"{locus}_{i + 1:02d}_{genes[i][0]}" for i in range(len(genes))}
    covered = {}
    for r in range(len(alns)):
        g = int(alns.q_names_dict[alns.q_name_ids[r]])
        cov = (alns.q_ends[r] - alns.q_starts[r]) / max(int(alns.q_lengths[r]), 1)
        covered[db.genes.ids[g]] = max(covered.get(db.genes.ids[g], 0.0), cov)
    hit = sum(1 for name in want if covered.get(name, 0.0) >= min_cov)
    return hit / len(want)


def test_recall_curve_divergence(db_truth):
    """Recall floors across the divergence sweep (documented curve).

    minimap2-class mappers hold near-perfect recall to ~10% divergence with
    k=15 minimizers; at 15% seeds thin out and recall may degrade.
    """
    db, truth, rng = db_truth
    floors = {0.0: 1.0, 0.05: 1.0, 0.10: 0.99, 0.15: 0.80}
    curve = {}
    for sub, floor in floors.items():
        recalls = [
            _recall(db, truth, rng, f"KL{li + 1}", sub_rate=sub) for li in range(4)
        ]
        curve[sub] = float(np.mean(recalls))
        assert curve[sub] >= floor, f"recall {curve[sub]:.2f} < {floor} at {sub:.0%}"
    # the curve must be monotone non-increasing within tolerance
    vals = [curve[s] for s in sorted(curve)]
    assert all(b <= a + 0.05 for a, b in zip(vals, vals[1:])), curve


def test_recall_with_indels(db_truth):
    db, truth, rng = db_truth
    r = np.mean([
        _recall(db, truth, rng, f"KL{li + 1}", sub_rate=0.02, indel_rate=0.01,
                min_cov=0.8)
        for li in range(4)
    ])
    assert r >= 0.95, f"indel recall {r:.2f}"


def test_fragmented_assembly_recall(db_truth):
    """A locus split mid-gene across two contigs: every gene except possibly
    the split one must still be recovered at full coverage."""
    db, truth, rng = db_truth
    locus = truth["loci"]["KL2"]["seq"]
    genes = truth["loci"]["KL2"]["genes"]
    # cut inside gene 3
    cut = (genes[2][1] + genes[2][2]) // 2
    fasta = b">c1\n%s\n>c2\n%s\n" % (
        random_dna(rng, 2000) + locus[:cut], locus[cut:] + random_dna(rng, 2000)
    )
    ga = GenomeAssembly.from_stream(io.BytesIO(fasta), "frag")
    names = tuple(str(i) for i in range(len(db.genes)))
    alns = map_genes(db.gene_index, ga, names, MapperParams())
    covered = {}
    for r in range(len(alns)):
        g = db.genes.ids[int(alns.q_names_dict[alns.q_name_ids[r]])]
        cov = (alns.q_ends[r] - alns.q_starts[r]) / max(int(alns.q_lengths[r]), 1)
        covered[g] = covered.get(g, 0.0) + cov  # fragments sum
    for i in range(6):
        name = f"KL2_{i + 1:02d}_{genes[i][0]}"
        floor = 0.8 if i == 2 else 0.95  # split gene allows edge loss
        assert covered.get(name, 0.0) >= floor, (name, covered.get(name))


def test_min_anchors_one_recovers_sparse_seeds(db_truth):
    """At high divergence the 1-anchor regime must not lose hits that the
    default 2-anchor chaining keeps, and may add more."""
    db, truth, rng = db_truth
    r2 = _recall(db, truth, rng, "KL1", sub_rate=0.15, min_cov=0.5,
                 params=MapperParams(min_anchors=2))
    r1 = _recall(db, truth, rng, "KL1", sub_rate=0.15, min_cov=0.5,
                 params=MapperParams(min_anchors=1))
    assert r1 >= r2


def test_overflow_fallback_path(db_truth, monkeypatch):
    """Force the anchor-capacity overflow so the host fallback runs; results
    must still recover the locus genes."""
    db, truth, rng = db_truth
    calls = {"n": 0}
    real = mapper_mod.find_anchors

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(mapper_mod, "ANCHOR_CAP", 4)
    monkeypatch.setattr(mapper_mod, "find_anchors", spy)
    r = _recall(db, truth, rng, "KL3", sub_rate=0.0)
    assert calls["n"] >= 1, "overflow fallback never triggered"
    assert r == 1.0


def test_contig_shorter_than_window(db_truth):
    """Contigs shorter than k+w-1 yield no minimizers and must not crash;
    typing an assembly of only short contigs returns an empty mapping."""
    db, truth, rng = db_truth
    fasta = b">tiny1\nACGTACGT\n>tiny2\nGGGCCC\n"
    ga = GenomeAssembly.from_stream(io.BytesIO(fasta), "tiny")
    names = tuple(str(i) for i in range(len(db.genes)))
    alns = map_genes(db.gene_index, ga, names, MapperParams())
    assert len(alns) == 0
    from kaptive_tpu.serotyping import Serotyper

    result = Serotyper(db)(ga)
    assert result.typeable is False
    assert len(result.gene_hits) == 0
