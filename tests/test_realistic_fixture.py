"""Vendored realistic-format GenBank fixture through the full DB + typing path.

Round 2's GenBank coverage was self-referential (our writer feeding our
parser).  This fixture (tests/fixtures/realistic_klocus.gbk, generated once by
make_realistic_fixture.py and committed) is formatted the way real Kaptive
databases are — full header block, ``K locus:``/``K type:`` prose notes,
``complement``/adjacent-``join``/partial locations, ``/codon_start``, a
valueless ``/pseudo``, wrapped ``/product`` + ``/translation`` qualifiers,
60-column numbered lowercase ORIGIN — the quirks gb-io absorbs for the
reference (``/root/reference/src/kaptive/db/core.py:289-441``).  The test pins
our parser's output to hand-computed ground truth and runs one typing call.
"""

import pickle
from pathlib import Path

import numpy as np
import pytest

from synthetic import random_dna

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def db_and_truth():
    from kaptive_tpu.db import Database

    db = Database.from_genbank(FIXTURES / "realistic_klocus.gbk")
    truth = pickle.loads((FIXTURES / "realistic_klocus_truth.pkl").read_bytes())
    return db, truth


def test_loci_and_metadata(db_and_truth):
    db, truth = db_and_truth
    # The Extra genes record compiles as a trailing pseudo-locus (matching the
    # reference's layout, which flags its genes via ``extra_genes``).
    assert tuple(db.loci.ids)[:2] == ("KL101", "KL102")
    assert tuple(db.serotypes)[:2] == ("K101", "K102")
    assert int(db.loci.lengths[0]) == truth["KL101"]["length"]
    assert int(db.loci.lengths[1]) == truth["KL102"]["length"]
    assert db.metadata.organism == "Klebsiella pneumoniae"
    assert db.metadata.id_threshold == 82.5


def test_gene_coordinates_strands_and_clusters(db_and_truth):
    db, truth = db_and_truth
    # Locus genes in order, then the Extra genes record's gene.
    want = truth["KL101"]["genes"] + truth["KL102"]["genes"]
    n_locus_genes = len(want)
    clusters = [db.cluster_keys[i] for i in db.gene_cluster_ids]
    assert clusters[:n_locus_genes] == [g[0] for g in want]
    for i, (name, start0, end1, strand) in enumerate(want):
        assert int(db.gene_intervals.starts[i]) == start0, name
        assert int(db.gene_intervals.ends[i]) == end1, name
        assert int(db.gene_intervals.strands[i]) == strand, name
    # wcaJ arrives via the Extra genes record and is flagged extra.
    assert clusters[n_locus_genes] == "wcaJ"
    assert bool(db.extra_genes[n_locus_genes])
    assert not db.extra_genes[:n_locus_genes].any()


def test_translations_match_hand_computed(db_and_truth):
    db, truth = db_and_truth
    clusters = [db.cluster_keys[i] for i in db.gene_cluster_ids]
    for i, name in enumerate(clusters):
        got = bytes(
            db.translations.seqs[
                db.translations.offsets[i] : db.translations.offsets[i]
                + db.translations.lengths[i]
            ]
        ).decode()
        # DB translations cover the full CDS incl. the stop codon -> '*'.
        assert got.rstrip("*") == truth["translations"][name], name


def test_partial_join_pseudo_quirks_parsed(db_and_truth):
    """The '<' partial marker, the adjacent join(), and /pseudo must neither
    crash nor shift coordinates (join collapses to its bounding span)."""
    db, truth = db_and_truth
    wza = truth["KL101"]["genes"][0]
    wzc = truth["KL101"]["genes"][2]
    assert int(db.gene_intervals.starts[0]) == wza[1]  # '<' stripped
    assert int(db.gene_intervals.starts[2]) == wzc[1]  # join() collapsed
    assert int(db.gene_intervals.ends[2]) == wzc[2]


def test_typing_call_with_phenotype_rule(db_and_truth):
    import io

    from kaptive_tpu.core.genome import GenomeAssembly
    from kaptive_tpu.serotyping import Serotyper

    db, truth = db_and_truth
    rng = np.random.default_rng(5)
    wcaJ_nt = None
    # Rebuild wcaJ's nucleotides from the DB itself (it is a DB gene).
    i = [db.cluster_keys[c] for c in db.gene_cluster_ids].index("wcaJ")
    wcaJ_nt = bytes(
        db.genes.seqs[db.genes.offsets[i] : db.genes.offsets[i] + db.genes.lengths[i]]
    )
    contig = (
        random_dna(rng, 20000)
        + truth["KL101"]["seq"]
        + random_dna(rng, 3000)
        + wcaJ_nt
        + random_dna(rng, 20000)
    )
    ga = GenomeAssembly.from_stream(io.BytesIO(b">c1\n%s\n" % contig), "fixture_genome")
    result = Serotyper(db)(ga)
    assert result.best_locus_name == "KL101"
    # The K101-like rule (loci=[KL101], extra_genes=[wcaJ]) fires.
    assert result.phenotype == "K101-like"
    assert result.typeable
