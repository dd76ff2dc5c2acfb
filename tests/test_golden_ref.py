"""Bit-identity harness: our typing calls vs the REFERENCE engine's calls.

For a panel of synthetic assemblies (clean / diverged / reverse-complemented /
fragmented / gene-truncated), both engines consume the SAME mapper hits (ours),
and we assert the decisions and report bytes agree:

- best locus, phenotype, typeability, problem symbols;
- per-hit gene states and protein identities;
- the full 22-column KaptiveRow TSV bytes (version column normalised — the
  reference reports "unknown" when not pip-installed).

The reference runs in-process from /root/reference with numba stubbed
(see tests/ref_oracle.py); tests skip if that tree is absent.
"""

import io

import numpy as np
import pytest

from ref_oracle import (
    reference_available,
    reference_row_bytes,
    reference_serotype,
)
from synthetic import make_genome_from_locus, make_synthetic_db, random_dna, revcomp

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)


@pytest.fixture(scope="module")
def db_and_truth(tmp_path_factory):
    from kaptive_tpu.db import Database

    rng = np.random.default_rng(20260819)
    tmp = tmp_path_factory.mktemp("goldendb")
    gbk, truth = make_synthetic_db(
        tmp, rng, n_loci=5, genes_per_locus=6, name="GoldenDB", keyword="golden_db"
    )
    return Database.from_genbank(gbk), truth, rng


def _assemble(fasta_bytes: bytes, name: str):
    from kaptive_tpu.core.genome import GenomeAssembly

    return GenomeAssembly.from_stream(io.BytesIO(fasta_bytes), name)


def _both_results(db, genome):
    """(our SerotypingResult, reference SerotypingResult) on identical hits."""
    from kaptive_tpu.ops.mapper import map_genes
    from kaptive_tpu.serotyping import Serotyper

    ours = Serotyper(db)
    our_result = ours(genome)
    alns = map_genes(db.gene_index, genome, ours._gene_names, ours.mapper_params)
    ref_result = reference_serotype(db, genome, alns)
    return our_result, ref_result


def _normalise_row(row: bytes) -> bytes:
    cols = row.split(b"\t")
    cols[0] = b"<version>"
    return b"\t".join(cols)


def _assert_match(our_result, ref_result):
    from kaptive_tpu.serotyping.io import KaptiveRow

    assert our_result.best_locus_name == ref_result.best_locus_name
    assert our_result.phenotype == ref_result.phenotype
    assert our_result.typeable == ref_result.typeable
    assert int(our_result.problems) == int(ref_result.problems)
    assert our_result.best_locus_score == pytest.approx(ref_result.best_locus_score)
    assert our_result.best_locus_completeness == pytest.approx(
        ref_result.best_locus_completeness
    )
    np.testing.assert_array_equal(our_result.gene_states, ref_result.gene_states)
    np.testing.assert_array_equal(
        our_result.gene_hits.gene_indices, ref_result.gene_hits.gene_indices
    )
    np.testing.assert_array_equal(
        our_result.gene_hits.is_inside, ref_result.gene_hits.is_inside
    )
    np.testing.assert_allclose(
        our_result.protein_identities, ref_result.protein_identities, rtol=0, atol=0
    )
    assert tuple(our_result.missing_expected_genes) == tuple(
        ref_result.missing_expected_genes
    )
    ours_row = _normalise_row(bytes(KaptiveRow.from_result(our_result)))
    ref_row = _normalise_row(reference_row_bytes(ref_result))
    assert ours_row == ref_row


def test_clean_locus_bit_identical(db_and_truth):
    db, truth, rng = db_and_truth
    fasta = make_genome_from_locus(rng, truth, "KL3", flank=8000)
    _assert_match(*_both_results(db, _assemble(fasta, "clean")))


def test_diverged_locus_bit_identical(db_and_truth):
    db, truth, rng = db_and_truth
    fasta = make_genome_from_locus(rng, truth, "KL2", flank=8000, sub_rate=0.02)
    _assert_match(*_both_results(db, _assemble(fasta, "diverged")))


def test_revcomp_locus_bit_identical(db_and_truth):
    db, truth, rng = db_and_truth
    locus = revcomp(truth["loci"]["KL4"]["seq"])
    contig = random_dna(rng, 6000) + locus + random_dna(rng, 6000)
    _assert_match(*_both_results(db, _assemble(b">c1\n%s\n" % contig, "rc")))


def test_fragmented_locus_bit_identical(db_and_truth):
    db, truth, rng = db_and_truth
    locus = truth["loci"]["KL1"]["seq"]
    cut = len(locus) // 2
    fasta = b">c1\n%s\n>c2\n%s\n" % (
        random_dna(rng, 5000) + locus[:cut],
        locus[cut:] + random_dna(rng, 5000),
    )
    our_result, ref_result = _both_results(db, _assemble(fasta, "fragmented"))
    _assert_match(our_result, ref_result)
    assert len(our_result.locus_pieces) == len(ref_result.locus_pieces)


def test_truncated_gene_bit_identical(db_and_truth):
    db, truth, rng = db_and_truth
    # Knock a premature stop into the 3rd gene of KL5 (frame-preserving).
    locus = bytearray(truth["loci"]["KL5"]["seq"])
    _, g_start, g_end, strand, orf = truth["loci"]["KL5"]["genes"][2]
    mid_codon = g_start + ((g_end - g_start) // 2 // 3) * 3
    if strand == 1:
        locus[mid_codon : mid_codon + 3] = b"TAA"
    else:
        locus[g_end - mid_codon + g_start - 3 : g_end - mid_codon + g_start] = b"TTA"
    contig = random_dna(rng, 6000) + bytes(locus) + random_dna(rng, 6000)
    our_result, ref_result = _both_results(db, _assemble(b">c1\n%s\n" % contig, "trunc"))
    _assert_match(our_result, ref_result)


def test_untypeable_low_completeness_bit_identical(db_and_truth):
    """Only a third of the locus present -> completeness < 0.5 -> Untypeable."""
    db, truth, rng = db_and_truth
    locus = truth["loci"]["KL3"]["seq"]
    fragment = locus[: len(locus) // 5]
    contig = random_dna(rng, 6000) + fragment + random_dna(rng, 6000)
    our_result, ref_result = _both_results(db, _assemble(b">c1\n%s\n" % contig, "lowcomp"))
    _assert_match(our_result, ref_result)
    assert not our_result.typeable


def test_untypeable_extra_intruding_genes_bit_identical(db_and_truth):
    """Two foreign genes inserted INSIDE the locus (> max_other_genes=1)."""
    db, truth, rng = db_and_truth
    locus = truth["loci"]["KL1"]["seq"]
    foreign = [g[4] for g in truth["loci"]["KL5"]["genes"][:2]]
    cut = len(locus) // 2
    insert = random_dna(rng, 60) + foreign[0] + random_dna(rng, 60) + foreign[1] + random_dna(rng, 60)
    hybrid = locus[:cut] + insert + locus[cut:]
    contig = random_dna(rng, 6000) + hybrid + random_dna(rng, 6000)
    our_result, ref_result = _both_results(db, _assemble(b">c1\n%s\n" % contig, "intruded"))
    _assert_match(our_result, ref_result)
    assert not our_result.typeable


def test_phenotype_wildcard_inactive_rule_bit_identical(db_and_truth):
    """KL2 with a truncated wz* gene fires the wildcard inactive rule
    (synthetic DB logic: K2-deficient on inactive_genes=['wz*'])."""
    db, truth, rng = db_and_truth
    locus = bytearray(truth["loci"]["KL2"]["seq"])
    _, g_start, g_end, strand, orf = truth["loci"]["KL2"]["genes"][1]
    mid_codon = g_start + ((g_end - g_start) // 2 // 3) * 3
    if strand == 1:
        locus[mid_codon : mid_codon + 3] = b"TAA"
    else:
        locus[g_end - mid_codon + g_start - 3 : g_end - mid_codon + g_start] = b"TTA"
    contig = random_dna(rng, 6000) + bytes(locus) + random_dna(rng, 6000)
    our_result, ref_result = _both_results(db, _assemble(b">c1\n%s\n" % contig, "k2def"))
    _assert_match(our_result, ref_result)
    assert our_result.phenotype == "K2-deficient"


def test_phenotype_suffix_rule_bit_identical(db_and_truth):
    """A suffix rule appends to (not replaces) the base phenotype, in priority
    order, identically in both engines.  The suffix flag is injected into the
    compiled Phenotypes (the TOML->as_suffix path is unwired in the reference
    too — ``/root/reference/src/kaptive/db/core.py:209-219`` never reads it)."""
    import dataclasses

    db, truth, rng = db_and_truth
    phen = db.phenotypes
    ids = [i.decode() for i in phen.ids]
    # Repurpose the K2-deficient rule as a suffix: " (deficient)".
    k2 = ids.index("K2-deficient")
    new_ids = np.asarray(phen.ids).copy()
    new_ids = new_ids.astype("S32")
    new_ids[k2] = b" (deficient)"
    suffixed = dataclasses.replace(
        phen,
        ids=new_ids,
        as_suffix=np.eye(1, len(ids), k2, dtype=bool)[0],
    )
    db2 = dataclasses.replace(db, phenotypes=suffixed)
    locus = bytearray(truth["loci"]["KL2"]["seq"])
    _, g_start, g_end, strand, orf = truth["loci"]["KL2"]["genes"][1]
    mid_codon = g_start + ((g_end - g_start) // 2 // 3) * 3
    if strand == 1:
        locus[mid_codon : mid_codon + 3] = b"TAA"
    else:
        locus[g_end - mid_codon + g_start - 3 : g_end - mid_codon + g_start] = b"TTA"
    contig = random_dna(rng, 6000) + bytes(locus) + random_dna(rng, 6000)
    our_result, ref_result = _both_results(db2, _assemble(b">c1\n%s\n" % contig, "k2suf"))
    _assert_match(our_result, ref_result)
    assert our_result.phenotype == "K2 (deficient)"


def test_short_junk_contigs_bit_identical(db_and_truth):
    """Contigs shorter than k+w (no minimizers possible) must not perturb the
    call — the reference's adversarial-panels spirit (tests/test_adversarial.py)."""
    db, truth, rng = db_and_truth
    locus = truth["loci"]["KL4"]["seq"]
    fasta = b">main\n%s\n>tiny1\nACGT\n>tiny2\n%s\n>tiny3\nA\n" % (
        random_dna(rng, 5000) + locus + random_dna(rng, 5000),
        random_dna(rng, 18),
    )
    _assert_match(*_both_results(db, _assemble(fasta, "shortctg")))


def test_long_gene_names_bit_identical(tmp_path):
    """40-char cluster names stress the byte-width-fitted id vocabularies."""
    from kaptive_tpu.db import Database

    rng = np.random.default_rng(99)
    prefix = "extremely_long_capsule_synthesis_cluster_name_"
    gbk, truth = make_synthetic_db(
        tmp_path, rng, n_loci=3, genes_per_locus=4, with_phenotypes=False,
        name="LongDB", keyword="long_db", cluster_prefix=prefix,
    )
    db = Database.from_genbank(gbk)
    fasta = make_genome_from_locus(rng, truth, "KL2", flank=5000)
    our_result, ref_result = _both_results(db, _assemble(fasta, "longnames"))
    _assert_match(our_result, ref_result)
    assert prefix.encode() in bytes(our_result.gene_hits.gene_ids[0])


def test_draft_assembly_many_contigs_bit_identical(db_and_truth):
    """A 30-contig draft assembly (locus split over 3 contigs, 27 junk
    contigs) — exercises multi-contig layout, contig-edge partials, and the
    sparse-upload exception path (inter-contig sentinels)."""
    db, truth, rng = db_and_truth
    locus = truth["loci"]["KL5"]["seq"]
    third = len(locus) // 3
    parts = [
        random_dna(rng, 3000) + locus[:third],
        locus[third : 2 * third],
        locus[2 * third :] + random_dna(rng, 3000),
    ]
    fasta = b"".join(
        b">p%d\n%s\n" % (i, p) for i, p in enumerate(parts)
    ) + b"".join(
        b">junk%d\n%s\n" % (i, random_dna(rng, int(rng.integers(200, 2000))))
        for i in range(27)
    )
    our_result, ref_result = _both_results(db, _assemble(fasta, "draft"))
    _assert_match(our_result, ref_result)
    assert len(our_result.locus_pieces) >= 3


def test_dual_locus_contamination_bit_identical(db_and_truth):
    """TWO complete loci in one assembly (contamination / mixed culture):
    the best-locus choice rides the full hit table's scoring and cull
    ordering — the mapq/ordering-sensitive regime — and both engines must
    agree on every byte of the winner's row, including the extra-genes
    problem annotations contributed by the losing locus."""
    db, truth, rng = db_and_truth
    a = truth["loci"]["KL1"]["seq"]
    b = truth["loci"]["KL4"]["seq"]
    fasta = (
        b">host\n" + random_dna(rng, 4000) + a + random_dna(rng, 4000) + b"\n"
        b">contam\n" + random_dna(rng, 1500) + b + random_dna(rng, 1500) + b"\n"
    )
    our_result, ref_result = _both_results(db, _assemble(fasta, "dual"))
    _assert_match(our_result, ref_result)
    assert our_result.best_locus_name in ("KL1", "KL4")


def test_jsonl_roundtrip_matches_reference_serialiser(db_and_truth):
    """Our to_dict must carry the same information as the reference's (same
    keys, equal JSON-normalised values), and our from_dict(to_dict) must
    reproduce byte-identical KaptiveRow TSV without recompute (the reference's
    convert path, ``serotyping/cli.py:237-267``)."""
    import json

    from kaptive_tpu.serotyping import SerotypingResult
    from kaptive_tpu.serotyping.cli import result_to_jsonl_bytes
    from kaptive_tpu.serotyping.io import KaptiveRow

    db, truth, rng = db_and_truth
    fasta = make_genome_from_locus(rng, truth, "KL5", flank=6000)
    our_result, ref_result = _both_results(db, _assemble(fasta, "roundtrip"))

    ours = json.loads(result_to_jsonl_bytes(our_result))
    theirs = json.loads(
        json.dumps(ref_result.to_dict(), default=_ref_json_default)
    )
    # The version stamp differs by construction; everything else must agree.
    ours.pop("kaptive_version"), theirs.pop("kaptive_version")
    assert ours == theirs

    rebuilt = SerotypingResult.from_dict(json.loads(result_to_jsonl_bytes(our_result)))
    assert bytes(KaptiveRow.from_result(rebuilt)) == bytes(
        KaptiveRow.from_result(our_result)
    )


def _ref_json_default(o):
    import numpy as _np

    if isinstance(o, _np.ndarray):
        return o.tolist()
    if isinstance(o, (_np.integer, _np.floating, _np.bool_)):
        return o.item()
    if isinstance(o, bytes):
        return o.decode("utf-8")
    if hasattr(o, "value"):
        return int(o)
    raise TypeError(f"Cannot serialise {type(o)}")


def test_pha4ge_row_bit_identical(db_and_truth):
    """The PHA4GE genotyping-specification TSV must also match byte-for-byte
    (version fields normalised — the reference reports 'unknown' when not
    pip-installed, and the software-version column embeds it)."""
    db, truth, rng = db_and_truth
    fasta = make_genome_from_locus(rng, truth, "KL2", flank=6000, sub_rate=0.01)
    our_result, ref_result = _both_results(db, _assemble(fasta, "pha4ge"))

    from kaptive_tpu.serotyping.io import Pha4geRow

    from ref_oracle import load_reference

    load_reference()
    from kaptive.serotyping.io import Pha4geRow as RefPha4geRow

    def normalise(row: bytes, header: bytes) -> bytes:
        cols = row.split(b"\t")
        names = header.rstrip(b"\n").split(b"\t")
        for i, name in enumerate(names):
            if b"version" in name.lower():
                cols[i] = b"<version>"
        return b"\t".join(cols)

    ours = normalise(bytes(Pha4geRow.from_result(our_result)), Pha4geRow.header())
    theirs = normalise(
        bytes(RefPha4geRow.from_result(ref_result)), RefPha4geRow.header()
    )
    assert Pha4geRow.header() == RefPha4geRow.header()
    assert ours == theirs


def test_batch_equals_single(db_and_truth):
    """Batched decisions must equal per-genome decisions (and hence the reference)."""
    from kaptive_tpu.serotyping import Serotyper
    from kaptive_tpu.serotyping.io import KaptiveRow

    db, truth, rng = db_and_truth
    genomes = [
        _assemble(make_genome_from_locus(rng, truth, f"KL{i + 1}", flank=5000), f"b{i}")
        for i in range(3)
    ]
    ser = Serotyper(db)
    batched = ser.batch(genomes)
    for genome, batched_result in zip(genomes, batched):
        single = ser(genome)
        assert bytes(KaptiveRow.from_result(single)) == bytes(
            KaptiveRow.from_result(batched_result)
        )


def test_diverged_draft_assembly_bit_identical(db_and_truth):
    """The bench's 'draft' composition at golden strictness: a diverged
    (0.5% subs) locus split across contigs inside a many-contig assembly —
    low-depth-style input where mapper coordinate drift under substitutions
    plus multi-contig reconstruction interact; full KaptiveRow byte equality."""
    from synthetic import mutate_dna

    db, truth, rng = db_and_truth
    locus = mutate_dna(rng, truth["loci"]["KL2"]["seq"], sub_rate=0.005)
    cut = len(locus) // 2
    parts = [random_dna(rng, 2500) + locus[:cut], locus[cut:] + random_dna(rng, 2500)]
    fasta = b"".join(b">p%d\n%s\n" % (i, p) for i, p in enumerate(parts)) + b"".join(
        b">j%d\n%s\n" % (i, random_dna(rng, int(rng.integers(150, 1200))))
        for i in range(20)
    )
    our_result, ref_result = _both_results(db, _assemble(fasta, "divdraft"))
    _assert_match(our_result, ref_result)
    assert our_result.best_locus_name == "KL2"
