"""One-shot generator for the vendored realistic K-locus GenBank fixture.

Writes ``realistic_klocus.gbk`` / ``realistic_klocus.toml`` formatted the way
real Kaptive databases are (modelled on the Klebsiella K-locus DB layout the
reference parses with gb-io — ``/root/reference/src/kaptive/db/core.py:289-441``
and the curation docs ``/root/reference/docs/db/curation.md``), with the
format quirks a flat-file parser must survive:

- full LOCUS/DEFINITION/ACCESSION/KEYWORDS/SOURCE header block;
- source ``/note="K locus: …"`` and ``/note="K type: …"`` (the reference's
  regexes search for ``locus:``/``type:`` inside longer prose);
- CDS locations as plain spans, ``complement(..)``, adjacent ``join(..)``,
  and a ``<``-partial 5' boundary;
- ``/codon_start=1``, a valueless ``/pseudo`` qualifier, multi-line
  ``/product`` prose and multi-line ``/translation``;
- an ``Extra genes:`` record;
- 60-column lowercase ORIGIN blocks with position numbers.

Run from the repo root:  python tests/fixtures/make_realistic_fixture.py
The test (tests/test_realistic_fixture.py) reads only the committed output.
"""

from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
import sys

sys.path.insert(0, str(HERE.parent))  # tests/ for synthetic helpers
from synthetic import make_orf, random_dna, revcomp  # noqa: E402


def wrap_qualifier(key: str, value: str, width: int = 58) -> list[str]:
    text = f'/{key}="{value}"'
    lines = []
    while len(text) > width:
        lines.append(text[:width])
        text = text[width:]
    lines.append(text)
    return [" " * 21 + chunk for chunk in lines]


def origin_block(seq: bytes) -> list[str]:
    lines = ["ORIGIN      "]
    low = seq.lower().decode()
    for i in range(0, len(low), 60):
        chunk = low[i : i + 60]
        grouped = " ".join(chunk[j : j + 10] for j in range(0, len(chunk), 10))
        lines.append(f"{i + 1:>9} {grouped}")
    return lines


def translate(orf: bytes) -> str:
    from kaptive_tpu.core.seq import BacterialTranslationTable

    return bytes(
        BacterialTranslationTable.translate(np.frombuffer(orf[:-3], dtype=np.uint8))
    ).decode()


def main() -> None:
    rng = np.random.default_rng(20260821)

    # --- KL101: three genes (plain, complement, adjacent join) --------------
    g1 = make_orf(rng, 140)
    g2 = make_orf(rng, 180)
    g3 = make_orf(rng, 160)
    s1, s2, s3 = random_dna(rng, 122), random_dna(rng, 90), random_dna(rng, 77)
    tail = random_dna(rng, 64)
    kl101 = s1 + g1 + s2 + revcomp(g2) + s3 + g3 + tail
    g1_lo, g1_hi = len(s1) + 1, len(s1) + len(g1)  # 1-based inclusive
    g2_lo = len(s1) + len(g1) + len(s2) + 1
    g2_hi = g2_lo + len(g2) - 1
    g3_lo = g2_hi + len(s3) + 1
    g3_hi = g3_lo + len(g3) - 1
    j_mid = g3_lo + 3 * ((g3_hi - g3_lo) // 6)  # codon-aligned split point

    lines = [
        f"LOCUS       KL101_fixture{len(kl101):>15} bp    DNA     linear   BCT 21-AUG-2026",
        "DEFINITION  Klebsiella pneumoniae capsule biosynthesis K locus KL101,",
        "            realistic-format fixture.",
        "ACCESSION   KLFIX101",
        "VERSION     KLFIX101.1",
        "KEYWORDS    .",
        "SOURCE      Klebsiella pneumoniae",
        "  ORGANISM  Klebsiella pneumoniae",
        "            Bacteria; Pseudomonadota; Gammaproteobacteria; Enterobacterales;",
        "            Enterobacteriaceae; Klebsiella.",
        "FEATURES             Location/Qualifiers",
        f"     source          1..{len(kl101)}",
        '                     /organism="Klebsiella pneumoniae"',
        '                     /mol_type="genomic DNA"',
        '                     /note="K locus: KL101"',
        '                     /note="K type: K101"',
        f"     CDS             <{g1_lo}..{g1_hi}",
        '                     /gene="wza"',
        '                     /locus_tag="KL101_01"',
        "                     /codon_start=1",
        *wrap_qualifier(
            "product",
            "polysaccharide export protein Wza precursor, outer membrane lipoprotein",
        ),
        *wrap_qualifier("translation", translate(g1)),
        f"     CDS             complement({g2_lo}..{g2_hi})",
        '                     /gene="wzb"',
        '                     /locus_tag="KL101_02"',
        "                     /codon_start=1",
        *wrap_qualifier("product", "low molecular weight protein-tyrosine-phosphatase Wzb"),
        *wrap_qualifier("translation", translate(g2)),
        f"     CDS             join({g3_lo}..{j_mid},{j_mid + 1}..{g3_hi})",
        '                     /gene="wzc"',
        '                     /locus_tag="KL101_03"',
        "                     /pseudo",
        *wrap_qualifier("product", "tyrosine-protein kinase Wzc"),
        *origin_block(kl101),
        "//",
    ]

    # --- KL102: two genes, one on each strand -------------------------------
    h1 = make_orf(rng, 150)
    h2 = make_orf(rng, 130)
    t1, t2, t3 = random_dna(rng, 80), random_dna(rng, 66), random_dna(rng, 58)
    kl102 = t1 + h1 + t2 + revcomp(h2) + t3
    h1_lo, h1_hi = len(t1) + 1, len(t1) + len(h1)
    h2_lo = len(t1) + len(h1) + len(t2) + 1
    h2_hi = h2_lo + len(h2) - 1
    lines += [
        f"LOCUS       KL102_fixture{len(kl102):>15} bp    DNA     linear   BCT 21-AUG-2026",
        "DEFINITION  Klebsiella pneumoniae K locus KL102 fixture.",
        "ACCESSION   KLFIX102",
        "FEATURES             Location/Qualifiers",
        f"     source          1..{len(kl102)}",
        '                     /note="K locus: KL102"',
        '                     /note="K type: K102"',
        f"     CDS             {h1_lo}..{h1_hi}",
        '                     /gene="galF"',
        '                     /locus_tag="KL102_01"',
        *wrap_qualifier("product", "UTP--glucose-1-phosphate uridylyltransferase GalF"),
        f"     CDS             complement({h2_lo}..{h2_hi})",
        '                     /gene="ugd"',
        '                     /locus_tag="KL102_02"',
        *wrap_qualifier("product", "UDP-glucose 6-dehydrogenase Ugd"),
        *origin_block(kl102),
        "//",
    ]

    # --- Extra genes record -------------------------------------------------
    e1 = make_orf(rng, 120)
    lines += [
        f"LOCUS       Extra_genes{len(e1):>17} bp    DNA     linear   BCT 21-AUG-2026",
        "DEFINITION  Extra genes outside the K locus.",
        "ACCESSION   KLFIXEX",
        "FEATURES             Location/Qualifiers",
        f"     source          1..{len(e1)}",
        '                     /note="Extra genes: Extra_genes"',
        f"     CDS             1..{len(e1)}",
        '                     /gene="wcaJ"',
        '                     /locus_tag="Extra_01"',
        *wrap_qualifier("product", "undecaprenyl-phosphate glucose phosphotransferase WcaJ"),
        *origin_block(e1),
        "//",
    ]

    (HERE / "realistic_klocus.gbk").write_text("\n".join(lines) + "\n")
    (HERE / "realistic_klocus.toml").write_text(
        'name = "realistic_klocus"\n'
        'keyword = "realistic_klocus"\n'
        'genbank = "realistic_klocus.gbk"\n'
        'organism = "Klebsiella pneumoniae"\n'
        "taxon = 573\n"
        'antigen = "Capsular polysaccharide"\n'
        'pathway = "Wzx/Wzy-dependent"\n'
        'version = "1.0.0"\n'
        "id_threshold = 82.5\n"
        'doi = ["10.1099/mgen.0.001428"]\n'
        'owner = "klebgenomics"\n'
        'repo = "fixture"\n'
        'branch = "main"\n'
        "[contact]\n"
        '"Fixture" = "fixture@example.org"\n'
        '[phenotype_logic."K101-like"]\n'
        'loci = ["KL101"]\n'
        'extra_genes = ["wcaJ"]\n'
        "priority = 60\n"
    )
    # Ground truth for the test.
    truth = {
        "KL101": dict(length=len(kl101), genes=[("wza", g1_lo - 1, g1_hi, 1),
                                               ("wzb", g2_lo - 1, g2_hi, -1),
                                               ("wzc", g3_lo - 1, g3_hi, 1)],
                      seq=kl101),
        "KL102": dict(length=len(kl102), genes=[("galF", h1_lo - 1, h1_hi, 1),
                                                ("ugd", h2_lo - 1, h2_hi, -1)],
                      seq=kl102),
        "translations": {"wza": translate(g1), "wzb": translate(g2),
                         "wzc": translate(g3), "galF": translate(h1),
                         "ugd": translate(h2), "wcaJ": translate(e1)},
    }
    import pickle

    (HERE / "realistic_klocus_truth.pkl").write_bytes(pickle.dumps(truth))
    print("fixture written:", HERE / "realistic_klocus.gbk")


if __name__ == "__main__":
    main()
