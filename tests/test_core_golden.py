"""Differential tests: core decision-critical kernels vs the REFERENCE's own.

The banded Smith-Waterman-Gotoh DP decides protein identities (and hence gene
states, phenotype rules, and Typeable calls), and the interval cull/cluster
kernels decide which hits survive reconstruction — all places where a subtle
semantic drift would silently change typing output.  With numba stubbed
(tests/ref_oracle.py) the reference kernels run as plain Python on the same
inputs as our device kernels, giving cell-exact parity evidence.
"""

import numpy as np
import pytest

from ref_oracle import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(777)


def _ragged(rng, seqs):
    flat = np.concatenate([np.frombuffer(s, dtype=np.uint8) for s in seqs])
    lengths = np.array([len(s) for s in seqs], dtype=np.int32)
    offsets = np.concatenate(([0], np.cumsum(lengths[:-1]))).astype(np.int32)
    return flat, offsets, lengths


def _random_protein(rng, n):
    alphabet = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)
    return alphabet[rng.integers(0, 20, n)].tobytes()


def _mutate_protein(rng, seq, rate):
    alphabet = b"ARNDCQEGHILKMFPSTWYV"
    out = bytearray(seq)
    for i in range(len(out)):
        if rng.random() < rate:
            out[i] = alphabet[rng.integers(0, 20)]
    return bytes(out)


def test_banded_gotoh_matches_reference(rng):
    """Unseeded banded SWG: scores/counts/coordinates cell-exact vs the
    reference kernel (ref pairwise.py:395-584) over homologous, truncated and
    unrelated protein pairs."""
    load_reference()
    from kaptive.core.pairwise import _batched_banded_gotoh
    from kaptive.core.pairwise import _blosum62_matrix as ref_matrix

    from kaptive_tpu.core.pairwise import batched_swg_align, blosum62_matrix

    pairs = []
    for _ in range(6):
        t = _random_protein(rng, int(rng.integers(60, 180)))
        pairs.append((_mutate_protein(rng, t, 0.1), t))  # homologous
        pairs.append((t[: len(t) // 2], t))  # truncated query
    pairs.append((_random_protein(rng, 90), _random_protein(rng, 110)))  # unrelated
    q_data, q_off, q_len = _ragged(rng, [p[0] for p in pairs])
    t_data, t_off, t_len = _ragged(rng, [p[1] for p in pairs])
    n = len(pairs)

    matrix8 = ref_matrix()
    outs = {name: np.zeros(n, dtype=np.int32) for name in
            ("scores", "matches", "mismatches", "gaps", "q_starts", "q_ends",
             "t_starts", "t_ends")}
    _batched_banded_gotoh(
        q_data, q_off, q_len, t_data, t_off, t_len, matrix8,
        20, 11, 1, False, np.zeros(n, dtype=np.int32),
        outs["scores"], outs["matches"], outs["mismatches"], outs["gaps"],
        outs["q_starts"], outs["q_ends"], outs["t_starts"], outs["t_ends"],
    )

    k_locals = np.maximum(
        20, np.abs(q_len.astype(np.int64) - t_len.astype(np.int64)) + 1
    ).astype(np.int32)
    ours = batched_swg_align(
        q_data, q_off, q_len, t_data, t_off, t_len,
        np.zeros(n, dtype=np.int32), k_locals,
        matrix=np.asarray(blosum62_matrix(), dtype=np.int32),
        gap_open=11, gap_extend=1,
    )
    for name in outs:
        np.testing.assert_array_equal(getattr(ours, name), outs[name], err_msg=name)


def test_cull_overlaps_matches_reference(rng):
    """Greedy overlap culling keeps/drops the exact same hits under the exact
    same order semantics (ref interval.py:698-751) — a flipped keep decision
    here flips reconstructed hit sets and hence TSV bytes."""
    load_reference()
    from kaptive.core.interval import _cull_overlaps_kernel

    from kaptive_tpu.core.interval import Intervals

    n = 60
    starts = rng.integers(0, 3000, n).astype(np.int32)
    ends = (starts + rng.integers(50, 700, n)).astype(np.int32)
    group1 = rng.integers(0, 3, n).astype(np.int32)
    group2 = rng.integers(0, 2, n).astype(np.int32)
    order = rng.permutation(n).astype(np.int32)  # e.g. score-sorted order
    frac = 0.1

    keep_ref = _cull_overlaps_kernel(order, group1, group2, starts, ends, frac, n)
    iv = Intervals(starts, ends, np.ones(n, dtype=np.int8))
    keep_ours = iv.cull_overlaps(
        order, max_overlap_fraction=frac, group_by=group1, secondary_group_by=group2
    )
    np.testing.assert_array_equal(np.asarray(keep_ours), np.asarray(keep_ref))


def test_cluster_spatial_matches_reference(rng):
    """1-D single-linkage clustering assigns identical cluster ids
    (ref interval.py:595-639)."""
    load_reference()
    from kaptive.core.interval import _cluster_kernel

    from kaptive_tpu.core.interval import Intervals

    n = 80
    starts = rng.integers(0, 50_000, n).astype(np.int32)
    ends = (starts + rng.integers(100, 2_000, n)).astype(np.int32)
    groups = rng.integers(0, 3, n).astype(np.int32)
    tol = 5_000
    order = np.lexsort((ends, starts, groups)).astype(np.int32)
    ref_ids = _cluster_kernel(starts, ends, groups, tol, order)
    iv = Intervals(starts, ends, np.ones(n, dtype=np.int8))
    our_ids = iv.cluster_spatial(tolerance=tol, group_by=groups)
    np.testing.assert_array_equal(np.asarray(our_ids), np.asarray(ref_ids))


def test_translate_matches_reference(rng):
    """Frame-shifted, to-stop translation byte-equal vs the reference ragged
    kernel (ref seq.py:671-741)."""
    load_reference()
    from kaptive.core.seq import Sequences as RefSequences

    from kaptive_tpu.core.seq import Sequences

    from synthetic import make_orf, random_dna

    seqs = [
        make_orf(rng, 50),
        b"AT" + make_orf(rng, 40),  # frame 1 needed
        random_dna(rng, 100),  # junk with internal stops
        make_orf(rng, 30)[:-3] + b"TAG",
    ]
    frames = np.array([0, 1, 0, 0], dtype=np.int64)
    ours = Sequences.from_bytes(seqs)
    ref = RefSequences(
        ids=tuple(str(i) for i in range(len(seqs))),
        seqs=np.asarray(ours.seqs), offsets=np.asarray(ours.offsets),
        lengths=np.asarray(ours.lengths),
    )
    our_prot = ours.translate(frames=frames, to_stop=True)
    ref_prot = ref.translate(frames=frames, to_stop=True)
    for i in range(len(seqs)):
        a = bytes(our_prot.seqs[our_prot.offsets[i]: our_prot.offsets[i] + our_prot.lengths[i]])
        b = bytes(ref_prot.seqs[ref_prot.offsets[i]: ref_prot.offsets[i] + ref_prot.lengths[i]])
        assert a == b, f"seq {i}"
