"""Differential test: our BGC kernels vs the REFERENCE's own kernels.

The reference's BGC stack is four numba kernels
(/root/reference/src/kaptive/bgc/kernels.py): bag-of-strobemer featurisation,
sliding-window smoothing, archetype emissions, and the architectural Viterbi.
With numba stubbed (tests/ref_oracle.py) they run as plain Python, so the same
inputs can be pushed through both stacks and the outputs compared directly —
the strongest available parity evidence for the vectorised/JAX re-derivations.
"""

import numpy as np
import pytest

from ref_oracle import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)


@pytest.fixture(scope="module")
def ref_kernels():
    load_reference()
    import kaptive.bgc.kernels as rk

    return rk


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1234)


def _fixture_features(rng, n=40, d=64):
    return rng.random((n, d), dtype=np.float32)


def test_vectorize_orfs_matches_reference(ref_kernels, rng):
    from kaptive_tpu.bgc.kernels import vectorize_orfs

    num_seqs, feature_dim = 12, 64
    n_records = 400
    seq_indices = np.sort(rng.integers(0, num_seqs, n_records)).astype(np.int64)
    hashes = rng.integers(0, 2**63, n_records, dtype=np.uint64)

    records = np.zeros(n_records, dtype=np.dtype([("hash", np.uint64)]))
    records["hash"] = hashes
    offsets = np.searchsorted(seq_indices, np.arange(num_seqs)).astype(np.uint64)

    theirs = ref_kernels.vectorize_orfs_kernel(records, offsets, num_seqs, feature_dim)
    ours = vectorize_orfs(hashes, seq_indices, num_seqs, feature_dim)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_contextualize_matches_reference(ref_kernels, rng):
    from kaptive_tpu.bgc.kernels import contextualize_features

    feats = _fixture_features(rng)
    for window in (1, 2, 5):
        theirs = ref_kernels.contextualize_features_kernel(feats, window)
        ours = np.asarray(contextualize_features(feats, window))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_emissions_match_reference(ref_kernels, rng):
    from kaptive_tpu.bgc.kernels import archetype_emissions

    feats = _fixture_features(rng, n=30, d=48)
    centroids = rng.random((5, 48), dtype=np.float32)
    bg = rng.random(48, dtype=np.float32)
    novelty = -3.25
    theirs = ref_kernels.archetype_emissions_kernel(feats, centroids, bg, novelty)
    ours = np.asarray(archetype_emissions(feats, centroids, bg, novelty))
    # Same state layout: PRE | archetypes | NOVEL | POST.
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_viterbi_matches_reference(ref_kernels, rng):
    from kaptive_tpu.bgc.kernels import architectural_viterbi

    n_states = 8
    for trial in range(5):
        n = int(rng.integers(3, 60))
        emissions = rng.normal(0, 2, (n, n_states)).astype(np.float32)
        transitions = np.log(
            rng.dirichlet(np.ones(n_states), size=n_states).astype(np.float32)
        ).astype(np.float32)
        ref_path, ref_prob = ref_kernels.architectural_viterbi_kernel(
            emissions, transitions
        )
        path, prob = architectural_viterbi(emissions, transitions)
        np.testing.assert_array_equal(np.asarray(path), ref_path, err_msg=f"trial {trial}")
        assert float(prob) == pytest.approx(float(ref_prob), rel=1e-4)
