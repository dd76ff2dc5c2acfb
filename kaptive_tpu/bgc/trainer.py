r"""Trainer for BGC architectural models: archetype clustering + transition learning.

Capability parity with ``/root/reference/src/kaptive/bgc/trainer.py:35-166``:
feature extraction over core locus proteins, MiniBatchKMeans archetype
centroids (sklearn when available, otherwise a built-in mini-batch k-means so
training works without the optional dependency), background centroid,
transition counting with Laplace smoothing, self-loop/NOVEL/edge weighting,
log conversion, and the absorbing-POST structural constraint.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from kaptive_tpu.bgc.kernels import vectorize_orfs
from kaptive_tpu.bgc.models import ArchitecturalModel
from kaptive_tpu.compare import LocusData
from kaptive_tpu.core.kmers import RandstrobeIndex
from kaptive_tpu.core.seq import Sequences


def _minibatch_kmeans(x: np.ndarray, k: int, seed: int = 42, iters: int = 50, batch: int = 256):
    r"""Dependency-free mini-batch k-means fallback (k-means++ init)."""
    rng = np.random.default_rng(seed)
    n = len(x)
    # k-means++ initialisation
    centroids = np.empty((k, x.shape[1]), dtype=np.float64)
    centroids[0] = x[rng.integers(n)]
    d2 = np.sum((x - centroids[0]) ** 2, axis=1)
    for i in range(1, k):
        probs = d2 / max(d2.sum(), 1e-12)
        centroids[i] = x[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, np.sum((x - centroids[i]) ** 2, axis=1))
    counts = np.ones(k)
    for _ in range(iters):
        sel = rng.integers(0, n, min(batch, n))
        xb = x[sel]
        dists = ((xb[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(dists, axis=1)
        for j, a in zip(sel, assign):
            counts[a] += 1
            centroids[a] += (x[j] - centroids[a]) / counts[a]
    dists = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(dists, axis=1), centroids


class ArchitecturalTrainer:
    r"""Learns archetype centroids and state transitions from known BGC loci."""

    def __init__(
        self,
        num_archetypes: int = 25,
        feature_dim: int = 1024,
        partial_edge_tolerance: float = 5.0,
    ) -> None:
        self.num_archetypes = num_archetypes
        self.feature_dim = feature_dim
        self.partial_edge_tolerance = partial_edge_tolerance

    def train(
        self,
        loci: Sequence[LocusData],
        background_proteins: Sequences | None = None,
    ) -> ArchitecturalModel:
        all_seqs = Sequences.concat([locus.proteins for locus in loci])

        idx = RandstrobeIndex.build(all_seqs, sort_by_hash=False)
        x_core = vectorize_orfs(
            idx.records["hash"], idx.records["seq_idx"], len(all_seqs), self.feature_dim
        )

        if background_proteins is not None and len(background_proteins) > 0:
            bg_idx = RandstrobeIndex.build(background_proteins, sort_by_hash=False)
            x_bg = vectorize_orfs(
                bg_idx.records["hash"], bg_idx.records["seq_idx"],
                len(background_proteins), self.feature_dim,
            )
            bg_centroid = x_bg.mean(axis=0)
        else:
            bg_centroid = np.zeros(self.feature_dim, dtype=np.float32)

        try:
            from sklearn.cluster import MiniBatchKMeans

            kmeans = MiniBatchKMeans(n_clusters=self.num_archetypes, random_state=42, n_init="auto")
            archetypes = kmeans.fit_predict(x_core)
            centroids = kmeans.cluster_centers_
        except ImportError:
            archetypes, centroids = _minibatch_kmeans(x_core, self.num_archetypes)

        gene_state_map = archetypes + 1  # 0 is PRE

        num_states = self.num_archetypes + 3
        transitions = np.zeros((num_states, num_states), dtype=np.float32)
        PRE, NOVEL, POST = 0, self.num_archetypes + 1, self.num_archetypes + 2

        offset = 0
        for locus in loci:
            length = len(locus.proteins)
            if length == 0:
                continue
            prev_state = PRE
            for i in range(length):
                curr_state = gene_state_map[offset + i]
                transitions[prev_state, curr_state] += 1.0
                prev_state = curr_state
            transitions[prev_state, POST] += 1.0
            offset += length

        transitions += 0.1  # Laplace smoothing
        transitions[PRE, PRE] += 100.0
        transitions[POST, POST] += 100.0
        transitions[1:NOVEL, NOVEL] += 5.0
        transitions[NOVEL, 1:NOVEL] += 5.0
        transitions[NOVEL, NOVEL] += 10.0
        transitions[PRE, 1:NOVEL] += self.partial_edge_tolerance
        transitions[1:NOVEL, POST] += self.partial_edge_tolerance

        row_sums = transitions.sum(axis=1, keepdims=True)
        trans_log_probs = np.log(transitions / row_sums)
        trans_log_probs[POST, :] = -np.inf
        trans_log_probs[POST, POST] = 0.0

        return ArchitecturalModel(
            centroids=np.ascontiguousarray(centroids.astype(np.float32)),
            bg_centroid=np.ascontiguousarray(bg_centroid.astype(np.float32)),
            transitions=np.ascontiguousarray(trans_log_probs.astype(np.float32)),
        )
