r"""kaptive-tpu: a TPU-native bacterial surface-antigen locus-typing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Kaptive 3
(reference: ``/root/reference/src/kaptive``): *in silico* K/O/OC-locus serotyping
of genome assemblies against decentralised GenBank+TOML reference databases,
plus database lifecycle management, result conversion, multi-locus comparison
with interactive plots, and a BGC annotate/predict/train toolkit.

Architecture (TPU-first, not a port):

- The reference wraps a Rust minimap2-class mapper (``rammappy``) and ~25 Numba
  CPU kernels.  Here the nucleotide mapping core (minimizer seeding, chaining,
  banded Smith-Waterman-Gotoh extension) and the protein identity DP run on TPU
  via JAX + Pallas kernels (``kaptive_tpu.ops``), batched over genes/assemblies
  with fixed shapes and length masks.
- The compiled reference database is packed into flat device-ready arrays
  (``kaptive_tpu.db``) and replicated (or locus-sharded) across a
  ``jax.sharding.Mesh``; assembly batches stream data-parallel via ``shard_map``
  (``kaptive_tpu.parallel``).
- Host-side orchestration (FASTA/GenBank parsing, report formatting, tiny
  array glue between device phases) lives in ``kaptive_tpu.core`` /
  ``kaptive_tpu.serotyping`` as vectorised numpy mirroring the reference's
  Structure-of-Arrays semantics exactly, so typing calls match.
"""

from kaptive_tpu._version import __version__

__all__ = ["__version__"]
