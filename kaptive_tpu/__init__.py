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

import os as _os

from kaptive_tpu._version import __version__

__all__ = ["__version__"]


def _enable_persistent_compilation_cache() -> None:
    """Cache compiled XLA programs across processes (device compiles are slow
    on tunneled TPUs). Set KAPTIVE_TPU_NO_JAX_CACHE=1 to disable."""
    if _os.environ.get("KAPTIVE_TPU_NO_JAX_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "KAPTIVE_TPU_JAX_CACHE", _os.path.expanduser("~/.cache/kaptive_tpu_jax")
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def _maybe_force_cpu() -> None:
    """KAPTIVE_TPU_FORCE_CPU=1 pins the default device to CPU (some TPU
    plugins ignore JAX_PLATFORMS); used by tests and CI."""
    if not _os.environ.get("KAPTIVE_TPU_FORCE_CPU"):
        return
    try:
        import jax

        jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])
    except Exception:
        pass


_enable_persistent_compilation_cache()
_maybe_force_cpu()
