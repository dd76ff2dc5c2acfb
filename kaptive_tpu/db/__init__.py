r"""Reference database: compile (GenBank+TOML -> packed SoA), cache, lifecycle.

Capability parity with ``/root/reference/src/kaptive/db``.
"""

from kaptive_tpu.db.core import Database
from kaptive_tpu.db.manager import DatabaseManager
from kaptive_tpu.db.models import DatabaseError, DatabaseMetadata, Phenotype, Phenotypes

__all__ = [
    "Database",
    "DatabaseError",
    "DatabaseManager",
    "DatabaseMetadata",
    "Phenotype",
    "Phenotypes",
]
