r"""BGC architectural model container with ``.npz`` persistence.

Capability parity with ``/root/reference/src/kaptive/bgc/models.py:17-76``.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np
import numpy.typing as npt


@dataclass
class ArchitecturalModel:
    r"""HMM parameters: archetype centroids, background centroid, log transitions."""

    centroids: npt.NDArray[np.float32]
    bg_centroid: npt.NDArray[np.float32]
    transitions: npt.NDArray[np.float32]

    def save(self, path: str | Path) -> None:
        np.savez_compressed(
            Path(path),
            centroids=self.centroids,
            bg_centroid=self.bg_centroid,
            transitions=self.transitions,
        )

    @classmethod
    def load(cls, path: str | Path) -> "ArchitecturalModel":
        weights = np.load(Path(path))
        return cls(
            centroids=np.ascontiguousarray(weights["centroids"].astype(np.float32)),
            bg_centroid=np.ascontiguousarray(weights["bg_centroid"].astype(np.float32)),
            transitions=np.ascontiguousarray(weights["transitions"].astype(np.float32)),
        )
