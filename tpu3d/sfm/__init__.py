from tpu3d.sfm.engine import (
    EdgeObservations,
    ImageRegistration,
    IncrementalSfM,
    PairObservations,
)
from tpu3d.sfm.scene import Reconstruction

__all__ = [
    "EdgeObservations",
    "ImageRegistration",
    "IncrementalSfM",
    "PairObservations",
    "Reconstruction",
]
