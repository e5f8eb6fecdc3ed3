from tpu3d.sfm.engine import IncrementalSfM, PairObservations
from tpu3d.sfm.scene import Reconstruction

__all__ = ["IncrementalSfM", "PairObservations", "Reconstruction"]
