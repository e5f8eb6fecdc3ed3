"""Device mesh setup + canonical shardings.

The reference is strictly single-device (feature_extraction.py:9 etc.,
SURVEY §2.2: no NCCL/MPI/torch.distributed anywhere); every distribution
strategy here is new design. The mesh has two axes:

  data  — batch-like: ray batches (dense training), images (extraction),
          BA observations (the Schur segment-sums reduce over this axis
          with XLA-inserted psums);
  model — voxel-brick axis: the dense grid shards along its leading X
          dimension; trilinear reads at brick borders become XLA
          collectives (halo exchange via collective-permute / all-gather,
          chosen by SPMD partitioning).

For multi-host pods, call jax.distributed.initialize() before make_mesh —
the same code then spans every host's devices, with collectives riding ICI
within a slice and DCN across slices."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu3d.config import MeshConfig


def make_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    cfg = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(cfg.model_parallel, 1)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        mp = 1
        dp = n
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def data_sharding(mesh: Mesh, ndim: int = 1, axis: int = 0) -> NamedSharding:
    """Shard dimension `axis` over the data mesh axis."""
    spec = [None] * ndim
    spec[axis] = mesh.axis_names[0]
    return NamedSharding(mesh, P(*spec))


def grid_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Voxel grid (X, Y, Z, C) sharded into bricks along X over the model
    axis."""
    spec = [None] * ndim
    spec[0] = mesh.axis_names[1]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
