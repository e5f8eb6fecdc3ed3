"""Reference-format ray dataset I/O.

The reference's dense trainers consume an *external* pickled numpy array of
shape (N, 9) — rows of [ray_origin(3), ray_dir(3), rgb(3)] — loaded with
``np.load(path, allow_pickle=True)`` (sdf.py:420, plenoxel.py:126-127; the
paths are hard-coded absolute). This module reads and writes that exact
format so ray datasets produced for the reference train here unchanged
(CLI: ``densify --rays-pkl``), and ours export back (``save_ray_dataset``).
"""
from __future__ import annotations

import numpy as np

from tpu3d.dense.train import RayDataset


def load_ray_dataset(path: str) -> RayDataset:
    """Load a reference-protocol (N, 9) pickled/plain numpy ray dataset."""
    arr = np.load(path, allow_pickle=True)
    arr = np.asarray(arr, np.float32)
    if arr.ndim != 2 or arr.shape[1] < 9:
        raise ValueError(
            f"{path}: expected an (N, 9) array of [origin, dir, rgb] rows "
            f"(reference training_data.pkl protocol), got {arr.shape}"
        )
    dirs = arr[:, 3:6]
    n = np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs / np.maximum(n, 1e-12)
    rgb = arr[:, 6:9]
    if rgb.max() > 1.5:  # tolerate 0-255 datasets
        rgb = rgb / 255.0
    return RayDataset(origins=arr[:, :3].copy(), dirs=dirs.astype(np.float32),
                      rgb=np.clip(rgb, 0.0, 1.0).astype(np.float32))


def save_ray_dataset(path: str, ds: RayDataset) -> None:
    """Write a RayDataset as the reference's (N, 9) pickle protocol."""
    arr = np.concatenate([
        np.asarray(ds.origins, np.float32),
        np.asarray(ds.dirs, np.float32),
        np.asarray(ds.rgb, np.float32),
    ], axis=1)
    # np.load(..., allow_pickle=True) on an .npy written by np.save reads
    # plain arrays too — match the reference's loader exactly.
    with open(path, "wb") as f:
        np.save(f, arr, allow_pickle=True)
