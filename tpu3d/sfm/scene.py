"""Reconstruction result container + export."""
from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np

from tpu3d.core import lie
import jax.numpy as jnp


@dataclasses.dataclass
class Reconstruction:
    """Final sparse reconstruction (the analog of the reference's
    cameras_extrinsic.npy / points_3d.npy / reconstructed_img.txt output
    set, sfm.py:139-147)."""

    image_names: List[str]
    registered: np.ndarray          # (M,) image indices with cameras
    cams: np.ndarray                # (M, 6) [rvec|t] world->cam
    points: np.ndarray              # (P, 3)
    colors_bgr: np.ndarray          # (P, 3) uint8
    track_ids: np.ndarray           # (P,) global track id per point
    mean_reproj_px: float
    num_obs: int
    # Image indices registered by the --register-all low-confidence pass
    # (SfMConfig.register_all): placed AFTER the final BA via relaxed
    # relative-pose chaining, never part of the BA gauge; dense training
    # excludes them by default. The reference registers 290/290 only by
    # never rejecting anything (sfm.py:139-143) — this mode matches that
    # count while keeping the flagged cameras out of everything that
    # defines quality.
    low_confidence: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int64))
    # Per-registered-image mean reprojection error (px) — the camera-trust
    # signal dense training/eval can gate on (engine.per_camera_reproj).
    per_cam_reproj_px: Dict[int, float] = dataclasses.field(
        default_factory=dict)

    def extrinsics(self) -> np.ndarray:
        """(M, 3, 4) [R|t] matrices (ref cameras_extrinsic.npy format)."""
        R = np.stack([lie.so3_exp_np(c) for c in self.cams[:, :3]])
        return np.concatenate([R, self.cams[:, 3:6][..., None]], axis=-1)

    def registered_names(self) -> List[str]:
        return [self.image_names[i] for i in self.registered]
