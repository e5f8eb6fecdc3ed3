"""Learned front-end dispatch: batched DISK / SuperPoint extraction behind
the classical frontend's FeatureSet interface.

The reference's production front-end IS learned — DISK with
max_num_keypoints=2048 (feature_extraction.py:10,28). This module makes the
learned Flax forwards (features/disk.py, features/superpoint.py) drop-in
replacements for the classical extractor in the pipeline: same FeatureSet,
same centered y-up keypoint convention (feature_extraction.py:34), same
fixed keypoint budget.

Weights come from `FrontendConfig.weights`: a torch checkpoint (.pth/.pt,
converted through the per-model `convert_*_state_dict` mappers) or a
pre-converted flat .npz written by `save_params_npz` (no torch needed at
load time). The published checkpoints cannot be downloaded in this offline
environment, so conversion is exercised in tests with randomly initialized
torch modules; dropping a real checkpoint file in makes the path production.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from tpu3d.config import FrontendConfig
from tpu3d.core.camera import pixel_to_centered
from tpu3d.features.frontend import FeatureSet


# ---------------------------------------------------------------------------
# Param persistence: flax param pytrees <-> flat .npz
# ---------------------------------------------------------------------------

def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(path: str, params: Dict[str, Any]) -> None:
    """Persist a (converted) flax param tree as a flat npz — lets the
    pipeline load learned weights without torch installed."""
    np.savez_compressed(path, **_flatten(params))


def load_params_npz(path: str) -> Dict[str, Any]:
    z = np.load(path)
    return _unflatten({k: z[k] for k in z.files})


def load_frontend_params(model: str, weights_path: str) -> Dict[str, Any]:
    """Load + convert front-end weights for `model` in {disk, superpoint}."""
    if weights_path.endswith(".npz"):
        return load_params_npz(weights_path)
    import torch

    sd = torch.load(weights_path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if model == "disk":
        from tpu3d.features.disk import convert_kornia_state_dict

        return convert_kornia_state_dict(sd)
    if model == "superpoint":
        from tpu3d.features.superpoint import convert_torch_state_dict

        return convert_torch_state_dict(sd)
    raise ValueError(f"unknown learned frontend {model!r}")


def load_matcher_params(weights_path: str, n_layers: int = 9) -> Dict[str, Any]:
    """Load + convert LightGlue weights (.pth via torch, or flat .npz)."""
    if weights_path.endswith(".npz"):
        return load_params_npz(weights_path)
    from tpu3d.matching.lightglue import load_torch_checkpoint

    return load_torch_checkpoint(weights_path, n_layers)


# ---------------------------------------------------------------------------
# Batched extraction behind the FeatureSet interface
# ---------------------------------------------------------------------------

def _pad16(hw: int) -> int:
    return (hw + 15) // 16 * 16


@functools.partial(jax.jit, static_argnames=("max_keypoints",))
def _disk_featureset(params, rgb_f32, orig_w, orig_h, max_keypoints):
    """(B, Hp, Wp, 3) padded float RGB -> FeatureSet. Full f32: the TPU
    default bf16 conv passes measurably perturb match sets (frontend.py)."""
    from tpu3d.features.disk import extract_disk

    with jax.default_matmul_precision("float32"):
        f = extract_disk(params, rgb_f32, max_keypoints=max_keypoints)
    return _to_featureset(f.keypoints, f.scores, f.descriptors, f.valid,
                          orig_w, orig_h)


@functools.partial(jax.jit, static_argnames=("max_keypoints",))
def _superpoint_featureset(params, gray_f32, orig_w, orig_h, max_keypoints):
    from tpu3d.features.superpoint import extract_superpoint

    with jax.default_matmul_precision("float32"):
        f = extract_superpoint(params, gray_f32, max_keypoints=max_keypoints)
    return _to_featureset(f.keypoints, f.scores, f.descriptors, f.valid,
                          orig_w, orig_h)


def _to_featureset(kp_px, scores, desc, valid, orig_w, orig_h):
    """Pixel keypoints on the (possibly padded) canvas -> FeatureSet in the
    ORIGINAL image frame: pad-region detections invalidated, centered y-up
    coords computed against the original (W, H)."""
    B, K, _ = kp_px.shape
    in_bounds = (kp_px[..., 0] < orig_w) & (kp_px[..., 1] < orig_h)
    valid = valid & in_bounds
    scores = jnp.where(valid, scores, 0.0)
    desc = desc * valid[..., None].astype(desc.dtype)
    size = jnp.broadcast_to(
        jnp.stack([orig_w, orig_h]).astype(jnp.float32), (B, 2))
    kp_centered = pixel_to_centered(kp_px, size[:, None, :])
    return FeatureSet(
        keypoints=kp_centered,
        keypoints_px=kp_px,
        descriptors=desc,
        scores=scores,
        scales=jnp.ones((B, K), jnp.float32),  # learned models are single-scale
        valid=valid,
        image_size=size,
    )


def extract_learned(params: Dict[str, Any], model: str, gray_u8: np.ndarray,
                    rgb_u8: np.ndarray, cfg: FrontendConfig) -> FeatureSet:
    """Run the learned extractor on one uint8 image batch.

    gray_u8: (B, H, W); rgb_u8: (B, H, W, 3). DISK consumes RGB and needs
    H, W divisible by 16 (zero-padded here, pad detections masked);
    SuperPoint consumes grayscale at any size divisible by 8 (same pad)."""
    B, H, W = gray_u8.shape
    Hp, Wp = _pad16(H), _pad16(W)
    if model == "disk":
        img = np.zeros((B, Hp, Wp, 3), np.float32)
        img[:, :H, :W] = rgb_u8.astype(np.float32) / 255.0
        return _disk_featureset(params, jnp.asarray(img),
                                jnp.float32(W), jnp.float32(H),
                                cfg.max_keypoints)
    if model == "superpoint":
        img = np.zeros((B, Hp, Wp), np.float32)
        img[:, :H, :W] = gray_u8.astype(np.float32) / 255.0
        return _superpoint_featureset(params, jnp.asarray(img),
                                      jnp.float32(W), jnp.float32(H),
                                      cfg.max_keypoints)
    raise ValueError(f"unknown learned frontend {model!r}")
