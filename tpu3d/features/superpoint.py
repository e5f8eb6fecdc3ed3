"""SuperPoint detector/descriptor as a JAX/Flax forward pass.

The second learned front-end named by BASELINE.json (configs[2]). VGG-style
backbone (64-64 / 64-64 / 128-128 / 128-128 with 2x maxpools), a 65-channel
cell-softmax detection head unpacked to full resolution, iterative-maxpool
NMS, and a 256-D descriptor head sampled bilinearly at keypoint locations —
batched, fixed-shape, jit-compiled. `convert_torch_state_dict` maps the
published MagicLeap/LightGlue checkpoint naming onto these params
(parity-tested against the reference torch implementation with random
weights in tests/test_superpoint.py)."""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class SuperPointNet(nn.Module):
    """Backbone + heads. Input (B, H, W, 1) float in [0, 1]; H, W % 8 == 0.
    Returns (scores (B, H, W), desc_map (B, H/8, W/8, 256))."""

    @nn.compact
    def __call__(self, x):
        def c(f, k, name):
            return nn.Conv(f, (k, k), padding="SAME", name=name)

        relu = jax.nn.relu
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))
        x = relu(c(64, 3, "conv1a")(x))
        x = relu(c(64, 3, "conv1b")(x))
        x = pool(x)
        x = relu(c(64, 3, "conv2a")(x))
        x = relu(c(64, 3, "conv2b")(x))
        x = pool(x)
        x = relu(c(128, 3, "conv3a")(x))
        x = relu(c(128, 3, "conv3b")(x))
        x = pool(x)
        x = relu(c(128, 3, "conv4a")(x))
        x = relu(c(128, 3, "conv4b")(x))

        cpa = relu(c(256, 3, "convPa")(x))
        logits = c(65, 1, "convPb")(cpa)           # (B, h, w, 65)
        probs = jax.nn.softmax(logits, axis=-1)[..., :64]
        b, h, w, _ = probs.shape
        scores = probs.reshape(b, h, w, 8, 8)
        scores = jnp.transpose(scores, (0, 1, 3, 2, 4)).reshape(b, h * 8, w * 8)

        cda = relu(c(256, 3, "convDa")(x))
        desc = c(256, 1, "convDb")(cda)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)
        return scores, desc


def simple_nms(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Iterative max-pool NMS (torch reference superpoint.py:50-65)."""
    win = 2 * radius + 1

    def maxpool(x):
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, win, win), (1, 1, 1), "SAME")

    zeros = jnp.zeros_like(scores)
    max_mask = scores == maxpool(scores)
    for _ in range(2):
        supp_mask = maxpool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == maxpool(supp_scores)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    return jnp.where(max_mask, scores, zeros)


class SuperPointFeatures(NamedTuple):
    keypoints: jnp.ndarray    # (B, K, 2) pixel (x, y)
    scores: jnp.ndarray       # (B, K)
    descriptors: jnp.ndarray  # (B, K, 256)
    valid: jnp.ndarray        # (B, K)


def _sample_desc(desc_map: jnp.ndarray, kpts: jnp.ndarray, s: int = 8) -> jnp.ndarray:
    """Bilinear descriptor sampling at pixel keypoints (reference
    sample_descriptors semantics, align_corners=True). desc_map:
    (h, w, C); kpts: (K, 2)."""
    h, w, C = desc_map.shape
    # map pixel coords to descriptor-grid continuous coords
    kp = (kpts - s / 2 + 0.5)
    gx = kp[:, 0] / (w * s - s / 2 - 0.5) * (w - 1)
    gy = kp[:, 1] / (h * s - s / 2 - 0.5) * (h - 1)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, h - 2)
    fx = (gx - x0)[:, None]
    fy = (gy - y0)[:, None]
    d00 = desc_map[y0, x0]
    d01 = desc_map[y0, x0 + 1]
    d10 = desc_map[y0 + 1, x0]
    d11 = desc_map[y0 + 1, x0 + 1]
    d = (d00 * (1 - fy) * (1 - fx) + d01 * (1 - fy) * fx
         + d10 * fy * (1 - fx) + d11 * fy * fx)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)


@functools.partial(jax.jit, static_argnames=("max_keypoints", "nms_radius", "remove_borders"))
def extract_superpoint(
    params: Dict[str, Any],
    images_gray: jnp.ndarray,
    max_keypoints: int = 2048,
    nms_radius: int = 4,
    detection_threshold: float = 0.0005,
    remove_borders: int = 4,
) -> SuperPointFeatures:
    """(B, H, W) grayscale in [0,1] -> fixed-K SuperPoint features."""
    B, H, W = images_gray.shape
    scores, desc_map = SuperPointNet().apply(params, images_gray[..., None])
    scores = simple_nms(scores, nms_radius)
    if remove_borders:
        p = remove_borders
        mask = jnp.zeros((H, W), bool).at[p : H - p, p : W - p].set(True)
        scores = jnp.where(mask[None], scores, 0.0)
    flat = scores.reshape(B, -1)
    vals, idx = jax.lax.top_k(flat, max_keypoints)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    valid = vals > detection_threshold
    kpts = jnp.stack([xs, ys], axis=-1)
    desc = jax.vmap(_sample_desc)(desc_map, kpts)
    return SuperPointFeatures(kpts, jnp.where(valid, vals, 0.0), desc * valid[..., None], valid)


def convert_torch_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map the torch SuperPoint state_dict (conv{1a..4b}, convPa/Pb/Da/Db)
    onto SuperPointNet params (torch OIHW -> flax HWIO)."""

    def t(k):
        v = sd[k]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    p = {}
    for name in ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
                 "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]:
        p[name] = {
            "kernel": np.transpose(t(f"{name}.weight"), (2, 3, 1, 0)),
            "bias": t(f"{name}.bias"),
        }
    return {"params": p}
