"""DISK learned feature extractor as a JAX/Flax forward pass.

Architecture per the DISK paper (Tyszkiewicz et al., NeurIPS 2020) and the
public kornia/DISK implementation the reference loads
(feature_extraction.py:10 via lightglue.DISK -> kornia.feature.DISK,
weights='depth'): a thin U-Net over RGB with

  down channels [16, 32, 64, 64, 64], up channels [64, 64, 64, 129],
  5x5 convolutions, InstanceNorm + PReLU gates, average-pool downsampling,
  nearest-neighbor upsampling, skip concatenation,

producing a (H, W, 129) map = 128-D descriptors + 1 detection heatmap.
Keypoints: window NMS on the heatmap + top-K selection, L2-normalized
descriptors sampled at keypoint locations — all batched under jit.

`convert_kornia_state_dict` maps a kornia DISK checkpoint onto these
params (kornia is not installed in this environment, so conversion is
validated structurally; the classical frontend remains the default until a
checkpoint is supplied)."""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvGN(nn.Module):
    """5x5 conv + InstanceNorm + PReLU (one 'thin' unet block)."""

    features: int
    name_prefix: str = ""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (5, 5), padding="SAME", name="conv")(x)
        # InstanceNorm: normalize over spatial dims per channel per sample.
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (self.features,))
        return jnp.where(x >= 0, x, alpha * x)


class DiskUNet(nn.Module):
    """Thin U-Net: down [16,32,64,64,64] / up [64,64,64,129]."""

    down_channels: Tuple[int, ...] = (16, 32, 64, 64, 64)
    up_channels: Tuple[int, ...] = (64, 64, 64, 129)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        skips = []
        for i, ch in enumerate(self.down_channels):
            if i > 0:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = ConvGN(ch, name=f"down_{i}")(x)
            skips.append(x)
        x = skips[-1]
        for i, ch in enumerate(self.up_channels):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            skip = skips[len(self.down_channels) - 2 - i]
            x = jnp.concatenate([x, skip], axis=-1)
            last = i == len(self.up_channels) - 1
            if last:
                x = nn.Conv(ch, (1, 1), padding="SAME", name=f"up_{i}_conv")(x)
            else:
                x = ConvGN(ch, name=f"up_{i}")(x)
        return x  # (B, H, W, 129)


class DiskFeatures(NamedTuple):
    keypoints: jnp.ndarray    # (B, K, 2) pixel coords
    scores: jnp.ndarray       # (B, K)
    descriptors: jnp.ndarray  # (B, K, 128)
    valid: jnp.ndarray        # (B, K)


def detect_from_heatmap(
    heatmap: jnp.ndarray,
    desc_map: jnp.ndarray,
    max_keypoints: int = 2048,
    window: int = 5,
    threshold: float = 0.0,
) -> DiskFeatures:
    """Window NMS + top-K on the DISK heatmap (kornia's
    heatmap_to_keypoints equivalent, batched fixed-shape)."""
    B, H, W = heatmap.shape
    pooled = jax.lax.reduce_window(
        heatmap, -jnp.inf, jax.lax.max, (1, window, 1), (1, 1, 1), "SAME"
    )
    pooled = jax.lax.reduce_window(
        pooled, -jnp.inf, jax.lax.max, (1, 1, window), (1, 1, 1), "SAME"
    )
    score = jnp.where((heatmap >= pooled) & (heatmap > threshold), heatmap, -jnp.inf)
    flat = score.reshape(B, -1)
    vals, idx = jax.lax.top_k(flat, max_keypoints)
    ys = idx // W
    xs = idx % W
    valid = jnp.isfinite(vals)
    desc = jax.vmap(lambda dm, y, x: dm[y, x])(desc_map, ys, xs)  # (B, K, 128)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)
    kp = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
    return DiskFeatures(kp, jnp.where(valid, vals, 0.0), desc * valid[..., None], valid)


def extract_disk(
    params: Dict[str, Any],
    images_rgb: jnp.ndarray,
    max_keypoints: int = 2048,
    window: int = 5,
) -> DiskFeatures:
    """Run DISK on (B, H, W, 3) float images in [0, 1]. H and W must be
    multiples of 16 (pad beforehand — ref DISK pads too)."""
    net = DiskUNet()
    out = net.apply(params, images_rgb)
    desc_map = out[..., :128]
    heat = out[..., 128]
    return detect_from_heatmap(heat, desc_map, max_keypoints, window)


def convert_kornia_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map kornia.feature.DISK state_dict tensors onto DiskUNet params.

    kornia names (DISK 'depth' checkpoint):
      unet.path_down.{i}.{j}.conv.weight/bias + ...gate.weight (PReLU)
      unet.path_up.{i}... (layout differs slightly across kornia versions;
      this mapper targets kornia >= 0.7 thin-unet naming)."""

    def t(k):
        v = sd[k]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    def conv(k):
        # torch OIHW -> flax HWIO
        return np.transpose(t(k + ".weight"), (2, 3, 1, 0)), t(k + ".bias")

    p: Dict[str, Any] = {}
    keys = list(sd.keys())

    def find(prefix_opts):
        for pre in prefix_opts:
            if any(k.startswith(pre) for k in keys):
                return pre
        raise KeyError(f"none of {prefix_opts} in checkpoint")

    down_pre = find(["unet.path_down", "unet.down"])
    up_pre = find(["unet.path_up", "unet.up"])
    for i in range(5):
        # the first block has no downsample submodule; conv path index differs
        cands = [f"{down_pre}.{i}.1.conv", f"{down_pre}.{i}.0.conv", f"{down_pre}.{i}.conv"]
        base = next(c for c in cands if c + ".weight" in sd)
        w, b = conv(base)
        gate = base.rsplit(".conv", 1)[0] + ".gate"
        alpha = t(gate + ".weight") if gate + ".weight" in sd else np.full(w.shape[-1], 0.25, np.float32)
        p[f"down_{i}"] = {"conv": {"kernel": w, "bias": b}, "prelu_alpha": alpha.reshape(-1)}
    for i in range(4):
        cands = [f"{up_pre}.{i}.1.conv", f"{up_pre}.{i}.conv", f"{up_pre}.{i}.0.conv"]
        base = next((c for c in cands if c + ".weight" in sd), None)
        if base is None:  # final 1x1 projection layer
            cands = [f"{up_pre}.{i}.1", f"{up_pre}.{i}"]
            base = next(c for c in cands if c + ".weight" in sd)
            w, b = conv(base)
            p[f"up_{i}_conv"] = {"kernel": w, "bias": b}
            continue
        w, b = conv(base)
        if i == 3:
            p[f"up_{i}_conv"] = {"kernel": w, "bias": b}
        else:
            gate = base.rsplit(".conv", 1)[0] + ".gate"
            alpha = t(gate + ".weight") if gate + ".weight" in sd else np.full(w.shape[-1], 0.25, np.float32)
            p[f"up_{i}"] = {"conv": {"kernel": w, "bias": b}, "prelu_alpha": alpha.reshape(-1)}
    return {"params": p}
