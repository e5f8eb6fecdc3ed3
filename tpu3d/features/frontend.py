"""Classical TPU-native feature front-end (stage 1 of the pipeline).

Replaces the reference's ``feature_extraction.py`` (DISK on CUDA): batched
grayscale images in, a fixed-capacity :class:`FeatureSet` out — keypoints in
the reference's centered y-up coordinate convention
(feature_extraction.py:34), per-keypoint colors (:32), image sizes, and
L2-normalized 128-D descriptors with the same 2048-keypoint budget (:10).

The whole extractor is ONE jitted program per image batch: pyramid
convolutions, DoG extrema, NMS, subpixel refinement, orientation histograms
and descriptors, then a global top-K merge across octaves. A learned DISK
forward pass (features/disk.py) can be swapped in when converted weights are
available; the classical path has no weights and runs anywhere.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpu3d.config import FrontendConfig
from tpu3d.core.camera import pixel_to_centered
from tpu3d.features.pyramid import build_pyramid
from tpu3d.features.detector import detect_octave
from tpu3d.features.descriptor import (gradients, orient_and_describe,
                                        sift_descriptors)


class FeatureSet(NamedTuple):
    keypoints: jnp.ndarray     # (B, K, 2) centered y-up coords
    keypoints_px: jnp.ndarray  # (B, K, 2) pixel coords (x, y)
    descriptors: jnp.ndarray   # (B, K, 128)
    scores: jnp.ndarray        # (B, K)
    scales: jnp.ndarray        # (B, K) absolute sigma in full-res pixels
    valid: jnp.ndarray         # (B, K) bool
    image_size: jnp.ndarray    # (B, 2) = (W, H)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_keypoints",
        "num_octaves",
        "scales_per_octave",
        "sigma0",
        "contrast_threshold",
        "edge_threshold",
        "nms_radius",
        "upright",
        "fused",
        "approx_topk_recall",
        "patch_precision",
        "orient_precision",
    ),
)
def _extract(
    images: jnp.ndarray,
    max_keypoints: int,
    num_octaves: int,
    scales_per_octave: int,
    sigma0: float,
    contrast_threshold: float,
    edge_threshold: float,
    nms_radius: int,
    upright: bool = False,
    fused: bool | None = None,
    approx_topk_recall: float = 0.0,
    patch_precision: str = "highest",
    orient_precision: str | None = None,
) -> FeatureSet:
    B, H, W = images.shape
    if images.dtype == jnp.uint8:  # uint8 upload path (4x less link traffic)
        images = images.astype(jnp.float32) / 255.0
    # Full f32: the TPU default runs convs/matmuls in bf16 passes, which
    # perturbs DoG extrema and descriptor histograms enough to measurably
    # change match sets vs the CPU backend (TPU-extracted features
    # registered 252/290 vs 276/290 for CPU-extracted on the same engine).
    # The pyramid/descriptor compute is a trivial fraction of wall-clock.
    with jax.default_matmul_precision("float32"):
        return _extract_f32(images, max_keypoints, num_octaves,
                            scales_per_octave, sigma0, contrast_threshold,
                            edge_threshold, nms_radius, upright, fused,
                            approx_topk_recall, patch_precision,
                            orient_precision)


def _extract_f32(images, max_keypoints, num_octaves, scales_per_octave,
                 sigma0, contrast_threshold, edge_threshold, nms_radius,
                 upright=False, fused=None, approx_topk_recall=0.0,
                 patch_precision="highest", orient_precision=None):
    """Detect per octave, merge the global top-K by score FIRST, then run
    orientation + descriptors ONCE for the K winners against a unified
    (octave, image)-stacked gradient pyramid.

    The per-keypoint Pallas sampling dispatches are the dominant extraction
    cost, and computing descriptors for every octave's K candidates before
    the merge did num_octaves x the necessary work (the reference pays the
    same kind of cost inside DISK's dense CNN instead,
    feature_extraction.py:28). Selection is identical: the merge only needs
    detector scores, which don't depend on descriptors."""
    B, H, W = images.shape
    O = num_octaves
    S = scales_per_octave
    K = max_keypoints
    gauss, dogs = build_pyramid(images, O, S, sigma0)

    xs, ys, scores, scales_loc, valids = [], [], [], [], []
    for o in range(O):
        kp = detect_octave(
            dogs[o], K, contrast_threshold, edge_threshold, nms_radius,
            approx_topk_recall,
        )
        xs.append(kp.x)
        ys.append(kp.y)
        scores.append(kp.score)
        scales_loc.append(kp.scale)
        valids.append(kp.valid)

    # (B, O*K) candidate pools, octave-LOCAL coordinates.
    x = jnp.concatenate(xs, axis=1)
    y = jnp.concatenate(ys, axis=1)
    score = jnp.concatenate(scores, axis=1)
    scale_l = jnp.concatenate(scales_loc, axis=1)
    valid = jnp.concatenate(valids, axis=1)
    oct_id = jnp.repeat(jnp.arange(O, dtype=jnp.int32), K)  # (O*K,)

    top_score, top_idx = jax.lax.top_k(jnp.where(valid, score, 0.0), K)
    take = lambda a: jnp.take_along_axis(a, top_idx, axis=1)
    x = take(x)
    y = take(y)
    scale_l = take(scale_l)
    oct = oct_id[top_idx]  # (B, K)
    valid = top_score > 0

    # Unified gradient stack: gaussian levels 1..S of every (image, octave),
    # each octave zero-padded into the octave-0 frame (padding is never
    # sampled: bilinear weights only touch the 2x2 cell around each sample
    # and keypoints keep an 8-px border in their own octave).
    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    gx_u = jnp.zeros((B, O, S, Hp, Wp), jnp.float32)
    gy_u = jnp.zeros((B, O, S, Hp, Wp), jnp.float32)
    for o in range(O):
        g = gauss[o][:, 1 : S + 1]  # (B, S, Ho, Wo)
        gx_o, gy_o = gradients(g)
        Ho, Wo = g.shape[-2:]
        gx_u = gx_u.at[:, o, :, :Ho, :Wo].set(gx_o)
        gy_u = gy_u.at[:, o, :, :Ho, :Wo].set(gy_o)
    gx_u = gx_u.reshape(B * O * S, Hp, Wp)
    gy_u = gy_u.reshape(B * O * S, Hp, Wp)

    lvl = jnp.clip(jnp.round(scale_l).astype(jnp.int32), 1, S)
    sigma_local = sigma0 * (2.0 ** (scale_l / S))
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    lvl_glob = ((b_idx * O + oct) * S + (lvl - 1)).reshape(-1)  # (B*K,)

    kx = x.reshape(-1)
    ky = y.reshape(-1)
    sig = sigma_local.reshape(-1)
    # Per-keypoint sampling bounds = the keypoint's own octave rectangle:
    # near-border samples clamp to border pixels (not the unified frame's
    # zero padding) on every backend.
    hs, ws = [float(H)], [float(W)]
    for _ in range(1, O):
        hs.append(float(-(-hs[-1] // 2)))
        ws.append(float(-(-ws[-1] // 2)))
    ymax = (jnp.asarray(hs, jnp.float32)[oct] - 1.001).reshape(-1)
    xmax = (jnp.asarray(ws, jnp.float32)[oct] - 1.001).reshape(-1)
    if upright:
        theta = jnp.zeros_like(sig)
        desc = sift_descriptors(gx_u, gy_u, kx, ky, lvl_glob, sig, theta,
                                ymax, xmax, patch_precision)
    else:
        desc, _ = orient_and_describe(gx_u, gy_u, kx, ky, lvl_glob, sig,
                                      ymax, xmax, fused=fused,
                                      precision=patch_precision,
                                      orient_precision=orient_precision)
    desc = desc.reshape(B, K, -1)

    factor = jnp.exp2(oct.astype(jnp.float32))
    x = x * factor
    y = y * factor
    scale = sigma_local * factor

    kp_px = jnp.stack([x, y], axis=-1)
    size = jnp.broadcast_to(jnp.asarray([W, H], jnp.float32), (B, 2))
    kp_centered = pixel_to_centered(kp_px, size[:, None, :])
    return FeatureSet(
        keypoints=kp_centered,
        keypoints_px=kp_px,
        descriptors=desc,
        scores=top_score,
        scales=scale,
        valid=valid,
        image_size=size,
    )


def extract_features(images: jnp.ndarray, config: Optional[FrontendConfig] = None) -> FeatureSet:
    """Extract features from a (B, H, W) float32 [0,1] grayscale batch."""
    cfg = config or FrontendConfig()
    return _extract(
        images,
        cfg.max_keypoints,
        cfg.num_octaves,
        cfg.scales_per_octave,
        cfg.sigma0,
        cfg.contrast_threshold,
        cfg.edge_threshold,
        cfg.nms_radius,
        cfg.upright,
        cfg.fused_descriptor,
        cfg.approx_topk_recall,
        cfg.patch_precision,
        cfg.orient_precision,
    )


def sample_colors(images_rgb, keypoints_px):
    """Per-keypoint color at the keypoint pixel (ref feature_extraction.py:32).
    images_rgb: (B, H, W, 3) uint8; keypoints_px: (B, K, 2).

    Host-side numpy on purpose: a (B, K) gather from uint8 images is scalar
    work the TPU backend compiles pathologically (and the images never need
    to reach the device for this)."""
    import numpy as np

    imgs = np.asarray(images_rgb)
    kp = np.asarray(keypoints_px)
    B, H, W, _ = imgs.shape
    xi = np.clip(np.round(kp[..., 0]).astype(np.int64), 0, W - 1)
    yi = np.clip(np.round(kp[..., 1]).astype(np.int64), 0, H - 1)
    return np.stack([imgs[b, yi[b], xi[b]] for b in range(B)])
