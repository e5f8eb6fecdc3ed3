"""Held-out view evaluation for the dense stage.

The reference's only test protocol is eyeballing four train-view renders
(plenoxel.py:134-135 — views 0/60/120/180 of the TRAINING set; README's
result gallery). Here: the standard NeRF-style protocol — hold out every
k-th registered camera from training, render those views in full, and
report per-view + mean PSNR against the real photographs.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu3d.config import DenseConfig
from tpu3d.core import lie
from tpu3d.dense.grid import VoxelGrid
from tpu3d.dense.render import render_image
from tpu3d.dense.train import RayDataset, SceneNormalization, psnr


def split_views(n_views: int, holdout_every: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """(train_idx, test_idx). holdout_every <= 0 disables the split."""
    idx = np.arange(n_views)
    if holdout_every <= 0 or n_views < 2:
        return idx, np.array([], np.int64)
    test = idx[holdout_every // 2 :: holdout_every]
    train = np.setdiff1d(idx, test)
    return train, test


def split_views_by_name(names, holdout_every: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Name-keyed holdout: an image is a test view iff the numeric part of
    its filename satisfies num % holdout_every == holdout_every // 2.

    The positional split above selects every 8th entry OF THE REGISTERED
    LIST, so two reconstructions with different registration subsets get
    entirely different test views — measured r3/r4: the same recipe spread
    14.5-18.7 dB across recs largely because each rec was graded on a
    different holdout lottery (close-up views land 6-10 dB below wide ones
    at the 256^3 voxel footprint). Keying on the image NAME makes every
    reconstruction of the same dataset score on the same physical views.
    Falls back to the positional split when names carry no digits."""
    import re

    idx = np.arange(len(names))
    if holdout_every <= 0 or len(names) < 2:
        return idx, np.array([], np.int64)
    nums = []
    for n in names:
        m = re.findall(r"(\d+)", n)
        nums.append(int(m[-1]) if m else -1)
    if all(v < 0 for v in nums):
        return split_views(len(names), holdout_every)
    test = np.asarray([i for i, v in enumerate(nums)
                       if v >= 0 and v % holdout_every == holdout_every // 2],
                      np.int64)
    if len(test) == 0 or len(test) == len(names):
        return split_views(len(names), holdout_every)
    train = np.setdiff1d(idx, test)
    return train, test


def view_rays(cam: np.ndarray, H: int, W: int, focal: float,
              norm: Optional[SceneNormalization] = None,
              stride: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """Full-view ray grid for one camera. Returns (origins (P, 3),
    dirs (P, 3)) in the normalized scene frame, row-major pixel order."""
    ys, xs = np.meshgrid(np.arange(0, H, stride), np.arange(0, W, stride), indexing="ij")
    u = xs.reshape(-1).astype(np.float32) - W / 2.0
    v = -(ys.reshape(-1).astype(np.float32) - H / 2.0)
    d_cam = np.stack([u / focal, v / focal, np.ones_like(u)], axis=-1)
    R = lie.so3_exp_np(cam[:3])
    t = cam[3:6]
    o = -R.T @ t
    d = d_cam @ R
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    if norm is not None:
        o = norm.apply(o)
    return np.broadcast_to(o.astype(np.float32), d.shape).copy(), d


def render_view(grid: VoxelGrid, cam: np.ndarray, H: int, W: int, focal: float,
                cfg: DenseConfig, norm: Optional[SceneNormalization] = None,
                stride: int = 1, chunk: int = 8192,
                bg_sh: Optional[np.ndarray] = None,
                rays: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                base_grid: Optional[VoxelGrid] = None) -> np.ndarray:
    """Render one full camera view. Returns (H', W', 3) float in [0, 1].
    rays: optional precomputed (origins, dirs) from view_rays (callers
    that also need the rays avoid building the grid twice)."""
    ro, rd = rays if rays is not None else view_rays(cam, H, W, focal, norm, stride)
    kw = dict(chunk=chunk, clip_aabb=cfg.per_ray_aabb,
              bg_sh=None if bg_sh is None else jnp.asarray(bg_sh),
              contract=getattr(cfg, "contraction", False),
              base_grid=base_grid)
    try:
        img = render_image(grid, jax.random.PRNGKey(0), jnp.asarray(ro),
                           jnp.asarray(rd), cfg.near, cfg.far,
                           cfg.num_samples, **kw)
    except Exception as e:
        if "RESOURCE_EXHAUSTED" not in str(e):
            raise
        # The Pallas path packs a second full copy of the grid; right
        # after training (grid + leftovers resident) that can OOM at
        # 256^3-budget shapes. The XLA gather path renders in place.
        img = render_image(grid, jax.random.PRNGKey(0), jnp.asarray(ro),
                           jnp.asarray(rd), cfg.near, cfg.far,
                           cfg.num_samples, use_pallas=False, **kw)
    h = len(range(0, H, stride))
    w = len(range(0, W, stride))
    return np.asarray(img).reshape(h, w, 3)


def fit_view_exposure(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Closed-form per-channel gain a* = <pred, gt>/<pred, pred> minimizing
    ||a·pred − gt||² — the eval-side counterpart of the per-TRAIN-image
    exposure latents (DenseConfig.exposure): held-out cameras never had a
    latent trained, so their (unknown, auto-exposure) gain is fit on the
    LEFT half of the view and scored on the RIGHT half (NeRF-W protocol)."""
    num = (pred * gt).sum(axis=(0, 1))
    den = (pred * pred).sum(axis=(0, 1)) + 1e-12
    return num / den


def evaluate_views(grid: VoxelGrid, cams: np.ndarray, images_rgb: np.ndarray,
                   focal: float, cfg: DenseConfig,
                   norm: Optional[SceneNormalization] = None,
                   stride: int = 2, chunk: int = 8192,
                   max_views: int = 0,
                   bg_sh: Optional[np.ndarray] = None,
                   base_grid: Optional[VoxelGrid] = None) -> dict:
    """PSNR of rendered vs ground-truth photographs for the given cameras.

    Reports both raw PSNR (canonical exposure vs the photo as shot) and
    exposure-calibrated PSNR (3 gains fit on the left half-image, scored on
    the right half). Returns {"per_view", "mean_psnr", "per_view_calibrated",
    "mean_psnr_calibrated", "renders"}."""
    n = len(cams) if not max_views else min(len(cams), max_views)
    per_view: List[float] = []
    per_view_cal: List[float] = []
    core_err, bg_err = [], []  # squared-error sums for the core/bg split
    core_n = bg_n = 0
    renders = []
    H, W = images_rgb.shape[1:3]
    for m in range(n):
        ro, rd = view_rays(cams[m], H, W, focal, norm, stride)
        pred = render_view(grid, cams[m], H, W, focal, cfg, norm, stride,
                           chunk, bg_sh=bg_sh, rays=(ro, rd),
                           base_grid=base_grid)
        gt = images_rgb[m, ::stride, ::stride].astype(np.float32) / 255.0
        gt = gt[: pred.shape[0], : pred.shape[1]]
        per_view.append(psnr(pred, gt))
        half = pred.shape[1] // 2
        gains = fit_view_exposure(pred[:, :half], gt[:, :half])
        per_view_cal.append(psnr(np.clip(pred[:, half:] * gains, 0.0, 1.0),
                                 gt[:, half:]))
        renders.append(pred)
        # Core-vs-background error split (the contraction retune signal:
        # where does resolution actually pay?). A ray is "core" if the
        # FORWARD half-line passes within the unit ball of the normalized
        # frame: closest approach at t* = max(0, -o.d) (a full-line test
        # would misclassify rays pointing away from the core). Note: a
        # camera inside the unit ball genuinely makes every ray core —
        # on those captures the split reports core_pixel_fraction ~= 1.
        t_star = np.maximum(0.0, -np.sum(ro * rd, axis=-1))
        closest = ro + t_star[:, None] * rd
        core = (np.linalg.norm(closest, axis=-1) < 1.0).reshape(pred.shape[:2])
        se = np.sum((pred - gt) ** 2, axis=-1) / 3.0
        core_err.append(float(se[core].sum()))
        bg_err.append(float(se[~core].sum()))
        core_n += int(core.sum())
        bg_n += int((~core).sum())
    mse_to_psnr = lambda s, c: (float(-10 * np.log10(max(s / c, 1e-12)))
                                if c else float("nan"))
    return {
        "per_view": per_view,
        "mean_psnr": float(np.mean(per_view)) if per_view else float("nan"),
        "per_view_calibrated": per_view_cal,
        "mean_psnr_calibrated": (float(np.mean(per_view_cal))
                                 if per_view_cal else float("nan")),
        "psnr_core": mse_to_psnr(sum(core_err), core_n),
        "psnr_background": mse_to_psnr(sum(bg_err), bg_n),
        "core_pixel_fraction": (core_n / max(core_n + bg_n, 1)),
        "renders": renders,
    }


def interpolate_poses(cams: np.ndarray, n_frames: int) -> np.ndarray:
    """Smooth novel-view flythrough along the registered trajectory:
    piecewise slerp of the world-to-camera rotations + lerp of the camera
    CENTERS (interpolating t directly would swing the center on an arc),
    sampled at uniform arc length over the center polyline. cams is (M, 6)
    [rvec, t] in registration order; returns (n_frames, 6)."""
    from tpu3d.core import lie

    cams = np.asarray(cams, np.float64)
    M = len(cams)
    if M == 1 or n_frames < 1:
        return np.repeat(cams[:1], max(n_frames, 1), axis=0)
    Rs = np.stack([lie.so3_exp_np(c[:3]) for c in cams])
    Cs = np.stack([-R.T @ c[3:6] for R, c in zip(Rs, cams)])
    seg = np.linalg.norm(np.diff(Cs, axis=0), axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = cum[-1] if cum[-1] > 0 else 1.0
    out = []
    k = 0
    for s in np.linspace(0.0, total, n_frames):
        while k < M - 2 and cum[k + 1] < s:
            k += 1
        a = float(np.clip((s - cum[k]) / max(cum[k + 1] - cum[k], 1e-12), 0.0, 1.0))
        w = lie.so3_log_np(Rs[k + 1] @ Rs[k].T)
        R = lie.so3_exp_np(a * w) @ Rs[k]
        c = (1.0 - a) * Cs[k] + a * Cs[k + 1]
        out.append(np.concatenate([lie.so3_log_np(R), -R @ c]))
    return np.stack(out)


def dataset_from_views(cams: np.ndarray, images_rgb: np.ndarray, focal: float,
                       view_idx: np.ndarray,
                       norm: Optional[SceneNormalization] = None,
                       stride: int = 1) -> RayDataset:
    """RayDataset restricted to a view subset (train split)."""
    from tpu3d.dense.train import rays_from_cameras

    return rays_from_cameras(cams[view_idx], images_rgb[view_idx], focal, norm, stride)
