"""Dense-stage training: ray dataset generation from a sparse
reconstruction + optax training of the voxel radiance grid.

Covers the reference's SceneHelper.sample_batch ray generation
(sdf.py:110-146) and the plenoxel/sdf training entries (plenoxel.py:96-135,
sdf.py:409-445): Adam lr 1e-2, MultiStep-style lr decay at epoch milestones
with gamma 0.5, MSE on 2048-ray batches. Improvements over the reference:
the ray dataset is produced from OUR reconstruction rather than an
absolute-path external pickle (sdf.py:420), the scene is normalized into
the grid box, optimizer+grid state checkpoints via ArtifactStore (the
reference loses everything on a crash, SURVEY §5), and the train step is a
single jitted function whose ray batch axis shards over the device mesh
(dist/sharding.py)."""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu3d.config import DenseConfig
from tpu3d.core import lie
from tpu3d.core.camera import camera_rays, pixel_to_centered
from tpu3d.dense.grid import VoxelGrid, create_grid
from tpu3d.dense.render import render_rays
from tpu3d.io.ply import filter_point_cloud


class RayDataset(NamedTuple):
    origins: np.ndarray   # (N, 3)
    dirs: np.ndarray      # (N, 3) unit
    rgb: np.ndarray       # (N, 3) in [0, 1]
    # Per-ray source-camera index (local, 0..M-1) — drives the per-image
    # exposure latents (DenseConfig.exposure). None for externally loaded
    # ray pickles (the reference's training_data.pkl has no camera ids).
    cam_ids: Optional[np.ndarray] = None


@dataclasses.dataclass
class SceneNormalization:
    center: np.ndarray
    scale: float

    def apply(self, pts: np.ndarray) -> np.ndarray:
        return (pts - self.center) / self.scale


def normalize_scene_contracted(points: np.ndarray,
                               core_q: float = 90.0,
                               core_radius: float = 0.9) -> SceneNormalization:
    """Gauge-invariant normalization for the contraction warp: the p`core_q`
    radius of the median-centered cloud lands at `core_radius` (inside the
    unit ball where the warp is identity); everything farther compresses
    into the shell. Unlike normalize_scene's mean+300-after-x200 filter,
    this is invariant to the arbitrary SfM gauge scale
    (benchmarks/dense_norm_probe.py)."""
    center = np.median(points, axis=0)
    dist = np.linalg.norm(points - center, axis=1)
    extent = float(np.percentile(dist, core_q)) / core_radius
    return SceneNormalization(center.astype(np.float32), extent + 1e-9)


def normalize_scene(points: np.ndarray, target_extent: float = 1.0,
                    core_q: float = 92.0, margin: float = 1.15) -> SceneNormalization:
    """GAUGE-INVARIANT similarity transform into [-target_extent,
    target_extent]^3: median center, extent = margin x p`core_q` of the
    radial distance distribution. An SfM gauge is arbitrary, so the
    transform must commute with rescaling the reconstruction — the legacy
    mean+300-after-x200 filter (normalize_scene_legacy) keyed off ABSOLUTE
    thresholds and collapsed 18.2 -> 14.9 dB when the CPU backend produced
    a larger gauge for the same matches (BASELINE.md, dense_norm_probe).
    Content beyond the core percentile falls outside the grid; the learned
    SH background / white background absorbs it."""
    center = np.median(points, axis=0)
    dist = np.linalg.norm(points - center, axis=1)
    extent = margin * float(np.percentile(dist, core_q))
    return SceneNormalization(center.astype(np.float32),
                              float(extent / target_extent + 1e-9))


def normalize_scene_coremax(points: np.ndarray, target_extent: float = 1.0,
                            q: float = 80.0, k: float = 1.0) -> SceneNormalization:
    """Gauge-invariant reformulation of the legacy normalization: keep
    points within k x p`q` radial distance of the median, max-abs extent
    of the kept cloud.

    q=80/k=1 calibrated against the legacy mean+300 filter on the real
    reconstructions: ystad clouds are EXTREMELY heavy-tailed (p50 ~ 7,
    p90 ~ 330, max ~ 16k radial units on the 287-cam rec), and the legacy
    filter — the framing every good PSNR number was measured under —
    turns out to keep only ~78-83% of points, i.e. it IS a ~p80 radial
    crop. A "lenient outlier trim" (the first coremax, 4 x p90) kept
    99.8% and inflated the extent 6-7x, collapsing core resolution to
    12.4 dB. Scale-free by construction
    (tests/test_dense.py::test_normalizations_gauge_equivariant)."""
    keep = core_points(points, q, k)
    p = keep if len(keep) else points
    center = p.mean(axis=0)
    extent = np.abs(p - center).max()
    return SceneNormalization(center.astype(np.float32),
                              float(extent / target_extent + 1e-9))


def normalize_scene_legacy(points: np.ndarray, target_extent: float = 1.0) -> SceneNormalization:
    """Round-1/2 normalization (outlier filter + per-axis max extent) —
    kept for A/B and for rendering grids trained before the gauge-invariant
    default landed (dense_meta without a recorded norm implies this)."""
    keep = filter_point_cloud(points)
    p = points[keep] if keep.any() else points
    center = p.mean(axis=0)
    extent = np.abs(p - center).max()
    return SceneNormalization(center.astype(np.float32), float(extent / target_extent + 1e-9))


def core_points(points: np.ndarray, q: float = 90.0, k: float = 4.0) -> np.ndarray:
    """Gauge-invariant outlier trim: keep points within k x p`q` radial
    distance of the median center (replaces io.ply.filter_point_cloud's
    absolute thresholds inside band/normalization math; the PLY export
    keeps the reference-exact filter)."""
    center = np.median(points, axis=0)
    dist = np.linalg.norm(points - center, axis=1)
    return points[dist <= k * np.percentile(dist, q)]


def rays_from_cameras(
    cams: np.ndarray,
    images_rgb: np.ndarray,
    focal: float,
    norm: Optional[SceneNormalization] = None,
    stride: int = 1,
) -> RayDataset:
    """Per-pixel world rays + GT colors for registered cameras.

    cams: (M, 6) [rvec|t] world->cam (our convention); images_rgb:
    (M, H, W, 3) uint8. Ray construction matches core.camera.camera_rays
    (the corrected form of ref sdf.py:129-141)."""
    M, H, W, _ = images_rgb.shape
    ys, xs = np.meshgrid(np.arange(0, H, stride), np.arange(0, W, stride), indexing="ij")
    # centered y-up coords (pixel_to_centered semantics, numpy host-side)
    u = xs.reshape(-1).astype(np.float32) - W / 2.0
    v = -(ys.reshape(-1).astype(np.float32) - H / 2.0)
    d_cam = np.stack([u / focal, v / focal, np.ones_like(u)], axis=-1)
    origins, dirs, rgbs = [], [], []
    for m in range(M):
        R = lie.so3_exp_np(cams[m, :3])
        t = cams[m, 3:6]
        o = -R.T @ t
        d = d_cam @ R  # == (Rᵀ d_camᵀ)ᵀ
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        if norm is not None:
            o = norm.apply(o)
        origins.append(np.broadcast_to(o, d.shape).copy())
        dirs.append(d.astype(np.float32))
        rgbs.append(images_rgb[m, ys.reshape(-1), xs.reshape(-1)].astype(np.float32) / 255.0)
    rays_per = len(ys.reshape(-1))
    return RayDataset(
        np.concatenate(origins).astype(np.float32),
        np.concatenate(dirs).astype(np.float32),
        np.concatenate(rgbs).astype(np.float32),
        np.repeat(np.arange(M, dtype=np.int32), rays_per),
    )


def auto_near_far(cams: np.ndarray, points: np.ndarray,
                  norm: Optional[SceneNormalization] = None) -> Tuple[float, float]:
    """Scene-derived sampling band: percentiles of the sparse cloud's depth
    along each camera's optical axis. The reference's fixed hn=2/hf=6
    (plenoxel.py:133) was tuned for ITS externally-normalized dataset; on
    our normalized reconstructions cameras sit INSIDE the scene (~0.2 from
    center with content at depth 0.02-1.1), so a fixed band can miss the
    scene entirely — observed as all-white renders. Outlier trim is the
    gauge-invariant core_points (the absolute filter made the band itself
    gauge-dependent)."""
    pts = core_points(points)
    if not len(pts):
        pts = points
    if norm is not None:
        pts = norm.apply(pts)
    depths = []
    for m in range(0, len(cams), max(len(cams) // 32, 1)):
        R = lie.so3_exp_np(cams[m, :3])
        C = -R.T @ cams[m, 3:6]
        if norm is not None:
            C = norm.apply(C)
        d = (pts - C) @ R[2]
        depths.append([np.percentile(d, 2), np.percentile(d, 98)])
    depths = np.asarray(depths)
    near = max(float(np.percentile(depths[:, 0], 10)) * 0.8, 1e-2)
    far = float(np.percentile(depths[:, 1], 90)) * 1.3
    return near, max(far, near + 1e-2)


# Aux outputs of the most recent train_plenoxel/train_sdf call (learned
# background SH coefficients + exposure gains) — consumed by the CLI for
# eval/render without changing the (grid, losses) return contract.
LAST_TRAIN_AUX: Dict[str, object] = {}


def _publish_aux(state) -> None:
    LAST_TRAIN_AUX.clear()
    LAST_TRAIN_AUX.update(
        background=(None if state.background is None
                    else np.asarray(state.background[0])),
        exposure=(None if state.exposure is None
                  else np.asarray(state.exposure[0])),
    )


def _lr_schedule(cfg: DenseConfig, steps_per_epoch: int) -> optax.Schedule:
    boundaries = {m * steps_per_epoch: cfg.lr_gamma for m in cfg.lr_milestones}
    return optax.piecewise_constant_schedule(cfg.learning_rate, boundaries)


def make_optimizer(cfg: DenseConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Grid optimizer. adam (ref sdf.py:417/plenoxel.py:129) keeps TWO
    moment buffers — 4 grid-sized arrays live per step, capping a 16 GB
    chip at 288^3. rmsprop (the actual Plenoxels-paper choice) keeps ONE,
    unlocking 320-352^3 (DenseConfig.optimizer)."""
    sched = _lr_schedule(cfg, steps_per_epoch)
    kind = getattr(cfg, "optimizer", "adam")
    if kind == "rmsprop":
        return optax.rmsprop(sched, decay=0.95, eps=1e-8)
    return optax.adam(sched)


class TrainState(NamedTuple):
    grid: VoxelGrid
    opt_state: optax.OptState
    step: jnp.ndarray
    # Per-image exposure latents, stacked (3, M, 3) = [log-gains, Adam m,
    # Adam v]; None when DenseConfig.exposure is off (keeps every existing
    # step bit-identical).
    exposure: Optional[jnp.ndarray] = None
    # View-directional background SH, stacked (3, 3, 9) = [coeffs, Adam m,
    # Adam v]; None when DenseConfig.sh_background is off.
    background: Optional[jnp.ndarray] = None


def init_exposure(n_cams: int) -> jnp.ndarray:
    return jnp.zeros((3, n_cams, 3), jnp.float32)


def init_background() -> jnp.ndarray:
    """(3, 3, 9) [coeffs, m, v], coefficients initialized to WHITE (DC
    1/C0) so switching sh_background on starts exactly at the white-bg
    behavior and learns away from it."""
    g = jnp.zeros((3, 9), jnp.float32).at[:, 0].set(1.0 / 0.282095)
    return jnp.stack([g, jnp.zeros_like(g), jnp.zeros_like(g)])


def _ray_background(bg_sh: Optional[jnp.ndarray], rd: jnp.ndarray):
    """Per-ray background colors from (3, 9) SH coeffs (None passthrough)."""
    if bg_sh is None:
        return None
    from tpu3d.dense.grid import eval_sh

    return eval_sh(jnp.broadcast_to(bg_sh, (rd.shape[0], 3, 9)), rd)


def _exposure_apply(pred: jnp.ndarray, gains: Optional[jnp.ndarray],
                    cid: Optional[jnp.ndarray]) -> jnp.ndarray:
    """pred * e^{g[cid]} — maps the grid's canonical exposure into each
    source photo's exposure before the MSE. gains: (M, 3) log-gains."""
    if gains is None or cid is None:
        return pred
    return pred * jnp.exp(gains[cid])


def _exposure_adam(exposure: jnp.ndarray, g: jnp.ndarray, step: jnp.ndarray,
                   lr: float) -> jnp.ndarray:
    """Manual Adam on the (M, 3) log-gains (kept out of the grid optimizer
    so the grid's optax state/shape stays unchanged when exposure is off).
    Adam's scale invariance matters here: a 2048-ray batch touches each
    image with only a handful of rays, so raw gradients are ~1000x smaller
    than the loss scale."""
    b1, b2, eps = 0.9, 0.999, 1e-8
    gains, m, v = exposure[0], exposure[1], exposure[2]
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    t = step.astype(jnp.float32) + 1.0
    mhat = m / (1 - b1**t)
    vhat = v / (1 - b2**t)
    gains = gains - lr * mhat / (jnp.sqrt(vhat) + eps)
    return jnp.stack([gains, m, v])


def _tv_crop_loss(grid_arr: jnp.ndarray, key: jax.Array, crop: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stochastic total-variation penalty on a random crop^3 sub-block.

    Returns (sigma_tv, sh_tv): mean squared neighbor differences of the
    density channel and the summed SH channels. Plenoxels-style smoothness
    prior (the reference cites the paper but ships no TV term); the random
    crop keeps per-step cost O(crop^3) instead of O(R^3)."""
    X, Y, Z, C = grid_arr.shape
    bx, by, bz = min(crop, X - 1), min(crop, Y - 1), min(crop, Z - 1)
    kx, ky, kz = jax.random.split(key, 3)
    # +1 so diffs inside the crop see bx interior faces per axis
    x0 = jax.random.randint(kx, (), 0, X - bx)
    y0 = jax.random.randint(ky, (), 0, Y - by)
    z0 = jax.random.randint(kz, (), 0, Z - bz)
    c = jax.lax.dynamic_slice(grid_arr, (x0, y0, z0, 0), (bx + 1, by + 1, bz + 1, C))
    per_ch = (
        jnp.mean((c[1:] - c[:-1]) ** 2, axis=(0, 1, 2))
        + jnp.mean((c[:, 1:] - c[:, :-1]) ** 2, axis=(0, 1, 2))
        + jnp.mean((c[:, :, 1:] - c[:, :, :-1]) ** 2, axis=(0, 1, 2))
    )
    return per_ch[0], jnp.sum(per_ch[1:])


def _tv_crop_loss_packed(packed: jnp.ndarray, res, key: jax.Array, crop: int,
                         channels: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """_tv_crop_loss on the pack_grid layout (X, Y, Zr+1, 2, 128): slice a
    zr-aligned window, unpack it to (bx, by, bz, C), reuse the dense TV."""
    X, Y, Zr1 = packed.shape[:3]
    Z = (Zr1 - 1) * 8
    bz_rows = max(min(crop, Z) // 8, 1)
    bx, by = min(crop, X - 1), min(crop, Y - 1)
    kx, ky, kz = jax.random.split(key, 3)
    x0 = jax.random.randint(kx, (), 0, X - bx)
    y0 = jax.random.randint(ky, (), 0, Y - by)
    zr0 = jax.random.randint(kz, (), 0, Zr1 - 1 - bz_rows + 1)
    c = jax.lax.dynamic_slice(
        packed, (x0, y0, zr0, 0, 0), (bx + 1, by + 1, bz_rows, 2, 128))
    c = c.reshape(bx + 1, by + 1, bz_rows * 8, 32)[:, :, :, :channels]
    per_ch = (
        jnp.mean((c[1:] - c[:-1]) ** 2, axis=(0, 1, 2))
        + jnp.mean((c[:, 1:] - c[:, :-1]) ** 2, axis=(0, 1, 2))
        + jnp.mean((c[:, :, 1:] - c[:, :, :-1]) ** 2, axis=(0, 1, 2))
    )
    return per_ch[0], jnp.sum(per_ch[1:])


def _split_grads(cfg, state, loss_fn, grid_args, key, rgb, cid):
    """Joint (grid, exposure, background) gradients for whichever latents
    exist; grid-only otherwise (trace-time branch on the pytree
    structure). loss_fn(grid_args, gains, bg_sh, key, rgb, cid)."""
    has_exp = state.exposure is not None and cid is not None
    has_bg = state.background is not None
    wrt = (0,) + ((1,) if has_exp else ()) + ((2,) if has_bg else ())
    loss, grads = jax.value_and_grad(loss_fn, argnums=wrt)(
        grid_args,
        state.exposure[0] if has_exp else None,
        state.background[0] if has_bg else None,
        key, rgb, cid if has_exp else None)
    grads = (grads,) if not isinstance(grads, tuple) else grads
    g = grads[0]
    i = 1
    exposure, background = state.exposure, state.background
    if has_exp:
        exposure = _exposure_adam(state.exposure, grads[i], state.step,
                                  cfg.exposure_lr)
        i += 1
    if has_bg:
        background = _exposure_adam(state.background, grads[i], state.step,
                                    cfg.background_lr)
    return loss, g, exposure, background


def _sparsity_crop_loss(grid_arr: jnp.ndarray, key: jax.Array, crop: int) -> jnp.ndarray:
    """Cauchy sparsity on the density channel of a random crop^3 block
    (Plenoxels sparsity loss): mean log(1 + relu(sigma)^2 / 0.25)."""
    X, Y, Z, _ = grid_arr.shape
    bx, by, bz = min(crop, X), min(crop, Y), min(crop, Z)
    kx, ky, kz = jax.random.split(key, 3)
    x0 = jax.random.randint(kx, (), 0, X - bx + 1)
    y0 = jax.random.randint(ky, (), 0, Y - by + 1)
    z0 = jax.random.randint(kz, (), 0, Z - bz + 1)
    c = jax.lax.dynamic_slice(grid_arr, (x0, y0, z0, 0), (bx, by, bz, 1))
    sig = jax.nn.relu(c[..., 0])
    return jnp.mean(jnp.log1p(sig * sig / 0.25))


def _sparsity_crop_loss_packed(packed: jnp.ndarray, key: jax.Array, crop: int) -> jnp.ndarray:
    """_sparsity_crop_loss on the packed (X, Y, Zr+1, 2, 128) layout —
    density is channel 0 of the first 32-lane group."""
    X, Y, Zr1 = packed.shape[:3]
    bz_rows = max(min(crop, (Zr1 - 1) * 8) // 8, 1)
    bx, by = min(crop, X), min(crop, Y)
    kx, ky, kz = jax.random.split(key, 3)
    x0 = jax.random.randint(kx, (), 0, X - bx + 1)
    y0 = jax.random.randint(ky, (), 0, Y - by + 1)
    zr0 = jax.random.randint(kz, (), 0, Zr1 - 1 - bz_rows + 1)
    c = jax.lax.dynamic_slice(packed, (x0, y0, zr0, 0, 0),
                              (bx, by, bz_rows, 2, 128))
    sig = jax.nn.relu(c.reshape(bx, by, bz_rows * 8, 32)[..., 0])
    return jnp.mean(jnp.log1p(sig * sig / 0.25))


def make_train_step(cfg: DenseConfig, optimizer: optax.GradientTransformation):
    """One jitted plenoxel training step (MSE on a ray batch)."""

    def render_loss(grid_arr, vg_template, key, ro, rd, occ, bg):
        vg = VoxelGrid(grid_arr, vg_template.min_bound, vg_template.max_bound)
        if cfg.hierarchical:
            from tpu3d.dense.render import render_rays_hierarchical

            return render_rays_hierarchical(
                vg, key, ro, rd, cfg.near, cfg.far, cfg.n_coarse, cfg.n_fine,
                cfg.white_background, clip_aabb=cfg.per_ray_aabb,
                occ=occ, occ_probes=cfg.occupancy_probes, bg=bg,
                contract=cfg.contraction,
            )
        return render_rays(
            vg, key, ro, rd, cfg.near, cfg.far, cfg.num_samples, cfg.white_background,
            clip_aabb=cfg.per_ray_aabb,
            occ=occ, occ_probes=cfg.occupancy_probes, bg=bg,
            contract=cfg.contraction,
        )

    # Donating the state is what makes a 256^3 grid fit: grid + Adam
    # moments are 5.6 GB, and without donation the old and new state
    # coexist during the step (plus temporaries) — ResourceExhausted on a
    # 16 GB chip.
    def step_body(state: TrainState, key, ro, rd, rgb, occ=None, cid=None):
        def loss_fn(grid_arr, gains, bg_sh, key, rgb, cid):
            pred = render_loss(grid_arr, state.grid, key, ro, rd, occ,
                               _ray_background(bg_sh, rd))
            loss = jnp.mean((_exposure_apply(pred, gains, cid) - rgb) ** 2)
            if cfg.tv_sigma or cfg.tv_sh:
                tv_s, tv_c = _tv_crop_loss(grid_arr, jax.random.fold_in(key, 7), cfg.tv_crop)
                loss = loss + cfg.tv_sigma * tv_s + cfg.tv_sh * tv_c
            if getattr(cfg, "sparsity_sigma", 0.0):
                loss = loss + cfg.sparsity_sigma * _sparsity_crop_loss(
                    grid_arr, jax.random.fold_in(key, 11), cfg.tv_crop)
            return loss

        loss, g, exposure, background = _split_grads(
            cfg, state, loss_fn, state.grid.grid, key, rgb, cid)
        updates, opt_state = optimizer.update(g, state.opt_state, state.grid.grid)
        new_grid = optax.apply_updates(state.grid.grid, updates)
        return TrainState(
            VoxelGrid(new_grid, state.grid.min_bound, state.grid.max_bound),
            opt_state,
            state.step + 1,
            exposure,
            background,
        ), loss

    step = functools.partial(jax.jit, donate_argnums=(0,))(step_body)
    step.body = step_body
    return step


def make_train_step_packed(cfg: DenseConfig, optimizer: optax.GradientTransformation,
                           res, interpret: bool = False, base_res=None):
    """Training step on the PACKED grid layout (kernels/trilinear.py):
    Pallas box-DMA forward + Pallas binned scatter-add backward
    (kernels/trilinear_grad.py) replace XLA's latency-bound gather/scatter
    pair — the dense step's dominant cost. Adam runs directly on the
    packed array (padding rows/channels get zero gradient and stay zero).

    base_res: static resolution of an optional frozen cascade BASE grid
    (r5 capacity cascade) — when set, step calls must pass base=(packed,
    min_bound, max_bound) device arrays and the trained grid becomes the
    core DETAIL layer (see dense/render.py)."""
    from tpu3d.dense.render import (render_rays_hierarchical_packed,
                                    render_rays_packed_diff)

    def render_pred(packed, minb, maxb, key, ro, rd, occ, bg, base):
        bkw = {}
        if base_res is not None:
            bkw = dict(base_packed=base[0], base_mb=base[1], base_xb=base[2],
                       base_res=base_res)
        if cfg.hierarchical:
            return render_rays_hierarchical_packed(
                packed, minb, maxb, res, key, ro, rd, cfg.near, cfg.far,
                cfg.n_coarse, cfg.n_fine, cfg.white_background,
                clip_aabb=cfg.per_ray_aabb, interpret=interpret,
                occ=occ, occ_probes=cfg.occupancy_probes, bg=bg,
                contract=cfg.contraction, **bkw)
        return render_rays_packed_diff(
            packed, minb, maxb, res, key, ro, rd, cfg.near, cfg.far,
            cfg.num_samples, cfg.white_background,
            clip_aabb=cfg.per_ray_aabb, interpret=interpret,
            occ=occ, occ_probes=cfg.occupancy_probes, bg=bg,
            contract=cfg.contraction, **bkw)

    def step_body(state: TrainState, key, ro, rd, rgb, occ=None, cid=None,
                  base=None):
        def loss_fn(packed, gains, bg_sh, key, rgb, cid):
            pred = render_pred(packed, state.grid.min_bound,
                               state.grid.max_bound, key, ro, rd, occ,
                               _ray_background(bg_sh, rd), base)
            loss = jnp.mean((_exposure_apply(pred, gains, cid) - rgb) ** 2)
            if cfg.tv_sigma or cfg.tv_sh:
                tv_s, tv_c = _tv_crop_loss_packed(
                    packed, res, jax.random.fold_in(key, 7), cfg.tv_crop, channels=28)
                loss = loss + cfg.tv_sigma * tv_s + cfg.tv_sh * tv_c
            if getattr(cfg, "sparsity_sigma", 0.0):
                loss = loss + cfg.sparsity_sigma * _sparsity_crop_loss_packed(
                    packed, jax.random.fold_in(key, 11), cfg.tv_crop)
            return loss

        loss, g, exposure, background = _split_grads(
            cfg, state, loss_fn, state.grid.grid, key, rgb, cid)
        updates, opt_state = optimizer.update(g, state.opt_state, state.grid.grid)
        new_grid = optax.apply_updates(state.grid.grid, updates)
        return TrainState(
            VoxelGrid(new_grid, state.grid.min_bound, state.grid.max_bound),
            opt_state, state.step + 1, exposure, background,
        ), loss

    step = functools.partial(jax.jit, donate_argnums=(0,))(step_body)
    step.body = step_body
    return step


def make_multi_step(step_fn, with_occ: bool):
    """Scan `K` training steps inside ONE dispatch against a device-resident
    ray dataset. On the remote-TPU tunnel each dispatch pays a full host
    round trip (~0.1-0.2 s) — at 2048-ray batches that overhead dominated
    the measured 8.7k rays/s (the Pallas kernel pair alone sustains ~4x
    that). The host sends only the (K, batch) shuffled index block."""
    body = step_fn.body

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, epoch_key, step0, idx, o_all, d_all, rgb_all, occ=None,
              cid_all=None, base=None):
        # Per-step keys are fold_in(epoch_key, step) — identical to the
        # per-step (scan_chunk=1) loop, so dispatch granularity cannot
        # change the training sequence (tests/test_trilinear_grad.py).
        steps = step0 + jnp.arange(idx.shape[0], dtype=jnp.uint32)
        keys = jax.vmap(lambda s: jax.random.fold_in(epoch_key, s))(steps)

        def scan_body(st, args):
            k, ix = args
            cid = None if cid_all is None else cid_all[ix]
            kw = {} if base is None else {"base": base}
            if with_occ:
                st, loss = body(st, k, o_all[ix], d_all[ix], rgb_all[ix], occ,
                                cid=cid, **kw)
            else:
                st, loss = body(st, k, o_all[ix], d_all[ix], rgb_all[ix],
                                cid=cid, **kw)
            return st, loss

        return jax.lax.scan(scan_body, state, (keys, idx))

    return multi


def _chunk_plan(steps_per_epoch: int, chunk: int):
    """(start_step, length) chunks covering an epoch; same plan every epoch
    so only two program shapes compile (full chunk + tail)."""
    out, b = [], 0
    while b < steps_per_epoch:
        k = min(chunk, steps_per_epoch - b)
        out.append((b, k))
        b += k
    return out


def _coarse_stage(train_fn, dataset, cfg: DenseConfig, seed, grid: VoxelGrid,
                  verbose, log_every, packed, x_multiple: int = 8):
    """Coarse phase of coarse-to-fine grid growing: train `coarse_epochs`
    on a grid downscaled by `coarse_factor` (dims floored to multiples of
    8 for the packed Pallas layout), then upsample align-corners back to
    the full grid. Returns (upsampled grid, coarse losses, config with the
    remaining epochs)."""
    from tpu3d.dense.grid import resample_grid

    f = max(int(cfg.coarse_factor), 2)
    full_res = tuple(grid.grid.shape[:3])
    # X floors to x_multiple (lcm(8, model_parallel) under the brick-TP
    # trainer, where X % MP == 0 is a hard shape requirement), Y/Z to 8.
    mults = (max(int(x_multiple), 8), 8, 8)
    coarse_res = tuple(max((r // f) // m * m, m)
                       for r, m in zip(full_res, mults))
    # Fresh bound copies per phase: the jitted steps donate the whole train
    # state (bounds included), so sharing one array across phases would
    # hand the fine phase already-deleted buffers.
    small = VoxelGrid(resample_grid(grid.grid, coarse_res),
                      jnp.array(grid.min_bound), jnp.array(grid.max_bound))
    sub = dataclasses.replace(cfg, epochs=cfg.coarse_epochs, coarse_epochs=0)
    if verbose:
        print(f"[dense] coarse stage: {coarse_res} for {cfg.coarse_epochs} "
              f"epochs", flush=True)
    # the camera gate belongs to the full-resolution phase: the coarse fit
    # is too rough for outlier separation to be meaningful
    sub = dataclasses.replace(sub, camera_gate=False)
    small, losses = train_fn(dataset, sub, seed=seed, grid=small,
                             verbose=verbose, log_every=log_every,
                             packed=packed)
    up = VoxelGrid(resample_grid(small.grid, full_res),
                   jnp.array(grid.min_bound), jnp.array(grid.max_bound))
    rest = dataclasses.replace(cfg, epochs=cfg.epochs - cfg.coarse_epochs,
                               coarse_epochs=0)
    return up, losses, rest


def _camera_gate_probe(state: TrainState, dataset: RayDataset,
                       cfg: DenseConfig, use_packed: bool, orig_shape,
                       rng: np.random.Generator) -> np.ndarray:
    """Per-train-camera probe MSE under the CURRENT grid. Renders a fixed
    subsample of each camera's rays (plain stratified, no jitter — the
    comparison is across cameras, not against the training loss) and
    segment-means the squared error by camera id. Returns (M,) mse."""
    from tpu3d.dense.render import render_rays, render_rays_packed

    cid = dataset.cam_ids
    M = int(cid.max()) + 1
    k = cfg.camera_gate_probe_rays
    sel = []
    for c in range(M):
        ids = np.flatnonzero(cid == c)
        if len(ids) > k:
            ids = rng.choice(ids, k, replace=False)
        sel.append(ids)
    sel = np.concatenate(sel)
    seg = cid[sel]
    key = jax.random.PRNGKey(0)
    preds = []
    chunk = 8192
    minb, maxb = state.grid.min_bound, state.grid.max_bound
    gains = None if state.exposure is None else state.exposure[0]
    bg_sh = None if state.background is None else state.background[0]
    for s in range(0, len(sel), chunk):
        ids = sel[s:s + chunk]
        pad = 0
        if len(ids) < chunk:        # keep one compiled shape
            pad = chunk - len(ids)
            ids = np.concatenate([ids, ids[-1:].repeat(pad)])
        ro = jnp.asarray(dataset.origins[ids])
        rd = jnp.asarray(dataset.dirs[ids])
        bg = _ray_background(bg_sh, rd)
        if use_packed:
            out = render_rays_packed(
                state.grid.grid, minb, maxb, tuple(orig_shape[:3]), key,
                ro, rd, cfg.near, cfg.far, cfg.num_samples,
                cfg.white_background, clip_aabb=cfg.per_ray_aabb, bg=bg,
                contract=cfg.contraction)
        else:
            out = render_rays(
                VoxelGrid(state.grid.grid, minb, maxb), key, ro, rd,
                cfg.near, cfg.far, cfg.num_samples, cfg.white_background,
                perturb=False, clip_aabb=cfg.per_ray_aabb, bg=bg,
                contract=cfg.contraction)
        out = _exposure_apply(out, gains, jnp.asarray(dataset.cam_ids[ids]))
        preds.append(np.asarray(out)[:chunk - pad if pad else chunk])
    err = (np.concatenate(preds) - dataset.rgb[sel]) ** 2
    per_ray = err.mean(axis=1)
    sums = np.bincount(seg, weights=per_ray, minlength=M)
    counts = np.maximum(np.bincount(seg, minlength=M), 1)
    return sums / counts


def apply_camera_gate(state: TrainState, dataset: RayDataset,
                      cfg: DenseConfig, use_packed: bool, orig_shape,
                      verbose: bool) -> Tuple[np.ndarray, List[int]]:
    """The dense-side camera gate (DenseConfig.camera_gate): probe each
    train camera's fit under the current grid and drop robust outliers
    from the remaining epochs' ray sampling. Returns (keep_ray_mask (n,),
    dropped_camera_ids). Wrong-pose cameras cannot be fit by ANY grid —
    their residual stays an outlier while well-posed cameras converge —
    so the gate decouples dense quality from sparse-stage tail cameras."""
    rng = np.random.default_rng(12345)
    mse = _camera_gate_probe(state, dataset, cfg, use_packed, orig_shape, rng)
    med = float(np.median(mse))
    mad = float(np.median(np.abs(mse - med))) * 1.4826
    thr = med + cfg.camera_gate_mad * max(mad, 1e-9)
    order = np.argsort(-mse)
    max_drop = int((1.0 - cfg.camera_gate_min_keep) * len(mse))
    dropped = [int(c) for c in order[:max_drop] if mse[c] > thr]
    keep = ~np.isin(dataset.cam_ids, dropped)
    if verbose and dropped:
        print(f"[dense] camera gate dropped {len(dropped)}/{len(mse)} "
              f"cameras (probe mse thr {thr:.4f}): "
              + ", ".join(f"{c}:{mse[c]:.4f}" for c in dropped), flush=True)
    elif verbose:
        print(f"[dense] camera gate: no outliers "
              f"(median {med:.4f}, max {mse.max():.4f}, thr {thr:.4f})",
              flush=True)
    return keep, dropped


def save_checkpoint(store, state: TrainState, epoch: int, losses: List[float]) -> None:
    """Persist grid + Adam moments (the reference loses everything on a
    training crash — SURVEY §5 checkpoint/resume row)."""
    import numpy as np

    flat, _ = jax.tree_util.tree_flatten(state.opt_state)
    extra = {}
    if state.exposure is not None:
        extra["exposure"] = np.asarray(state.exposure)
    if state.background is not None:
        extra["background"] = np.asarray(state.background)
    store.save(
        "dense_ckpt",
        grid=np.asarray(state.grid.grid),
        min_bound=np.asarray(state.grid.min_bound),
        max_bound=np.asarray(state.grid.max_bound),
        step=np.asarray(state.step),
        epoch=np.asarray(epoch),
        losses=np.asarray(losses, np.float32),
        **extra,
        **{f"opt_{i}": np.asarray(a) for i, a in enumerate(flat) if hasattr(a, "shape")},
    )


def load_checkpoint(store, optimizer) -> Optional[Tuple[TrainState, int, List[float]]]:
    data = store.load("dense_ckpt")
    if data is None:
        return None
    grid = VoxelGrid(jnp.asarray(data["grid"]), jnp.asarray(data["min_bound"]), jnp.asarray(data["max_bound"]))
    opt_state = optimizer.init(grid.grid)
    flat, treedef = jax.tree_util.tree_flatten(opt_state)
    restored = []
    k = 0
    for a in flat:
        if hasattr(a, "shape") and f"opt_{k}" in data:
            restored.append(jnp.asarray(data[f"opt_{k}"]))
            k += 1
        else:
            restored.append(a)
    opt_state = jax.tree_util.tree_unflatten(treedef, restored)
    exposure = jnp.asarray(data["exposure"]) if "exposure" in data else None
    background = jnp.asarray(data["background"]) if "background" in data else None
    state = TrainState(grid, opt_state, jnp.asarray(data["step"]), exposure,
                       background)
    return state, int(data["epoch"]), list(data["losses"])


def train_plenoxel(
    dataset: RayDataset,
    cfg: Optional[DenseConfig] = None,
    seed: int = 0,
    grid: Optional[VoxelGrid] = None,
    verbose: bool = True,
    log_every: int = 170,
    checkpoint_store=None,
    resume: bool = False,
    packed: Optional[bool] = None,
    mesh=None,
    base_grid: Optional[VoxelGrid] = None,
) -> Tuple[VoxelGrid, List[float]]:
    """Reference training loop (plenoxel.py:96-121 / sdf.py:423-445), with
    optional per-epoch checkpoint/resume through an ArtifactStore.

    base_grid: optional frozen cascade BASE (r5): when given, the trained
    grid is the core DETAIL layer composed pre-activation with this base
    (dense/render.py). Callers should pass a detail `grid` with tighter
    bounds, coarse_epochs=0 and camera_gate=False; the packed Pallas path
    is forced (interpret mode on CPU).

    packed: run the step on the packed grid layout through the Pallas
    kernel pair (None = auto: on for TPU backends). The returned grid is
    always unpacked (X, Y, Z, C).

    mesh: a jax.sharding.Mesh routes training through the ray-DP x
    voxel-brick-TP sharded step (dist/dense_tp.py) — per-device grid
    memory is 1/n_model, lifting the 256^3 single-chip capacity ceiling."""
    cfg = cfg or DenseConfig()
    if mesh is not None:
        from tpu3d.dist.dense_tp import train_dense_tp

        return train_dense_tp(dataset, cfg, mesh, seed=seed, grid=grid,
                              verbose=verbose, log_every=log_every,
                              checkpoint_store=checkpoint_store,
                              resume=resume, sdf_mode=False)
    n = len(dataset.origins)
    steps_per_epoch = max(n // cfg.batch_size, 1)
    if grid is None:
        # Contraction maps all of space into the radius-2 ball; the grid
        # must span exactly [-2, 2]^3 for the warp's core/shell split.
        s = 2.0 if cfg.contraction else cfg.scene_scale
        grid = create_grid(cfg.grid_resolution, (-s, -s, -s), (s, s, s))
    pre_losses: List[float] = []
    if cfg.coarse_epochs > 0 and cfg.epochs > cfg.coarse_epochs and not resume:
        grid, pre_losses, cfg = _coarse_stage(
            train_plenoxel, dataset, cfg, seed, grid, verbose, log_every, packed)
    use_packed = packed if packed is not None else (jax.default_backend() != "cpu")
    if base_grid is not None:
        use_packed = True
    orig_shape = tuple(grid.grid.shape)
    if use_packed:
        from tpu3d.kernels.trilinear import pack_grid, unpack_grid

        garr = pack_grid(grid.grid)
    else:
        garr = grid.grid
    base_tuple = None
    base_res = None
    if base_grid is not None:
        from tpu3d.kernels.trilinear import pack_grid as _pg

        base_res = tuple(base_grid.grid.shape[:3])
        base_tuple = (jnp.asarray(_pg(jnp.asarray(base_grid.grid))),
                      jnp.asarray(base_grid.min_bound),
                      jnp.asarray(base_grid.max_bound))
    optimizer = make_optimizer(cfg, steps_per_epoch)
    exp0 = (init_exposure(int(dataset.cam_ids.max()) + 1)
            if cfg.exposure and dataset.cam_ids is not None else None)
    bg0 = init_background() if cfg.sh_background else None
    state = TrainState(VoxelGrid(garr, grid.min_bound, grid.max_bound),
                       optimizer.init(garr), jnp.asarray(0), exp0, bg0)
    losses: List[float] = list(pre_losses)
    start_epoch = 0
    if resume and checkpoint_store is not None:
        ck = load_checkpoint(checkpoint_store, optimizer)
        if ck is not None:
            state, start_epoch, losses = ck
            state = _convert_layout(state, use_packed, orig_shape)
            start_epoch += 1
            if verbose:
                print(f"[dense] resumed at epoch {start_epoch}", flush=True)
    if use_packed:
        interp = jax.default_backend() == "cpu"
        step_fn = make_train_step_packed(cfg, optimizer, orig_shape[:3], interp,
                                         base_res=base_res)
    else:
        step_fn = make_train_step(cfg, optimizer)

    # Occupancy pruning starts fully occupied (== no pruning) and is
    # refreshed from the live density every `occupancy_every` steps — the
    # empty-space classification follows the model instead of freezing
    # regions out before they can densify.
    occ = None
    if cfg.occupancy_prune:
        from tpu3d.dense.occupancy import occupancy_from_grid, occupancy_from_packed

        f = cfg.occupancy_factor
        coarse = tuple(-(-d // f) for d in orig_shape[:3])
        occ = jnp.ones(coarse, bool)

    def _refresh_occ(occ):
        if use_packed:
            return occupancy_from_packed(
                state.grid.grid, orig_shape, f, cfg.occupancy_threshold)
        return occupancy_from_grid(state.grid.grid, f, cfg.occupancy_threshold)

    chunk = max(int(cfg.scan_chunk), 1)
    if n < cfg.batch_size:
        chunk = 1  # single short batch per epoch — per-step path handles it
    plan = _chunk_plan(steps_per_epoch, chunk)
    multi_fn = make_multi_step(step_fn, with_occ=True) if chunk > 1 else None
    cid_all = dataset.cam_ids if exp0 is not None else None
    if multi_fn is not None:
        o_dev = jnp.asarray(dataset.origins)
        d_dev = jnp.asarray(dataset.dirs)
        rgb_dev = jnp.asarray(dataset.rgb)
        cid_dev = jnp.asarray(cid_all) if cid_all is not None else None

    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    global_step = 0
    next_occ = cfg.occupancy_every
    kept_idx = None
    gate_dropped: List[int] = []
    gate_done = False
    for epoch in range(start_epoch, cfg.epochs):
        if (cfg.camera_gate and not gate_done and dataset.cam_ids is not None
                and epoch >= cfg.camera_gate_epoch):
            keep_mask, gate_dropped = apply_camera_gate(
                state, dataset, cfg, use_packed, orig_shape, verbose)
            gate_done = True
            if gate_dropped:
                kept_idx = np.flatnonzero(keep_mask)
                plan = _chunk_plan(max(len(kept_idx) // cfg.batch_size, 1),
                                   chunk)
        key, pkey, ekey = jax.random.split(key, 3)
        if kept_idx is None:
            perm = np.asarray(jax.random.permutation(pkey, n))
        else:
            perm = kept_idx[np.asarray(
                jax.random.permutation(pkey, len(kept_idx)))]
        for b, k_steps in plan:
            # occupancy refresh lands on the first chunk boundary at/after
            # each occupancy_every multiple (exact per-step cadence when
            # scan_chunk == 1)
            if occ is not None and global_step >= next_occ:
                occ = _refresh_occ(occ)
                next_occ += cfg.occupancy_every
            if multi_fn is not None:
                idx = perm[b * cfg.batch_size : (b + k_steps) * cfg.batch_size]
                idx = jnp.asarray(idx.reshape(k_steps, cfg.batch_size))
                state, loss_chunk = multi_fn(state, ekey, np.uint32(b), idx,
                                             o_dev, d_dev, rgb_dev, occ,
                                             cid_all=cid_dev, base=base_tuple)
            else:
                idx = perm[b * cfg.batch_size : (b + 1) * cfg.batch_size]
                extra = {} if base_tuple is None else {"base": base_tuple}
                state, loss = step_fn(
                    state, jax.random.fold_in(ekey, np.uint32(b)),
                    jnp.asarray(dataset.origins[idx]),
                    jnp.asarray(dataset.dirs[idx]),
                    jnp.asarray(dataset.rgb[idx]),
                    occ=occ,
                    cid=(jnp.asarray(cid_all[idx]) if cid_all is not None
                         else None),
                    **extra,
                )
                loss_chunk = None
            global_step += k_steps
            log_js = [j for j in range(k_steps) if (b + j) % log_every == 0]
            if log_js:
                lc = np.asarray(loss_chunk) if loss_chunk is not None else None
                for j in log_js:
                    loss_j = float(lc[j]) if lc is not None else float(loss)
                    losses.append(loss_j)
                    if verbose:
                        rate = (b + k_steps) * cfg.batch_size / (time.time() - t0)
                        print(f"[dense] epoch {epoch} step {b + j}/{steps_per_epoch} "
                              f"loss {loss_j:.5f} ({rate:.0f} rays/s)", flush=True)
        if checkpoint_store is not None:
            save_checkpoint(checkpoint_store, state, epoch, losses)
    _publish_aux(state)
    LAST_TRAIN_AUX["dropped_cameras"] = gate_dropped
    if use_packed:
        return VoxelGrid(unpack_grid(state.grid.grid, orig_shape),
                         state.grid.min_bound, state.grid.max_bound), losses
    return state.grid, losses


def _convert_layout(state: TrainState, use_packed: bool, orig_shape) -> TrainState:
    """Convert a resumed checkpoint between dense and packed layouts (the
    pack is a linear reshape, so Adam moments convert the same way)."""
    from tpu3d.kernels.trilinear import pack_grid, unpack_grid

    is_packed = state.grid.grid.ndim == 5
    if is_packed == use_packed:
        return state
    src_shape = tuple(state.grid.grid.shape)
    f = pack_grid if use_packed else (lambda a: unpack_grid(a, orig_shape))
    conv = lambda a: f(a) if hasattr(a, "shape") and tuple(a.shape) == src_shape else a
    return TrainState(
        VoxelGrid(conv(state.grid.grid), state.grid.min_bound, state.grid.max_bound),
        jax.tree_util.tree_map(conv, state.opt_state),
        state.step,
        state.exposure,
        state.background,
    )


def make_sdf_train_step_packed(cfg: DenseConfig, optimizer: optax.GradientTransformation,
                               res, interpret: bool = False):
    """SDF step on the packed Pallas layout. The SDF grid is structurally a
    plenoxel grid (relu density ch0 + SH, dense/sdf.py::query_sdf_sh), so
    the packed renderer applies with the SDF path's band semantics: pure
    per-ray AABB band (near=0, far=inf, clip_aabb) and valid-ray-masked
    MSE (ref sdf.py:431)."""
    from tpu3d.dense.render import render_rays_packed_diff
    from tpu3d.dense.sdf import ray_aabb

    BIG = 1e6

    def step_body(state: TrainState, key, ro, rd, rgb, cid=None):
        def loss_fn(packed, gains, bg_sh, key, rgb, cid):
            pred = render_rays_packed_diff(
                packed, state.grid.min_bound, state.grid.max_bound, res, key,
                ro, rd, 0.0, BIG, cfg.num_samples, cfg.white_background,
                clip_aabb=True, interpret=interpret,
                bg=_ray_background(bg_sh, rd))
            pred = _exposure_apply(pred, gains, cid)
            _, _, valid = ray_aabb(ro, rd, state.grid.min_bound, state.grid.max_bound)
            w = valid.astype(pred.dtype)[:, None]
            loss = jnp.sum(w * (pred - rgb) ** 2) / jnp.maximum(jnp.sum(w) * 3, 1.0)
            if cfg.tv_sigma or cfg.tv_sh:
                tv_s, tv_c = _tv_crop_loss_packed(
                    packed, res, jax.random.fold_in(key, 7), cfg.tv_crop, channels=28)
                loss = loss + cfg.tv_sigma * tv_s + cfg.tv_sh * tv_c
            if getattr(cfg, "sparsity_sigma", 0.0):
                loss = loss + cfg.sparsity_sigma * _sparsity_crop_loss_packed(
                    packed, jax.random.fold_in(key, 11), cfg.tv_crop)
            return loss

        loss, g, exposure, background = _split_grads(
            cfg, state, loss_fn, state.grid.grid, key, rgb, cid)
        updates, opt_state = optimizer.update(g, state.opt_state, state.grid.grid)
        new_grid = optax.apply_updates(state.grid.grid, updates)
        return TrainState(
            VoxelGrid(new_grid, state.grid.min_bound, state.grid.max_bound),
            opt_state, state.step + 1, exposure, background,
        ), loss

    step = functools.partial(jax.jit, donate_argnums=(0,))(step_body)
    step.body = step_body
    return step


def make_sdf_train_step(cfg: DenseConfig, optimizer: optax.GradientTransformation):
    """SDF-grid step (ref sdf.py:423-438): render_rays_aabb with per-ray
    AABB bounds, MSE over VALID rays only (ref masks with `valid`,
    sdf.py:431)."""
    from tpu3d.dense.render import render_rays_aabb
    from tpu3d.dense.sdf import SDFGrid

    def step_body(state: TrainState, key, ro, rd, rgb, cid=None):
        def loss_fn(grid_arr, gains, bg_sh, key, rgb, cid):
            sg = SDFGrid(grid_arr, state.grid.min_bound, state.grid.max_bound)
            pred, valid = render_rays_aabb(sg, key, ro, rd, cfg.num_samples,
                                           cfg.white_background,
                                           bg=_ray_background(bg_sh, rd))
            pred = _exposure_apply(pred, gains, cid)
            w = valid.astype(pred.dtype)[:, None]
            loss = jnp.sum(w * (pred - rgb) ** 2) / jnp.maximum(jnp.sum(w) * 3, 1.0)
            if cfg.tv_sigma or cfg.tv_sh:
                tv_s, tv_c = _tv_crop_loss(grid_arr, jax.random.fold_in(key, 7), cfg.tv_crop)
                loss = loss + cfg.tv_sigma * tv_s + cfg.tv_sh * tv_c
            if getattr(cfg, "sparsity_sigma", 0.0):
                loss = loss + cfg.sparsity_sigma * _sparsity_crop_loss(
                    grid_arr, jax.random.fold_in(key, 11), cfg.tv_crop)
            return loss

        loss, g, exposure, background = _split_grads(
            cfg, state, loss_fn, state.grid.grid, key, rgb, cid)
        updates, opt_state = optimizer.update(g, state.opt_state, state.grid.grid)
        new_grid = optax.apply_updates(state.grid.grid, updates)
        return TrainState(
            VoxelGrid(new_grid, state.grid.min_bound, state.grid.max_bound),
            opt_state, state.step + 1, exposure, background,
        ), loss

    step = functools.partial(jax.jit, donate_argnums=(0,))(step_body)
    step.body = step_body
    return step


def train_sdf(
    dataset: RayDataset,
    cfg: Optional[DenseConfig] = None,
    seed: int = 0,
    grid: Optional[VoxelGrid] = None,
    verbose: bool = True,
    log_every: int = 170,
    packed: Optional[bool] = None,
    mesh=None,
) -> Tuple[VoxelGrid, List[float]]:
    """SDF-grid training loop (ref sdf.py:409-445): same schedule/batching
    as the plenoxel path, per-ray AABB sampling, valid-ray masking.
    packed (None = auto on TPU backends): run on the Pallas packed layout
    — the XLA gather/scatter path measured ~5x slower on TPU.
    mesh: route through the brick-sharded TP step (see train_plenoxel)."""
    cfg = cfg or DenseConfig()
    if mesh is not None:
        from tpu3d.dist.dense_tp import train_dense_tp

        return train_dense_tp(dataset, cfg, mesh, seed=seed, grid=grid,
                              verbose=verbose, log_every=log_every,
                              sdf_mode=True)
    n = len(dataset.origins)
    steps_per_epoch = max(n // cfg.batch_size, 1)
    if grid is None:
        # Contraction maps all of space into the radius-2 ball; the grid
        # must span exactly [-2, 2]^3 for the warp's core/shell split.
        s = 2.0 if cfg.contraction else cfg.scene_scale
        grid = create_grid(cfg.grid_resolution, (-s, -s, -s), (s, s, s))
    pre_losses: List[float] = []
    if cfg.coarse_epochs > 0 and cfg.epochs > cfg.coarse_epochs:
        grid, pre_losses, cfg = _coarse_stage(
            train_sdf, dataset, cfg, seed, grid, verbose, log_every, packed)
    use_packed = packed if packed is not None else (jax.default_backend() != "cpu")
    orig_shape = tuple(grid.grid.shape)
    optimizer = make_optimizer(cfg, steps_per_epoch)
    exp0 = (init_exposure(int(dataset.cam_ids.max()) + 1)
            if cfg.exposure and dataset.cam_ids is not None else None)
    bg0 = init_background() if cfg.sh_background else None
    if use_packed:
        from tpu3d.kernels.trilinear import pack_grid

        garr = pack_grid(grid.grid)
        state = TrainState(VoxelGrid(garr, grid.min_bound, grid.max_bound),
                           optimizer.init(garr), jnp.asarray(0), exp0, bg0)
        step_fn = make_sdf_train_step_packed(
            cfg, optimizer, orig_shape[:3],
            interpret=jax.default_backend() == "cpu")
    else:
        state = TrainState(grid, optimizer.init(grid.grid), jnp.asarray(0),
                           exp0, bg0)
        step_fn = make_sdf_train_step(cfg, optimizer)
    losses: List[float] = list(pre_losses)
    chunk = max(int(cfg.scan_chunk), 1)
    if n < cfg.batch_size:
        chunk = 1  # single short batch per epoch — per-step path handles it
    plan = _chunk_plan(steps_per_epoch, chunk)
    multi_fn = make_multi_step(step_fn, with_occ=False) if chunk > 1 else None
    cid_all = dataset.cam_ids if exp0 is not None else None
    if multi_fn is not None:
        o_dev = jnp.asarray(dataset.origins)
        d_dev = jnp.asarray(dataset.dirs)
        rgb_dev = jnp.asarray(dataset.rgb)
        cid_dev = jnp.asarray(cid_all) if cid_all is not None else None
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    for epoch in range(cfg.epochs):
        key, pkey, ekey = jax.random.split(key, 3)
        perm = np.asarray(jax.random.permutation(pkey, n))
        for b, k_steps in plan:
            if multi_fn is not None:
                idx = perm[b * cfg.batch_size : (b + k_steps) * cfg.batch_size]
                idx = jnp.asarray(idx.reshape(k_steps, cfg.batch_size))
                state, loss_chunk = multi_fn(state, ekey, np.uint32(b), idx,
                                             o_dev, d_dev, rgb_dev,
                                             cid_all=cid_dev)
            else:
                idx = perm[b * cfg.batch_size : (b + 1) * cfg.batch_size]
                state, loss = step_fn(
                    state, jax.random.fold_in(ekey, np.uint32(b)),
                    jnp.asarray(dataset.origins[idx]),
                    jnp.asarray(dataset.dirs[idx]),
                    jnp.asarray(dataset.rgb[idx]),
                    cid=(jnp.asarray(cid_all[idx]) if cid_all is not None
                         else None),
                )
                loss_chunk = None
            log_js = [j for j in range(k_steps) if (b + j) % log_every == 0]
            if log_js:
                lc = np.asarray(loss_chunk) if loss_chunk is not None else None
                for j in log_js:
                    loss_j = float(lc[j]) if lc is not None else float(loss)
                    losses.append(loss_j)
                    if verbose:
                        rate = (b + k_steps) * cfg.batch_size / (time.time() - t0)
                        print(f"[sdf] epoch {epoch} step {b + j}/{steps_per_epoch} "
                              f"loss {loss_j:.5f} ({rate:.0f} rays/s)", flush=True)
    _publish_aux(state)
    if use_packed:
        from tpu3d.kernels.trilinear import unpack_grid

        return VoxelGrid(unpack_grid(state.grid.grid, orig_shape),
                         state.grid.min_bound, state.grid.max_bound), losses
    return state.grid, losses


def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    mse = float(np.mean((pred - gt) ** 2))
    return -10.0 * np.log10(mse + 1e-12)
