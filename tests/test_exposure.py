"""Per-image exposure latents (DenseConfig.exposure).

Synthetic setup: one ground-truth scene photographed by "cameras" whose
images carry different global gains (auto-exposure). Without latents, the
grid can only learn the mean exposure and every view pays the variance as
irreducible MSE; with latents the residual collapses and the learned
log-gains must recover the simulated ones up to a common shift (the
canonical-exposure gauge)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3d.config import DenseConfig
from tpu3d.dense.grid import VoxelGrid
from tpu3d.dense.render import render_rays
from tpu3d.dense.train import (
    RayDataset, TrainState, init_exposure, make_train_step, rays_from_cameras,
    train_plenoxel,
)


def _ball_scene(rng, n_rays=2048, n_cams=4, gain_spread=0.5):
    res = 32
    coords = np.stack(np.meshgrid(*[np.linspace(-1, 1, res)] * 3, indexing="ij"), -1)
    inside = (np.linalg.norm(coords, axis=-1) < 0.5).astype(np.float32)
    g = np.zeros((res, res, res, 28), np.float32)
    g[..., 0] = inside * 50.0
    g[..., 1] = inside * 0.8 / 0.282095
    g[..., 10] = inside * 0.6 / 0.282095
    g[..., 19] = inside * 0.4 / 0.282095
    gt_grid = VoxelGrid(jnp.asarray(g), jnp.asarray([-1.0, -1, -1]),
                        jnp.asarray([1.0, 1, 1]))
    o = rng.normal(0, 1, (n_rays, 3)).astype(np.float32)
    o = 3.0 * o / np.linalg.norm(o, axis=1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=1, keepdims=True)
    clean = np.asarray(render_rays(gt_grid, jax.random.PRNGKey(1),
                                   jnp.asarray(o), jnp.asarray(d),
                                   near=1.0, far=5.0, n_samples=64,
                                   perturb=False))
    cam_ids = (np.arange(n_rays) % n_cams).astype(np.int32)
    true_log_gains = np.linspace(-gain_spread, gain_spread, n_cams).astype(np.float32)
    gained = clean * np.exp(true_log_gains[cam_ids])[:, None]
    return o, d, np.clip(gained, 0.0, 4.0).astype(np.float32), cam_ids, true_log_gains


def _train(ds, exposure):
    cfg = DenseConfig(grid_resolution=32, num_samples=64, near=1.0, far=5.0,
                      scene_scale=1.0, batch_size=512, epochs=10,
                      learning_rate=1e-1, lr_milestones=(6, 8),
                      exposure=exposure, exposure_lr=3e-2, scan_chunk=4)
    return train_plenoxel(ds, cfg, verbose=False, log_every=4)


def test_exposure_latents_absorb_per_image_gain(rng):
    o, d, rgb, cam_ids, _ = _ball_scene(rng)
    ds = RayDataset(o, d, rgb, cam_ids)
    _, losses_off = _train(ds, exposure=False)
    _, losses_on = _train(ds, exposure=True)
    # gain variance is irreducible without latents; latents must cut the
    # final loss by a wide margin
    assert losses_on[-1] < losses_off[-1] * 0.5, (losses_on[-1], losses_off[-1])


def test_exposure_recovers_true_gains(rng):
    """Drive only the latents (frozen ground-truth grid): the learned
    log-gains must match the simulated ones up to a common constant."""
    import optax

    o, d, rgb, cam_ids, true_gains = _ball_scene(rng, n_rays=1024)
    res = 32
    coords = np.stack(np.meshgrid(*[np.linspace(-1, 1, res)] * 3, indexing="ij"), -1)
    inside = (np.linalg.norm(coords, axis=-1) < 0.5).astype(np.float32)
    g = np.zeros((res, res, res, 28), np.float32)
    g[..., 0] = inside * 50.0
    g[..., 1] = inside * 0.8 / 0.282095
    g[..., 10] = inside * 0.6 / 0.282095
    g[..., 19] = inside * 0.4 / 0.282095
    grid = VoxelGrid(jnp.asarray(g), jnp.asarray([-1.0, -1, -1]),
                     jnp.asarray([1.0, 1, 1]))
    cfg = DenseConfig(grid_resolution=res, num_samples=64, near=1.0, far=5.0,
                      scene_scale=1.0, batch_size=1024, epochs=1,
                      learning_rate=0.0,  # grid frozen: lr 0
                      exposure=True, exposure_lr=5e-2)
    opt = optax.adam(cfg.learning_rate)
    step = make_train_step(cfg, opt)
    state = TrainState(grid, opt.init(grid.grid), jnp.asarray(0),
                       init_exposure(4))
    key = jax.random.PRNGKey(0)
    for i in range(150):
        key, k = jax.random.split(key)
        state, loss = step(state, k, jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray(rgb), cid=jnp.asarray(cam_ids))
    learned = np.asarray(state.exposure[0]).mean(axis=-1)  # (4,)
    # compare up to the common-gauge shift
    learned = learned - learned.mean()
    centered = true_gains - true_gains.mean()
    np.testing.assert_allclose(learned, centered, atol=0.08)


def test_rays_from_cameras_cam_ids(rng):
    cams = np.zeros((3, 6), np.float32)
    cams[:, 5] = 3.0
    imgs = rng.integers(0, 255, (3, 8, 10, 3)).astype(np.uint8)
    ds = rays_from_cameras(cams, imgs, focal=20.0)
    assert ds.cam_ids is not None and len(ds.cam_ids) == 3 * 80
    np.testing.assert_array_equal(np.unique(ds.cam_ids), [0, 1, 2])
    assert (ds.cam_ids[:80] == 0).all() and (ds.cam_ids[-80:] == 2).all()


def test_exposure_off_is_unchanged(rng):
    """exposure=False must produce the exact same training trajectory as
    before the feature existed (state pytree carries exposure=None)."""
    o, d, rgb, cam_ids, _ = _ball_scene(rng, n_rays=512)
    cfg = DenseConfig(grid_resolution=32, num_samples=32, near=1.0, far=5.0,
                      scene_scale=1.0, batch_size=256, epochs=2,
                      learning_rate=1e-1, scan_chunk=2)
    g1, l1 = train_plenoxel(RayDataset(o, d, rgb, cam_ids), cfg,
                            verbose=False, log_every=1)
    g2, l2 = train_plenoxel(RayDataset(o, d, rgb, None), cfg,
                            verbose=False, log_every=1)
    np.testing.assert_array_equal(np.asarray(g1.grid), np.asarray(g2.grid))
    assert l1 == l2


def _ball_scene_bg(rng, bg_color, n_rays=2048):
    res = 32
    coords = np.stack(np.meshgrid(*[np.linspace(-1, 1, res)] * 3, indexing="ij"), -1)
    inside = (np.linalg.norm(coords, axis=-1) < 0.4).astype(np.float32)
    g = np.zeros((res, res, res, 28), np.float32)
    g[..., 0] = inside * 50.0
    g[..., 1] = inside * 0.8 / 0.282095
    gt_grid = VoxelGrid(jnp.asarray(g), jnp.asarray([-1.0, -1, -1]),
                        jnp.asarray([1.0, 1, 1]))
    o = rng.normal(0, 1, (n_rays, 3)).astype(np.float32)
    o = 3.0 * o / np.linalg.norm(o, axis=1, keepdims=True)
    # aim at scattered targets so a good fraction of rays MISS the opaque
    # ball and see the background through the (empty) grid volume
    targets = rng.uniform(-0.9, 0.9, (n_rays, 3)).astype(np.float32)
    d = targets - o
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    bg = jnp.broadcast_to(jnp.asarray(bg_color, jnp.float32), (n_rays, 3))
    gt = np.asarray(render_rays(gt_grid, jax.random.PRNGKey(1),
                                jnp.asarray(o), jnp.asarray(d),
                                near=1.0, far=5.0, n_samples=64,
                                perturb=False, bg=bg))
    return o, d, gt.astype(np.float32)


def test_sh_background_learns_sky_color(rng):
    """Frozen ground-truth grid (lr 0), GT rays composited over a non-white
    background: only the SH background latent can explain the residual, and
    its DC term must recover the color. (A jointly-trained grid can fake a
    CONSTANT background with fog voxels instead — that failure mode is what
    DenseConfig.sparsity_sigma exists for on real scenes.)"""
    import optax

    from tpu3d.dense.train import init_background

    bg_color = (0.3, 0.5, 0.8)
    o, d, rgb = _ball_scene_bg(rng, bg_color, n_rays=1024)
    res = 32
    coords = np.stack(np.meshgrid(*[np.linspace(-1, 1, res)] * 3, indexing="ij"), -1)
    inside = (np.linalg.norm(coords, axis=-1) < 0.4).astype(np.float32)
    g = np.zeros((res, res, res, 28), np.float32)
    g[..., 0] = inside * 50.0
    g[..., 1] = inside * 0.8 / 0.282095
    grid = VoxelGrid(jnp.asarray(g), jnp.asarray([-1.0, -1, -1]),
                     jnp.asarray([1.0, 1, 1]))
    cfg = DenseConfig(grid_resolution=res, num_samples=64, near=1.0, far=5.0,
                      scene_scale=1.0, batch_size=1024, epochs=1,
                      learning_rate=0.0, sh_background=True,
                      background_lr=5e-2)
    opt = optax.adam(cfg.learning_rate)
    step = make_train_step(cfg, opt)
    state = TrainState(grid, opt.init(grid.grid), jnp.asarray(0),
                       None, init_background())
    key = jax.random.PRNGKey(0)
    loss0 = None
    for i in range(200):
        key, k = jax.random.split(key)
        state, loss = step(state, k, jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray(rgb))
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < loss0 * 0.05, (float(loss), loss0)
    dc_color = np.asarray(state.background[0])[:, 0] * 0.282095
    np.testing.assert_allclose(dc_color, bg_color, atol=0.06)


def test_sh_background_off_unchanged(rng):
    o, d, rgb, cam_ids, _ = _ball_scene(rng, n_rays=512)
    cfg = DenseConfig(grid_resolution=32, num_samples=32, near=1.0, far=5.0,
                      scene_scale=1.0, batch_size=256, epochs=2,
                      learning_rate=1e-1, scan_chunk=2)
    g1, l1 = train_plenoxel(RayDataset(o, d, rgb), cfg, verbose=False, log_every=1)
    from tpu3d.dense.train import LAST_TRAIN_AUX
    assert LAST_TRAIN_AUX["background"] is None
    # composite with bg=None + white_bg must be the historical behavior
    from tpu3d.dense.render import composite
    sig = jnp.asarray(rng.uniform(0, 2, (8, 16)).astype(np.float32))
    col = jnp.asarray(rng.uniform(0, 1, (8, 16, 3)).astype(np.float32))
    z = jnp.cumsum(jnp.asarray(rng.uniform(0.01, 0.1, (8, 16)).astype(np.float32)), axis=1)
    white = np.asarray(composite(sig, col, z, white_bg=True))
    via_bg = np.asarray(composite(sig, col, z, white_bg=True,
                                  bg=jnp.ones((8, 3))))
    np.testing.assert_allclose(white, via_bg, atol=1e-6)


def test_sparsity_prior_kills_fog(rng):
    """With the Cauchy sparsity prior, training over a non-white background
    drives fog density down so the bg latent (not fog) explains the sky:
    post-training, voxels far from the ball stay near-empty."""
    bg_color = (0.3, 0.5, 0.8)
    o, d, rgb = _ball_scene_bg(rng, bg_color, n_rays=2048)
    cfg = DenseConfig(grid_resolution=32, num_samples=64, near=1.0, far=5.0,
                      scene_scale=1.0, batch_size=512, epochs=10,
                      learning_rate=1e-1, lr_milestones=(6, 8), scan_chunk=4,
                      sh_background=True, background_lr=5e-2,
                      sparsity_sigma=1e-3, tv_crop=16)
    grid, losses = train_plenoxel(RayDataset(o, d, rgb), cfg, verbose=False,
                                  log_every=4)
    g = np.asarray(grid.grid)
    res = g.shape[0]
    coords = np.stack(np.meshgrid(*[np.linspace(-1, 1, res)] * 3, indexing="ij"), -1)
    far_mask = np.linalg.norm(coords, axis=-1) > 0.8
    fog = np.maximum(g[..., 0], 0.0)[far_mask].mean()
    assert fog < 1.0, fog  # far voxels stay near-empty
    assert losses[-1] < 0.02
