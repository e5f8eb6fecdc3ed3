"""Cascade (base + core detail) composition tests — r5 capacity feature.

The cascade trains a high-voxels-per-unit DETAIL grid over the scene core
against a FROZEN base grid (dense/render.py base_* args): pre-activation
residual composition, ray sampling driven by the BASE bounds. These tests
pin the two invariants everything else rests on: a zero detail layer
changes nothing, and training moves only the detail layer.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpu3d.config import DenseConfig
from tpu3d.dense.grid import VoxelGrid, create_grid
from tpu3d.dense.render import render_image, render_rays, render_rays_packed
from tpu3d.kernels.trilinear import pack_grid


def _scene():
    rng = np.random.default_rng(0)
    base = create_grid(16, (-2, -2, -2), (2, 2, 2))
    base = VoxelGrid(
        jnp.asarray(rng.normal(0.2, 0.5, base.grid.shape).astype(np.float32)),
        base.min_bound, base.max_bound)
    detail = create_grid(16, (-1, -1, -1), (1, 1, 1), init=0.0)
    n = 64
    o = rng.normal(0, 1, (n, 3)).astype(np.float32)
    o = 3.0 * o / np.linalg.norm(o, axis=1, keepdims=True)
    d = (-o / np.linalg.norm(o, axis=1, keepdims=True)).astype(np.float32)
    return base, detail, jnp.asarray(o), jnp.asarray(d)


def test_zero_detail_is_identity_xla():
    base, detail, o, d = _scene()
    key = jax.random.PRNGKey(0)
    ref = render_rays(base, key, o, d, 0.5, 5.0, 32, perturb=False)
    out = render_rays(detail, key, o, d, 0.5, 5.0, 32, perturb=False,
                      base_vg=base)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-6)


def test_zero_detail_is_identity_packed():
    base, detail, o, d = _scene()
    key = jax.random.PRNGKey(0)
    ref = render_rays_packed(pack_grid(base.grid), base.min_bound,
                             base.max_bound, (16, 16, 16), key, o, d,
                             0.5, 5.0, 32)
    out = render_rays_packed(pack_grid(detail.grid), detail.min_bound,
                             detail.max_bound, (16, 16, 16), key, o, d,
                             0.5, 5.0, 32,
                             base_packed=pack_grid(base.grid),
                             base_mb=base.min_bound, base_xb=base.max_bound,
                             base_res=(16, 16, 16))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_detail_changes_core_only():
    base, detail, o, d = _scene()
    key = jax.random.PRNGKey(0)
    bumped = VoxelGrid(detail.grid.at[6:10, 6:10, 6:10, 0].add(5.0),
                       detail.min_bound, detail.max_bound)
    a = render_rays(detail, key, o, d, 0.5, 5.0, 32, perturb=False,
                    base_vg=base)
    b = render_rays(bumped, key, o, d, 0.5, 5.0, 32, perturb=False,
                    base_vg=base)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_render_image_base_passthrough():
    base, detail, o, d = _scene()
    ref = render_image(base, jax.random.PRNGKey(0), o, d, 0.5, 5.0, 32,
                       chunk=32, use_pallas=False)
    out = render_image(detail, jax.random.PRNGKey(0), o, d, 0.5, 5.0, 32,
                       chunk=32, use_pallas=False, base_grid=base)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-6)


def test_train_step_moves_detail_only():
    from tpu3d.dense.train import TrainState, make_train_step_packed

    base, detail, o, d = _scene()
    cfg = DenseConfig(grid_resolution=16, num_samples=32, near=0.5, far=5.0,
                      hierarchical=False, batch_size=64, tv_sigma=0.0,
                      tv_sh=0.0)
    opt = optax.adam(1e-2)
    packed = pack_grid(detail.grid)
    packed_before = np.asarray(packed).copy()  # step donates the state
    state = TrainState(VoxelGrid(packed, detail.min_bound, detail.max_bound),
                       opt.init(packed), jnp.asarray(0))
    step = make_train_step_packed(cfg, opt, (16, 16, 16), interpret=True,
                                  base_res=(16, 16, 16))
    rgb = jnp.zeros((64, 3), jnp.float32)
    bt = (pack_grid(base.grid), base.min_bound, base.max_bound)
    st2, loss = step(state, jax.random.PRNGKey(1), o, d, rgb, base=bt)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(st2.grid.grid), packed_before)


def test_train_plenoxel_with_base_runs():
    from tpu3d.dense.train import RayDataset, train_plenoxel

    base, detail, o, d = _scene()
    rng = np.random.default_rng(1)
    ds = RayDataset(np.asarray(o), np.asarray(d),
                    rng.uniform(0, 1, (64, 3)).astype(np.float32))
    cfg = DenseConfig(grid_resolution=16, num_samples=32, near=0.5, far=5.0,
                      hierarchical=False, batch_size=32, epochs=1,
                      coarse_epochs=0, scan_chunk=2, tv_sigma=0.0, tv_sh=0.0)
    g, losses = train_plenoxel(ds, cfg, grid=detail, verbose=False,
                               base_grid=base)
    assert g.grid.shape == (16, 16, 16, 28)
    assert np.isfinite(losses).all()
