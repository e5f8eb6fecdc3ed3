"""Brick-sharded dense training (dist/dense_tp.py) on the virtual 8-device
CPU mesh: partial-interpolation exactness, 1-vs-8-device step equivalence,
per-device memory sharding, and the train_plenoxel/train_sdf mesh routing.
This is the production wiring of grid TP (VERDICT r3 item 1)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3d.config import DenseConfig, MeshConfig
from tpu3d.dense.grid import create_grid, trilinear_sample
from tpu3d.dense.train import RayDataset, make_optimizer, TrainState
from tpu3d.dist import make_mesh
from tpu3d.dist.dense_tp import (
    make_tp_dense_step, psum_bytes_per_step, trilinear_partial,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    return make_mesh(MeshConfig(data_parallel=2, model_parallel=4))


def _rand_grid(rng, res=16, channels=28):
    g = rng.normal(0, 1, (res, res, res, channels)).astype(np.float32)
    return jnp.asarray(g), jnp.asarray([-1.0, -1.0, -1.0], jnp.float32), \
        jnp.asarray([1.0, 1.0, 1.0], jnp.float32)


def test_trilinear_partial_sums_to_dense(rng):
    """Summing the brick partials over all bricks reproduces the dense
    trilinear_sample exactly (ownership masks are disjoint + covering),
    including points straddling brick boundaries and out-of-bounds."""
    g, lo, hi = _rand_grid(rng, res=16)
    pts = jnp.asarray(rng.uniform(-1.3, 1.3, (500, 3)).astype(np.float32))
    want, in_ref = trilinear_sample(g, lo, hi, pts)
    for n_bricks in (2, 4, 8):
        Xl = 16 // n_bricks
        total = jnp.zeros_like(want)
        for j in range(n_bricks):
            part, in_b = trilinear_partial(
                g[j * Xl:(j + 1) * Xl], jnp.asarray(j * Xl), (16, 16, 16),
                lo, hi, pts)
            total = total + part
        np.testing.assert_allclose(np.asarray(total * in_b[:, None]),
                                   np.asarray(want), rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(in_b), np.asarray(in_ref))


def _tiny_batch(rng, n=256):
    o = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(rgb)


def _cfg(**kw):
    base = dict(grid_resolution=16, num_samples=24, near=0.1, far=2.5,
                scene_scale=1.0, batch_size=256, epochs=1, scan_chunk=1,
                hierarchical=False, per_ray_aabb=True)
    base.update(kw)
    return DenseConfig(**base)


@pytest.mark.parametrize("hier", [False, True])
def test_tp_step_1dev_vs_8dev_equivalence(rng, hier):
    """The same batch through the TP step on a (1,1) mesh and the full
    (2,4) mesh produces matching losses and updated grids — WITH jitter on:
    per-ray randomness keys off the global ray index (_ray_uniforms), so
    the trajectory is invariant to the mesh shape."""
    import optax

    cfg = _cfg(hierarchical=hier, n_coarse=16, n_fine=16)
    # SGD, not Adam, for the equivalence check: updates are then LINEAR in
    # the gradient, so a mis-scaled psum transpose (the check_vma footgun:
    # every brick gradient x n_model) or a boundary-ownership error shows
    # as a proportional grid difference. Under Adam the same x4 bug is
    # invisible except through eps on near-zero entries.
    opt = optax.sgd(0.05)
    o, d, rgb = _tiny_batch(rng)
    key = jax.random.PRNGKey(3)

    results = {}
    for name, mesh_cfg in [("1dev", MeshConfig(data_parallel=1, model_parallel=1)),
                           ("8dev", MeshConfig(data_parallel=2, model_parallel=4))]:
        devs = jax.devices()[:1] if name == "1dev" else jax.devices()
        m = make_mesh(mesh_cfg, devices=devs)
        # fresh grid per mesh: on a 1-device mesh device_put aliases the
        # source buffer, and the step donates (deletes) it
        grid = create_grid(cfg.grid_resolution, (-1, -1, -1), (1, 1, 1))
        step, place = make_tp_dense_step(cfg, opt, m,
                                         tuple(grid.grid.shape),
                                         perturb=True)
        state = TrainState(grid, opt.init(grid.grid), jnp.asarray(0))
        state, batch = place(state, o, d, rgb)
        for i in range(3):
            state, loss = step(state, jax.random.fold_in(key, i), *batch)
        results[name] = (float(loss), np.asarray(state.grid.grid))

    assert results["1dev"][0] == pytest.approx(results["8dev"][0], rel=1e-4)
    np.testing.assert_allclose(results["1dev"][1], results["8dev"][1],
                               rtol=1e-4, atol=1e-6)


def test_tp_grid_actually_sharded(rng, mesh):
    """Per-device grid state is 1/n_model of the total: the updated grid
    and every grid-shaped Adam moment land as (X/4, Y, Z, C) shards."""
    cfg = _cfg()
    opt = make_optimizer(cfg, steps_per_epoch=10)
    grid = create_grid(16, (-1, -1, -1), (1, 1, 1))
    step, place = make_tp_dense_step(cfg, opt, mesh, tuple(grid.grid.shape),
                                     perturb=False)
    state = TrainState(grid, opt.init(grid.grid), jnp.asarray(0))
    state, batch = place(state, *_tiny_batch(rng))
    state, _ = step(state, jax.random.PRNGKey(0), *batch)
    g = state.grid.grid
    assert g.sharding.shard_shape(g.shape) == (4, 16, 16, 28)
    moments = [a for a in jax.tree_util.tree_leaves(state.opt_state)
               if getattr(a, "shape", ()) == g.shape]
    assert moments, "expected grid-shaped optimizer moments"
    for m in moments:
        assert m.sharding.shard_shape(m.shape) == (4, 16, 16, 28)
    # Collective payload is resolution-independent (the value-psum design):
    # same bytes at 16^3 and at 320^3.
    assert psum_bytes_per_step(cfg, 4, 2) == \
        psum_bytes_per_step(dataclasses.replace(cfg, grid_resolution=320), 4, 2)


def test_train_plenoxel_mesh_routing(rng, mesh):
    """train_plenoxel(mesh=...) runs the full loop on the sharded step and
    returns a trainable (loss-decreasing) dense-layout grid."""
    from tpu3d.dense.train import train_plenoxel

    n = 2048
    o = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    ds = RayDataset(o, d, rgb, np.zeros(n, np.int32))
    cfg = _cfg(batch_size=256, epochs=2, learning_rate=0.3)
    grid, losses = train_plenoxel(ds, cfg, mesh=mesh, verbose=False,
                                  log_every=1)
    assert grid.grid.shape == (16, 16, 16, 28)
    assert len(losses) >= 8
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_train_sdf_mesh_routing(rng, mesh):
    from tpu3d.dense.train import train_sdf

    n = 1024
    o = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    ds = RayDataset(o, d, rgb, np.zeros(n, np.int32))
    cfg = _cfg(batch_size=256, epochs=1, num_samples=16)
    grid, losses = train_sdf(ds, cfg, mesh=mesh, verbose=False, log_every=1)
    assert grid.grid.shape == (16, 16, 16, 28)
    assert np.isfinite(losses).all()


def test_tp_rejects_occupancy_prune(rng, mesh):
    from tpu3d.dense.train import train_plenoxel

    ds = RayDataset(np.zeros((256, 3), np.float32),
                    np.ones((256, 3), np.float32) / np.sqrt(3),
                    np.zeros((256, 3), np.float32))
    with pytest.raises(ValueError, match="occupancy_prune"):
        train_plenoxel(ds, _cfg(occupancy_prune=True), mesh=mesh,
                       verbose=False)


def test_tp_step_with_latents(rng, mesh):
    """Exposure + background latents under the sharded step: replicated
    (3, M, 3)/(3, 3, 9) states update and stay finite; their gradients
    arrive psum'ed over data (transpose-of-broadcast) and are rescaled
    inside the step."""
    from tpu3d.dense.train import init_background, init_exposure

    cfg = _cfg(exposure=True, sh_background=True)
    opt = make_optimizer(cfg, steps_per_epoch=10)
    grid = create_grid(16, (-1, -1, -1), (1, 1, 1))
    step, place = make_tp_dense_step(cfg, opt, mesh,
                                     tuple(grid.grid.shape),
                                     with_exposure=True,
                                     with_background=True)
    o, d, rgb = _tiny_batch(rng)
    cid = jnp.asarray(np.tile(np.arange(4, dtype=np.int32), 64))
    state = TrainState(grid, opt.init(grid.grid), jnp.asarray(0),
                       init_exposure(4), init_background())
    state, batch = place(state, o, d, rgb)
    cid = jax.device_put(cid, step.ray_sharding)
    exp0 = np.asarray(state.exposure)
    for i in range(2):
        state, loss = step(state, jax.random.PRNGKey(i), *batch, cid=cid)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(state.exposure)).all()
    assert np.isfinite(np.asarray(state.background)).all()
    # the latents actually moved
    assert not np.allclose(np.asarray(state.exposure), exp0)


def test_train_dense_tp_checkpoint_roundtrip(rng, mesh, tmp_path):
    """Distributed trainer writes/loads the same checkpoint protocol as
    the single-device loop (sharded arrays gather on save)."""
    from tpu3d.dense.train import train_plenoxel
    from tpu3d.io.artifacts import ArtifactStore

    n = 512
    o = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ds = RayDataset(o, d, rng.uniform(0, 1, (n, 3)).astype(np.float32),
                    np.zeros(n, np.int32))
    store = ArtifactStore(str(tmp_path))
    cfg = _cfg(batch_size=256, epochs=1)
    g1, _ = train_plenoxel(ds, cfg, mesh=mesh, verbose=False,
                           checkpoint_store=store)
    # resume from epoch 0's checkpoint and run one more epoch
    cfg2 = _cfg(batch_size=256, epochs=2)
    g2, losses = train_plenoxel(ds, cfg2, mesh=mesh, verbose=False,
                                checkpoint_store=store, resume=True)
    assert g2.grid.shape == g1.grid.shape
    assert np.isfinite(losses).all()
