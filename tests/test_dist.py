"""Multi-device tests on the 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8) — SURVEY §4 test-strategy item d."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tpu3d.config import DenseConfig, MeshConfig
from tpu3d.dist import make_mesh, make_sharded_dense_step, sharded_bundle_adjust
from tpu3d.dense.grid import create_grid


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    return make_mesh(MeshConfig(data_parallel=4, model_parallel=2))


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_sharded_dense_step_runs_and_matches_single(mesh, rng):
    cfg = DenseConfig(grid_resolution=16, num_samples=32, near=1.0, far=5.0,
                      scene_scale=1.0, batch_size=256, learning_rate=1e-2)
    vg = create_grid(16, (-1, -1, -1), (1, 1, 1))
    opt = optax.adam(cfg.learning_rate)

    o = rng.normal(0, 1, (256, 3)).astype(np.float32)
    o = 3.0 * o / np.linalg.norm(o, axis=1, keepdims=True)
    d = (-o / np.linalg.norm(o, axis=1, keepdims=True)).astype(np.float32)
    rgb = rng.uniform(0, 1, (256, 3)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    bounds = jnp.stack([vg.min_bound, vg.max_bound])

    step, place = make_sharded_dense_step(cfg, opt, mesh)
    ga, os_, batch = place(vg.grid, opt.init(vg.grid), jnp.asarray(o), jnp.asarray(d), jnp.asarray(rgb))
    ga2, _, loss_sharded = step(ga, bounds, os_, key, *batch)

    # single-device reference
    from tpu3d.dense.render import render_rays

    def loss_fn(grid_arr):
        from tpu3d.dense.grid import VoxelGrid
        pred = render_rays(VoxelGrid(grid_arr, vg.min_bound, vg.max_bound), key,
                           jnp.asarray(o), jnp.asarray(d), cfg.near, cfg.far,
                           cfg.num_samples, cfg.white_background)
        return jnp.mean((pred - jnp.asarray(rgb)) ** 2)

    loss_single = loss_fn(vg.grid)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single), rtol=1e-4)
    assert np.all(np.isfinite(np.asarray(ga2)))


def test_sharded_ba_matches_single(mesh, rng):
    from tests.test_ba import make_ba_problem
    from tpu3d.ba import bundle_adjust

    p = make_ba_problem(rng, n_cams=4, n_pts=128)
    args = (
        jnp.asarray(p["cams0"]), jnp.asarray(p["X0"]),
        jnp.asarray(p["cam_idx"]), jnp.asarray(p["pt_idx"]),
        jnp.asarray(p["uv"]), jnp.asarray(p["w"]), jnp.asarray(p["cam_fixed"]),
    )
    st_single = bundle_adjust(*args, max_iters=5)
    st_sharded = sharded_bundle_adjust(mesh, *args, max_iters=5)
    np.testing.assert_allclose(np.asarray(st_sharded.cams), np.asarray(st_single.cams), atol=1e-4)
    np.testing.assert_allclose(float(st_sharded.cost), float(st_single.cost), rtol=1e-3)


def test_sharded_match_block_matches_single(mesh, rng):
    """Pair-axis-sharded matching must reproduce the single-device packed
    results bit-for-bit (replicated inputs, deterministic keys)."""
    from tpu3d.dist.sharding import make_sharded_match_block
    from tpu3d.sfm.pipeline import _match_and_gate_block

    N, K, F = 6, 128, 32
    focal = 600.0
    d = jnp.asarray(rng.normal(size=(N, K, F)).astype(np.float32))
    v = jnp.ones((N, K), jnp.float32)
    kp = jnp.asarray(rng.uniform(-200, 200, (N, K, 2)).astype(np.float32))
    B = 8
    ii = jnp.asarray((np.arange(B) % N).astype(np.int32))
    jj = jnp.asarray(((np.arange(B) + 1) % N).astype(np.int32))
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    single = np.asarray(_match_and_gate_block(
        d, v, kp, ii, jj, keys, focal, 1.0, 0.95, 64, five_point=False))
    run = make_sharded_match_block(mesh, focal, 1.0, 0.95, 64)
    sharded = np.asarray(run(d, v, kp, ii, jj, keys))
    np.testing.assert_allclose(sharded, single, atol=1e-5)
