"""Scatter-add backward kernel (kernels/trilinear_grad.py) vs the XLA
autodiff of the pure-jnp trilinear sampler — exact agreement required.

Runs in interpret mode on the CPU test backend; the same kernel compiles
for TPU (benchmarks/trilinear_bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3d.dense.grid import trilinear_sample
from tpu3d.kernels.trilinear import CPAD, pack_grid, unpack_grid
from tpu3d.kernels.trilinear_grad import sample_packed_diff, scatter_grad

RES = (8, 16, 16)
C = 28
MINB = np.array([-1.0, -1.0, -1.0], np.float32)
MAXB = np.array([1.0, 1.0, 1.0], np.float32)


def _rand_scene(seed, n=700):
    rng = np.random.RandomState(seed)
    grid = rng.randn(*RES, C).astype(np.float32)
    # mix of interior, boundary-exact and out-of-bounds points
    pts = rng.uniform(-1.3, 1.3, size=(n, 3)).astype(np.float32)
    pts[:5] = [[-1, -1, -1], [1, 1, 1], [0, 1, -1], [1, 0, 0], [-1, 1, 1]]
    return grid, pts


def _expected_grad(grid, pts, ct):
    """d/d grid of sum(ct * trilinear_sample(grid)(pts)) via XLA autodiff."""
    def f(g):
        vals, _ = trilinear_sample(g, jnp.asarray(MINB), jnp.asarray(MAXB),
                                   jnp.asarray(pts))
        return jnp.sum(vals * ct[:, :C])

    return jax.grad(f)(jnp.asarray(grid))


@pytest.mark.parametrize("seed", [0, 3])
def test_scatter_grad_matches_xla_autodiff(seed):
    grid, pts = _rand_scene(seed)
    rng = np.random.RandomState(seed + 100)
    ct_np = rng.randn(len(pts), CPAD).astype(np.float32)
    ct_np[:, C:] = 0.0  # training cotangents never touch padding channels
    ct = jnp.asarray(ct_np)

    gp = scatter_grad(ct, jnp.asarray(MINB), jnp.asarray(MAXB), RES,
                      jnp.asarray(pts), interpret=True)
    got = unpack_grid(gp, (*RES, C))
    want = _expected_grad(grid, pts, ct)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # padding rows/channels must stay zero (Adam on the packed layout)
    full = unpack_grid(gp, (*RES, CPAD))
    np.testing.assert_array_equal(np.asarray(full[..., C:]), 0.0)


def test_custom_vjp_end_to_end():
    """value_and_grad of an MSE through sample_packed_diff == the XLA path."""
    grid, pts = _rand_scene(7, n=300)
    target = np.random.RandomState(8).randn(len(pts), C).astype(np.float32)
    packed = pack_grid(jnp.asarray(grid))

    def loss_packed(p):
        vals, _ = sample_packed_diff(RES, True, p, jnp.asarray(MINB),
                                     jnp.asarray(MAXB), jnp.asarray(pts))
        return jnp.mean((vals[:, :C] - target) ** 2)

    def loss_xla(g):
        vals, _ = trilinear_sample(g, jnp.asarray(MINB), jnp.asarray(MAXB),
                                   jnp.asarray(pts))
        return jnp.mean((vals - target) ** 2)

    lp, gp = jax.value_and_grad(loss_packed)(packed)
    lx, gx = jax.value_and_grad(loss_xla)(jnp.asarray(grid))
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(unpack_grid(gp, (*RES, C))),
                               np.asarray(gx), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("hierarchical", [False, True])
def test_packed_train_step_matches_xla_path(hierarchical):
    """A few plenoxel training steps on the packed layout == the XLA
    autodiff path (same seed, same batches)."""
    from tpu3d.config import DenseConfig
    from tpu3d.dense.train import RayDataset, train_plenoxel

    rng = np.random.RandomState(0)
    n = 256
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = -2.0
    d = rng.randn(n, 3).astype(np.float32)
    d[:, 0] = np.abs(d[:, 0]) + 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ds = RayDataset(o, d, rng.rand(n, 3).astype(np.float32))
    # scan_chunk=1 isolates the kernel-pair equivalence from scan-fusion
    # reassociation noise (the chunked loop is covered separately below)
    cfg = DenseConfig(grid_resolution=16, epochs=2, batch_size=64,
                      num_samples=8, near=0.5, far=4.0,
                      hierarchical=hierarchical, n_coarse=6, n_fine=6,
                      scan_chunk=1)
    g_xla, _ = train_plenoxel(ds, cfg, verbose=False, packed=False)
    g_pk, _ = train_plenoxel(ds, cfg, verbose=False, packed=True)
    assert g_pk.grid.shape == g_xla.grid.shape
    # atol covers Adam's sqrt(v) amplification of float-associativity
    # noise on near-zero gradients (a real kernel bug diverges by orders
    # of magnitude — see test_scatter_grad_* for the exact-math checks)
    np.testing.assert_allclose(np.asarray(g_pk.grid), np.asarray(g_xla.grid),
                               rtol=2e-4, atol=5e-4)


def test_chunked_loop_matches_per_step():
    """The scan_chunk>1 multi-step dispatch == the per-step loop (same
    seed, same shuffle, same batches — the chunking only changes dispatch
    granularity, not the training sequence)."""
    from tpu3d.config import DenseConfig
    from tpu3d.dense.train import RayDataset, train_plenoxel

    rng = np.random.RandomState(1)
    n = 256
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = -2.0
    d = rng.randn(n, 3).astype(np.float32)
    d[:, 0] = np.abs(d[:, 0]) + 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ds = RayDataset(o, d, rng.rand(n, 3).astype(np.float32))
    base = dict(grid_resolution=16, epochs=2, batch_size=64,
                num_samples=8, near=0.5, far=4.0)
    g1, l1 = train_plenoxel(ds, DenseConfig(scan_chunk=1, **base),
                            verbose=False, packed=False, log_every=1)
    g2, l2 = train_plenoxel(ds, DenseConfig(scan_chunk=3, **base),
                            verbose=False, packed=False, log_every=1)
    assert len(l1) == len(l2)
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.grid), np.asarray(g1.grid),
                               rtol=2e-4, atol=1e-4)


def test_scatter_grad_dense_cluster():
    """Many samples in one cell (the conflict-heavy case an RMW-racy
    implementation would get wrong)."""
    rng = np.random.RandomState(11)
    grid = rng.randn(*RES, C).astype(np.float32)
    base = np.array([0.1, 0.2, -0.3], np.float32)
    pts = (base + rng.uniform(-0.02, 0.02, size=(1500, 3))).astype(np.float32)
    ct = jnp.asarray(rng.randn(len(pts), CPAD).astype(np.float32))
    gp = scatter_grad(ct, jnp.asarray(MINB), jnp.asarray(MAXB), RES,
                      jnp.asarray(pts), interpret=True)
    want = _expected_grad(grid, pts, ct)
    np.testing.assert_allclose(np.asarray(unpack_grid(gp, (*RES, C))),
                               np.asarray(want), rtol=1e-4, atol=1e-4)
