"""Pallas trilinear box-DMA kernel vs the jnp reference (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from tpu3d.dense.grid import trilinear_sample
from tpu3d.kernels.trilinear import CPAD, pack_grid, sample_packed


def test_sample_packed_matches_reference():
    rng = np.random.default_rng(0)
    X, Y, Z, C = 16, 24, 32, 28
    grid = jnp.asarray(rng.normal(0, 1, (X, Y, Z, C)).astype(np.float32))
    lo = jnp.asarray([-1.0, -2.0, 0.5])
    hi = jnp.asarray([1.0, 0.0, 2.5])
    n = 300
    pts = jnp.asarray(np.concatenate([
        rng.uniform(-1.1, 1.1, (n - 4, 1)) * 1.0,
        rng.uniform(-2.1, 0.1, (n - 4, 1)),
        rng.uniform(0.4, 2.6, (n - 4, 1)),
    ], axis=1).astype(np.float32))
    corners = jnp.asarray([[-1, -2, 0.5], [1, 0, 2.5], [-1, 0, 2.5], [0, -1, 1.5]], jnp.float32)
    pts = jnp.concatenate([pts, corners])

    ref, ref_in = trilinear_sample(grid, lo, hi, pts)
    packed = pack_grid(grid)
    out, out_in = sample_packed(packed, lo, hi, (X, Y, Z), pts, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_in), np.asarray(out_in))
    np.testing.assert_allclose(np.asarray(out[:, :28]), np.asarray(ref), rtol=1e-5, atol=1e-5)
    # padding channels stay zero
    assert float(jnp.abs(out[:, 28:]).max()) == 0.0


def test_render_image_pallas_path_matches():
    """render_image with use_pallas must match the XLA path (CPU interpret)."""
    rng = np.random.default_rng(1)
    res = 16
    coords = np.stack(np.meshgrid(*[np.linspace(-1, 1, res)] * 3, indexing="ij"), -1)
    inside = (np.linalg.norm(coords, axis=-1) < 0.5).astype(np.float32)
    g = np.zeros((res, res, res, 28), np.float32)
    g[..., 0] = inside * 50.0
    g[..., 1] = inside / 0.282095
    from tpu3d.dense.grid import VoxelGrid
    from tpu3d.dense.render import render_image

    vg = VoxelGrid(jnp.asarray(g), jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]))
    n = 64
    o = rng.normal(0, 1, (n, 3)).astype(np.float32)
    o = 3.0 * o / np.linalg.norm(o, axis=1, keepdims=True)
    d = (-o / np.linalg.norm(o, axis=1, keepdims=True)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    a = np.asarray(render_image(vg, key, jnp.asarray(o), jnp.asarray(d), 1.0, 5.0, 32, chunk=32, use_pallas=False))
    b = np.asarray(render_image(vg, key, jnp.asarray(o), jnp.asarray(d), 1.0, 5.0, 32, chunk=32, use_pallas=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
