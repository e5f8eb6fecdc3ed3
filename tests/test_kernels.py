"""Pallas kernels vs their pure-jnp references, interpret mode on CPU
(SURVEY §4 test-strategy item e)."""
import numpy as np
import jax.numpy as jnp

from tpu3d.kernels.distance import descriptor_top2, mutual_nn_pallas
from tpu3d.matching.mnn import match_descriptors


def unit(rng, n, d=128):
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_top2_matches_dense(rng):
    d0 = unit(rng, 256)
    d1 = unit(rng, 512)
    best, second, arg = descriptor_top2(jnp.asarray(np.pad(d0, ((0, 0), (0, 0)))),
                                        jnp.asarray(d1), interpret=True)
    sim = d0 @ d1.T
    np.testing.assert_allclose(np.asarray(best), sim.max(1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(arg), sim.argmax(1))
    part = np.sort(sim, axis=1)
    np.testing.assert_allclose(np.asarray(second), part[:, -2], atol=1e-5)


def test_mutual_nn_pallas_matches_jnp(rng):
    d0 = unit(rng, 256)
    d1 = unit(rng, 256)
    # inject true correspondences for half the set
    d1[:128] = d0[:128] + rng.normal(0, 0.05, (128, 128)).astype(np.float32)
    d1[:128] /= np.linalg.norm(d1[:128], axis=1, keepdims=True)
    v0 = np.ones(256, np.float32)
    v1 = np.ones(256, np.float32)
    v0[200:] = 0.0  # padding region
    ref = match_descriptors(jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(v0), jnp.asarray(v1))
    got = mutual_nn_pallas(jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(v0), jnp.asarray(v1),
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    sel = np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(got.idx1)[sel], np.asarray(ref.idx1)[sel])


def test_patch_sample_matches_reference(rng):
    from tpu3d.kernels.patch_sample import (
        NSAMP, sample_gradient_patches, sample_gradient_patches_reference,
    )
    import jax.numpy as jnp

    H, W = 128, 160
    gx = rng.normal(0, 1, (H, W)).astype(np.float32)
    gy = rng.normal(0, 1, (H, W)).astype(np.float32)
    K = 8
    # keypoints well inside; rotated-grid-like sample clouds of radius ~20
    cy = rng.uniform(40, H - 40, (K, 1))
    cx = rng.uniform(40, W - 40, (K, 1))
    ys = (cy + rng.uniform(-20, 20, (K, NSAMP))).astype(np.float32)
    xs = (cx + rng.uniform(-20, 20, (K, NSAMP))).astype(np.float32)
    got = np.asarray(sample_gradient_patches(
        jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(ys), jnp.asarray(xs),
        interpret=True,
    ))
    ref = np.asarray(sample_gradient_patches_reference(
        jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(ys), jnp.asarray(xs)))
    np.testing.assert_allclose(got[:, 0, :], ref[..., 0], atol=1e-5)
    np.testing.assert_allclose(got[:, 1, :], ref[..., 1], atol=1e-5)


def test_patch_sample_narrow_width(rng):
    """Width-128 sample axis (the orientation pass's shape — the kernel's
    sample dim follows the caller instead of always padding to 256)."""
    from tpu3d.kernels.patch_sample import (
        sample_gradient_patches, sample_gradient_patches_reference,
    )
    import jax.numpy as jnp

    H, W = 128, 160
    gx = rng.normal(0, 1, (H, W)).astype(np.float32)
    gy = rng.normal(0, 1, (H, W)).astype(np.float32)
    K, S = 4, 128
    cy = rng.uniform(40, H - 40, (K, 1))
    cx = rng.uniform(40, W - 40, (K, 1))
    ys = (cy + rng.uniform(-12, 12, (K, S))).astype(np.float32)
    xs = (cx + rng.uniform(-12, 12, (K, S))).astype(np.float32)
    got = np.asarray(sample_gradient_patches(
        jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(ys), jnp.asarray(xs),
        interpret=True,
    ))
    assert got.shape == (K, 2, S)
    ref = np.asarray(sample_gradient_patches_reference(
        jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(ys), jnp.asarray(xs)))
    np.testing.assert_allclose(got[:, 0, :], ref[..., 0], atol=1e-5)
    np.testing.assert_allclose(got[:, 1, :], ref[..., 1], atol=1e-5)


def test_patch_sample_split2_close_to_reference(rng):
    """split2 (bf16-exact weights x hi/lo patch split, 2 MXU passes) must
    track the exact bilinear reference to ~2^-9-weight-quantization error."""
    from tpu3d.kernels.patch_sample import (
        sample_gradient_patches, sample_gradient_patches_reference,
    )
    import jax.numpy as jnp

    H, W = 128, 160
    gx = rng.normal(0, 1, (H, W)).astype(np.float32)
    gy = rng.normal(0, 1, (H, W)).astype(np.float32)
    K, S = 6, 128
    cy = rng.uniform(40, H - 40, (K, 1))
    cx = rng.uniform(40, W - 40, (K, 1))
    ys = (cy + rng.uniform(-15, 15, (K, S))).astype(np.float32)
    xs = (cx + rng.uniform(-15, 15, (K, S))).astype(np.float32)
    got = np.asarray(sample_gradient_patches(
        jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(ys), jnp.asarray(xs),
        interpret=True, precision="split2",
    ))
    ref = np.asarray(sample_gradient_patches_reference(
        jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(ys), jnp.asarray(xs)))
    np.testing.assert_allclose(got[:, 0, :], ref[..., 0], atol=1.5e-2)
    np.testing.assert_allclose(got[:, 1, :], ref[..., 1], atol=1.5e-2)
    # and much closer than plain bf16 everywhere on average
    assert np.mean(np.abs(got[:, 0, :] - ref[..., 0])) < 3e-3


def test_orient_desc_fused_matches_split(rng):
    """Fused orientation+descriptor kernel (interpret mode) vs the split
    reference path (keypoint_orientations + sift_descriptors)."""
    import jax.numpy as jnp

    from tpu3d.features.descriptor import (bin_descriptor, GRID,
                                           keypoint_orientations,
                                           sift_descriptors)
    from tpu3d.kernels.orient_desc import orient_desc_samples

    L, H, W = 3, 160, 200
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(rng.normal(0, 1, (L, H, W)), 2.0).astype(np.float32)
    gx = np.gradient(img, axis=2).astype(np.float32)
    gy = np.gradient(img, axis=1).astype(np.float32)
    K = 16
    ky = rng.uniform(45, H - 45, K).astype(np.float32)
    kx = rng.uniform(45, W - 45, K).astype(np.float32)
    lvl = rng.integers(0, L, K).astype(np.int32)
    sigma = rng.uniform(1.6, 3.5, K).astype(np.float32)
    ymax = np.full(K, H - 1.001, np.float32)
    xmax = np.full(K, W - 1.001, np.float32)

    gxs, gys, theta = orient_desc_samples(
        jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(ky), jnp.asarray(kx),
        jnp.asarray(lvl), jnp.asarray(sigma), jnp.asarray(ymax),
        jnp.asarray(xmax), interpret=True)
    g = (np.arange(GRID, dtype=np.float32) - (GRID - 1) / 2.0)
    dyg, dxg = np.meshgrid(g, g, indexing="ij")
    desc_fused = np.asarray(bin_descriptor(
        gxs, gys, theta, jnp.asarray(dyg.reshape(-1)),
        jnp.asarray(dxg.reshape(-1))))

    theta_ref = keypoint_orientations(
        jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(kx), jnp.asarray(ky),
        jnp.asarray(lvl), jnp.asarray(sigma), jnp.asarray(ymax),
        jnp.asarray(xmax))
    desc_ref = np.asarray(sift_descriptors(
        jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(kx), jnp.asarray(ky),
        jnp.asarray(lvl), jnp.asarray(sigma), theta_ref, jnp.asarray(ymax),
        jnp.asarray(xmax)))

    # Orientation peaks can flip between near-tie bins; require most
    # keypoints to agree tightly and all agreeing ones to match in
    # descriptor space.
    dtheta = np.abs(((np.asarray(theta) - np.asarray(theta_ref) + np.pi)
                     % (2 * np.pi)) - np.pi)
    agree = dtheta < 0.05
    assert agree.mean() >= 0.8, f"theta agreement {agree.mean()}"
    cos = np.sum(desc_fused * desc_ref, axis=-1)
    assert np.all(cos[agree] > 0.98), cos[agree].min()
