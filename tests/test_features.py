import numpy as np
import jax.numpy as jnp

from tpu3d.config import FrontendConfig
from tpu3d.features import extract_features
from tpu3d.features.frontend import sample_colors


def make_texture(rng, n=256):
    """Smooth random texture with plenty of blob-like structure."""
    img = rng.normal(0, 1, (n, n)).astype(np.float32)
    # Lowpass with a few box blurs for smooth blobs.
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(img, 3.0)
    img = (img - img.min()) / (img.max() - img.min())
    return img.astype(np.float32)


CFG = FrontendConfig(max_keypoints=512, num_octaves=3)


def test_detects_keypoints(rng):
    img = make_texture(rng)
    fs = extract_features(jnp.asarray(img)[None], CFG)
    n_valid = int(jnp.sum(fs.valid))
    assert n_valid > 100
    # all valid keypoints inside the image
    kp = np.asarray(fs.keypoints_px[0])[np.asarray(fs.valid[0])]
    assert kp[:, 0].min() >= 0 and kp[:, 0].max() < 256
    # descriptors are unit norm
    d = np.asarray(fs.descriptors[0])[np.asarray(fs.valid[0])]
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-3)


def test_centered_convention(rng):
    img = make_texture(rng)
    fs = extract_features(jnp.asarray(img)[None], CFG)
    kp_px = np.asarray(fs.keypoints_px[0])
    kp_c = np.asarray(fs.keypoints[0])
    np.testing.assert_allclose(kp_c[:, 0], kp_px[:, 0] - 128.0, atol=1e-4)
    np.testing.assert_allclose(kp_c[:, 1], -(kp_px[:, 1] - 128.0), atol=1e-4)


def test_translation_repeatability(rng):
    img = make_texture(rng, 320)
    shift = 16
    img2 = np.roll(img, shift, axis=1)  # shift right by 16 px
    fs = extract_features(jnp.asarray(np.stack([img, img2])), CFG)
    d0 = np.asarray(fs.descriptors[0])
    d1 = np.asarray(fs.descriptors[1])
    v0 = np.asarray(fs.valid[0])
    v1 = np.asarray(fs.valid[1])
    kp0 = np.asarray(fs.keypoints_px[0])
    kp1 = np.asarray(fs.keypoints_px[1])
    # central region only (away from the wrap seam)
    sel0 = v0 & (kp0[:, 0] > 40) & (kp0[:, 0] < 240) & (kp0[:, 1] > 40) & (kp0[:, 1] < 280)
    sim = d0[sel0] @ d1[v1].T
    nn = np.argmax(sim, axis=1)
    best = np.max(sim, axis=1)
    src = kp0[sel0]
    dst = kp1[v1][nn]
    offsets = dst - src
    good = best > 0.8
    assert good.sum() > 30
    dx = offsets[good, 0]
    dy = offsets[good, 1]
    # majority of confident matches should be the pure translation
    frac = np.mean((np.abs(dx - shift) < 1.5) & (np.abs(dy) < 1.5))
    assert frac > 0.7


def test_sample_colors(rng):
    img = (make_texture(rng) * 255).astype(np.uint8)
    rgb = np.stack([img, img // 2, img // 3], axis=-1)
    fs = extract_features(jnp.asarray(img[None] / 255.0, jnp.float32), CFG)
    colors = np.asarray(sample_colors(jnp.asarray(rgb[None]), fs.keypoints_px))
    kp = np.asarray(fs.keypoints_px[0])
    xi = np.clip(np.round(kp[:, 0]).astype(int), 0, 255)
    yi = np.clip(np.round(kp[:, 1]).astype(int), 0, 255)
    np.testing.assert_array_equal(colors[0], rgb[yi, xi])


def test_topk_threshold_matches_topk_set(rng):
    """_topk_threshold must select the same SET as lax.top_k on an NMS-like
    sparse score map (the TPU sort-free path must not change features)."""
    import jax
    import jax.numpy as jnp

    from tpu3d.features.detector import _topk_threshold

    B, N, k = 3, 50_000, 256
    flat = np.zeros((B, N), np.float32)
    for b in range(B):
        nz = rng.choice(N, 2000, replace=False)
        flat[b, nz] = rng.uniform(1e-4, 1.0, 2000).astype(np.float32)
    vals_t, idx_t = jax.jit(_topk_threshold, static_argnames="k")(
        jnp.asarray(flat), k=k)
    vals_r, idx_r = jax.lax.top_k(jnp.asarray(flat), k)
    vals_t, idx_t = np.asarray(vals_t), np.asarray(idx_t)
    vals_r, idx_r = np.asarray(vals_r), np.asarray(idx_r)
    for b in range(B):
        sel_t = set(idx_t[b][vals_t[b] > 0].tolist())
        sel_r = set(idx_r[b][vals_r[b] > 0].tolist())
        assert sel_t == sel_r
    # sparse case: fewer nonzeros than k -> all survive, rest zero-filled
    flat2 = np.zeros((1, N), np.float32)
    flat2[0, [5, 77, 1234]] = [0.5, 0.2, 0.9]
    v, i = jax.jit(_topk_threshold, static_argnames="k")(jnp.asarray(flat2), k=8)
    v, i = np.asarray(v), np.asarray(i)
    assert set(i[0][v[0] > 0].tolist()) == {5, 77, 1234}
    assert (v[0] > 0).sum() == 3


def test_topk_segmented_matches_plain(rng):
    import jax
    import jax.numpy as jnp

    from tpu3d.features.detector import _topk_segmented

    B, N, K = 3, 1 << 18, 512
    flat = rng.uniform(0, 1, (B, N)).astype(np.float32)
    flat *= (rng.uniform(0, 1, (B, N)) < 0.002)  # NMS-like sparsity
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(flat), K)
    v, i = _topk_segmented(jnp.asarray(flat), K)
    # same VALUE multiset and the indices address those values
    np.testing.assert_allclose(np.sort(np.asarray(v)), np.sort(np.asarray(v_ref)))
    np.testing.assert_allclose(
        np.take_along_axis(flat, np.asarray(i), axis=1), np.asarray(v))
